"""k-hop neighbor fanout sampling: determinism, fanout bounds, and exact
agreement with a single-process numpy reference."""
import numpy as np
import pyarrow as pa
import pytest


def _edges(m=500, n=60, seed=3):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    return pa.table({"src": pa.array(src), "dst": pa.array(dst)})


def _ref_sample(edges: pa.Table, seeds, fanouts, seed=0):
    """Single-process reference: same rank rule, pure python/numpy."""
    from raphtory_ray.algorithms.sampling import _rank_key
    src = edges["src"].to_numpy()
    dst = edges["dst"].to_numpy()
    pairs = set(zip(src.tolist(), dst.tolist()))
    frontier = sorted(set(int(s) for s in seeds))
    rows = []
    for h, f in enumerate(fanouts, start=1):
        nxt = set()
        for u in frontier:
            cand = sorted({d for (s, d) in pairs if s == u})
            if not cand:
                continue
            keys = _rank_key(np.full(len(cand), u, np.int64),
                             np.array(cand, np.int64), seed + h)
            order = sorted(range(len(cand)),
                           key=lambda i: (keys[i], cand[i]))[:f]
            for i in order:
                rows.append((u, cand[i], h))
                nxt.add(cand[i])
        frontier = sorted(nxt)
    return sorted(rows)


def test_neighbor_sample_matches_reference(ray_session):
    import ray.data as rd
    from raphtory_ray.algorithms.sampling import neighbor_sample
    edges = _edges()
    ds = rd.from_arrow(edges).repartition(6)
    seeds = np.array([1, 5, 9, 13], np.int64)
    got = neighbor_sample(ds, seeds, [3, 2], seed=7)
    got_rows = sorted(zip(got["src"].to_pylist(), got["dst"].to_pylist(),
                          got["hop"].to_pylist()))
    assert got_rows == _ref_sample(edges, seeds, [3, 2], seed=7)


def test_neighbor_sample_fanout_bound_and_determinism(ray_session):
    import ray.data as rd
    from raphtory_ray.algorithms.sampling import neighbor_sample
    edges = _edges(m=2000, n=40, seed=11)
    seeds = np.arange(0, 40, 4, dtype=np.int64)
    a = neighbor_sample(rd.from_arrow(edges).repartition(8), seeds, [4, 3])
    b = neighbor_sample(rd.from_arrow(edges).repartition(3), seeds, [4, 3])
    ra = sorted(zip(a["src"].to_pylist(), a["dst"].to_pylist(),
                    a["hop"].to_pylist()))
    rb = sorted(zip(b["src"].to_pylist(), b["dst"].to_pylist(),
                    b["hop"].to_pylist()))
    assert ra == rb                       # reshard-invariant
    import collections
    per = collections.Counter((s, h) for s, _d, h in ra)
    assert all(c <= (4 if h == 1 else 3) for (_s, h), c in per.items())
    # hop-2 sources are exactly hop-1 destinations that have out-edges
    h1_dst = {d for _s, d, h in ra if h == 1}
    h2_src = {s for s, _d, h in ra if h == 2}
    assert h2_src <= h1_dst


def test_neighbor_sample_empty_seeds(ray_session):
    import ray.data as rd
    from raphtory_ray.algorithms.sampling import neighbor_sample
    out = neighbor_sample(rd.from_arrow(_edges()), np.array([], np.int64),
                          [3, 2])
    assert out.num_rows == 0
    assert out.column_names == ["src", "dst", "hop"]
