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


def _ref_walks(edges: pa.Table, starts, length, seed=0, wps=1):
    """Single-process reference for random_walks: same rank rule."""
    import numpy as np
    from raphtory_ray.algorithms.sampling import _C1, _C2, _splitmix64
    adj = {}
    for s, d in zip(edges["src"].to_pylist(), edges["dst"].to_pylist()):
        adj.setdefault(s, set()).add(d)
    rows = []
    for i, st in enumerate(starts):
        for j in range(wps):
            w, cur = i * wps + j, int(st)
            rows.append((w, 0, cur))
            for s in range(1, length + 1):
                nbrs = sorted(adj.get(cur, ()))
                if not nbrs:
                    break
                keys = _splitmix64(
                    (np.uint64(cur) << np.uint64(32))
                    + np.array(nbrs, np.uint64) + np.uint64(seed)
                    + np.uint64(s) * _C1 + np.uint64(w) * _C2)
                cur = min(zip(keys.tolist(), nbrs))[1]
                rows.append((w, s, cur))
    return sorted(rows)


def test_random_walks_match_reference(ray_session):
    import ray.data as rd
    from raphtory_ray.algorithms.sampling import random_walks
    edges = _edges(m=800, n=50, seed=21)
    starts = np.arange(0, 50, 5, dtype=np.int64)
    got = random_walks(rd.from_arrow(edges).repartition(6), starts,
                       length=6, seed=3, walks_per_start=2)
    got_rows = sorted(zip(got["walk_id"].to_pylist(),
                          got["pos"].to_pylist(),
                          got["node"].to_pylist()))
    assert got_rows == _ref_walks(edges, starts, 6, seed=3, wps=2)


def test_random_walks_sink_stop_and_reshard(ray_session):
    import ray.data as rd
    from raphtory_ray.algorithms.sampling import random_walks
    # a path graph 0->1->2: walks stop at the sink
    edges = pa.table({"src": pa.array([0, 1], pa.int64()),
                      "dst": pa.array([1, 2], pa.int64())})
    t = random_walks(rd.from_arrow(edges), np.array([0], np.int64), 5)
    rows = sorted(zip(t["pos"].to_pylist(), t["node"].to_pylist()))
    assert rows == [(0, 0), (1, 1), (2, 2)]
    big = _edges(m=1500, n=30, seed=8)
    a = random_walks(rd.from_arrow(big).repartition(9),
                     np.arange(10, dtype=np.int64), 4, seed=1)
    b = random_walks(rd.from_arrow(big).repartition(2),
                     np.arange(10, dtype=np.int64), 4, seed=1)
    assert sorted(map(tuple, zip(*[a[c].to_pylist() for c in
                                   a.column_names]))) \
        == sorted(map(tuple, zip(*[b[c].to_pylist() for c in
                                   b.column_names])))


def test_neighbor_sample_empty_seeds(ray_session):
    import ray.data as rd
    from raphtory_ray.algorithms.sampling import neighbor_sample
    out = neighbor_sample(rd.from_arrow(_edges()), np.array([], np.int64),
                          [3, 2])
    assert out.num_rows == 0
    assert out.column_names == ["src", "dst", "hop"]


def _ref_node2vec(edges: pa.Table, starts, length, seed=0, wps=1,
                  shifts=(0, 2, 0)):
    """Single-process reference for node2vec_walks: same biased rank."""
    import numpy as np
    from raphtory_ray.algorithms.sampling import _C1, _C2, _splitmix64
    adj = {}
    for s, d in zip(edges["src"].to_pylist(), edges["dst"].to_pylist()):
        adj.setdefault(s, set()).add(d)
    s0, s1, s2 = shifts
    rows = []
    for i, st in enumerate(starts):
        for j in range(wps):
            w, cur, prev = i * wps + j, int(st), None
            rows.append((w, 0, cur))
            for s in range(1, length + 1):
                nbrs = sorted(adj.get(cur, ()))
                if not nbrs:
                    break
                keys = _splitmix64(
                    (np.uint64(cur) << np.uint64(32))
                    + np.array(nbrs, np.uint64) + np.uint64(seed)
                    + np.uint64(s) * _C1 + np.uint64(w) * _C2).tolist()
                if prev is not None:
                    keys = [k >> (s0 if v == prev
                                  else s1 if v in adj.get(prev, ())
                                  else s2)
                            for k, v in zip(keys, nbrs)]
                prev = cur
                cur = min(zip(keys, nbrs))[1]
                rows.append((w, s, cur))
    return sorted(rows)


def test_node2vec_walks_match_reference(ray_session):
    import ray.data as rd
    from raphtory_ray.algorithms.sampling import node2vec_walks
    edges = _edges(m=800, n=50, seed=11)
    starts = np.arange(0, 50, 5, dtype=np.int64)
    for shifts in [(0, 2, 0), (3, 0, 1), (0, 0, 4)]:
        got = node2vec_walks(rd.from_arrow(edges).repartition(6), starts,
                             length=6, seed=5, walks_per_start=2,
                             shifts=shifts)
        got_rows = sorted(zip(got["walk_id"].to_pylist(),
                              got["pos"].to_pylist(),
                              got["node"].to_pylist()))
        assert got_rows == _ref_node2vec(edges, starts, 6, seed=5, wps=2,
                                         shifts=shifts), shifts


def test_node2vec_zero_shifts_equal_deepwalk(ray_session):
    import ray.data as rd
    from raphtory_ray.algorithms.sampling import node2vec_walks, random_walks
    edges = _edges(m=600, n=40, seed=9)
    starts = np.arange(8, dtype=np.int64)
    a = node2vec_walks(rd.from_arrow(edges), starts, length=5, seed=2,
                       shifts=(0, 0, 0))
    b = random_walks(rd.from_arrow(edges), starts, length=5, seed=2)
    ka = sorted(zip(a["walk_id"].to_pylist(), a["pos"].to_pylist(),
                    a["node"].to_pylist()))
    kb = sorted(zip(b["walk_id"].to_pylist(), b["pos"].to_pylist(),
                    b["node"].to_pylist()))
    assert ka == kb


def test_node2vec_reshard_invariance(ray_session):
    import ray.data as rd
    from raphtory_ray.algorithms.sampling import node2vec_walks
    big = _edges(m=1500, n=30, seed=8)
    a = node2vec_walks(rd.from_arrow(big).repartition(9),
                       np.arange(10, dtype=np.int64), 4, seed=1,
                       shifts=(1, 3, 0))
    b = node2vec_walks(rd.from_arrow(big).repartition(2),
                       np.arange(10, dtype=np.int64), 4, seed=1,
                       shifts=(1, 3, 0))
    assert sorted(map(tuple, zip(*[a[c].to_pylist() for c in
                                   a.column_names]))) \
        == sorted(map(tuple, zip(*[b[c].to_pylist() for c in
                                   b.column_names])))
