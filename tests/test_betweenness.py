"""Betweenness parity vs NetworkX's Brandes (public oracle; the
reference's betweenness.rs implements the same directed unweighted
Brandes with 1/((n-1)(n-2)) normalization)."""
import numpy as np
import pyarrow as pa
import pytest

nx = pytest.importorskip("networkx")


def _frame(s, d, n):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    t = pa.table({"src": pa.array(s, pa.int64()),
                  "dst": pa.array(d, pa.int64()),
                  "t": pa.array(np.ones(len(s), np.int64)),
                  "event_id": pa.array(np.arange(len(s), dtype=np.int64))})
    return GraphFrame(rd.from_arrow(t), n)


@pytest.mark.parametrize("seed,normalized", [(1, True), (2, False),
                                             (3, True)])
def test_betweenness_matches_networkx(ray_session, seed, normalized):
    from raphtory_ray.algorithms.extra import betweenness_centrality
    rng = np.random.default_rng(seed)
    n, m = 40, 160
    s = rng.integers(0, n, m)
    d = rng.integers(0, n, m)
    keep = s != d
    s, d = s[keep], d[keep]
    gf = _frame(s, d, n)
    got = betweenness_centrality(gf, normalized=normalized).values
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(s.tolist(), d.tolist()))
    want = nx.betweenness_centrality(g, normalized=normalized)
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_harmonic_centrality_brute_force(ray_session):
    import numpy as np
    from raphtory_ray.algorithms.extra import harmonic_centrality
    from raphtory_ray.state.shards import BspGraph
    rng = np.random.default_rng(13)
    n = 120
    src = rng.integers(0, n, 500)
    dst = rng.integers(0, n, 500)
    g = BspGraph.from_arrays(src, dst, n, num_blocks=3)
    srcs = np.arange(0, n, 9)
    st = harmonic_centrality(g, sources=srcs, num_tasks=4)
    # dense BFS reference
    pair = np.unique(src.astype(np.int64) * n + dst.astype(np.int64))
    s2, d2 = pair // n, pair % n
    adj = {}
    for a, b in zip(s2.tolist(), d2.tolist()):
        adj.setdefault(a, []).append(b)
    H = np.zeros(n)
    for s in srcs:
        dist = {int(s): 0}
        q = [int(s)]
        while q:
            nq = []
            for v in q:
                for w in adj.get(v, ()):
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        nq.append(w)
            q = nq
        for v, d in dist.items():
            if d > 0:
                H[v] += 1.0 / d
    assert np.allclose(st.values, H, atol=1e-12)


def test_harmonic_unreachable_contributes_zero(ray_session):
    import numpy as np
    from raphtory_ray.algorithms.extra import harmonic_centrality
    from raphtory_ray.state.shards import BspGraph
    # two disjoint chains: sources in one never score the other
    src = np.array([0, 1, 5, 6])
    dst = np.array([1, 2, 6, 7])
    g = BspGraph.from_arrays(src, dst, 8, num_blocks=2)
    st = harmonic_centrality(g, sources=np.array([0]))
    assert st.values[1] == 1.0 and st.values[2] == 0.5
    assert st.values[5] == st.values[6] == st.values[7] == 0.0


def test_link_prediction_features_brute_force(ray_session):
    import numpy as np
    from raphtory_ray.algorithms.linkpred import link_prediction_features
    from raphtory_ray.state.shards import BspGraph
    rng = np.random.default_rng(21)
    n = 80
    src = rng.integers(0, n, 600)
    dst = rng.integers(0, n, 600)
    g = BspGraph.from_arrays(src, dst, n, num_blocks=4)
    S = np.arange(0, n, 3)
    t = link_prediction_features(g, S)
    got = {(r["a"], r["b"]): (r["cn"], r["aa"]) for r in t.to_pylist()}
    # dense reference
    pair = np.unique(src.astype(np.int64) * n + dst.astype(np.int64))
    s2, d2 = pair // n, pair % n
    out = {v: set(d2[s2 == v].tolist()) for v in range(n)}
    od = {v: len(out[v]) for v in range(n)}
    want = {}
    Sset = sorted(S.tolist())
    for i, a in enumerate(Sset):
        for b in Sset[i + 1:]:
            common = out[a] & out[b]
            if common:
                aa = sum(1.0 / np.log(od[c]) for c in sorted(common)
                         if od[c] >= 2)
                want[(a, b)] = (len(common), aa)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-9


def test_dijkstra_direction_both(ray_session):
    import numpy as np
    import pytest
    from raphtory_ray.algorithms.extra import \
        dijkstra_single_source_shortest_paths as dj
    from raphtory_ray.state.shards import BspGraph
    # chain 0→1→2 plus back-edge 3→2: "both" reaches 3 from 0, "out" not
    g = BspGraph.from_arrays(np.array([0, 1, 3]), np.array([1, 2, 2]),
                             4, num_blocks=2)
    out = dj(g, 0, targets=[2, 3])
    assert 2 in out and 3 not in out
    both = dj(g, 0, targets=[2, 3], direction="both")
    assert both[3][0] == 3.0 and both[3][1] == [0, 1, 2, 3]
    with pytest.raises(ValueError):
        dj(g, 0, direction="both", weight=np.ones(3))
