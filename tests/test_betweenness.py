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
