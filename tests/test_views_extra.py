"""Single-node components, SCC, temporal reachability, WindowSet bounds —
the algorithm surface added on top of the core four (SURVEY §2.8: seq +
pathing + WindowSet rows)."""

import numpy as np
import pyarrow as pa
import pytest


def _gf(edges, n, ray_session=None):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    s, d, t = (np.array([e[i] for e in edges], dtype=np.int64)
               for i in range(3))
    ds = rd.from_arrow(pa.table({
        "src": pa.array(s), "dst": pa.array(d), "t": pa.array(t),
        "event_id": pa.array(np.arange(len(s), dtype=np.int64))}))
    return GraphFrame(ds, n=n)


def test_single_node_components(ray_session):
    # 0→1→2→0 cycle, 2→3, 3→4→3 cycle, 5→0
    from raphtory_ray.algorithms import in_component, out_component
    gf = _gf([(0, 1, 0), (1, 2, 0), (2, 0, 0), (2, 3, 0),
              (3, 4, 0), (4, 3, 0), (5, 0, 0)], n=6)
    assert set(out_component(gf, 0).tolist()) == {0, 1, 2, 3, 4}
    assert set(in_component(gf, 3).tolist()) == {0, 1, 2, 3, 4, 5}
    assert set(in_component(gf, 5).tolist()) == set()
    # matches the all-nodes variant
    from raphtory_ray.algorithms import out_components
    assert set(out_components(gf)[0].tolist()) == \
        set(out_component(gf, 0).tolist())


def test_scc_fixture(ray_session):
    from raphtory_ray.algorithms.extra import strongly_connected_components
    gf = _gf([(0, 1, 0), (1, 2, 0), (2, 0, 0), (2, 3, 0),
              (3, 4, 0), (4, 3, 0), (5, 0, 0)], n=6)
    comp = strongly_connected_components(gf).values
    np.testing.assert_array_equal(comp, [0, 0, 0, 3, 3, 5])


def test_temporal_reachability(ray_session):
    # 1→2 happens BEFORE 0→1, so taint from 0 cannot ride it
    from raphtory_ray.algorithms import temporally_reachable_nodes
    gf = _gf([(0, 1, 5), (1, 2, 3), (1, 3, 7)], n=4)
    got = set(temporally_reachable_nodes(gf, start_time=0, seeds=[0]).tolist())
    assert got == {0, 1, 3}
    # starting later excludes the t=5 edge
    got = set(temporally_reachable_nodes(gf, start_time=6, seeds=[0]).tolist())
    assert got == {0}


def test_window_bounds_and_rolling(ray_session):
    from raphtory_ray.algorithms.extra import expanding, rolling
    gf = _gf([(i % 3, (i + 1) % 3, i) for i in range(10)], n=3)
    w = gf.window(2, 7)
    assert (w.start, w.end) == (2, 7)
    assert w.count_temporal_edges() == 5

    views = rolling(gf, window=4, step=4)
    assert views, "rolling produced no windows"
    for v in views:
        assert v.end - v.start == 4
        want = sum(1 for t in range(10) if v.start <= t < v.end)
        assert v.count_temporal_edges() == want
    # every event covered; last window may overhang (reference WindowSet)
    assert views[0].start == 0 and views[-1].end == 12

    exp = expanding(gf, step=4)
    assert exp[-1].count_temporal_edges() == 10
    counts = [v.count_temporal_edges() for v in exp]
    assert counts == sorted(counts)


def test_windowset_reference_bounds(ray_session):
    """Exact WindowSet bounds transcribed from time_tests.rs:57-175."""
    from raphtory_ray.algorithms.extra import expanding, rolling

    def bounds(views):
        return [(v.start, v.end) for v in views]

    def timeline(a, b):        # events at every t in [a, b)
        return _gf([(0, 1, t) for t in range(a, b)], n=2)

    g = timeline(1, 7)
    assert bounds(rolling(g, 2)) == [(1, 3), (3, 5), (5, 7)]
    assert [(v.start, v.end) for v in expanding(g, 2)] == \
        [(None, 3), (None, 5), (None, 7)]

    g = timeline(1, 6)
    assert bounds(rolling(g, 3, 2)) == [(0, 3), (2, 5), (4, 7)]
    assert [(v.start, v.end) for v in expanding(g, 2)] == \
        [(None, 3), (None, 5), (None, 7)]

    g = timeline(0, 9)
    w = g.window(1, 6)
    w.edges = w.edges.materialize()
    assert bounds(rolling(w, 3, 2)) == [(1, 3), (2, 5), (4, 6)]
    assert bounds(expanding(w, 2)) == [(1, 3), (1, 5), (1, 6)]


def test_balance_reference_golden(ray_session):
    """Reference balance fixture (test_algorithms.py::test_balance_algorithm,
    nodes renumbered 1..5 → 0..4)."""
    import ray.data as rd
    from raphtory_ray.algorithms import balance
    from raphtory_ray.graph.graph_frame import GraphFrame
    edges = [(0, 1, 10.0), (0, 3, 20.0), (1, 2, 5.0), (2, 1, 2.0),
             (2, 0, 1.0), (3, 2, 10.0), (3, 0, 5.0), (0, 4, 2.0)]
    tbl = pa.table({
        "src": pa.array([e[0] for e in edges], pa.int64()),
        "dst": pa.array([e[1] for e in edges], pa.int64()),
        "t": pa.array(list(range(1, len(edges) + 1)), pa.int64()),
        "w": pa.array([e[2] for e in edges])})
    gf = GraphFrame(rd.from_arrow(tbl), n=5)
    np.testing.assert_allclose(balance(gf, "w", "both").values,
                               [-26.0, 7.0, 12.0, 5.0, 2.0])
    np.testing.assert_allclose(balance(gf, "w", "in").values,
                               [6.0, 12.0, 15.0, 20.0, 2.0])


def test_hits_sum_normalization(ray_session):
    """HITS parity: sum-normalized (Σ auth = Σ hub = 1 per iteration,
    hits.rs:104-110) and stops when both max-diffs ≤ 0.01."""
    from raphtory_ray.core import kernels as K
    rng = np.random.default_rng(5)
    s = rng.integers(0, 40, 200)
    d = rng.integers(0, 40, 200)
    hub, auth, it = K.hits(s, d, 40)
    assert hub.sum() == pytest.approx(1.0)
    assert auth.sum() == pytest.approx(1.0)
    from raphtory_ray.state.shards import BspGraph
    g = BspGraph.from_arrays(s, d, 40, num_blocks=3)
    h2, a2, it2 = g.hits()
    np.testing.assert_allclose(h2, hub, atol=1e-12)
    np.testing.assert_allclose(a2, auth, atol=1e-12)
    assert it2 == it


def test_balance_direction_variants(ray_session):
    import ray.data as rd
    from raphtory_ray.algorithms import balance
    from raphtory_ray.graph.graph_frame import GraphFrame
    tbl = pa.table({"src": pa.array([0, 1], pa.int64()),
                    "dst": pa.array([1, 2], pa.int64()),
                    "t": pa.array([0, 1], pa.int64()),
                    "w": pa.array([2.0, 3.0])})
    gf = GraphFrame(rd.from_arrow(tbl), n=3)
    np.testing.assert_allclose(balance(gf, "w", "in").values, [0, 2, 3])
    np.testing.assert_allclose(balance(gf, "w", "out").values, [-2, -3, 0])
    np.testing.assert_allclose(balance(gf, "w", "both").values, [-2, -1, 3])


def test_shrink_window_aliases(ray_session):
    """shrink_window/start/end (graph.rs:336-374) = one-sided window
    narrowing; nested bounds intersect, never widen."""
    import pyarrow as pa
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    edges = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                      "dst": pa.array([1, 2, 0], pa.int64()),
                      "t": pa.array([1, 5, 9], pa.int64()),
                      "event_id": pa.array([0, 1, 2], pa.int64())})
    gf = GraphFrame(rd.from_arrow(edges), 3)
    assert gf.shrink_start(3).edges.count() == 2
    assert gf.shrink_end(6).edges.count() == 2
    assert gf.shrink_window(3, 6).edges.count() == 1
    # narrowing never widens an existing window
    w = gf.window(4, 8)
    assert w.shrink_start(0).start == 4
    assert w.shrink_end(100).end == 8


def test_window_reports_requested_bounds(ray_session):
    """round-4 advice: window() REPLACES the reported bounds (reference
    time.rs:245 — only shrink_* report the intersection); event
    visibility still intersects with the parent."""
    from tests.test_views_extra import _gf as _mk  # same module helper
    g = _gf([(0, 1, t) for t in range(0, 9)], n=2)
    w = g.window(1, 6)
    # a nested WIDER window reports ITS OWN bounds...
    w2 = w.window(0, 8)
    assert (w2.start, w2.end) == (0, 8)
    # ...but sees only the intersection's events
    assert w2.edges.count() == 5
    # shrink_window reports the intersection
    s2 = w.shrink_window(0, 8)
    assert (s2.start, s2.end) == (1, 6)
    assert s2.edges.count() == 5
    s3 = w.shrink_start(3)
    assert (s3.start, s3.end) == (3, 6)


def test_earliest_arrival_matches_reachability(ray_session):
    """Arrival times refine temporally_reachable_nodes: same reached set,
    and each arrival is the min over brute-force time-respecting paths."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from raphtory_ray.algorithms import (earliest_arrival,
                                         temporally_reachable_nodes)
    from raphtory_ray.graph.graph_frame import GraphFrame
    rng = np.random.default_rng(7)
    m, n = 300, 40
    edges = pa.table({"src": pa.array(rng.integers(0, n, m), pa.int64()),
                      "dst": pa.array(rng.integers(0, n, m), pa.int64()),
                      "t": pa.array(rng.integers(0, 50, m), pa.int64()),
                      "event_id": pa.array(np.arange(m), pa.int64())})
    gf = GraphFrame(rd.from_arrow(edges).repartition(4), n, None)
    st = earliest_arrival(gf, source=0, start_time=0)
    INF = np.iinfo(np.int64).max
    reached = set(np.flatnonzero(st.values < INF).tolist())
    assert reached == set(
        temporally_reachable_nodes(gf, 0, [0]).tolist()) | {0}
    # brute-force label-correcting reference
    s = edges["src"].to_numpy()
    d = edges["dst"].to_numpy()
    t = edges["t"].to_numpy()
    arr = np.full(n, INF, np.int64)
    arr[0] = 0
    for _ in range(n):
        for i in range(m):
            if arr[s[i]] != INF and t[i] >= arr[s[i]] and t[i] < arr[d[i]]:
                arr[d[i]] = t[i]
    assert np.array_equal(st.values, arr)
