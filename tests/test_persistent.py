"""PersistentGraph (deletion semantics) conformance — behaviors transcribed
from the reference's python suite
(python/tests/test_base_install/test_graphdb/test_persistent_graph.py:
basics, hanging edges, overlapping times, same-time ordering, at/before/
after/window boundaries, valid, graph-type swap)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pg(ray_session, events, n=None):
    """events: list of (t, src, dst, op[, layer]); event_id = list order."""
    import ray.data as rd
    from raphtory_ray.graph.persistent import PersistentGraphFrame
    t = np.array([e[0] for e in events], np.int64)
    s = np.array([e[1] for e in events], np.int64)
    d = np.array([e[2] for e in events], np.int64)
    op = np.array([e[3] for e in events], np.int64)
    cols = {"src": pa.array(s), "dst": pa.array(d), "t": pa.array(t),
            "event_id": pa.array(np.arange(len(s), dtype=np.int64)),
            "op": pa.array(op)}
    if any(len(e) > 4 for e in events):
        cols["layer"] = pa.array([e[4] if len(e) > 4 else "_default"
                                  for e in events], pa.string())
    n = n or int(max(s.max(initial=0), d.max(initial=0))) + 1
    return PersistentGraphFrame(rd.from_arrow(pa.table(cols)), n)


A, D = 0, 1


def test_basics(ray_session):
    g = _pg(ray_session, [(1, 0, 1, A), (3, 1, 2, A), (5, 0, 1, D),
                          (10, 0, 1, A)])
    assert g.count_edges() == 2


def test_hanging_edges(ray_session):
    g = _pg(ray_session, [(5, 0, 1, D)])
    assert g.count_edges() == 1
    assert g.at(6).count_edges() == 0
    assert g.latest_time() == 5
    assert g.at(5).count_edges() == 0
    assert g.at(4).count_edges() == 0


def test_overlapping_times_exploded(ray_session):
    g = _pg(ray_session, [(1, 0, 1, A), (5, 0, 1, D), (3, 0, 1, A),
                          (7, 0, 1, D)])
    ex = g.explode()
    got = list(zip(ex["earliest_time"].to_pylist(),
                   ex["latest_time"].to_pylist()))
    assert got == [(1, 3), (3, 5)]


def test_overlapping_times_layers(ray_session):
    g = _pg(ray_session, [(1, 0, 1, A, "colleagues"),
                          (5, 0, 1, D, "colleagues"),
                          (3, 0, 1, A, "friends"), (7, 0, 1, D, "friends")])
    ex = g.layer(["colleagues", "friends"]).explode()
    got = sorted(zip(ex["earliest_time"].to_pylist(),
                     ex["latest_time"].to_pylist()))
    assert got == [(1, 5), (3, 7)]


def test_same_time_op(ray_session):
    g1 = _pg(ray_session, [(1, 0, 1, A), (1, 0, 1, D)])
    g2 = _pg(ray_session, [(1, 0, 1, D), (1, 0, 1, A)])
    ex1 = g1.explode()
    ex2 = g2.explode()
    assert list(zip(ex1["earliest_time"].to_pylist(),
                    ex1["latest_time"].to_pylist())) == [(1, 1)]
    assert list(zip(ex2["earliest_time"].to_pylist(),
                    ex2["latest_time"].to_pylist())) == [(1, 1)]
    assert g1.at(1).count_temporal_edges() == 0   # add-then-delete
    assert g2.at(1).count_temporal_edges() == 1   # delete-then-add


def test_at_boundaries(ray_session):
    g = _pg(ray_session, [(2, 0, 1, A), (5, 0, 1, D)])
    for t, (nn, ne) in {0: (0, 0), 1: (0, 0), 2: (2, 1), 3: (2, 1),
                        4: (2, 1), 5: (0, 0), 6: (0, 0)}.items():
        assert g.at(t).count_nodes() == nn, t
        assert g.at(t).count_edges() == ne, t


def test_before_after_window_boundaries(ray_session):
    g = _pg(ray_session, [(2, 0, 1, A), (5, 0, 1, D)])
    for t, ne in {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1, 6: 1}.items():
        assert g.before(t).count_edges() == ne, t
    assert g.before(5).edge_is_valid(0, 1) is True
    assert g.before(6).edge_is_valid(0, 1) is False
    for t, ne in {0: 1, 1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0}.items():
        assert g.after(t).count_edges() == ne, t
    for (a, b), ne in {(0, 2): 0, (0, 4): 1, (3, 4): 1, (5, 8): 0,
                       (1, 8): 1, (6, 10): 0}.items():
        assert g.window(a, b).count_edges() == ne, (a, b)


def test_basic_valid(ray_session):
    g = _pg(ray_session, [(1, 0, 1, A), (2, 0, 2, A), (10, 0, 2, D),
                          (30, 0, 3, A)])
    assert g.count_edges() == 3
    assert g.valid().count_edges() == 2
    assert g.at(9).valid().count_edges() == 2


def test_layered_valid(ray_session):
    """test_properties_valid layer subset: deleting one of three layers
    keeps the edge valid; deleting all three invalidates it."""
    ev = [(1, 0, 1, A, "red"), (2, 0, 1, A, "green"), (3, 0, 1, A, "blue"),
          (4, 0, 1, D, "red")]
    g = _pg(ray_session, ev)
    assert g.edge_is_deleted(0, 1) is False
    assert g.valid().count_edges() == 1
    assert g.layer("red").edge_is_deleted(0, 1) is True
    assert g.layer("red").valid().count_edges() == 0
    g2 = _pg(ray_session, ev + [(5, 0, 1, D, "green")])
    assert g2.edge_is_deleted(0, 1) is False
    g3 = _pg(ray_session, ev + [(5, 0, 1, D, "green"), (6, 0, 1, D, "blue")])
    assert g3.edge_is_deleted(0, 1) is True
    assert g3.valid().count_edges() == 0


def test_graph_type_swap(ray_session):
    g = _pg(ray_session, [(1, 0, 1, A), (2, 0, 2, A), (30, 0, 3, A)])
    assert g.at(15).count_edges() == 2
    eg = g.event_graph()
    w = eg.window(2, 3)
    assert w.count_edges() == 1


def test_rolling_over_persistent(ray_session):
    """WindowSet helpers drive persistent views: per-window active-edge
    counts follow the deletion intervals."""
    from raphtory_ray.algorithms.extra import rolling
    g = _pg(ray_session, [(0, 0, 1, A), (4, 0, 1, D), (6, 2, 3, A)])
    views = rolling(g, window=2, step=2)
    counts = [v.count_edges() for v in views]
    # windows [0,2),[2,4),[4,6),[6,8): edge (0,1) active on [0,4);
    # (2,3) added at 6
    assert counts == [1, 1, 0, 1]


def test_snapshot_semantics(ray_session):
    from raphtory_ray.graph.persistent import persistent_graph
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    gf = GraphFrame(rd.from_arrow(pa.table({
        "src": pa.array([0, 0, 0], pa.int64()),
        "dst": pa.array([1, 2, 3], pa.int64()),
        "t": pa.array([1, 2, 30], pa.int64()),
        "event_id": pa.array([0, 1, 2], pa.int64())})), 4)
    pg = persistent_graph(gf)
    assert pg.count_edges() == 3
    assert pg.snapshot_at(15).count_edges() == 2
    assert pg.snapshot_latest().count_edges() == 3
    # event-graph snapshot = before(t+1) (time.rs:265-270)
    assert gf.snapshot_at(2).count_temporal_edges() == 2
    assert gf.snapshot_latest().count_temporal_edges() == 3


def test_to_graph_frame_runs_algorithms(ray_session):
    """Persistent snapshot → GraphFrame → BspGraph algorithms (reference
    runs algorithms on any view); pairs match edges_table exactly."""
    import numpy as np
    from raphtory_ray.state.shards import BspGraph
    # triangle 0-1-2 alive at t=10; edge (0,1) deleted at t=5 kills it
    pg = _pg(ray_session, [
        (1, 0, 1, 0), (1, 1, 2, 0), (1, 2, 0, 0),
        (5, 0, 1, 1)])
    snap_early = pg.snapshot_at(3)
    gf = snap_early.to_graph_frame()
    t = snap_early.edges_table()
    got = sorted((r["src"], r["dst"]) for r in
                 gf.edges.select_columns(["src", "dst"]).take_all())
    want = sorted(zip(t["src"].to_pylist(), t["dst"].to_pylist()))
    assert got == want
    assert BspGraph.from_graph(gf).triangle_counts()[0] == 1
    gf2 = pg.snapshot_at(7).to_graph_frame()
    assert BspGraph.from_graph(gf2).triangle_counts()[0] == 0
