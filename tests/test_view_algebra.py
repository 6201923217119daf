"""exclude_layer / default_layer / exclude_nodes / subgraph_node_types /
materialize / cached_view — view-algebra completeness (round 3).

Modeled on the reference's invariance tests: subgraph_tests.rs:31-65
(cached-view/subgraph triangle invariance) and test_materialize.rs:66
(algorithm equality between a view and its materialized copy)."""
import numpy as np
import pyarrow as pa


def _gf(with_layers=True, with_types=True):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    src = [0, 1, 2, 0, 3, 4, 0, 1]
    dst = [1, 2, 0, 2, 4, 0, 3, 3]
    t = [1, 2, 3, 4, 5, 6, 7, 8]
    cols = {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64()),
            "t": pa.array(t, pa.int64()),
            "event_id": pa.array(range(8), pa.int64())}
    if with_layers:
        cols["layer"] = pa.array(["a", "b", "a", None, "b", "a", "c", "b"])
    vertices = None
    if with_types:
        vertices = pa.table({
            "vid": pa.array(range(5), pa.int64()),
            "gid": pa.array([f"n{i}" for i in range(5)]),
            "node_type": pa.array(["x", "x", "y", "y", "x"])})
    return GraphFrame(rd.from_arrow(pa.table(cols)), 5, vertices)


def _pairs(gf):
    return sorted((r["src"], r["dst"]) for r in
                  gf.edges.select_columns(["src", "dst"]).take_all())


def test_exclude_layer(ray_session):
    gf = _gf()
    got = _pairs(gf.exclude_layer("a"))
    # drops the three layer-a events; null-layer event survives
    assert got == [(0, 2), (0, 3), (1, 2), (1, 3), (3, 4)]
    # exclusion + inclusion partition the events (null row lands in got)
    inc = _pairs(gf.layer("a"))
    assert len(inc) + len(got) == 8
    assert _pairs(gf.exclude_layers(["a", "b", "c"])) == [(0, 2)]


def test_default_layer(ray_session):
    gf = _gf()
    assert _pairs(gf.default_layer()) == [(0, 2)]    # null layer only
    # no layer column at all → everything is the default layer
    gf2 = _gf(with_layers=False)
    assert len(_pairs(gf2.default_layer())) == 8


def test_exclude_nodes_complement_of_subgraph(ray_session):
    gf = _gf()
    ex = gf.exclude_nodes([3, 4])
    sub = gf.subgraph([0, 1, 2])
    assert _pairs(ex) == _pairs(sub)


def test_subgraph_node_types(ray_session):
    gf = _gf()
    got = _pairs(gf.subgraph_node_types("x"))
    # nodes {0,1,4}: surviving events (0,1),(4,0)
    assert got == [(0, 1), (4, 0)]
    assert _pairs(gf.subgraph_node_types(["x", "y"])) == _pairs(gf)


def test_materialize_algorithm_equality(ray_session):
    """test_materialize.rs:66 contract on a composed view."""
    from raphtory_ray.state.shards import BspGraph
    gf = _gf()
    view = gf.window(2, 8).exclude_layer("c")
    mat = view.materialize()
    assert _pairs(mat) == _pairs(view)
    g1 = BspGraph.from_graph(view)
    g2 = BspGraph.from_graph(mat)
    assert np.array_equal(g1.out_degree, g2.out_degree)
    assert g1.triangle_counts()[0] == g2.triangle_counts()[0]
    assert (mat.start, mat.end) == (view.start, view.end)


def test_cached_view_invariance(ray_session):
    """subgraph_tests.rs:31-65: triangle count invariant under caching."""
    from raphtory_ray.state.shards import BspGraph
    gf = _gf()
    sub = gf.subgraph([0, 1, 2])
    cached = sub.cached_view()
    t1 = BspGraph.from_graph(sub).triangle_counts()[0]
    t2 = BspGraph.from_graph(cached).triangle_counts()[0]
    assert t1 == t2 == 1


def _conv_gf():
    import ray.data as rd
    import pyarrow as pa
    from raphtory_ray.graph.graph_frame import GraphFrame
    edges = pa.table({
        "src": pa.array([0, 0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 2, 0], pa.int64()),
        "t": pa.array([1, 3, 5, 7], pa.int64()),
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "layer": pa.array(["x", "y", "x", "y"]),
        "w": pa.array([1.0, 2.0, 3.0, 2.0]),
    })
    verts = pa.table({
        "vid": pa.array([0, 1, 2, 3], pa.int64()),
        "gid": pa.array(["a", "b", "c", "d"]),
        "node_type": pa.array(["hub", "leaf", "leaf", "hub"]),
    })
    return GraphFrame(rd.from_arrow(edges), 4, verts)


def test_graphview_convenience_parity(ray_session):
    gf = _conv_gf()
    # window_size / latest / windowed count_nodes
    assert gf.window_size() is None
    w = gf.window(1, 6)
    assert w.window_size() == 5
    assert w.count_nodes() == 3          # vid 3 never active; 0,1,2 are
    assert gf.count_nodes() == 4
    lat = gf.latest()
    assert lat.edges.count() == 1        # only the t=7 event
    # membership probes
    assert gf.has_node("a") and not gf.has_node("zz")
    assert gf.has_edge(0, 1) and not gf.has_edge(1, 0)
    assert gf.has_edge(0, 2, layer="y") and not gf.has_edge(0, 2, layer="x")
    assert gf.has_layer("x") and not gf.has_layer("nope")
    # valid layer views ignore unknown names
    assert gf.valid_layers(["x", "ghost"]).edges.count() == 2
    assert gf.exclude_valid_layer(["ghost"]).edges.count() == 4
    assert gf.exclude_valid_layers(["y", "ghost"]).edges.count() == 2


def test_find_and_filter_routing(ray_session):
    from raphtory_ray.graph.filter import Prop
    gf = _conv_gf()
    hubs = gf.find_nodes({"node_type": "hub"})
    assert hubs["vid"].to_pylist() == [0, 3]
    ew = gf.find_edges({"layer": "y", "w": 2.0})
    assert sorted((r["src"], r["dst"]) for r in ew.take_all()) == \
        [(0, 2), (2, 0)]
    # filter() routes node-column exprs to filter_nodes (induced
    # subgraph of passing vids), others to the edge algebra
    fn = gf.filter(Prop("node_type") == "leaf")
    assert sorted((r["src"], r["dst"]) for r in fn.edges.take_all()) == \
        [(1, 2)]
    fe = gf.filter(Prop("w") > 1.5)
    assert fe.edges.count() == 3


def test_materialize_at_roundtrip(ray_session, tmp_path):
    gf = _conv_gf()
    m = gf.window(1, 6).materialize_at(tmp_path / "snap")
    assert m.edges.count() == gf.window(1, 6).edges.count()
    assert m.vertices is not None
    assert (tmp_path / "snap" / "edges").exists()


def test_layer_edge_cases_from_review(ray_session):
    """round-4 review fixes: null layers, empty valid_layers, _default."""
    import ray.data as rd
    import pyarrow as pa
    from raphtory_ray.graph.graph_frame import GraphFrame
    edges = pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
        "t": pa.array([1, 2, 3], pa.int64()),
        "event_id": pa.array([0, 1, 2], pa.int64()),
        "layer": pa.array(["x", None, "x"]),
    })
    gf = GraphFrame(rd.from_arrow(edges), 3)
    # nulls read as _default everywhere
    assert gf.unique_layers() == ["_default", "x"]
    assert gf.has_layer("_default") and gf.has_layer("x")
    assert gf.layer("_default").edges.count() == 1
    ex = gf.explode_layers()
    assert sorted(ex) == ["_default", "x"]
    assert ex["_default"].edges.count() == 1
    assert ex["x"].edges.count() == 2
    # zero valid names -> EMPTY view, not the whole graph
    assert gf.valid_layers(["ghost"]).edges.count() == 0
    assert gf.valid_layers([]).edges.count() == 0
    assert gf.valid_layers(["x", "ghost"]).edges.count() == 2


def test_has_node_vid_with_vertices(ray_session):
    gf = _conv_gf()
    assert gf.has_node(2)              # int vid works despite gids
    assert not gf.has_node(99)
    assert gf.has_node("a")
    assert not gf.has_node("2")        # digit STRING is a gid lookup


def test_materialize_at_overwrites(ray_session, tmp_path):
    gf = _conv_gf()
    m1 = gf.materialize_at(tmp_path / "snap2")
    n1 = m1.edges.count()
    m2 = gf.materialize_at(tmp_path / "snap2")   # re-run, same path
    assert m2.edges.count() == n1                # no doubling
