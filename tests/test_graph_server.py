"""Server-less GraphQL management plane (query/server.py) — the
reference's GraphServer working-dir CRUD (raphtory-graphql/src/data.rs,
model/mod.rs:666-860) without network/auth."""

import numpy as np
import pyarrow as pa
import pytest


def _gf(n=5):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    edges = pa.table({
        "src": pa.array([0, 1, 2, 3], pa.int64()),
        "dst": pa.array([1, 2, 3, 4], pa.int64()),
        "t": pa.array([10, 20, 30, 40], pa.int64()),
        "event_id": pa.array([0, 1, 2, 3], pa.int64())})
    verts = pa.table({
        "vid": pa.array(range(n), pa.int64()),
        "gid": pa.array([f"node alpha-{i}" for i in range(n)], pa.string())})
    return GraphFrame(rd.from_arrow(edges), n, verts)


def _edges_set(gf):
    t = pa.concat_tables(gf.edges.iter_batches(batch_format="pyarrow"))
    return set(zip(t["src"].to_pylist(), t["dst"].to_pylist(),
                   t["t"].to_pylist()))


def test_upload_load_roundtrip(ray_session, tmp_path):
    from raphtory_ray.query.server import GraphWorkDir
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("team/proj/g1", _gf())
    g = wd.graph("team/proj/g1")
    assert g.n == 5
    assert _edges_set(g) == {(0, 1, 10), (1, 2, 20), (2, 3, 30), (3, 4, 40)}
    meta = wd.graph_metadata("team/proj/g1")
    assert meta["nodeCount"] == 5 and meta["edgeEventCount"] == 4
    assert meta["graphType"] == "EVENT"


def test_namespaces_and_listing(ray_session, tmp_path):
    from raphtory_ray.query.server import GraphWorkDir
    wd = GraphWorkDir(str(tmp_path))
    wd.new_graph("a")
    wd.new_graph("team/proj/g1")
    wd.new_graph("team/g2", graph_type="PERSISTENT")
    assert wd.namespaces() == ["", "team", "team/proj"]
    root = wd.namespace("")
    assert root["graphs"] == ["a"] and root["children"] == ["team"]
    team = wd.namespace("team")
    assert team["graphs"] == ["team/g2"]
    assert team["children"] == ["team/proj"]


def test_path_validation(ray_session, tmp_path):
    from raphtory_ray.query.server import GraphWorkDir, InvalidPath
    wd = GraphWorkDir(str(tmp_path))
    for bad in ["/abs", "a//b", "a/../b", ".hidden/g", "a\\b", "a/./b"]:
        with pytest.raises(InvalidPath):
            wd.new_graph(bad)
    wd.new_graph("g")
    # a graph can never be an ancestor of another graph (ParentIsGraph)
    with pytest.raises(InvalidPath):
        wd.new_graph("g/child")
    # and a namespace path can't be overwritten by a graph
    wd.new_graph("ns/inner")
    with pytest.raises(InvalidPath):
        wd.new_graph("ns")


def test_copy_move_delete(ray_session, tmp_path):
    from raphtory_ray.query.server import GraphNotFound, GraphWorkDir
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("src/g", _gf())
    wd.copy_graph("src/g", "dst/g2")
    assert _edges_set(wd.graph("dst/g2")) == _edges_set(wd.graph("src/g"))
    with pytest.raises(FileExistsError):
        wd.copy_graph("src/g", "dst/g2")
    wd.copy_graph("src/g", "dst/g2", overwrite=True)
    wd.move_graph("dst/g2", "dst/g3")
    with pytest.raises(GraphNotFound):
        wd.graph("dst/g2")
    assert wd.graph("dst/g3").n == 5
    wd.delete_graph("dst/g3")
    with pytest.raises(GraphNotFound):
        wd.graph("dst/g3")


def test_send_receive_roundtrip(ray_session, tmp_path):
    from raphtory_ray.query.server import GraphWorkDir
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("g", _gf())
    blob = wd.receive_graph("g")
    wd.send_graph("copy/of/g", blob)
    assert _edges_set(wd.graph("copy/of/g")) == _edges_set(wd.graph("g"))
    # deterministic encode: same folder → same base64
    assert wd.receive_graph("g") == wd.receive_graph("g")


def test_create_subgraph(ray_session, tmp_path):
    from raphtory_ray.query.server import GraphWorkDir
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("g", _gf())
    wd.create_subgraph("g", [0, 1, 2], "sub")
    assert _edges_set(wd.graph("sub")) == {(0, 1, 10), (1, 2, 20)}
    # by name too
    wd.create_subgraph("g", ["node alpha-0", "node alpha-1"], "sub2")
    assert _edges_set(wd.graph("sub2")) == {(0, 1, 10)}


def test_graph_type_reinterpretation(ray_session, tmp_path):
    from raphtory_ray.graph.persistent import PersistentGraphFrame
    from raphtory_ray.query.server import GraphWorkDir
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("g", _gf())
    pg = wd.graph("g", graph_type="PERSISTENT")
    assert isinstance(pg, PersistentGraphFrame)
    # persistent upload keeps deletions through the roundtrip
    import ray.data as rd
    ev = pa.table({
        "src": pa.array([0, 0], pa.int64()),
        "dst": pa.array([1, 1], pa.int64()),
        "t": pa.array([5, 9], pa.int64()),
        "event_id": pa.array([0, 1], pa.int64()),
        "op": pa.array([False, True], pa.bool_())})  # add then delete
    wd.upload_graph("pg", PersistentGraphFrame(rd.from_arrow(ev), n=2))
    back = wd.graph("pg")
    assert isinstance(back, PersistentGraphFrame)
    assert back.snapshot_at(7).count_edges() == 1
    assert back.snapshot_at(12).count_edges() == 0


def test_index_and_search(ray_session, tmp_path):
    from raphtory_ray.query.server import GraphWorkDir
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("g", _gf())
    wd.create_index("g")
    hits = wd.search_nodes("g", "alpha-2")
    assert hits == [{"id": 2, "name": "node alpha-2"}]
    hits = wd.search_nodes("g", "node", limit=3)
    assert [h["id"] for h in hits] == [0, 1, 2]


def test_execute_server_document(ray_session, tmp_path):
    from raphtory_ray.query.server import execute_server
    wd = str(tmp_path)
    # mutations through the document surface
    r = execute_server(wd, 'mutation { newGraph(path: "ns/g") }')
    assert r["data"]["newGraph"] is True
    # upload real content for the read side
    from raphtory_ray.query.server import GraphWorkDir
    GraphWorkDir(wd).upload_graph("ns/g", _gf(), overwrite=True)
    r = execute_server(wd, '''
      query {
        hello
        graph(path: "ns/g") { countNodes countEdges }
        missing: graph(path: "nope") { countNodes }
        graphMetadata(path: "ns/g") { nodeCount graphType }
        namespaces
        root { path graphs children }
      }''')
    d = r["data"]
    assert d["graph"] == {"countNodes": 5, "countEdges": 4}
    assert d["missing"] is None
    assert d["graphMetadata"] == {"nodeCount": 5, "graphType": "EVENT"}
    assert d["namespaces"] == ["", "ns"]
    assert d["root"] == {"path": "", "graphs": [], "children": ["ns"]}
    r = execute_server(wd, '''mutation {
        copyGraph(path: "ns/g", newPath: "ns/g2")
        createIndex(path: "ns/g2")
    }''')
    assert r["data"] == {"copyGraph": True, "createIndex": True}
    r = execute_server(
        wd, 'query { searchNodes(path: "ns/g2", query: "alpha-1", '
            'limit: 2) { id name } }')
    assert r["data"]["searchNodes"] == [{"id": 1, "name": "node alpha-1"}]


def test_copy_move_same_path_is_safe(ray_session, tmp_path):
    """overwrite=True with new_path == path must NOT destroy the source
    (review: _prepare_insert would rmtree the source before copytree)."""
    from raphtory_ray.query.server import GraphWorkDir, InvalidPath
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("g", _gf())
    with pytest.raises(InvalidPath):
        wd.copy_graph("g", "g", overwrite=True)
    with pytest.raises(InvalidPath):
        wd.move_graph("g", "g", overwrite=True)
    assert wd.graph("g").n == 5          # source intact


def test_send_graph_never_clobbers_namespace(ray_session, tmp_path):
    """sendGraph(overwrite=True) onto a NAMESPACE must refuse — rmtree
    there would silently delete every graph under it."""
    from raphtory_ray.query.server import GraphWorkDir, InvalidPath
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("ns/g1", _gf())
    wd.upload_graph("other", _gf())
    blob = wd.receive_graph("other")
    with pytest.raises(InvalidPath):
        wd.send_graph("ns", blob, overwrite=True)
    assert wd.graph("ns/g1").n == 5      # namespace intact


def test_persistent_upload_keeps_vertices(ray_session, tmp_path):
    """PERSISTENT storage round-trips the vertices dimension table
    (review: _persist_events wrote only edges)."""
    import ray.data as rd
    from raphtory_ray.graph.persistent import PersistentGraphFrame
    from raphtory_ray.query.server import GraphWorkDir
    ev = pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 2], pa.int64()),
        "t": pa.array([5, 6], pa.int64()),
        "event_id": pa.array([0, 1], pa.int64()),
        "op": pa.array([False, False])})
    verts = pa.table({
        "vid": pa.array([0, 1, 2], pa.int64()),
        "gid": pa.array(["a", "b", "c"], pa.string()),
        "node_type": pa.array(["x", "y", "x"], pa.string())})
    pgf = PersistentGraphFrame(rd.from_arrow(ev), n=3, vertices=verts)
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("pg", pgf)
    back = wd.graph("pg")
    assert back.vertices is not None
    assert back.vertices["gid"].to_pylist() == ["a", "b", "c"]
    assert back.vertices["node_type"].to_pylist() == ["x", "y", "x"]
    # views carry the dimension table too
    assert back.window(0, 10).vertices is not None


def test_event_reload_honors_meta_node_count(ray_session, tmp_path):
    """A vertex-less graph whose vid space exceeds max(vid)+1 must not
    shrink on reload (review: isolated trailing nodes were dropped)."""
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    from raphtory_ray.query.server import GraphWorkDir
    edges = pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 2], pa.int64()),
        "t": pa.array([1, 2], pa.int64()),
        "event_id": pa.array([0, 1], pa.int64())})
    gf = GraphFrame(rd.from_arrow(edges), n=100)     # 97 isolated nodes
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("g", gf)
    assert wd.graph("g").n == 100


def test_create_subgraph_respects_vid_column(ray_session, tmp_path):
    """Node names resolve through the vid COLUMN, not row position
    (review fix): a non-dense vertices table must induce the right
    subgraph."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    from raphtory_ray.query.server import GraphWorkDir
    edges = pa.table({"src": pa.array([5, 2], pa.int64()),
                      "dst": pa.array([2, 9], pa.int64()),
                      "t": pa.array([1, 2], pa.int64()),
                      "event_id": pa.array([0, 1], pa.int64())})
    verts = pa.table({"vid": pa.array([5, 2, 9], pa.int64()),
                      "gid": pa.array(["alice", "bob", "eve"])})
    gf = GraphFrame(rd.from_arrow(edges), 10, verts)
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("parent", gf)
    wd.create_subgraph("parent", ["alice", "bob"], "child")
    sub = wd.graph("child")
    import ray
    e = pa.concat_tables([t.select(["src", "dst"])
                          for t in ray.get(sub.edges.to_arrow_refs())
                          if t.num_rows])
    pairs = sorted(zip(e["src"].to_pylist(), e["dst"].to_pylist()))
    assert pairs == [(5, 2)]        # alice→bob kept; bob→eve dropped


def test_upload_graph_overwrite_is_atomic(ray_session, tmp_path):
    """A failing overwrite upload must leave the ORIGINAL graph intact
    (review fix: write-then-swap)."""
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    from raphtory_ray.query.server import GraphWorkDir
    edges = pa.table({"src": pa.array([0], pa.int64()),
                      "dst": pa.array([1], pa.int64()),
                      "t": pa.array([1], pa.int64()),
                      "event_id": pa.array([0], pa.int64())})
    gf = GraphFrame(rd.from_arrow(edges), 2, None)
    wd = GraphWorkDir(str(tmp_path))
    wd.upload_graph("g", gf)

    class Boom:
        n = 2
        edges = property(lambda self: (_ for _ in ()).throw(
            RuntimeError("mid-write failure")))

    with pytest.raises(Exception):
        wd.upload_graph("g", Boom(), overwrite=True)
    back = wd.graph("g")            # original survives
    assert back.n == 2
    assert wd.namespace("")["graphs"] == ["g"]   # no tmp debris listed
