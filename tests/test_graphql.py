"""GraphQL-subset read surface (raphtory-graphql graph.rs resolver
parity, server-less): parser, scalars, pagination, view nesting."""
import numpy as np
import pyarrow as pa
import pytest


def _gf():
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    edges = pa.table({
        "src": pa.array([0, 0, 1, 1, 2, 3], pa.int64()),
        "dst": pa.array([1, 2, 2, 3, 3, 0], pa.int64()),
        "t": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "layer": pa.array(["x", "y", "x", "y", "x", "y"]),
    })
    verts = pa.table({
        "vid": pa.array([0, 1, 2, 3], pa.int64()),
        "gid": pa.array(["a", "b", "c", "d"]),
        "node_type": pa.array(["hub", "leaf", "leaf", "hub"]),
    })
    return GraphFrame(rd.from_arrow(edges), 4, verts)


def test_parser_aliases_args_nesting():
    from raphtory_ray.query.graphql import parse_graphql
    sel = parse_graphql('query Q { graph { n: countNodes '
                        'nodes(limit: 3, offset: 1) { name } } }')
    assert sel[0].name == "graph"
    inner = sel[0].sel
    assert inner[0].alias == "n" and inner[0].name == "countNodes"
    assert inner[1].args == {"limit": 3, "offset": 1}
    assert inner[1].sel[0].name == "name"


def test_scalars_and_counts(ray_session):
    from raphtory_ray.query.graphql import execute
    g = execute(_gf(), "{ graph { countNodes countEdges "
                       "countTemporalEdges earliestTime latestTime "
                       "hasNode(name: \"a\") nope: hasNode(name: \"z\") "
                       "hasEdge(src: \"a\", dst: \"b\") "
                       "noEdge: hasEdge(src: \"b\", dst: \"a\") } }")
    got = g["data"]["graph"]
    assert got == {"countNodes": 4, "countEdges": 6,
                   "countTemporalEdges": 6, "earliestTime": 1,
                   "latestTime": 6, "hasNode": True, "nope": False,
                   "hasEdge": True, "noEdge": False}


def test_node_and_neighbours(ray_session):
    from raphtory_ray.query.graphql import execute
    g = execute(_gf(), '{ graph { node(name: "a") { id name nodeType '
                       'degree inDegree outDegree '
                       'neighbours(limit: 10) { name } } } }')
    n = g["data"]["graph"]["node"]
    assert n["id"] == 0 and n["name"] == "a" and n["nodeType"] == "hub"
    # distinct-neighbour degrees: out {b,c}, in {d}
    assert (n["degree"], n["inDegree"], n["outDegree"]) == (3, 1, 2)
    assert sorted(x["name"] for x in n["neighbours"]) == ["b", "c", "d"]


def test_pagination_deterministic(ray_session):
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    p1 = execute(gf, "{ graph { edges(limit: 3) { src dst time } } }")
    p2 = execute(gf, "{ graph { edges(offset: 3, limit: 3) "
                     "{ src dst time } } }")
    all_rows = p1["data"]["graph"]["edges"] + p2["data"]["graph"]["edges"]
    assert [(r["src"], r["dst"]) for r in all_rows] == \
        [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 0)]
    nodes = execute(gf, "{ graph { nodes(offset: 2, limit: 5) "
                        "{ id name } } }")["data"]["graph"]["nodes"]
    assert [(n["id"], n["name"]) for n in nodes] == [(2, "c"), (3, "d")]


def test_view_nesting_matches_direct_views(ray_session):
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    g = execute(gf, "{ graph { "
                    "w: window(start: 2, end: 5) { countTemporalEdges } "
                    "l: layer(name: \"x\") { countTemporalEdges } "
                    "s: subgraph(nodes: [0, 1, 2]) { countTemporalEdges } "
                    "ty: subgraphNodeTypes(nodeTypes: [\"hub\"]) "
                    "{ countTemporalEdges } } }")["data"]["graph"]
    assert g["w"]["countTemporalEdges"] == gf.window(2, 5).edges.count()
    assert g["l"]["countTemporalEdges"] == gf.layer("x").edges.count()
    assert g["s"]["countTemporalEdges"] == \
        gf.subgraph(np.array([0, 1, 2])).edges.count()
    assert g["ty"]["countTemporalEdges"] == \
        gf.subgraph_node_types(["hub"]).edges.count()


def test_unknown_field_raises(ray_session):
    from raphtory_ray.query.graphql import execute
    with pytest.raises(KeyError):
        execute(_gf(), "{ graph { frobnicate } }")
    with pytest.raises(KeyError):
        execute(_gf(), "{ notgraph { countNodes } }")


def test_rolling_expanding_windowsets(ray_session):
    from raphtory_ray.algorithms.extra import rolling
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    g = execute(gf, "{ graph { rolling(window: 2, step: 2) "
                    "{ start end countTemporalEdges } } }")
    wins = g["data"]["graph"]["rolling"]
    direct = rolling(gf, 2, 2)
    assert [(w["start"], w["end"]) for w in wins] == \
        [(v.start, v.end) for v in direct]
    assert [w["countTemporalEdges"] for w in wins] == \
        [v.edges.count() for v in direct]
    assert sum(w["countTemporalEdges"] for w in wins) == 6


def test_node_restricting_views(ray_session):
    """subgraph/excludeNodes/subgraphNodeTypes restrict countNodes,
    nodes pages, hasNode and node() — not just the edge set."""
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    g = execute(gf, '{ graph { s: subgraph(nodes: [0, 1]) { '
                    'countNodes nodes(limit: 10) { id } '
                    'gone: hasNode(name: "c") kept: hasNode(name: "a") '
                    'node(name: "c") { id } } '
                    'x: excludeNodes(nodes: [0]) { countNodes } '
                    'ty: subgraphNodeTypes(nodeTypes: ["hub"]) { '
                    'countNodes nodes(limit: 10) { id } } } }')
    s = g["data"]["graph"]["s"]
    assert s["countNodes"] == 2
    assert [n["id"] for n in s["nodes"]] == [0, 1]
    assert s["gone"] is False and s["kept"] is True
    assert s["node"] is None
    assert g["data"]["graph"]["x"]["countNodes"] == 3
    ty = g["data"]["graph"]["ty"]
    assert ty["countNodes"] == 2
    assert [n["id"] for n in ty["nodes"]] == [0, 3]


def test_has_node_non_numeric_without_gids(ray_session):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    from raphtory_ray.query.graphql import execute
    edges = pa.table({"src": pa.array([0], pa.int64()),
                      "dst": pa.array([1], pa.int64()),
                      "t": pa.array([1], pa.int64()),
                      "event_id": pa.array([0], pa.int64())})
    gf = GraphFrame(rd.from_arrow(edges), 2)
    g = execute(gf, '{ graph { hasNode(name: "alice") '
                    'ok: hasNode(name: "1") node(name: "bob") { id } } }')
    got = g["data"]["graph"]
    assert got == {"hasNode": False, "ok": True, "node": None}


def test_nodes_page_neighbours_one_pass(ray_session):
    """a page selecting neighbours resolves them from one batched scan
    (cache warm for every page vid before per-node resolution)."""
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    g = execute(gf, "{ graph { nodes(limit: 4) "
                    "{ id neighbours(limit: 10) { id } } } }")
    nbrs = {n["id"]: sorted(x["id"] for x in n["neighbours"])
            for n in g["data"]["graph"]["nodes"]}
    assert nbrs == {0: [1, 2, 3], 1: [0, 2, 3], 2: [0, 1, 3],
                    3: [0, 1, 2]}


def test_windowed_node_universe_is_active_nodes(ray_session):
    """under a time view, countNodes / nodes pages / hasNode cover only
    event-active nodes (graph.rs windowed count_nodes semantics)."""
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    # window [2, 5): events (0->2 t2), (1->2 t3), (1->3 t4)
    g = execute(gf, '{ graph { w: window(start: 2, end: 5) { '
                    'countNodes nodes(limit: 10) { id } '
                    'inactive: hasNode(name: "a") '
                    'active: hasNode(name: "c") } } }')["data"]["graph"]
    w = g["w"]
    assert w["countNodes"] == 4          # {0,1,2,3} all touched
    g2 = execute(gf, '{ graph { w: window(start: 5, end: 7) { '
                     'countNodes nodes(limit: 10) { id } '
                     'a0: hasNode(name: "a") '
                     'b1: hasNode(name: "b") } } }')["data"]["graph"]
    # events in [5,7): (2->3 t5), (3->0 t6) -> active {0, 2, 3}
    w2 = g2["w"]
    assert w2["countNodes"] == 3
    assert [n["id"] for n in w2["nodes"]] == [0, 2, 3]
    assert w2["a0"] is True and w2["b1"] is False


def test_expanding_windowset(ray_session):
    from raphtory_ray.algorithms.extra import expanding
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    g = execute(gf, "{ graph { expanding(step: 2) "
                    "{ end countTemporalEdges } } }")
    wins = g["data"]["graph"]["expanding"]
    direct = expanding(gf, 2)
    assert [w["end"] for w in wins] == [v.end for v in direct]
    assert [w["countTemporalEdges"] for w in wins] == \
        [v.edges.count() for v in direct]
    assert wins[-1]["countTemporalEdges"] == 6    # expanding reaches all


def test_node_metadata_and_property_history(ray_session):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    from raphtory_ray.query.graphql import execute
    edges = pa.table({"src": pa.array([0, 1], pa.int64()),
                      "dst": pa.array([1, 0], pa.int64()),
                      "t": pa.array([1, 2], pa.int64()),
                      "event_id": pa.array([0, 1], pa.int64())})
    verts = pa.table({"vid": pa.array([0, 1], pa.int64()),
                      "gid": pa.array(["a", "b"]),
                      "node_type": pa.array(["hub", "leaf"]),
                      "region": pa.array(["eu", "us"])})
    nev = pa.table({"vid": pa.array([0, 0, 1], pa.int64()),
                    "t": pa.array([5, 9, 7], pa.int64()),
                    "event_id": pa.array([0, 1, 2], pa.int64()),
                    "status": pa.array(["new", "active", "new"])})
    gf = GraphFrame(rd.from_arrow(edges), 2, verts, rd.from_arrow(nev))
    g = execute(gf, '{ graph { node(name: "a") { '
                    'metadata region: metadata(key: "region") '
                    'propertyHistory(key: "status") } } }')
    n = g["data"]["graph"]["node"]
    assert n["metadata"] == {"gid": "a", "node_type": "hub",
                             "region": "eu"}
    assert n["region"] == {"region": "eu"}
    assert n["propertyHistory"] == [{"time": 5, "value": "new"},
                                    {"time": 9, "value": "active"}]
    # node.properties: latest temporal value per key, window-aware
    g2 = execute(gf, '{ graph { node(name: "a") { properties '
                     's: properties(keys: "status") '
                     'w: window(start: 0, end: 7) { properties } } } }')
    n2 = g2["data"]["graph"]["node"]
    assert n2["properties"] == {"status": "active"}
    assert n2["s"] == {"status": "active"}
    assert n2["w"]["properties"] == {"status": "new"}   # t=9 excluded


def test_vector_search_nodes(ray_session):
    from raphtory_ray.data.vectors import vectorise
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    vg = vectorise(gf)
    g = execute(gf, '{ graph { vectorSearchNodes(query: "a", limit: 3) '
                    '} }', vectors=vg)
    hits = g["data"]["graph"]["vectorSearchNodes"]
    assert len(hits) == 3
    assert [h["rank"] for h in hits] == [1, 2, 3]
    assert all(set(h) == {"id", "name", "cosine", "rank"} for h in hits)
    # parity with the direct API
    direct = vg.nodes_by_similarity("a", 3)
    assert [h["id"] for h in hits] == direct["vec_id"].to_pylist()
    with pytest.raises(KeyError):
        execute(gf, '{ graph { vectorSearchNodes(query: "a") } }')


def test_snapshot_views(ray_session):
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    g = execute(gf, "{ graph { s: snapshotAt(time: 3) "
                    "{ countTemporalEdges } "
                    "l: snapshotLatest { countTemporalEdges } } }")
    got = g["data"]["graph"]
    assert got["s"]["countTemporalEdges"] == \
        gf.snapshot_at(3).edges.count()
    assert got["l"]["countTemporalEdges"] == \
        gf.snapshot_latest().edges.count()


def test_vector_search_under_view_and_batched_history(ray_session):
    import ray.data as rd
    from raphtory_ray.data.vectors import vectorise
    from raphtory_ray.graph.graph_frame import GraphFrame
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    vg = vectorise(gf)
    g = execute(gf, '{ graph { layer(name: "x") { '
                    'vectorSearchNodes(query: "a", limit: 2) } } }',
                vectors=vg)
    assert len(g["data"]["graph"]["layer"]["vectorSearchNodes"]) == 2
    # propertyHistory without node_events -> clean empty list, no crash
    g2 = execute(gf, '{ graph { node(name: "a") '
                     '{ propertyHistory(key: "status") } } }')
    assert g2["data"]["graph"]["node"]["propertyHistory"] == []
    # page-wide batched histories
    nev = pa.table({"vid": pa.array([0, 1, 0], pa.int64()),
                    "t": pa.array([3, 4, 8], pa.int64()),
                    "event_id": pa.array([0, 1, 2], pa.int64()),
                    "status": pa.array(["x", "y", "z"])})
    edges = pa.table({"src": pa.array([0], pa.int64()),
                      "dst": pa.array([1], pa.int64()),
                      "t": pa.array([1], pa.int64()),
                      "event_id": pa.array([0], pa.int64())})
    gf2 = GraphFrame(rd.from_arrow(edges), 2, None, rd.from_arrow(nev))
    g3 = execute(gf2, '{ graph { nodes(limit: 2) '
                      '{ id propertyHistory(key: "status") } } }')
    nodes = g3["data"]["graph"]["nodes"]
    assert nodes[0]["propertyHistory"] == [
        {"time": 3, "value": "x"}, {"time": 8, "value": "z"}]
    assert nodes[1]["propertyHistory"] == [{"time": 4, "value": "y"}]


def test_shrink_view_fields(ray_session):
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    g = execute(gf, "{ graph { a: shrinkStart(time: 3) "
                    "{ countTemporalEdges } "
                    "b: shrinkEnd(time: 4) { countTemporalEdges } "
                    "c: shrinkWindow(start: 2, end: 5) "
                    "{ countTemporalEdges } } }")["data"]["graph"]
    assert g["a"]["countTemporalEdges"] == 4   # t in {3,4,5,6}
    assert g["b"]["countTemporalEdges"] == 3   # t in {1,2,3}
    assert g["c"]["countTemporalEdges"] == 3   # t in {2,3,4}


def test_layer_plural_and_default(ray_session):
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    g = execute(gf, '{ graph { '
                    'ls: layers(names: ["x", "y"]) { countTemporalEdges } '
                    'ex: excludeLayers(names: ["x"]) '
                    '{ countTemporalEdges } '
                    'dl: defaultLayer { countTemporalEdges } } }')
    got = g["data"]["graph"]
    assert got["ls"]["countTemporalEdges"] == 6
    assert got["ex"]["countTemporalEdges"] == \
        gf.exclude_layer("x").edges.count() == 3
    assert got["dl"]["countTemporalEdges"] == \
        gf.default_layer().edges.count()


def test_unique_layers_and_bounds(ray_session):
    from raphtory_ray.query.graphql import execute
    gf = _gf()
    g = execute(gf, "{ graph { uniqueLayers "
                    "w: window(start: 2, end: 5) { start end "
                    "uniqueLayers } } }")["data"]["graph"]
    assert g["uniqueLayers"] == ["x", "y"]
    assert g["w"]["start"] == 2 and g["w"]["end"] == 5
    assert set(g["w"]["uniqueLayers"]) <= {"x", "y"}


# ------------------------------------------- round 4: algorithm plugin

def test_algorithms_pagerank_field(ray_session):
    """graph { algorithms { pagerank } } (plugins/algorithms.rs): one
    {name, rank} row per node, ranks summing to ~1, scoped to the view."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gf(), "{ graph { algorithms { "
                       "pagerank(iterCount: 20) { id name rank } } } }")
    rows = g["data"]["graph"]["algorithms"]["pagerank"]
    assert len(rows) == 4
    assert {r["name"] for r in rows} == {"a", "b", "c", "d"}
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-6
    # parity with the engine's own pagerank on the same graph
    from raphtory_ray.state.shards import BspGraph
    scores, _i, _s = BspGraph.from_graph(_gf()).pagerank(iter_count=20)
    for r in rows:
        assert abs(r["rank"] - scores[r["id"]]) < 1e-12


def test_algorithms_shortest_path_field(ray_session):
    from raphtory_ray.query.graphql import execute
    g = execute(_gf(), '{ graph { algorithms { '
                       'shortestPath(source: "a", targets: ["d", "c"]) '
                       '{ target nodes } } } }')
    rows = g["data"]["graph"]["algorithms"]["shortestPath"]
    by = {r["target"]: r["nodes"] for r in rows}
    assert by["c"] == ["a", "c"]
    assert by["d"][0] == "a" and by["d"][-1] == "d" and len(by["d"]) == 3


def test_algorithms_scope_to_window(ray_session):
    """nesting algorithms under window() scopes the graph it runs on."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gf(), "{ graph { w: window(start: 1, end: 3) "
                       "{ algorithms { pagerank(iterCount: 5) "
                       "{ name rank } } } } }")
    rows = g["data"]["graph"]["w"]["algorithms"]["pagerank"]
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-6


def test_lexer_unterminated_string_raises(ray_session):
    from raphtory_ray.query.graphql import execute
    with pytest.raises(SyntaxError):
        execute(_gf(), '{ graph { node(name: "a) { id } } }')


def test_edges_page_layer_default(ray_session):
    """edges { layer } on a graph with no layer column returns _default
    (reference resolver behavior), not a KeyError."""
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    from raphtory_ray.query.graphql import execute
    edges = pa.table({
        "src": pa.array([0, 1], pa.int64()),
        "dst": pa.array([1, 2], pa.int64()),
        "t": pa.array([1, 2], pa.int64()),
        "event_id": pa.array([0, 1], pa.int64()),
    })
    gf = GraphFrame(rd.from_arrow(edges), 3)
    g = execute(gf, "{ graph { edges(limit: 2) { src dst layer } } }")
    assert [e["layer"] for e in g["data"]["graph"]["edges"]] == \
        ["_default", "_default"]
    # name field is a string even on a vid-only graph
    g2 = execute(gf, "{ graph { nodes(limit: 1) { name } } }")
    assert g2["data"]["graph"]["nodes"][0]["name"] == "0"


# ---------------------------------------------------------------- filters
# NodeFilter / EdgeFilter input objects (filtering.rs:310-900) and the
# filter_nodes / filter_edges / search_* / apply_views resolvers
# (graph.rs:736,756,801,829).

def _gfw():
    """Fixture with a float edge property ``w`` and one multi-event edge
    (0->1 twice: w=1 then w=100) for latest-vs-any semantics."""
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    edges = pa.table({
        "src": pa.array([0, 0, 1, 1, 2, 3, 0], pa.int64()),
        "dst": pa.array([1, 2, 2, 3, 3, 0, 1], pa.int64()),
        "t": pa.array([1, 2, 3, 4, 5, 6, 10], pa.int64()),
        "event_id": pa.array([0, 1, 2, 3, 4, 5, 6], pa.int64()),
        "layer": pa.array(["x", "y", "x", "y", "x", "y", "x"]),
        "w": pa.array([1.0, 5.0, 2.0, 7.0, 3.0, 9.0, 100.0]),
    })
    verts = pa.table({
        "vid": pa.array([0, 1, 2, 3], pa.int64()),
        "gid": pa.array(["a", "b", "c", "d"]),
        "node_type": pa.array(["hub", "leaf", "leaf", "hub"]),
    })
    return GraphFrame(rd.from_arrow(edges), 4, verts)


def test_filter_nodes_view(ray_session):
    """filterNodes: induced subgraph — edges survive only when both
    endpoints match (graph.rs:736 doc)."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), '{ graph { filterNodes(expr: {node: '
                        '{field: NODE_TYPE, where: {eq: "hub"}}}) '
                        '{ countNodes countEdges } } }')
    got = g["data"]["graph"]["filterNodes"]
    assert got == {"countNodes": 2, "countEdges": 1}   # only d->a


def test_filter_nodes_boolean_composition(ray_session):
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), '{ graph { filterNodes(expr: {or: ['
                        '{node: {field: NODE_NAME, where: {eq: "b"}}}, '
                        '{node: {field: NODE_NAME, where: {eq: "c"}}}]}) '
                        '{ countNodes countEdges } } }')
    assert g["data"]["graph"]["filterNodes"] == \
        {"countNodes": 2, "countEdges": 1}             # only b->c


def test_filter_edges_latest_property(ray_session):
    """filterEdges resolves temporal props to the LATEST event per edge
    (property variant); nodes remain in the view."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), '{ graph { filterEdges(expr: {property: '
                        '{name: "w", where: {gt: 4}}}) '
                        '{ countNodes countEdges } } }')
    # latest w per edge: a->b 100, a->c 5, b->c 2, b->d 7, c->d 3, d->a 9
    assert g["data"]["graph"]["filterEdges"] == \
        {"countNodes": 4, "countEdges": 4}


def test_filter_edges_temporal_any(ray_session):
    """temporalProperty variant matches ANY event of the edge."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), '{ graph { filterEdges(expr: {temporalProperty: '
                        '{name: "w", where: {le: 1}}}) '
                        '{ countEdges } } }')
    assert g["data"]["graph"]["filterEdges"]["countEdges"] == 1  # a->b


def test_filter_edges_endpoint_and_selfloop(ray_session):
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), '{ graph { '
                        'bySrc: filterEdges(expr: {src: {node: '
                        '{field: NODE_TYPE, where: {eq: "leaf"}}}}) '
                        '{ countEdges } '
                        'loops: filterEdges(expr: {isSelfLoop: true}) '
                        '{ countEdges } '
                        'noLoops: filterEdges(expr: {not: '
                        '{isSelfLoop: true}}) { countEdges } } }')
    got = g["data"]["graph"]
    assert got["bySrc"]["countEdges"] == 3     # b->c, b->d, c->d
    assert got["loops"]["countEdges"] == 0
    assert got["noLoops"]["countEdges"] == 6


def test_search_nodes_and_edges(ray_session):
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), '{ graph { '
                        'searchNodes(filter: {node: {field: NODE_TYPE, '
                        'where: {eq: "leaf"}}}, limit: 10, offset: 0) '
                        '{ name } '
                        'searchEdges(filter: {property: {name: "w", '
                        'where: {gt: 8}}}, limit: 10, offset: 0) '
                        '{ src dst } } }')
    got = g["data"]["graph"]
    assert [n["name"] for n in got["searchNodes"]] == ["b", "c"]
    pairs = {(e["src"], e["dst"]) for e in got["searchEdges"]}
    assert pairs == {(0, 1), (3, 0)}          # a->b, d->a (page emits vids)


def test_apply_views_ordered(ray_session):
    """applyViews folds one-of variants left-to-right; equals nesting."""
    from raphtory_ray.query.graphql import execute
    doc_nested = ('{ graph { window(start: 1, end: 6) { filterNodes('
                  'expr: {node: {field: NODE_TYPE, where: {eq: "leaf"}}})'
                  ' { countNodes countEdges } } } }')
    doc_apply = ('{ graph { applyViews(views: ['
                 '{window: {start: 1, end: 6}}, '
                 '{nodeFilter: {node: {field: NODE_TYPE, '
                 'where: {eq: "leaf"}}}}]) { countNodes countEdges } } }')
    a = execute(_gfw(), doc_nested)["data"]["graph"]["window"][
        "filterNodes"]
    b = execute(_gfw(), doc_apply)["data"]["graph"]["applyViews"]
    assert a == b


def test_filter_nodes_fuzzy_and_isin(ray_session):
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), '{ graph { '
                        'inSet: filterNodes(expr: {node: {field: '
                        'NODE_NAME, where: {isIn: ["a", "d"]}}}) '
                        '{ countNodes } '
                        'notIn: filterNodes(expr: {node: {field: '
                        'NODE_NAME, where: {isNotIn: ["a", "d"]}}}) '
                        '{ countNodes } } }')
    got = g["data"]["graph"]
    assert got["inSet"]["countNodes"] == 2
    assert got["notIn"]["countNodes"] == 2


def test_node_temporal_accessors(ray_session):
    """node.rs:320-365 temporal accessors: earliestTime/latestTime/
    history/edgeHistoryCount/isActive, windowed variants included."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gf(), '{ graph { node(name: "a") { earliestTime '
                       'latestTime history edgeHistoryCount isActive } '
                       'w: window(start: 2, end: 6) { nodes(limit: 4) '
                       '{ name isActive latestTime } } } }')
    n = g["data"]["graph"]["node"]
    # node a touches events at t=1 (a->b), 2 (a->c), 6 (d->a)
    assert n == {"earliestTime": 1, "latestTime": 6, "history": [1, 2, 6],
                 "edgeHistoryCount": 3, "isActive": True}
    # window [2,6): active nodes page with per-node latest inside window
    w = {r["name"]: r for r in g["data"]["graph"]["w"]["nodes"]}
    assert w["a"]["latestTime"] == 2 and w["a"]["isActive"]
    assert w["d"]["latestTime"] == 5


def test_node_edges_and_components(ray_session):
    """node.rs per-node edges/outEdges/inEdges(select:) + in/outComponent."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), '{ graph { node(name: "a") { '
                        'edges(limit: 10) { src dst time } '
                        'outEdges(limit: 10) { dst } '
                        'inEdges(limit: 10) { src } '
                        'hot: outEdges(select: {property: {name: "w", '
                        'where: {gt: 50}}}, limit: 10) { dst } '
                        'outComponent { name } } } }')
    n = g["data"]["graph"]["node"]
    assert len(n["edges"]) == 4            # a->b x2, a->c, d->a events
    assert sorted(e["dst"] for e in n["outEdges"]) == [1, 1, 2]
    assert [e["src"] for e in n["inEdges"]] == [3]
    assert sorted(e["dst"] for e in n["hot"]) == [1, 1]  # a->b latest=100
    # descendants of a: everything (a->b->c->d cycle back to a)
    assert sorted(x["name"] for x in n["outComponent"]) == \
        ["a", "b", "c", "d"]


def test_node_level_views(ray_session):
    """node.rs:73-267: time/layer views on a single node context."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), '{ graph { node(name: "a") { '
                        'w: window(start: 1, end: 5) '
                        '{ outDegree history } '
                        'x: layer(name: "x") { outDegree } '
                        'av: applyViews(views: [{window: '
                        '{start: 1, end: 5}}]) { history } '
                        'r: expanding(step: 5) { end isActive } } } }')
    n = g["data"]["graph"]["node"]
    # window [1,5): a's events at t=1 (a->b), t=2 (a->c); out {b, c}
    assert n["w"] == {"outDegree": 2, "history": [1, 2]}
    # layer x events: a->b (t=1, t=10); out degree on x = 1
    assert n["x"] == {"outDegree": 1}
    assert n["av"] == {"history": [1, 2]}
    assert [r["isActive"] for r in n["r"]] == [True, True]


def test_graph_edge_and_shared_neighbours(ray_session):
    """graph.rs edge(src,dst), sharedNeighbours, edge-time scalars."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), '{ graph { '
                        'edge(src: "a", dst: "b") { src dst srcName '
                        'dstName earliestTime latestTime time history '
                        'countEvents isSelfLoop layerNames '
                        'wHist: propertyHistory(key: "w") '
                        'w: property(key: "w") properties '
                        'pw: properties(keys: "w") } '
                        'none: edge(src: "b", dst: "a") { src } '
                        'sharedNeighbours(node1: "a", node2: "c") '
                        '{ name } '
                        'earliestEdgeTime latestEdgeTime } }')
    got = g["data"]["graph"]
    e = got["edge"]
    assert (e["src"], e["dst"]) == (0, 1)
    assert (e["srcName"], e["dstName"]) == ("a", "b")
    assert (e["earliestTime"], e["latestTime"], e["time"]) == (1, 10, 10)
    assert e["history"] == [1, 10] and e["countEvents"] == 2
    assert not e["isSelfLoop"] and e["layerNames"] == ["x"]
    assert e["wHist"] == [{"time": 1, "value": 1.0},
                          {"time": 10, "value": 100.0}]
    assert e["w"] == 100.0                      # latest-event value
    assert e["properties"] == {"w": 100.0}      # latest per key
    assert e["pw"] == {"w": 100.0}
    assert got["none"] is None
    # neighbours: a~{b,c,d}, c~{a,b,d} → shared {b, d}
    assert sorted(x["name"] for x in got["sharedNeighbours"]) == \
        ["b", "d"]
    assert (got["earliestEdgeTime"], got["latestEdgeTime"]) == (1, 10)


def test_graph_properties_fields(ray_session):
    """graph-level temporal properties + metadata resolvers."""
    from raphtory_ray.query.graphql import execute
    gf = _gfw().add_properties(5, {"owner": "alice"}) \
               .add_properties(7, {"owner": "bob"}) \
               .add_metadata({"kind": "test"})
    g = execute(gf, '{ graph { properties '
                    'propertyHistory(key: "owner") '
                    'metadata(key: "kind") '
                    'w: window(start: 1, end: 6) { properties } } }')
    got = g["data"]["graph"]
    assert got["properties"] == {"owner": "bob"}
    assert got["propertyHistory"] == [{"time": 5, "value": "alice"},
                                      {"time": 7, "value": "bob"}]
    assert got["metadata"] == {"kind": "test"}
    assert got["w"]["properties"] == {"owner": "alice"}   # window-aware


def test_graph_schema_introspection(ray_session):
    """graph.rs schema → node types + per-layer edge type combinations."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gfw(), "{ graph { schema { nodes layers } } }")
    sch = g["data"]["graph"]["schema"]
    assert [n["typeName"] for n in sch["nodes"]] == ["hub", "leaf"]
    lays = {l["name"]: {(e["srcType"], e["dstType"])
                        for e in l["edges"]} for l in sch["layers"]}
    assert set(lays) == {"x", "y"}
    # x events: a->b (hub,leaf) x2, b->c (leaf,leaf), c->d (leaf,hub)
    assert lays["x"] == {("hub", "leaf"), ("leaf", "leaf"),
                         ("leaf", "hub")}
    # y events: a->c (hub,leaf), b->d (leaf,hub), d->a (hub,hub)
    assert lays["y"] == {("hub", "leaf"), ("leaf", "hub"),
                         ("hub", "hub")}
    # edge property schema includes w (double), not the key columns
    keys = {p["key"] for l in sch["layers"] for e in l["edges"]
            for p in e["properties"]}
    assert keys == {"w"}


def test_in_out_neighbours(ray_session):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    from raphtory_ray.query.graphql import execute
    edges = pa.table({"src": pa.array([0, 0, 1], pa.int64()),
                      "dst": pa.array([1, 2, 2], pa.int64()),
                      "t": pa.array([1, 2, 3], pa.int64()),
                      "event_id": pa.array([0, 1, 2], pa.int64())})
    gf = GraphFrame(rd.from_arrow(edges), 3)
    g = execute(gf, '{ graph { node(name: "2") '
                    '{ neighbours { id } i: inNeighbours { id } '
                    'o: outNeighbours { id } } '
                    'nodes(limit: 3) { id i: inNeighbours { id } } } }')
    n = g["data"]["graph"]["node"]
    assert [x["id"] for x in n["neighbours"]] == [0, 1]
    assert [x["id"] for x in n["i"]] == [0, 1]
    assert n["o"] == []
    page = g["data"]["graph"]["nodes"]
    assert [[x["id"] for x in r["i"]] for r in page] == [[], [0], [0, 1]]


def test_graphql_parser_fuzz_clean_errors():
    """Malformed documents raise SyntaxError, never internal errors
    (seeded random strings + mutations of a valid document)."""
    import random
    import string

    from raphtory_ray.query.graphql import parse_document
    random.seed(13)
    alphabet = string.ascii_letters + string.digits + ' {}():[],"#_-.!$@'
    base = ('{ graph { nodes(offset: 0, limit: 10) { id name inDegree } '
            'w: window(start: 1, end: 5) { countNodes } } }')
    for i in range(1500):
        if i % 2:
            s = "".join(random.choice(alphabet)
                        for _ in range(random.randint(1, 80)))
        else:
            s = list(base)
            for _ in range(random.randint(1, 5)):
                j = random.randrange(len(s))
                r = random.random()
                if r < 0.4:
                    s[j] = random.choice(alphabet)
                elif r < 0.7:
                    del s[j]
                else:
                    s.insert(j, random.choice(alphabet))
            s = "".join(s)
        try:
            parse_document(s)
        except (SyntaxError, NotImplementedError):
            pass


def test_algorithms_shortest_path_directions(ray_session):
    """direction in/both (plugins/algorithms.rs:136-140): reversed and
    symmetrized BFS. Graph: a→b, a→c, b→c, b→d, c→d, d→a."""
    from raphtory_ray.query.graphql import execute
    g = execute(_gf(), '{ graph { algorithms { '
                       'shortestPath(source: "d", targets: ["a", "b"], '
                       'direction: "in") { target nodes } } } }')
    rows = g["data"]["graph"]["algorithms"]["shortestPath"]
    by = {r["target"]: r["nodes"] for r in rows}
    # reversed edges: d←b, d←c, so d→b is one reversed hop; a reaches d
    # only via its out-edge a→... reversed means "who reaches d"
    assert by["b"] == ["d", "b"]
    assert by["a"][0] == "d" and by["a"][-1] == "a" and len(by["a"]) == 3
    g2 = execute(_gf(), '{ graph { algorithms { '
                        'shortestPath(source: "c", targets: ["a"], '
                        'direction: "both") { target nodes } } } }')
    rows2 = g2["data"]["graph"]["algorithms"]["shortestPath"]
    by2 = {r["target"]: r["nodes"] for r in rows2}
    assert len(by2["a"]) == 2        # undirected: a–c edge exists
    import pytest as _pytest
    with _pytest.raises(KeyError):
        execute(_gf(), '{ graph { algorithms { '
                       'shortestPath(source: "a", targets: ["b"], '
                       'direction: "sideways") { target } } } }')


def test_self_loop_history_counts_once(ray_session):
    """A self-loop event is ONE update (review fix)."""
    import numpy as np
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    from raphtory_ray.query.graphql import execute
    edges = pa.table({"src": pa.array([0, 0], pa.int64()),
                      "dst": pa.array([1, 0], pa.int64()),
                      "t": pa.array([1, 5], pa.int64()),
                      "event_id": pa.array([0, 1], pa.int64())})
    verts = pa.table({"vid": pa.array([0, 1], pa.int64()),
                      "gid": pa.array(["a", "b"])})
    gf = GraphFrame(rd.from_arrow(edges), 2, verts)
    g = execute(gf, '{ graph { node(name: "a") '
                    '{ history edgeHistoryCount } } }')
    node = g["data"]["graph"]["node"]
    assert node["history"] == [1, 5]
    assert node["edgeHistoryCount"] == 2


def test_subgraph_view_accepts_names(ray_session):
    from raphtory_ray.query.graphql import execute
    g = execute(_gf(), '{ graph { s: subgraph(nodes: ["a", "b"]) '
                       '{ countNodes countEdges } } }')
    s = g["data"]["graph"]["s"]
    assert s["countNodes"] >= 1
    g2 = execute(_gf(), '{ graph { s: subgraph(nodes: [0, 1]) '
                        '{ countNodes countEdges } } }')
    assert g2["data"]["graph"]["s"] == s
    import pytest as _p
    with _p.raises(KeyError):
        execute(_gf(), '{ graph { s: subgraph(nodes: ["nope"]) '
                       '{ countNodes } } }')


def test_apply_views_latest_on_empty_graph(ray_session):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    from raphtory_ray.query.graphql import execute
    edges = pa.table({"src": pa.array([], pa.int64()),
                      "dst": pa.array([], pa.int64()),
                      "t": pa.array([], pa.int64()),
                      "event_id": pa.array([], pa.int64())})
    gf = GraphFrame(rd.from_arrow(edges), 0, None)
    g = execute(gf, '{ graph { applyViews(views: [{latest: true}]) '
                    '{ countNodes } } }')
    assert g["data"]["graph"]["applyViews"]["countNodes"] == 0
