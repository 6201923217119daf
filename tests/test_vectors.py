"""VectorisedGraph semantic search + NodeState.arrow_compute."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _gf(ray_session):
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    edges = pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
        "t": pa.array([1, 2, 3], pa.int64()),
        "event_id": pa.array([0, 1, 2], pa.int64())})
    verts = pa.table({
        "vid": pa.array([0, 1, 2], pa.int64()),
        "gid": pa.array(["alpha server", "beta cache", "gamma server"],
                        pa.string())})
    return GraphFrame(rd.from_arrow(edges), 3, verts)


def test_nodes_by_similarity(ray_session):
    from raphtory_ray.data.vectors import vectorise
    vg = vectorise(_gf(ray_session))
    top = vg.nodes_by_similarity("server", 2)
    # the two 'server' nodes outrank the 'cache' node
    assert set(top["vec_id"].to_pylist()) == {0, 2}
    assert top["rank"].to_pylist() == [1, 2]
    # exact query by embedding vector works too
    from raphtory_ray.data.vectors import default_embedding
    v = default_embedding(["node alpha server"])[0]
    top2 = vg.nodes_by_similarity(list(v), 1)
    assert top2["vec_id"].to_pylist() == [0]


def test_edges_and_entities(ray_session):
    from raphtory_ray.data.vectors import vectorise
    vg = vectorise(_gf(ray_session))
    e = vg.edges_by_similarity("alpha", 3)
    assert e.num_rows == 3
    ents = vg.entities_by_similarity("server", 4)
    assert ents.num_rows == 4
    assert set(ents["kind"].to_pylist()) == {"node", "edge"}
    assert ents["rank"].to_pylist() == [1, 2, 3, 4]


def test_nodestate_arrow_compute(ray_session):
    import pyarrow.compute as pc
    from raphtory_ray.graph.node_state import NodeState
    ns = NodeState(np.array([1.0, 4.0, 9.0]), name="v")
    out = ns.arrow_compute(pc.sqrt)
    assert out.values.tolist() == [1.0, 2.0, 3.0]
    assert out.name == "v"
