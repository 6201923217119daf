"""Graph-level temporal properties + metadata (property_addition_ops.rs
graph arm) and the edge-deletion bulk loader."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _gf():
    import ray.data as rd
    from raphtory_ray.graph.graph_frame import GraphFrame
    t = pa.table({"src": pa.array([0, 1], pa.int64()),
                  "dst": pa.array([1, 2], pa.int64()),
                  "t": pa.array([5, 15], pa.int64()),
                  "event_id": pa.array([0, 1], pa.int64())})
    return GraphFrame(rd.from_arrow(t), 3)


def test_graph_properties_roundtrip(ray_session):
    gf = _gf()
    g2 = gf.add_properties(10, {"snapshot": "v1", "source": "crawl-a"})
    g3 = g2.add_properties(20, {"snapshot": "v2"})
    hist = g3.graph_property_history("snapshot")
    assert hist["t"].to_pylist() == [10, 20]
    assert hist["value"].to_pylist() == ["v1", "v2"]
    assert g3.latest_graph_properties() == {"snapshot": "v2",
                                            "source": "crawl-a"}
    # windowed view: only in-window property rows visible
    w = g3.window(0, 15)
    assert w.latest_graph_properties() == {"snapshot": "v1",
                                           "source": "crawl-a"}
    # original frame untouched (immutable discipline)
    assert gf.graph_events is None


def test_graph_metadata_last_write_wins(ray_session):
    gf = _gf().add_metadata({"name": "g", "owner": "a"})
    gf = gf.add_metadata({"owner": "b"})
    assert gf.graph_metadata("owner") == "b"
    assert gf.graph_metadata() == {"name": "g", "owner": "b"}


def test_load_edge_deletions(ray_session, tmp_path):
    from raphtory_ray.sources.loaders import (load_edges_from_parquet,
                                              load_edge_deletions_from_parquet)
    from raphtory_ray.graph.persistent import PersistentGraphFrame
    adds = pa.table({"ts": pa.array([1, 2], pa.int64()),
                     "a": pa.array([0, 1], pa.int64()),
                     "b": pa.array([1, 2], pa.int64())})
    dels = pa.table({"ts": pa.array([5], pa.int64()),
                     "a": pa.array([0], pa.int64()),
                     "b": pa.array([1], pa.int64())})
    pa_p, pd_p = str(tmp_path / "a.parquet"), str(tmp_path / "d.parquet")
    pq.write_table(adds, pa_p)
    pq.write_table(dels, pd_p)
    ea = load_edges_from_parquet(pa_p, "ts", "a", "b")

    def tag_add(t: pa.Table) -> pa.Table:
        return t.append_column("op", pa.array(
            np.zeros(t.num_rows, np.int64), pa.int64()))

    ea = ea.map_batches(tag_add, batch_format="pyarrow", zero_copy_batch=True)
    ed = load_edge_deletions_from_parquet(pd_p, "ts", "a", "b")
    pg = PersistentGraphFrame(ea.union(ed), 3)
    def pairs(view):
        t = view.edges_table()
        return set(zip(t["src"].to_pylist(), t["dst"].to_pylist()))

    alive_before = pairs(pg.snapshot_at(3))
    alive_after = pairs(pg.snapshot_at(6))
    assert (0, 1) in alive_before
    assert (0, 1) not in alive_after
    assert (1, 2) in alive_after


def test_materialize_carries_graph_props(ray_session):
    """materialize()/cached_view() must keep graph-level properties and
    metadata (test_materialize.rs:66 contract covers the whole view)."""
    gf = _gf().add_properties(10, {"snapshot": "v1"}) \
              .add_metadata({"name": "g"})
    mat = gf.window(0, 15).materialize()
    assert mat.graph_property_history("snapshot")["t"].to_pylist() == [10]
    assert mat.latest_graph_properties() == {"snapshot": "v1"}
    assert mat.graph_metadata("name") == "g"
    cached = gf.cached_view()
    assert cached.latest_graph_properties() == {"snapshot": "v1"}
