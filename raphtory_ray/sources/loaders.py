"""Column-mapped bulk loaders + canonical exports (SURVEY §2.1).

Mirrors the reference's loader surface —
``load_edges_from_parquet/csv/json`` (parquet_loaders.rs:44-180,
csv_loader.rs, json_loader.rs) and the canonical Parquet graph encoding
(parquet_encoder/mod.rs:29-58, column layout ``rap_*``) — as thin Ray Data
pipelines: read → map_batches(column map + time parse) → GraphFrame.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raphtory_ray.graph.graph_frame import GraphFrame


def _to_ms(col: pa.ChunkedArray | pa.Array, fmt: str | None = None):
    """Any time column → int64 epoch ms (reference TryIntoInputTime)."""
    t = col.type if not isinstance(col, pa.ChunkedArray) else col.type
    if pa.types.is_integer(t):
        return col.cast(pa.int64())
    if pa.types.is_timestamp(t):
        return pc.divide(col.cast(pa.timestamp("us")).cast(pa.int64()), 1000)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        parsed = pc.strptime(col, format=fmt or "%Y-%m-%d %H:%M:%S",
                             unit="ms")
        return parsed.cast(pa.int64())
    raise TypeError(f"unsupported time column type {t}")


def _edge_mapper(time_col, src_col, dst_col, layer_col=None,
                 prop_cols=None, time_fmt=None):
    prop_cols = prop_cols or []

    def fn(b: pa.Table) -> pa.Table:
        cols = {
            "src": b[src_col],
            "dst": b[dst_col],
            "t": _to_ms(b[time_col], time_fmt),
            "event_id": pa.array(np.arange(b.num_rows, dtype=np.int64)),
        }
        if layer_col is not None:
            cols["layer"] = b[layer_col]
        for p in prop_cols:
            cols[p] = b[p]
        return pa.table(cols)

    return fn


def load_edges(ds, time_col: str, src_col: str, dst_col: str,
               layer_col: str | None = None, prop_cols=None,
               time_fmt: str | None = None):
    """Any Dataset → edge-event Dataset with the engine's canonical columns.
    NOTE: event_id here is per-batch ordinal; pass a pre-assigned column for
    a reference-exact global secondary index (loaders' secondary_index,
    parquet_loaders.rs:50)."""
    return ds.map_batches(
        _edge_mapper(time_col, src_col, dst_col, layer_col, prop_cols,
                     time_fmt),
        batch_format="pyarrow", zero_copy_batch=True)


def load_edges_from_parquet(path, time_col, src_col, dst_col, **kw):
    import ray.data as rd
    cols = [time_col, src_col, dst_col] + list(kw.get("prop_cols") or [])
    if kw.get("layer_col"):
        cols.append(kw["layer_col"])
    return load_edges(rd.read_parquet(path, columns=cols),
                      time_col, src_col, dst_col, **kw)


def load_edges_from_csv(path, time_col, src_col, dst_col, **kw):
    import ray.data as rd
    return load_edges(rd.read_csv(path), time_col, src_col, dst_col, **kw)


def load_edges_from_json(path, time_col, src_col, dst_col, **kw):
    """Newline-delimited JSON (json_loader.rs)."""
    import ray.data as rd
    return load_edges(rd.read_json(path), time_col, src_col, dst_col, **kw)


# ------------------------------------------------------- canonical parquet

RAP_COLUMNS = ["rap_time", "rap_secondary_index", "rap_src_vid",
               "rap_dst_vid", "rap_src_gid", "rap_dst_gid", "rap_layer"]


def to_parquet(gf: GraphFrame, path: str, row_group_size: int = 100_000):
    """Canonical graph encode (parquet_encoder/mod.rs:29-42 column layout,
    row-group 100k). One directory of edge-event files + one vertices file —
    resumable, partition-per-block."""
    import os

    import pyarrow.parquet as pq

    gids = None
    if gf.vertices is not None:
        gids = gf.vertices["gid"].to_numpy(zero_copy_only=False)

    def encode(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        cols = {
            "rap_time": b["t"] if "t" in b.column_names else
            pa.array(np.zeros(b.num_rows, np.int64)),
            "rap_secondary_index": b["event_id"]
            if "event_id" in b.column_names else
            pa.array(np.arange(b.num_rows, dtype=np.int64)),
            "rap_src_vid": pa.array(s),
            "rap_dst_vid": pa.array(d),
        }
        if gids is not None:
            cols["rap_src_gid"] = pa.array(gids[s])
            cols["rap_dst_gid"] = pa.array(gids[d])
        cols["rap_layer"] = b["layer"] if "layer" in b.column_names else \
            pa.array(["_default"] * b.num_rows, pa.string())
        return pa.table(cols)

    (gf.edges.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)
     .write_parquet(os.path.join(path, "edges"),
                    row_group_size=row_group_size))
    if gf.vertices is not None:
        pq.write_table(gf.vertices, os.path.join(path, "vertices.parquet"))


def from_parquet(path: str) -> GraphFrame:
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    edges = rd.read_parquet(os.path.join(path, "edges"))

    def decode(b: pa.Table) -> pa.Table:
        return pa.table({
            "src": b["rap_src_vid"], "dst": b["rap_dst_vid"],
            "t": b["rap_time"], "event_id": b["rap_secondary_index"],
            "layer": b["rap_layer"]})

    vertices = None
    n = 0
    vp = os.path.join(path, "vertices.parquet")
    if os.path.exists(vp):
        vertices = pq.read_table(vp)
        n = vertices.num_rows
    ds = edges.map_batches(decode, batch_format="pyarrow",
                           zero_copy_batch=True)
    if n == 0:
        mx = -1
        for blk in ds.select_columns(["src", "dst"]).iter_batches(
                batch_format="pyarrow"):
            if blk.num_rows:
                mx = max(mx, pc.max(blk["src"]).as_py(),
                         pc.max(blk["dst"]).as_py())
        n = mx + 1
    return GraphFrame(ds, n=n, vertices=vertices)


# --------------------------------------------------------------- interop

def to_networkx(gf: GraphFrame, directed: bool = True):
    """Materialized networkx export (GraphView.to_networkx, pyi:54-60).
    Driver-side by nature — test/interop scale only."""
    import networkx as nx
    g = nx.MultiDiGraph() if directed else nx.MultiGraph()
    if gf.vertices is not None:
        for vid, gid in zip(gf.vertices["vid"].to_pylist(),
                            gf.vertices["gid"].to_pylist()):
            g.add_node(vid, gid=gid)
    for b in gf.edges.iter_batches(batch_format="pyarrow"):
        cols = b.column_names
        for row in zip(b["src"].to_pylist(), b["dst"].to_pylist(),
                       b["t"].to_pylist() if "t" in cols else
                       [None] * b.num_rows):
            g.add_edge(row[0], row[1], t=row[2])
    return g


def to_df(gf: GraphFrame):
    return gf.edges.to_pandas()
