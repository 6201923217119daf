"""GraphFrame — the engine's graph handle: an edge-event Dataset + vertex
dimension table, with lazily-composed views.

Mirrors the reference's view algebra (SURVEY §1.4): a view never
materializes; ``window``/``layer``/``subgraph`` return a new GraphFrame whose
edge Dataset has an extra vectorized filter stage. The temporal model is the
reference's event log: one row per (src, dst, t, event_id[, layer]) edge
event (timeindex.rs:28 EventTime = (t, event_id); half-open windows
time.rs:113-117).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class GraphFrame:
    """edges: ray.data.Dataset with at least (src:int64, dst:int64) and
    optionally (t:int64, event_id:int64, layer:string, w:float64).
    n: number of vertices (dense vid space [0, n)).
    vertices: optional pyarrow.Table (vid:int64, gid:string) dimension table.
    """

    def __init__(self, edges, n: int, vertices: pa.Table | None = None):
        self.edges = edges
        self.n = int(n)
        self.vertices = vertices
        self.start = None      # window bounds when this is a windowed view
        self.end = None

    # ------------------------------------------------------------------ views
    def window(self, start: int | None, end: int | None) -> "GraphFrame":
        """Events with start <= t < end (half-open, time.rs:113-117)."""
        lo, hi = start, end

        def filt(b: pa.Table) -> pa.Table:
            m = None
            if lo is not None:
                m = pc.greater_equal(b["t"], pa.scalar(lo, pa.int64()))
            if hi is not None:
                m2 = pc.less(b["t"], pa.scalar(hi, pa.int64()))
                m = m2 if m is None else pc.and_(m, m2)
            return b if m is None else b.filter(m)

        g = GraphFrame(self.edges.map_batches(filt, batch_format="pyarrow",
                                              zero_copy_batch=True),
                       self.n, self.vertices)
        # reference views expose their bounds (GraphView.start/end, time.rs)
        g.start, g.end = lo, hi
        return g

    def at(self, t: int) -> "GraphFrame":
        return self.window(t, t + 1)

    def before(self, t: int) -> "GraphFrame":
        return self.window(None, t)

    def after(self, t: int) -> "GraphFrame":
        return self.window(t + 1, None)

    def layer(self, layers: str | Sequence[str]) -> "GraphFrame":
        """Restrict to edge events of the given layer(s) (layer_graph.rs)."""
        if isinstance(layers, str):
            layers = [layers]
        lset = pa.array(list(layers), pa.string())

        def filt(b: pa.Table) -> pa.Table:
            return b.filter(pc.is_in(b["layer"], value_set=lset))

        return GraphFrame(self.edges.map_batches(filt, batch_format="pyarrow",
                                                 zero_copy_batch=True),
                          self.n, self.vertices)

    def subgraph(self, vids) -> "GraphFrame":
        """Induced subgraph on a vertex set: keep events with both endpoints
        in the set (node_subgraph.rs). Membership is a broadcast boolean
        mask (O(n) bits), not a shuffle join."""
        mask = np.zeros(self.n, dtype=bool)
        mask[np.asarray(list(vids), dtype=np.int64)] = True

        def filt(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(mask[s] & mask[d]))

        return GraphFrame(self.edges.map_batches(filt, batch_format="pyarrow",
                                                 zero_copy_batch=True),
                          self.n, self.vertices)

    def filter_edges(self, expr) -> "GraphFrame":
        """Property filter view: ``expr`` is a pyarrow.compute expression
        evaluated per batch (filter/mod.rs algebra → Arrow compute)."""
        return GraphFrame(
            self.edges.map_batches(lambda b: b.filter(expr), batch_format="pyarrow",
                                   zero_copy_batch=True),
            self.n, self.vertices)

    # ------------------------------------------------------------ accessors
    def gids_for(self, vids: np.ndarray) -> pa.Array:
        assert self.vertices is not None, "no vertex dimension table"
        return pc.take(self.vertices["gid"], pa.array(vids, pa.int64()))

    def count_edges(self) -> int:
        """Number of distinct (src, dst) simple edges (adjacency uniqueness,
        adj.rs:60-69)."""
        from raphtory_ray.state.shards import BspGraph
        return BspGraph.from_graph(self).num_edges

    def count_temporal_edges(self) -> int:
        return self.edges.count()
