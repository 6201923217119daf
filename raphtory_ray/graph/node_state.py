"""NodeState — per-vertex algorithm results with the reference's reduction
surface (node_state/__init__.pyi: sum/mean/min/max/median/top_k/bottom_k/
groups/sorted/merge → SURVEY §2.5-2.6 Ray mappings).

Values are a dense O(V) numpy array (vid-indexed). Reductions are numpy;
``to_arrow``/``to_pandas`` attach gids from the vertex dimension table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class NodeState:
    def __init__(self, values: np.ndarray, gf=None, name: str = "value"):
        self.values = np.asarray(values)
        self.gf = gf
        self.name = name

    # ---------------------------------------------------------------- export
    def to_arrow(self, include_gid: bool = True) -> pa.Table:
        cols = {"vid": pa.array(np.arange(len(self.values)), pa.int64())}
        if include_gid and self.gf is not None and self.gf.vertices is not None:
            cols["gid"] = self.gf.vertices["gid"]
        cols[self.name] = pa.array(self.values)
        return pa.table(cols)

    def to_pandas(self):
        return self.to_arrow().to_pandas()

    def to_dataset(self, blocks: int | None = None):
        """Dataset-backed result for O(10^9)-vertex outputs: the dense vid
        range is sliced into ``blocks`` Arrow tables so downstream
        map_batches / write_parquet stream instead of holding one driver
        table (NodeState-on-Dataset, round-1 verdict gap #7)."""
        import ray.data as rd
        n = len(self.values)
        blocks = blocks or max(1, min(64, n // 65536 + 1))
        bounds = np.linspace(0, n, blocks + 1).astype(np.int64)
        gids = None
        if self.gf is not None and self.gf.vertices is not None:
            gids = self.gf.vertices["gid"]
        tabs = []
        for i in range(blocks):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            cols = {"vid": pa.array(np.arange(lo, hi), pa.int64())}
            if gids is not None:
                cols["gid"] = gids.slice(lo, hi - lo)
            cols[self.name] = pa.array(self.values[lo:hi])
            tabs.append(pa.table(cols))
        return rd.from_arrow(tabs)

    def to_dict(self) -> dict:
        t = self.to_arrow()
        keys = t["gid"].to_pylist() if "gid" in t.column_names else t["vid"].to_pylist()
        return dict(zip(keys, self.values.tolist()))

    def arrow_compute(self, fn, *args, **kwargs) -> "NodeState":
        """Apply a pyarrow.compute kernel to the values
        (node_state/__init__.pyi arrow_compute composition surface)."""
        res = fn(pa.array(self.values), *args, **kwargs)
        return NodeState(res.to_numpy(zero_copy_only=False), self.gf,
                         self.name)

    # ------------------------------------------------------------ reductions
    def sum(self):
        return self.values.sum()

    def mean(self):
        return float(self.values.mean())

    def min(self):
        return self.values.min()

    def max(self):
        return self.values.max()

    def median(self):
        return float(np.median(self.values))

    def top_k(self, k: int) -> pa.Table:
        idx = np.argsort(-self.values, kind="stable")[:k]
        return self._subset(idx)

    def bottom_k(self, k: int) -> pa.Table:
        idx = np.argsort(self.values, kind="stable")[:k]
        return self._subset(idx)

    def sorted(self, descending: bool = False) -> pa.Table:
        idx = np.argsort(self.values, kind="stable")
        if descending:
            idx = idx[::-1]
        return self._subset(idx)

    def _subset(self, idx: np.ndarray) -> pa.Table:
        t = self.to_arrow()
        return t.take(pa.array(idx))

    def groups(self) -> dict:
        """value → array of vids (NodeState.groups semantics)."""
        order = np.argsort(self.values, kind="stable")
        sv = self.values[order]
        boundary = np.r_[True, sv[1:] != sv[:-1]]
        starts = np.flatnonzero(boundary)
        out = {}
        for i, st in enumerate(starts):
            en = starts[i + 1] if i + 1 < len(starts) else len(sv)
            out[sv[st]] = order[st:en]
        return out

    def merge(self, other: "NodeState", names=("left", "right")) -> pa.Table:
        """Join two results on vid (NodeState.merge → ds.join on vid)."""
        t = self.to_arrow()
        return t.rename_columns(
            [c if c not in (self.name,) else names[0] for c in t.column_names]
        ).append_column(names[1], pa.array(other.values))
