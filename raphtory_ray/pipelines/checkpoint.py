"""Per-superstep vertex-state checkpointing with lineage + metrics — the
north_rule's resume contract (reference analogue: WAL + control file +
snapshots, db4-storage/src/{wal,persist}; SURVEY §4 "Checkpoint/resume").

Layout (all under one checkpoint dir):

    iter_0003/part-00.parquet ... part-07.parquet   # vid-range partitions
    iter_0003/MANIFEST.json                          # written LAST = complete

The manifest carries lineage (iteration, parent iteration, partition row
counts + per-partition state hashes) and the superstep's metrics (e.g.
convergence norm). ``load_latest`` only trusts iterations whose manifest
exists and whose parts all exist — a killed run resumes from the last
*complete* superstep. Partitioned parts mean a multi-node restore reads in
parallel and a partial write never masquerades as complete.
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class CheckpointManager:
    def __init__(self, path: str, num_partitions: int = 8, keep_last: int = 2):
        self.path = path
        self.num_partitions = num_partitions
        self.keep_last = keep_last
        os.makedirs(path, exist_ok=True)

    def _iter_dir(self, it: int) -> str:
        return os.path.join(self.path, f"iter_{it:04d}")

    def save(self, iteration: int, state: dict[str, np.ndarray],
             metrics: dict | None = None) -> None:
        d = self._iter_dir(iteration)
        os.makedirs(d, exist_ok=True)
        n = len(next(iter(state.values())))
        bounds = np.linspace(0, n, self.num_partitions + 1).astype(np.int64)
        parts = []
        for p in range(self.num_partitions):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            cols = {"vid": pa.array(np.arange(lo, hi), pa.int64())}
            hashes = {}
            for name, arr in state.items():
                cols[name] = pa.array(arr[lo:hi])
                hashes[name] = zlib.crc32(np.ascontiguousarray(arr[lo:hi]).tobytes())
            fn = os.path.join(d, f"part-{p:02d}.parquet")
            pq.write_table(pa.table(cols), fn + ".tmp")
            os.replace(fn + ".tmp", fn)
            parts.append({"file": f"part-{p:02d}.parquet", "rows": hi - lo,
                          "crc32": hashes})
        manifest = {
            "iteration": iteration,
            "parent_iteration": iteration - 1,
            "n": n,
            "columns": list(state),
            "partitions": parts,
            "metrics": metrics or {},
        }
        mfn = os.path.join(d, "MANIFEST.json")
        with open(mfn + ".tmp", "w") as f:
            json.dump(manifest, f)
        os.replace(mfn + ".tmp", mfn)
        self._gc(iteration)

    def _gc(self, current: int) -> None:
        import shutil
        its = self.iterations()
        for it in its[:-self.keep_last] if self.keep_last else []:
            if it < current:
                shutil.rmtree(self._iter_dir(it), ignore_errors=True)

    def iterations(self) -> list[int]:
        out = []
        for name in sorted(os.listdir(self.path)):
            if name.startswith("iter_") and os.path.exists(
                    os.path.join(self.path, name, "MANIFEST.json")):
                out.append(int(name.split("_")[1]))
        return out

    def load(self, iteration: int) -> dict | None:
        d = self._iter_dir(iteration)
        mfn = os.path.join(d, "MANIFEST.json")
        if not os.path.exists(mfn):
            return None
        with open(mfn) as f:
            manifest = json.load(f)
        state = {c: np.empty(manifest["n"], dtype=None) for c in manifest["columns"]}
        arrays: dict[str, list] = {c: [] for c in manifest["columns"]}
        for part in manifest["partitions"]:
            fn = os.path.join(d, part["file"])
            if not os.path.exists(fn):
                return None
            t = pq.read_table(fn)
            for c in manifest["columns"]:
                arrays[c].append(t[c].to_numpy(zero_copy_only=False))
        state = {c: np.concatenate(v) for c, v in arrays.items()}
        return {"iteration": iteration, "state": state,
                "metrics": manifest["metrics"]}

    def load_latest(self) -> dict | None:
        for it in reversed(self.iterations()):
            got = self.load(it)
            if got is not None:
                return got
        return None
