"""Corpus → edge-event extraction stages (zero-copy Arrow map_batches bodies).

Two stateful stages (callable classes → Ray actor pools; regexes compiled /
lookup tables built once per actor in ``__init__``):

- :class:`HashStage`   — per-row sha256(content) + gid + commit-time; this is
  the ingest invariant carrier (``input_hint``: content sha256 equality).
- :class:`ImportExtractor` — parses import statements out of ``content`` into
  (src_gid, dst_gid, t, event_id) edge events. Line splitting and regex
  capture run as vectorized pyarrow.compute kernels (split_pattern /
  list_flatten / extract_regex), not per-row Python.

Reference parity: this replaces Raphtory's bulk loaders
(/root/reference/raphtory/src/io/parquet_loaders.rs:44-180 and
arrow_loader/df_loaders/edges.rs:101-311) — there ingestion locks a shared
graph; here it is a pure Dataset transform.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raphtory_ray.sources.corpus import T0, T_STEP, MAX_IMPORTS

# one pattern per language; all capture (o, r, p, m) → target gid
_PATTERNS = [
    r"^from org(?P<o>\d+)_repo(?P<r>\d+)\.pkg(?P<p>\d+)\.mod_(?P<m>\d+) import",
    r"^use org(?P<o>\d+)_repo(?P<r>\d+)::pkg(?P<p>\d+)::mod_(?P<m>\d+)::",
    r"from \"@org(?P<o>\d+)/repo(?P<r>\d+)/pkg(?P<p>\d+)/mod_(?P<m>\d+)\";",
    r"^import m\d+ \"example\.com/org(?P<o>\d+)/repo(?P<r>\d+)/pkg(?P<p>\d+)/mod_(?P<m>\d+)\"",
]


def _gid_from_repo_path(repo: pa.Array, path: pa.Array) -> pa.Array:
    stem = pc.replace_substring_regex(path, r"\.[a-z]+$", "")
    return pc.binary_join_element_wise(repo, stem, "/")


def _commit_to_t(commit: pa.Array) -> np.ndarray:
    """First 12 hex chars of the commit id → int64, vectorized: fixed-width
    byte view of the sliced column, digit decode + base-16 fold in numpy
    (round 3: was a Python int(h, 16) loop per row)."""
    sliced = pc.utf8_slice_codeunits(commit, 0, 12)
    if isinstance(sliced, pa.ChunkedArray):
        sliced = sliced.combine_chunks()
    n = len(sliced)
    if n == 0:
        return np.empty(0, np.int64)
    arr = sliced.cast(pa.large_string())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset:arr.offset + n + 1]
    assert np.all(np.diff(offs) == 12), "commit ids must be >= 12 hex chars"
    buf = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0]:offs[-1]]
    v = buf.reshape(n, 12).astype(np.int64)
    d = np.where(v >= 97, v - 87, np.where(v >= 65, v - 55, v - 48))
    weights = np.int64(16) ** np.arange(11, -1, -1, dtype=np.int64)
    return d @ weights


class HashStage:
    """content → sha256 + gid + t; drops the wide content column immediately
    (SURVEY §7.4: slim early, keep the hash for the row invariant)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        content = batch["content"]
        sha = pa.array(
            [hashlib.sha256(s.encode()).hexdigest() for s in content.to_pylist()],
            pa.string())
        return pa.table({
            "gid": _gid_from_repo_path(batch["repo"], batch["path"]),
            "repo": batch["repo"],
            "path": batch["path"],
            "lang": batch["lang"],
            "sha256": sha,
            "t": pa.array(_commit_to_t(batch["commit"]), pa.int64()),
            "n_bytes": pc.binary_length(content).cast(pa.int64()),
        })


class ImportExtractor:
    """content → edge events (src_gid, dst_gid, t, event_id).

    event_id = file_ordinal * (MAX_IMPORTS+1) + import_slot, a total order
    consistent with generation/insertion order — the secondary index of
    Raphtory's EventTime (timeindex.rs:28) without needing a global row
    counter at extract time.
    """

    def __init__(self):
        self.patterns = list(_PATTERNS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        src_gid_rows = _gid_from_repo_path(batch["repo"], batch["path"])
        t_rows = _commit_to_t(batch["commit"])
        lines = pc.split_pattern(batch["content"], "\n")
        parent = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lines)
        parts = []
        for pat in self.patterns:
            m = pc.extract_regex(flat, pat)
            valid = pc.is_valid(m).to_numpy(zero_copy_only=False)
            if not valid.any():
                continue
            idx = np.flatnonzero(valid)
            sm = m.take(pa.array(idx))
            dst = pc.binary_join_element_wise(
                "org", pc.struct_field(sm, "o"), "/repo", pc.struct_field(sm, "r"),
                "/src/pkg", pc.struct_field(sm, "p"), "/mod_", pc.struct_field(sm, "m"),
                "")
            parts.append((parent[idx], dst))
        if not parts:
            return pa.table({"src_gid": pa.array([], pa.string()),
                             "dst_gid": pa.array([], pa.string()),
                             "t": pa.array([], pa.int64()),
                             "event_id": pa.array([], pa.int64())})
        par = np.concatenate([p for p, _ in parts])
        dst = pa.concat_arrays([d.combine_chunks() if isinstance(d, pa.ChunkedArray)
                                else d for _, d in parts])
        order = np.argsort(par, kind="stable")
        par = par[order]
        dst = dst.take(pa.array(order))
        # slot = ordinal within each source row (line order ⇒ stable argsort
        # preserves per-row emission order across the 4 language passes —
        # each line matches exactly one language pattern)
        first = np.r_[0, np.flatnonzero(np.diff(par)) + 1]
        slot = np.arange(len(par)) - np.repeat(first, np.diff(np.r_[first, len(par)]))
        t = t_rows[par]
        file_ord = (t - T0) // T_STEP
        event_id = file_ord * (MAX_IMPORTS + 1) + slot
        return pa.table({
            "src_gid": pc.take(src_gid_rows, pa.array(par)),
            "dst_gid": dst,
            "t": pa.array(t, pa.int64()),
            "event_id": pa.array(event_id, pa.int64()),
        })
