"""Vertex id resolution (GID → dense VID), mirroring the reference's
GIDResolver first-sight assignment (/root/reference/db4-graph/src/lib.rs:52-53).

Small/driver-side helper here; the distributed dict-encode over a Dataset
lives in raphtory_ray.pipelines.ingest (groupby min-first-row → sort →
enumerate).
"""

from __future__ import annotations

import numpy as np


def encode_event_list(events: list[tuple]) -> tuple[np.ndarray, np.ndarray, np.ndarray, dict]:
    """Encode a list of (t, src_gid, dst_gid) events exactly as the reference
    does: VIDs assigned at first sight scanning events in insertion order,
    src resolved before dst (addition_ops.rs:122-160).

    Returns (t, src_vid, dst_vid) int64 arrays and the gid→vid mapping.
    """
    gid_to_vid: dict = {}
    t_arr = np.empty(len(events), dtype=np.int64)
    s_arr = np.empty(len(events), dtype=np.int64)
    d_arr = np.empty(len(events), dtype=np.int64)
    for i, (t, s, d) in enumerate(events):
        for g in (s, d):
            if g not in gid_to_vid:
                gid_to_vid[g] = len(gid_to_vid)
        t_arr[i] = t
        s_arr[i] = gid_to_vid[s]
        d_arr[i] = gid_to_vid[d]
    return t_arr, s_arr, d_arr, gid_to_vid
