"""Seeded synthetic graph generators (SURVEY §2.1; reference:
/root/reference/raphtory/src/graphgen/{random_attachment.rs:51,
preferential_attachment.rs:55,erdos_renyi.rs:48}).

Distributed + deterministic: every edge is a pure function of (seed, node
index, slot) through the counter RNG of sources.corpus, so generation is a
`ray.data.range(n).map_batches(...)` pipeline reproducible at any
parallelism. Semantics mirror the reference models:

- random_attachment: node i joins with k edges to uniform-random existing
  nodes (the Callaway et al. randomly-grown graph). Reference samples
  without replacement from [0, i); we draw k independent targets with
  per-slot rejection re-draws — collision probability k/i, negligible for
  i >> k, and the model's statistical properties are preserved.
- ba_preferential_attachment: node i attaches degree-proportionally. Uses
  the copy-model equivalence: a degree-proportional target is a uniformly
  random ENDPOINT of a uniformly random earlier edge; pointer chains are
  resolved by bounded iterative substitution (vectorized), which keeps the
  process embarrassingly parallel.
- erdos_renyi: each ordered pair (i, j), i≠j, present with probability p.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raphtory_ray.sources.corpus import _rand_u01, _rand_u64


def _ra_targets(idx: np.ndarray, k: int, seed_stream: int = 77):
    """Targets for random attachment: node i (i>=k) draws k targets < i."""
    idx = np.asarray(idx, dtype=np.int64)
    idx = idx[idx >= k]
    src = np.repeat(idx, k)
    slot = np.tile(np.arange(k, dtype=np.int64), len(idx))
    key = src * np.int64(k + 1) + slot
    dst = np.floor(_rand_u01(key, seed_stream) * src).astype(np.int64)
    # redraw once on within-node duplicate slots (cheap de-dup pass)
    order = np.lexsort((dst, src))
    dup = np.zeros(len(src), dtype=bool)
    so, do = src[order], dst[order]
    dup_sorted = np.r_[False, (so[1:] == so[:-1]) & (do[1:] == do[:-1])]
    dup[order] = dup_sorted
    if dup.any():
        dst2 = np.floor(_rand_u01(key[dup], seed_stream + 1) * src[dup]).astype(np.int64)
        dst = dst.copy()
        dst[dup] = dst2
    return src, dst


def random_attachment_batch(idx: np.ndarray, k: int) -> pa.Table:
    src, dst = _ra_targets(idx, k)
    slot = np.tile(np.arange(k, dtype=np.int64), len(src) // k)
    return pa.table({"src": pa.array(src), "dst": pa.array(dst),
                     "t": pa.array(src),
                     "event_id": pa.array(src * k + slot)})  # global ordinal


def random_attachment(n_nodes: int, k: int, parallelism: int = 64):
    """→ lazy edge-event Dataset (src, dst, t, event_id), |E| ≈ (n-k)·k."""
    import ray.data as rd
    ds = rd.range(n_nodes, override_num_blocks=parallelism)
    return ds.map_batches(lambda b: random_attachment_batch(b["id"], k),
                          batch_format="numpy", zero_copy_batch=True)


def ba_batch(idx: np.ndarray, k: int, n_nodes: int) -> pa.Table:
    """Preferential attachment via the copy model: target reference r in
    [0, 2·E_i) resolves to src(e)=e//k+k if even endpoint, else to dst(e) —
    which recurses; resolved by iterative substitution (chains shorten
    geometrically)."""
    idx = np.asarray(idx, dtype=np.int64)
    idx = idx[idx >= k]
    src = np.repeat(idx, k)
    slot = np.tile(np.arange(k, dtype=np.int64), len(idx))
    key = src * np.int64(k + 1) + slot
    # edge ids: edge e = (src e//k + k, slot e%k); E_i edges exist before node i
    e_before = (src - k) * k
    r = np.floor(_rand_u01(key, 88) * 2 * np.maximum(e_before, 1)).astype(np.int64)
    # even r → src endpoint of edge r//2 (known); odd → dst endpoint (recurse)
    target = np.where(e_before == 0, 0, -1)
    cur = r.copy()
    for _round in range(64):
        unresolved = target < 0
        if not unresolved.any():
            break
        e = cur[unresolved] // 2
        is_src = (cur[unresolved] % 2) == 0
        t_new = np.where(is_src, e // k + k, -1)
        tr = target.copy()
        tr_idx = np.flatnonzero(unresolved)
        tr[tr_idx] = t_new
        target = tr
        # recurse on dst endpoints: dst of edge e was drawn with reference
        # r' = rand(key(e)) over 2*E_{src(e)}
        still = target < 0
        if still.any():
            si = np.flatnonzero(still)
            e2 = cur[si] // 2
            s2 = e2 // k + k
            sl2 = e2 % k
            k2 = s2 * np.int64(k + 1) + sl2
            eb2 = (s2 - k) * k
            cur[si] = np.floor(
                _rand_u01(k2, 88) * 2 * np.maximum(eb2, 1)).astype(np.int64)
            target[si] = np.where(eb2 == 0, 0, -1)
    target = np.maximum(target, 0)
    return pa.table({"src": pa.array(src), "dst": pa.array(target),
                     "t": pa.array(src),
                     "event_id": pa.array(src * k + slot)})  # global ordinal


def ba_preferential_attachment(n_nodes: int, k: int, parallelism: int = 64):
    import ray.data as rd
    ds = rd.range(n_nodes, override_num_blocks=parallelism)
    return ds.map_batches(lambda b: ba_batch(b["id"], k, n_nodes),
                          batch_format="numpy", zero_copy_batch=True)


def erdos_renyi_batch(idx: np.ndarray, n: int, p: float) -> pa.Table:
    """Row block of the n×n pair matrix: for each src i in idx, keep each
    j≠i with probability p (per-pair counter RNG — deterministic)."""
    idx = np.asarray(idx, dtype=np.int64)
    src = np.repeat(idx, n)
    dst = np.tile(np.arange(n, dtype=np.int64), len(idx))
    key = src * np.int64(n) + dst
    keep = (_rand_u01(key, 99) < p) & (src != dst)
    return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep]),
                     "t": pa.array(src[keep]), "event_id": pa.array(key[keep])})


def erdos_renyi(n_nodes: int, p: float, parallelism: int = 16):
    import ray.data as rd
    ds = rd.range(n_nodes, override_num_blocks=parallelism)
    return ds.map_batches(lambda b: erdos_renyi_batch(b["id"], n_nodes, p),
                          batch_format="numpy", zero_copy_batch=True,
                          batch_size=2048)
