"""Temporal three-node motifs (Paranjape et al., WSDM 2017) — global counts.

Reference semantics: algorithms/motifs/global_temporal_three_node_motifs.rs
(star_motif_count :27-78, twonode_motif_count :80-119, triangle_motifs
:124-254, temporal_three_node_motif_multi :272-330) with the sliding-window
counters of three_node_motifs.rs (TwoNodeCounter :28-61, StarCounter
:85-177, TriangleCounter :223-341). Output: one 40-vector per delta —
[0..24) star (pre/mid/post × 8 dir-triples, two-node-excluded),
[24..32) two-node (counted from both endpoints, hence doubled — reference
keeps the doubling), [32..40) triangle.

Ray decomposition:
- STAR phase: every non-self edge event is routed to BOTH endpoints'
  owner partition (hash shuffle); each partition runs the per-node
  counters over its nodes' time-sorted incident events. Driver combines
  P fixed-size (len(deltas)×32) partials.
- TRIANGLE phase: k-core(2) subgraph → triangle triples via the engine's
  partitioned wedge semi-join (no global edge pull); pair event lists are
  hash-partitioned by unordered pair; each triple partition receives ONLY
  the pair lists its triangles touch (per-partition semi-join subsets) and
  runs the reference TriangleCounter per triangle. Driver combines Q
  (len(deltas)×8) partials.

The per-entity counters are sequential sliding windows (as in the
reference, which parallelises across nodes/edges exactly the same way);
hot nodes/pairs bound a partition's work, matching the reference's
per-node task granularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_GOLD = np.uint64(0x9E3779B97F4A7C15)

_DIRS2D = [(0, 0), (0, 1), (1, 0), (1, 1)]


def _map2d(d1, d2):
    return 2 * d1 + d2


def _map3d(d1, d2, d3):
    return 4 * d1 + 2 * d2 + d3


# ------------------------------------------------------------ counters

def _two_node_count(dirs: np.ndarray, times: np.ndarray,
                    delta: int) -> np.ndarray:
    """TwoNodeCounter.execute (three_node_motifs.rs:28-61): 8 counts."""
    c1 = np.zeros(2, np.int64)
    c2 = np.zeros(4, np.int64)
    c3 = np.zeros(8, np.int64)
    start = 0
    for j in range(len(dirs)):
        tj = times[j]
        while times[start] + delta < tj:
            d = dirs[start]
            c1[d] -= 1
            c2[_map2d(d, 0)] -= c1[0]
            c2[_map2d(d, 1)] -= c1[1]
            start += 1
        d = dirs[j]
        for d1, d2 in _DIRS2D:
            c3[_map3d(d1, d2, d)] += c2[_map2d(d1, d2)]
        c2[_map2d(0, d)] += c1[0]
        c2[_map2d(1, d)] += c1[1]
        c1[d] += 1
    return c3


def _star_count(nbs: np.ndarray, dirs: np.ndarray, times: np.ndarray,
                n: int, delta: int) -> np.ndarray:
    """StarCounter.execute (three_node_motifs.rs:85-177): 24 counts
    (pre | mid | post). Pure-Python-list inner loop with the _map2d/_map3d
    index algebra pre-expanded — numpy scalar indexing in this per-event
    loop measured ~4x slower than list ops."""
    out = np.zeros(24, np.int64)
    l = len(nbs)
    if l < 3:
        return out
    nbs_l = nbs.tolist() if hasattr(nbs, "tolist") else list(nbs)
    dirs_l = dirs.tolist() if hasattr(dirs, "tolist") else list(dirs)
    times_l = times.tolist() if hasattr(times, "tolist") else list(times)
    pre_nodes = [0] * (2 * n)
    post_nodes = [0] * (2 * n)
    pre_sum = [0] * 4      # index _map2d(d1,d2) = 2*d1+d2
    mid_sum = [0] * 4
    post_sum = [0] * 4
    cp = [0] * 8           # count_pre, index _map3d
    cm = [0] * 8           # count_mid
    cpo = [0] * 8          # count_post
    start = 0
    end = 0
    for j in range(l):
        tj = times_l[j]
        while start < l and times_l[start] + delta < tj:
            # pop_pre
            nb = nbs_l[start]
            d = dirs_l[start]
            pre_nodes[d * n + nb] -= 1
            pre_sum[2 * d] -= pre_nodes[nb]           # _map2d(d,0)
            pre_sum[2 * d + 1] -= pre_nodes[n + nb]   # _map2d(d,1)
            start += 1
        while end < l and times_l[end] <= tj + delta:
            # push_post
            nb = nbs_l[end]
            d = dirs_l[end]
            post_sum[d] += post_nodes[nb]             # _map2d(0,d)
            post_sum[2 + d] += post_nodes[n + nb]     # _map2d(1,d)
            post_nodes[d * n + nb] += 1
            end += 1
        nb = nbs_l[j]
        d = dirs_l[j]
        # pop_post
        post_nodes[d * n + nb] -= 1
        post_sum[2 * d] -= post_nodes[nb]
        post_sum[2 * d + 1] -= post_nodes[n + nb]
        # process_current
        mid_sum[d] -= pre_nodes[nb]                   # _map2d(0,d)
        mid_sum[2 + d] -= pre_nodes[n + nb]           # _map2d(1,d)
        # count_pre[_map3d(d1,d2,d)] += pre_sum[_map2d(d1,d2)]
        cp[d] += pre_sum[0]
        cp[2 + d] += pre_sum[1]
        cp[4 + d] += pre_sum[2]
        cp[6 + d] += pre_sum[3]
        # count_post[_map3d(d,d1,d2)] += post_sum[_map2d(d1,d2)]
        b = 4 * d
        cpo[b] += post_sum[0]
        cpo[b + 1] += post_sum[1]
        cpo[b + 2] += post_sum[2]
        cpo[b + 3] += post_sum[3]
        # count_mid[_map3d(d1,d,d2)] += mid_sum[_map2d(d1,d2)]
        b = 2 * d
        cm[b] += mid_sum[0]
        cm[b + 1] += mid_sum[1]
        cm[b + 4] += mid_sum[2]
        cm[b + 5] += mid_sum[3]
        mid_sum[2 * d] += post_nodes[nb]              # _map2d(d,0)
        mid_sum[2 * d + 1] += post_nodes[n + nb]      # _map2d(d,1)
        # push_pre
        pre_sum[d] += pre_nodes[nb]                   # _map2d(0,d)
        pre_sum[2 + d] += pre_nodes[n + nb]           # _map2d(1,d)
        pre_nodes[d * n + nb] += 1
    out[0:8] = cp
    out[8:16] = cm
    out[16:24] = cpo
    return out


# uv-event count table for _triangle_count8: for each uv-event direction d,
# 8 rows of (out_slot, mid_idx, post_idx, pre_idx) — generated from the
# reference index expressions (three_node_motifs.rs:223-341) so the fast
# kernel cannot drift from them.
def _uv_count_table():
    tab = {}
    for d in (0, 1):
        tab[d] = (
            (0, _map3d(d, 0, 0), _map3d(d, 0, 1), _map3d(1 - d, 1, 1)),
            (4, _map3d(d, 1, 0), _map3d(1 - d, 0, 1), _map3d(1 - d, 0, 1)),
            (2, _map3d(1 - d, 0, 0), _map3d(d, 1, 1), _map3d(1 - d, 1, 0)),
            (6, _map3d(1 - d, 1, 0), _map3d(1 - d, 1, 1), _map3d(1 - d, 0, 0)),
            (1, _map3d(d, 0, 1), _map3d(d, 0, 0), _map3d(d, 1, 1)),
            (5, _map3d(d, 1, 1), _map3d(1 - d, 0, 0), _map3d(d, 0, 1)),
            (3, _map3d(1 - d, 0, 1), _map3d(d, 1, 0), _map3d(d, 1, 0)),
            (7, _map3d(1 - d, 1, 1), _map3d(1 - d, 1, 0), _map3d(d, 0, 0)),
        )
    return tab


_UV_TABLE = _uv_count_table()


def _triangle_count8(uv, uorv, dirs, times, delta: int) -> np.ndarray:
    """TriangleCounter.execute with n=2, nb=0 (three_node_motifs.rs:223-341,
    as used by triangle_motifs with init_tri_count(2)): 8 counts.
    List-based inner loop with the _map2d/_map3d algebra pre-expanded
    (4d+2s / 2-2s / 6-2s / 4s+2d / 4-4s+d / 6-4s+d)."""
    out = [0] * 8
    l = len(uv)
    if l < 3:
        return np.zeros(8, np.int64)
    uv_l = uv if type(uv) is list else uv.tolist()
    s_l = uorv if type(uorv) is list else uorv.tolist()
    d_l = dirs if type(dirs) is list else dirs.tolist()
    t_l = times if type(times) is list else times.tolist()
    pre_nodes = [0] * 8
    post_nodes = [0] * 8
    pre_sum = [0] * 8
    mid_sum = [0] * 8
    post_sum = [0] * 8
    start = 0
    end = 0
    for j in range(l):
        tj = t_l[j]
        while start < l and t_l[start] + delta < tj:
            if not uv_l[start]:             # pop_pre (w-event)
                sx = s_l[start]
                dx = d_l[start]
                pre_nodes[4 * dx + 2 * sx] -= 1
                i0 = 4 * sx + 2 * dx
                pre_sum[i0] -= pre_nodes[2 - 2 * sx]
                pre_sum[i0 + 1] -= pre_nodes[6 - 2 * sx]
            start += 1
        while end < l and t_l[end] <= tj + delta:
            if not uv_l[end]:               # push_post
                sx = s_l[end]
                dx = d_l[end]
                post_sum[4 - 4 * sx + dx] += post_nodes[2 - 2 * sx]
                post_sum[6 - 4 * sx + dx] += post_nodes[6 - 2 * sx]
                post_nodes[4 * dx + 2 * sx] += 1
            end += 1
        sx = s_l[j]
        dx = d_l[j]
        if not uv_l[j]:                     # pop_post + process_current
            post_nodes[4 * dx + 2 * sx] -= 1
            i0 = 4 * sx + 2 * dx
            post_sum[i0] -= post_nodes[2 - 2 * sx]
            post_sum[i0 + 1] -= post_nodes[6 - 2 * sx]
            mid_sum[4 - 4 * sx + dx] -= pre_nodes[2 - 2 * sx]
            mid_sum[6 - 4 * sx + dx] -= pre_nodes[6 - 2 * sx]
            mid_sum[i0] += post_nodes[2 - 2 * sx]
            mid_sum[i0 + 1] += post_nodes[6 - 2 * sx]
            # push_pre
            pre_sum[4 - 4 * sx + dx] += pre_nodes[2 - 2 * sx]
            pre_sum[6 - 4 * sx + dx] += pre_nodes[6 - 2 * sx]
            pre_nodes[4 * dx + 2 * sx] += 1
        else:                               # uv-edge event: count motifs
            for slot, mi, pi, ri in _UV_TABLE[dx]:
                out[slot] += mid_sum[mi] + post_sum[pi] + pre_sum[ri]
    return np.asarray(out, np.int64)


# --------------------------------------------------------------- star phase

def _grouped_window_starts(gid, t_rel, M, delta):
    """L[j] = first row i in j's group with t_rel[i] >= t_rel[j] - delta,
    via one searchsorted over composite keys gid*M + t_rel. When
    n_groups * M would overflow int64 (ns-resolution spans, huge group
    counts), re-base gids per chunk so every composite key fits — same
    result, a few extra searchsorted passes only in that regime."""
    rows = len(gid)
    n_groups = int(gid[-1]) + 1
    gpc = max(1, (1 << 62) // M)  # groups per overflow-safe chunk
    if n_groups <= gpc:
        comp = gid * M + t_rel
        return np.searchsorted(comp, comp - delta, side="left")
    chunk = gid // gpc
    starts = np.r_[0, np.flatnonzero(chunk[1:] != chunk[:-1]) + 1, rows]
    L = np.empty(rows, np.int64)
    for s, epos in zip(starts[:-1], starts[1:]):
        comp = (gid[s:epos] - chunk[s] * gpc) * M + t_rel[s:epos]
        L[s:epos] = s + np.searchsorted(comp, comp - delta, side="left")
    return L


def _two_node_group_counts(node, nbr, dr, t, e, deltas,
                           per_node: bool = False):
    """Vectorized TwoNodeCounter over every (node, nbr) event group.

    Exact reformulation of _two_node_count's sliding window: the
    contribution of event j is the number of pairs (i1 < i2 < j) in j's
    group with t_j - t_i1 <= delta, classified by (dir_i1, dir_i2,
    dir_j). Window pairs come from per-group prefix sums -- for window
    start L(j) (first index with t >= t_j - delta, via one global
    searchsorted over group-offset composite keys):

        wp(d1,d2) = Q[d1,d2][j] - Q[d1,d2][L] - c[d1][L] * (c[d2][j] - c[d2][L])

    with c[d] the group-relative exclusive dir counts and Q[d1,d2] the
    group-relative exclusive pair-prefix (cumsum of (dir==d2)*c[d1]).
    Replaces the per-neighbour boolean-mask loop (O(deg*m) per node) and
    the per-group Python loop with O(rows) numpy passes.

    Returns (D, 8) global totals, or (vids, (nv, D, 8)) when per_node.
    """
    D = len(deltas)
    if len(node) == 0:
        return (np.empty(0, np.int64), np.zeros((0, D, 8), np.int64)) \
            if per_node else np.zeros((D, 8), np.int64)
    order = np.lexsort((e, t, nbr, node))
    nd = node[order]
    nb = nbr[order]
    d = dr[order].astype(np.int64)
    tt = t[order]
    rows = len(nd)
    ar = np.arange(rows, dtype=np.int64)
    first_g = np.empty(rows, bool)
    first_g[0] = True
    first_g[1:] = (nd[1:] != nd[:-1]) | (nb[1:] != nb[:-1])
    gid = np.cumsum(first_g) - 1
    gs_row = np.maximum.accumulate(np.where(first_g, ar, 0))
    # group-relative exclusive prefix dir counts
    is1 = (d == 1).astype(np.int64)
    c1x = np.cumsum(is1) - is1
    c0x = ar - c1x
    c = (c0x - c0x[gs_row], c1x - c1x[gs_row])
    # group-offset composite keys: searchsorted stays inside j's group
    t_rel = tt - tt[gs_row]
    M = int(t_rel.max()) + int(max(deltas)) + 2
    # group-relative exclusive pair-prefix per (d1, d2)
    Q = {}
    for d1 in (0, 1):
        for d2 in (0, 1):
            inc = np.where(d == d2, c[d1], 0)
            q = np.cumsum(inc) - inc
            Q[(d1, d2)] = q
    if per_node:
        first_n = np.empty(rows, bool)
        first_n[0] = True
        first_n[1:] = nd[1:] != nd[:-1]
        nrun = np.cumsum(first_n) - 1
        vids = nd[first_n]
        out = np.zeros((len(vids), D, 8), np.int64)
    else:
        out = np.zeros((D, 8), np.int64)
    m1 = d == 1
    for di, delta in enumerate(deltas):
        L = _grouped_window_starts(gid, t_rel, M, int(delta))
        for d1 in (0, 1):
            cbL = c[d1][L]
            for d2 in (0, 1):
                q = Q[(d1, d2)]
                wp = q - q[L] - cbL * (c[d2] - c[d2][L])
                base = 4 * d1 + 2 * d2
                if per_node:
                    out[:, di, base + 1] += np.bincount(
                        nrun[m1], weights=wp[m1],
                        minlength=len(vids)).astype(np.int64)
                    out[:, di, base] += np.bincount(
                        nrun[~m1], weights=wp[~m1],
                        minlength=len(vids)).astype(np.int64)
                else:
                    out[di, base + 1] += int(wp[m1].sum())
                    out[di, base] += int(wp[~m1].sum())
    return (vids, out) if per_node else out


def _node_codes_and_order(node, nbr, dr, t, e):
    """(order2, codes, starts, degs): rows in per-node (t, e) order with
    per-node dense neighbour codes (first-appearance order is irrelevant
    to the counters) -- replaces per-node np.unique + mask loops."""
    rows = len(node)
    ar = np.arange(rows, dtype=np.int64)
    order1 = np.lexsort((e, t, nbr, node))
    nd1, nb1 = node[order1], nbr[order1]
    first_g = np.empty(rows, bool)
    first_g[0] = True
    first_g[1:] = (nd1[1:] != nd1[:-1]) | (nb1[1:] != nb1[:-1])
    gid = np.cumsum(first_g) - 1
    first_n = np.empty(rows, bool)
    first_n[0] = True
    first_n[1:] = nd1[1:] != nd1[:-1]
    node_start = np.maximum.accumulate(np.where(first_n, ar, 0))
    code1 = gid - gid[node_start]
    codes = np.empty(rows, np.int64)
    codes[order1] = code1
    degs = np.bincount((np.cumsum(first_n) - 1)[first_g])
    order2 = np.lexsort((e, t, node))
    nd2 = node[order2]
    starts = np.r_[0, np.flatnonzero(nd2[1:] != nd2[:-1]) + 1, rows]
    return order2, codes, starts, degs


@ray.remote
def _star_split(block: pa.Table, P: int):
    """Route every non-self event to BOTH endpoints' owner partitions as
    (node, nbr, dir, t, eid); dir=1 when node is the source."""
    if block.num_rows == 0 or "src" not in block.column_names:
        z = np.empty(0, np.int64)
        e = (z, z, np.empty(0, np.int8), z, z)
        return tuple([e] * P) if P > 1 else e
    s = block["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = block["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = block["t"].to_numpy(zero_copy_only=False).astype(np.int64) \
        if "t" in block.column_names else np.zeros(len(s), np.int64)
    e = block["event_id"].to_numpy(zero_copy_only=False).astype(np.int64) \
        if "event_id" in block.column_names else np.arange(len(s))
    m = s != d
    s, d, t, e = s[m], d[m], t[m], e[m]
    node = np.concatenate([s, d])
    nbr = np.concatenate([d, s])
    dr = np.concatenate([np.ones(len(s), np.int8), np.zeros(len(s), np.int8)])
    tt = np.concatenate([t, t])
    ee = np.concatenate([e, e])
    bk = ((node.astype(np.uint64) * _GOLD) >> np.uint64(33)) % np.uint64(P)
    order = np.argsort(bk, kind="stable")
    bounds = np.searchsorted(bk[order], np.arange(P + 1))
    out = []
    for p in range(P):
        sl = order[bounds[p]:bounds[p + 1]]
        out.append((node[sl], nbr[sl], dr[sl], tt[sl], ee[sl]))
    return tuple(out) if P > 1 else out[0]


@ray.remote
def _star_partial(deltas: tuple, *pieces) -> np.ndarray:
    """One node partition: per node, star + two-node counts over its
    time-sorted incident events → (len(deltas), 32) partial. Two-node
    counts come from the vectorized group counter (global totals suffice:
    the per-node star24 - tile(two) corrections sum to
    Σstar24 - tile(Σtwo)); the star counter runs per node over dense
    neighbour codes (no per-node np.unique / mask loop)."""
    node = np.concatenate([p[0] for p in pieces])
    res = np.zeros((len(deltas), 32), np.int64)
    if len(node) == 0:
        return res
    nbr = np.concatenate([p[1] for p in pieces])
    dr = np.concatenate([p[2] for p in pieces]).astype(np.int64)
    t = np.concatenate([p[3] for p in pieces])
    e = np.concatenate([p[4] for p in pieces])
    two_tot = _two_node_group_counts(node, nbr, dr, t, e, deltas)
    order2, codes, starts, degs = _node_codes_and_order(node, nbr, dr, t, e)
    nd2, cd2, dr2, t2 = node[order2], codes[order2], dr[order2], t[order2]
    for i in range(len(starts) - 1):
        lo, hi = starts[i], starts[i + 1]
        for j, delta in enumerate(deltas):
            res[j, :24] += _star_count(cd2[lo:hi], dr2[lo:hi], t2[lo:hi],
                                       int(degs[i]), delta)
    for j in range(len(deltas)):
        res[j, :24] -= np.tile(two_tot[j], 3)
        res[j, 24:] += two_tot[j]
    return res


# ----------------------------------------------------------- triangle phase

@ray.remote
def _pair_split(block: pa.Table, n: int, P: int, member_ref):
    """Non-self events between k-core members, keyed by unordered pair
    pk = min*n + max, routed by hash(pk)."""
    if block.num_rows == 0 or "src" not in block.column_names:
        z = np.empty(0, np.int64)
        e = (z, np.empty(0, np.int8), z, z)
        return tuple([e] * P) if P > 1 else e
    member = ray.get(member_ref) if isinstance(member_ref, ray.ObjectRef) \
        else member_ref
    s = block["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = block["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = block["t"].to_numpy(zero_copy_only=False).astype(np.int64) \
        if "t" in block.column_names else np.zeros(len(s), np.int64)
    e = block["event_id"].to_numpy(zero_copy_only=False).astype(np.int64) \
        if "event_id" in block.column_names else np.arange(len(s))
    m = (s != d) & member[s] & member[d]
    s, d, t, e = s[m], d[m], t[m], e[m]
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    pk = lo * n + hi
    src_is_lo = (s == lo).astype(np.int8)
    bk = ((pk.astype(np.uint64) * _GOLD) >> np.uint64(33)) % np.uint64(P)
    order = np.argsort(bk, kind="stable")
    bounds = np.searchsorted(bk[order], np.arange(P + 1))
    out = []
    for p in range(P):
        sl = order[bounds[p]:bounds[p + 1]]
        out.append((pk[sl], src_is_lo[sl], t[sl], e[sl]))
    return tuple(out) if P > 1 else out[0]


@ray.remote
def _pair_merge(*pieces):
    """Pair partition: pk-sorted event arrays (pk, src_is_lo, t, eid)."""
    pk = np.concatenate([p[0] for p in pieces])
    sl = np.concatenate([p[1] for p in pieces])
    t = np.concatenate([p[2] for p in pieces])
    e = np.concatenate([p[3] for p in pieces])
    order = np.lexsort((e, t, pk))
    return (pk[order], sl[order], t[order], e[order])


@ray.remote
def _split_triples(triples, R: int):
    """Fan a triple block into R chunks so the per-triangle counting loops
    parallelize beyond the (adaptive, possibly small) wedge grid."""
    x, y, z = triples
    out = []
    for r in range(R):
        sl = slice(r, None, R)
        out.append((x[sl], y[sl], z[sl]))
    return tuple(out) if R > 1 else out[0]


@ray.remote
def _pair_subset_n(pair_part, n: int, *triple_pieces):
    """Ship ONLY the pair rows this triple partition's triangles touch
    (sorted-key range selection — the distributed semi-join)."""
    pk, sl, t, e = pair_part
    if len(pk) == 0:
        z = np.empty(0, np.int64)
        return (z, z.astype(np.int8), z, z)
    keys = []
    for p in triple_pieces:
        x, y, zz = p
        if len(x):
            keys += [x * n + y, x * n + zz, y * n + zz]
    if not keys:
        z = np.empty(0, np.int64)
        return (z, z.astype(np.int8), z, z)
    need = np.unique(np.concatenate(keys))
    lo = np.searchsorted(pk, need, side="left")
    hi = np.searchsorted(pk, need, side="right")
    take = np.concatenate([np.arange(a, b) for a, b in zip(lo, hi)]) \
        if len(need) else np.empty(0, np.int64)
    take = take.astype(np.int64)
    return (pk[take], sl[take], t[take], e[take])


@ray.remote
def _triple_motifs(deltas: tuple, n: int, triples, *subsets) -> np.ndarray:
    """One triple partition: merge its pair subsets, run the reference
    TriangleCounter per triangle → (len(deltas), 8) partial. Per-triangle
    event assembly is fully vectorized (one batched searchsorted over all
    3T pair keys, one ragged-arange gather, one global (triangle, t, e)
    lexsort, vectorized dir/uorv tagging) — only the O(m) reference
    counter itself runs per triangle."""
    res = np.zeros((len(deltas), 8), np.int64)
    x, y, z = triples
    if len(x) == 0:
        return res
    pk = np.concatenate([s[0] for s in subsets])
    sl = np.concatenate([s[1] for s in subsets]).astype(np.int64)
    t = np.concatenate([s[2] for s in subsets])
    e = np.concatenate([s[3] for s in subsets])
    order = np.lexsort((e, t, pk))
    pk, sl, t, e = pk[order], sl[order], t[order], e[order]
    T = len(x)
    xi = x.astype(np.int64)
    yi = y.astype(np.int64)
    zi = z.astype(np.int64)
    # reference mapping: w = largest (z), u = middle (y), v = smallest (x)
    keys = np.empty(3 * T, np.int64)
    keys[0::3] = xi * n + yi
    keys[1::3] = xi * n + zi
    keys[2::3] = yi * n + zi
    a = np.searchsorted(pk, keys, side="left")
    b = np.searchsorted(pk, keys, side="right")
    cnt = b - a
    total = int(cnt.sum())
    if total == 0:
        return res
    offs = np.cumsum(cnt) - cnt
    idx = np.arange(total, dtype=np.int64) - np.repeat(offs, cnt) \
        + np.repeat(a, cnt)
    trow = np.repeat(np.repeat(np.arange(T, dtype=np.int64), 3), cnt)
    kk, ss, tt, ee = pk[idx], sl[idx], t[idx], e[idx]
    order2 = np.lexsort((ee, tt, trow))
    kk, ss, tt, trow = kk[order2], ss[order2], tt[order2], trow[order2]
    yr, zr = yi[trow], zi[trow]
    kxy = xi[trow] * n + yr
    lo_n = kk // n
    hi_n = kk % n
    src = np.where(ss == 1, lo_n, hi_n)
    dst = np.where(ss == 1, hi_n, lo_n)
    uv = kk == kxy                       # events on the (u,v)=(y,x) edge
    dirs = np.zeros(total, np.int64)
    uorv = np.zeros(total, np.int64)
    # w-events (src or dst == z); reference tagging (dirs stays 0 for
    # w-src events)
    is_w_src = src == zr
    is_w_dst = dst == zr
    uorv[is_w_src] = np.where(dst[is_w_src] == yr[is_w_src], 0, 1)
    uorv[is_w_dst] = np.where(src[is_w_dst] == yr[is_w_dst], 0, 1)
    dirs[is_w_dst] = 1
    # uv events: src == u(y) → (uorv=1, dir=1); src == v(x) → (0, 0)
    on_u = src[uv] == yr[uv]
    dirs[uv] = np.where(on_u, 1, 0)
    uorv[uv] = np.where(on_u, 1, 0)
    starts = np.r_[0, np.flatnonzero(trow[1:] != trow[:-1]) + 1, total]
    uv_l = uv.tolist()
    s_l = uorv.tolist()
    d_l = dirs.tolist()
    t_l = tt.tolist()
    for i in range(len(starts) - 1):
        lo, hi = int(starts[i]), int(starts[i + 1])
        if hi - lo < 3:
            continue
        for j, delta in enumerate(deltas):
            res[j] += _triangle_count8(uv_l[lo:hi], s_l[lo:hi],
                                       d_l[lo:hi], t_l[lo:hi], delta)
    return res


# ------------------------------------------------------------- entry points

def temporal_three_node_motif_multi(gf, deltas) -> np.ndarray:
    """Global 40-vector per delta (temporal_three_node_motif_multi,
    global_temporal_three_node_motifs.rs:272-330)."""
    from raphtory_ray.algorithms import _bsp
    deltas = tuple(int(d) for d in deltas)
    refs = gf.edges.materialize().to_arrow_refs()
    P = max(4, min(32, len(refs) * 2))

    # ---- star phase
    splits = [_star_split.options(num_returns=P if P > 1 else 1)
              .remote(r, P) for r in refs]

    def piece(row, q):
        return row[q] if P > 1 else row

    star_futs = [_star_partial.remote(deltas, *[piece(s, q) for s in splits])
                 for q in range(P)]

    # ---- triangle phase
    g = _bsp(gf)           # reuses gf._bsp when built
    core = g.kcore_set(2)
    member = np.zeros(gf.n, dtype=bool)
    member[core] = True
    triples = _triangles_of(g, member)        # list of per-partition refs
    member_ref = ray.put(member)
    # pair partitions stay at P: an A/B at sf0.1 measured Pp=4 at 17.5s vs
    # Pp=32 at 6.3s — smaller pair partitions serialize the subset scans
    Pp = P
    psplits = [_pair_split.options(num_returns=Pp if Pp > 1 else 1)
               .remote(r, gf.n, Pp, member_ref) for r in refs]
    pair_parts = [_pair_merge.remote(*[piece(s, q) for s in psplits])
                  for q in range(Pp)]
    # fan triple blocks out to ~32 count tasks regardless of the (adaptive)
    # wedge grid size — the per-triangle counting loop is the hot part
    R = max(1, 32 // max(len(triples), 1))
    tchunks = []
    for tr in triples:
        parts = _split_triples.options(num_returns=R if R > 1 else 1)\
            .remote(tr, R)
        tchunks += list(parts) if R > 1 else [parts]
    Q = len(tchunks)
    subs = [[_pair_subset_n.remote(pair_parts[p], gf.n, tchunks[q])
             for p in range(Pp)] for q in range(Q)]
    tri_futs = [_triple_motifs.remote(deltas, gf.n, tchunks[q], *subs[q])
                for q in range(Q)]

    star = np.sum(ray.get(star_futs), axis=0)
    tri = np.sum(ray.get(tri_futs), axis=0) if tri_futs else \
        np.zeros((len(deltas), 8), np.int64)
    return np.concatenate([star, tri], axis=1)


def global_temporal_three_node_motif(gf, delta: int) -> np.ndarray:
    """40 global motif counts for one delta
    (global_temporal_three_node_motifs.rs:355-362)."""
    return temporal_three_node_motif_multi(gf, [delta])[0]


@ray.remote
def _star_partial_local(deltas: tuple, *pieces):
    """Per-node star/two-node counts: (vids, counts[nv, len(deltas), 32])
    (local_temporal_three_node_motifs.rs:348-390 star_motif_step)."""
    node = np.concatenate([p[0] for p in pieces])
    if len(node) == 0:
        return (np.empty(0, np.int64),
                np.zeros((0, len(deltas), 32), np.int64))
    nbr = np.concatenate([p[1] for p in pieces])
    dr = np.concatenate([p[2] for p in pieces]).astype(np.int64)
    t = np.concatenate([p[3] for p in pieces])
    e = np.concatenate([p[4] for p in pieces])
    vids, two_pn = _two_node_group_counts(node, nbr, dr, t, e, deltas,
                                          per_node=True)
    order2, codes, starts, degs = _node_codes_and_order(node, nbr, dr, t, e)
    nd2, cd2, dr2, t2 = node[order2], codes[order2], dr[order2], t[order2]
    assert np.array_equal(vids, nd2[starts[:-1]])
    out = np.zeros((len(vids), len(deltas), 32), np.int64)
    for i in range(len(starts) - 1):
        lo, hi = starts[i], starts[i + 1]
        for j, delta in enumerate(deltas):
            star24 = _star_count(cd2[lo:hi], dr2[lo:hi], t2[lo:hi],
                                 int(degs[i]), delta)
            out[i, j, :24] = star24 - np.tile(two_pn[i, j], 3)
            out[i, j, 24:] = two_pn[i, j]
    return vids, out


@ray.remote
def _triple_motifs_local(deltas: tuple, n: int, triples, *subsets):
    """Per-MEMBER triangle counts: each triangle contributes an 8-vector to
    each of its three nodes, tagged from that node's perspective
    (local_temporal_three_node_motifs.rs:182-330: uid = the counting node,
    v = the smaller / w = the larger of the other two)."""
    x, y, z = triples
    acc: dict[int, np.ndarray] = {}
    if len(x) == 0:
        return (np.empty(0, np.int64),
                np.zeros((0, len(deltas), 8), np.int64))
    pk = np.concatenate([s[0] for s in subsets])
    sl = np.concatenate([s[1] for s in subsets]).astype(np.int64)
    t = np.concatenate([s[2] for s in subsets])
    e = np.concatenate([s[3] for s in subsets])
    order = np.lexsort((e, t, pk))
    pk, sl, t, e = pk[order], sl[order], t[order], e[order]
    for i in range(len(x)):
        tri = sorted((int(x[i]), int(y[i]), int(z[i])))
        keys = (tri[0] * n + tri[1], tri[0] * n + tri[2],
                tri[1] * n + tri[2])
        segs = []
        for key in keys:
            a = np.searchsorted(pk, key, side="left")
            b = np.searchsorted(pk, key, side="right")
            if b > a:
                segs.append(np.arange(a, b))
        if not segs:
            continue
        idx = np.concatenate(segs)
        idx = idx[np.lexsort((e[idx], t[idx]))]
        kk, ss, tt = pk[idx], sl[idx], t[idx]
        lo_n = kk // n
        hi_n = kk % n
        src = np.where(ss == 1, lo_n, hi_n)
        dst = np.where(ss == 1, hi_n, lo_n)
        for u in tri:
            others = [m for m in tri if m != u]
            v, w = min(others), max(others)
            uv = (((src == u) & (dst == v)) | ((src == v) & (dst == u)))
            dirs = np.zeros(len(kk), np.int64)
            uorv = np.zeros(len(kk), np.int64)
            is_w_src = src == w
            is_w_dst = dst == w
            uorv[is_w_src] = np.where(dst[is_w_src] == u, 0, 1)
            dirs[is_w_src] = 0
            uorv[is_w_dst] = np.where(src[is_w_dst] == u, 0, 1)
            dirs[is_w_dst] = 1
            dirs[uv] = np.where(src[uv] == u, 1, 0)
            uorv[uv] = np.where(src[uv] == u, 1, 0)
            slot = acc.setdefault(u, np.zeros((len(deltas), 8), np.int64))
            for j, delta in enumerate(deltas):
                slot[j] += _triangle_count8(uv, uorv, dirs, tt, delta)
    vids = np.array(sorted(acc), dtype=np.int64)
    out = np.stack([acc[v] for v in vids]) if len(vids) else \
        np.zeros((0, len(deltas), 8), np.int64)
    return vids, out


def local_temporal_three_node_motifs(gf, deltas) -> np.ndarray:
    """(n, len(deltas), 40) per-node motif counts
    (local_temporal_three_node_motifs.rs temporal_three_node_motif). Same
    distribution as the global variant; partials land per node."""
    from raphtory_ray.algorithms import _bsp
    deltas = tuple(int(d) for d in deltas)
    refs = gf.edges.materialize().to_arrow_refs()
    P = max(4, min(32, len(refs) * 2))
    splits = [_star_split.options(num_returns=P if P > 1 else 1)
              .remote(r, P) for r in refs]

    def piece(row, q):
        return row[q] if P > 1 else row

    star_futs = [_star_partial_local.remote(
        deltas, *[piece(s, q) for s in splits]) for q in range(P)]

    g = _bsp(gf)           # reuses gf._bsp when built
    core = g.kcore_set(2)
    member = np.zeros(gf.n, dtype=bool)
    member[core] = True
    triples = _triangles_of(g, member)
    member_ref = ray.put(member)
    # pair partitions stay at P: an A/B at sf0.1 measured Pp=4 at 17.5s vs
    # Pp=32 at 6.3s — smaller pair partitions serialize the subset scans
    Pp = P
    psplits = [_pair_split.options(num_returns=Pp if Pp > 1 else 1)
               .remote(r, gf.n, Pp, member_ref) for r in refs]
    pair_parts = [_pair_merge.remote(*[piece(s, q) for s in psplits])
                  for q in range(Pp)]
    R = max(1, 32 // max(len(triples), 1))
    tchunks = []
    for tr in triples:
        parts = _split_triples.options(num_returns=R if R > 1 else 1)\
            .remote(tr, R)
        tchunks += list(parts) if R > 1 else [parts]
    Q = len(tchunks)
    subs = [[_pair_subset_n.remote(pair_parts[p], gf.n, tchunks[q])
             for p in range(Pp)] for q in range(Q)]
    tri_futs = [_triple_motifs_local.remote(deltas, gf.n, tchunks[q],
                                            *subs[q]) for q in range(Q)]

    out = np.zeros((gf.n, len(deltas), 40), np.int64)
    for vids, counts in ray.get(star_futs):
        out[vids, :, :32] += counts
    for vids, counts in ray.get(tri_futs):
        out[vids, :, 32:] += counts
    return out


def local_temporal_three_node_motif(gf, delta: int) -> np.ndarray:
    """(n, 40) per-node counts for one delta."""
    return local_temporal_three_node_motifs(gf, [delta])[:, 0, :]


def temporal_rich_club_coefficient(gf, views, k: int,
                                   window_size: int) -> float:
    """Temporal rich-club coefficient (Pedreschi/Battaglia/Barrat 2022;
    temporal_rich_club_coefficient.rs:59-117): over every run of
    ``window_size`` consecutive views, the density of the aggregate-graph
    rich club (distinct-neighbour degree ≥ k) edges that persist through
    the whole run; returns the max over runs.

    Per-view edge sets are distributed partial-dedups restricted to the
    rich club (a broadcast boolean mask); only the club-internal edge keys
    reach the driver — the club is small by construction (degree ≥ k)."""
    from raphtory_ray.algorithms import _bsp
    g = _bsp(gf)           # reuses gf._bsp when built
    s_k = np.flatnonzero(g.both_degree >= k)
    if len(s_k) <= 1:
        return 0.0
    member = np.zeros(gf.n, dtype=bool)
    member[s_k] = True
    member_ref = ray.put(member)
    n = gf.n

    def club_keys(view) -> np.ndarray:
        def part(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            mem = member if not isinstance(member_ref, ray.ObjectRef) \
                else ray.get(member_ref)
            m = (s != d) & mem[s] & mem[d]
            lo = np.minimum(s[m], d[m])
            hi = np.maximum(s[m], d[m])
            return pa.table({"key": pa.array(np.unique(lo * n + hi))})

        parts = [t["key"].to_numpy(zero_copy_only=False)
                 for t in view.edges.map_batches(
                     part, batch_format="pyarrow", zero_copy_batch=True)
                 .iter_batches(batch_format="pyarrow") if t.num_rows]
        return np.unique(np.concatenate(parts)) if parts \
            else np.empty(0, np.int64)

    sets = [club_keys(v) for v in views]
    best = 0.0
    poss = len(s_k) * (len(s_k) - 1) / 2
    for i in range(0, len(sets) - window_size + 1):
        stable = sets[i]
        for j in range(i + 1, i + window_size):
            stable = np.intersect1d(stable, sets[j], assume_unique=True)
        best = max(best, len(stable) / poss)
    return best


@ray.remote
def _probe_triples(Sq: pa.Table, n: int, *wedge_pieces: pa.Table):
    """Probe variant returning the closing triples (a, m, c), a<m<c."""
    s = Sq["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = Sq["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    keys = np.sort(s * n + d)
    outs = []
    for w in wedge_pieces:
        if w.num_rows == 0 or "a" not in w.column_names:
            continue
        wa = w["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        wm = w["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        wc = w["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        wkeys = wa * n + wc
        pos = np.searchsorted(keys, wkeys)
        pos[pos >= len(keys)] = max(len(keys) - 1, 0)
        hit = keys[pos] == wkeys if len(keys) else np.zeros(len(wkeys), bool)
        if hit.any():
            outs.append((wa[hit], wm[hit], wc[hit]))
    if not outs:
        z = np.empty(0, np.int64)
        return (z, z.copy(), z.copy())
    return (np.concatenate([o[0] for o in outs]),
            np.concatenate([o[1] for o in outs]),
            np.concatenate([o[2] for o in outs]))


def _triangles_of(g, member: np.ndarray) -> list:
    """Triangle triples (x<y<z) of the node-induced subgraph, one ref per
    probe partition — reuses the BspGraph wedge semi-join (shards.py
    triangle_counts) with a triple-returning probe."""
    from raphtory_ray.state import shards as S
    member_ref = ray.put(member)
    sub_refs = [_subgraph_und.remote(r, member_ref) for r in g.und_refs]
    # adaptive task grid, as in BspGraph.triangle_counts: ~35k oriented
    # edges per partition (P=4 on a 567k-edge graph measured 10-20x slower
    # than P=16 — wedge expansion under-parallelized), capped by CPUs
    cpus = int(ray.cluster_resources().get("CPU", 8))
    P = min(len(sub_refs), max(4, min(cpus, g.num_edges // 35_000)))
    if P == 1:
        Ssplit = [S._merge_concat.remote(
            *[S._orient_split.remote(r, 1, "src") for r in sub_refs])]
        Dsplit = [S._merge_concat.remote(
            *[S._orient_split.remote(r, 1, "dst") for r in sub_refs])]
        wparts = [[S._wedge_split.remote(Dsplit[0], Ssplit[0], 1,
                                         262_144)]]
    else:
        so = [S._orient_split.options(num_returns=P).remote(r, P, "src")
              for r in sub_refs]
        do = [S._orient_split.options(num_returns=P).remote(r, P, "dst")
              for r in sub_refs]
        Ssplit = [S._merge_concat.remote(*[sp[p] for sp in so])
                  for p in range(P)]
        Dsplit = [S._merge_concat.remote(*[sp[p] for sp in do])
                  for p in range(P)]
        w = [S._wedge_split.options(num_returns=P).remote(
            Dsplit[p], Ssplit[p], P, 262_144) for p in range(P)]
        wparts = [[w[p][q] for p in range(P)] for q in range(P)]
    return [_probe_triples.remote(Ssplit[q], len(member), *wparts[q])
            for q in range(P)]


@ray.remote
def _subgraph_und(block: pa.Table, member) -> pa.Table:
    member = ray.get(member) if isinstance(member, ray.ObjectRef) else member
    s = block["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = block["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = member[s] & member[d]
    return pa.table({"src": pa.array(s[m]), "dst": pa.array(d[m])})
