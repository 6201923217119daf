"""Louvain community detection + modularity.

Reference semantics: algorithms/community_detection/louvain.rs:27-81 (outer
aggregate loop over inner local-move passes, move accepted when
delta > tol) and modularity.rs ModularityUnDir:
- the graph is treated as an undirected multigraph over its DIRECTED simple
  edges: every directed edge (u, v) contributes its weight to BOTH
  endpoints' k and both adjacency lists (node.edges() iterates in+out);
- per directed simple edge the weight is the LATEST event's value
  (e.properties().get(w) resolves the temporal prop to its last value);
- self-loops are excluded from adj/k (modularity.rs:195,220) but counted in
  the node's own community weight (modularity.rs:234-239);
- move_delta (modularity.rs:260-277):
  ((2(a_new − a_old_excl)) − r·2(k_u(K_new − K_old) + k_u²)/m2)/m2;
- value() (modularity.rs:390-404): e/m2 − r·Σ K_c²/m2², with m2 = Σ k
  (self-loop weights excluded from k, hence from m2 — reference quirk,
  mirrored exactly).

Execution split (Ray-Data-first): the 100-TB-heavy step — reducing the edge
EVENT log to the weighted simple-edge graph — is a distributed hash shuffle
on (src, dst) with per-partition latest-event resolution (same partitioning
as GraphFrame.filter_edges). The multi-level local-move refinement then runs
on the driver over the (much smaller) simple-edge graph with fully
vectorized numpy passes — the reference's own louvain is a sequential
single-thread loop (louvain.rs:44-71), so this matches its scalability
class while the event→edge reduction, the expensive part at scale, streams.
Parallel-move correctness: moves are applied Jacobi-style per pass; the
singleton-swap guard (only let a singleton join a singleton with a smaller
community id) prevents the classic two-node oscillation, and passes are
capped. Like the reference (rng shuffle, louvain.rs:47), output labels are
a local optimum, not a canonical partition — tests assert invariants.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_GOLD = np.uint64(0x9E3779B97F4A7C15)


# --------------------------------------------------------------- reduction

@ray.remote
def _lv_split(block: pa.Table, P: int, weighted: bool):
    """Route events by hash(src, dst); emit only (src, dst, t, event_id, w)
    as numpy for cheap transport."""
    if block.num_rows == 0 or "src" not in block.column_names:
        z = np.empty(0, np.int64)
        e = (z, z, z, z, np.empty(0, np.float64))
        return tuple([e] * P) if P > 1 else e
    s = block["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = block["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    t = block["t"].to_numpy(zero_copy_only=False).astype(np.int64) \
        if "t" in block.column_names else np.zeros(len(s), np.int64)
    ei = block["event_id"].to_numpy(zero_copy_only=False).astype(np.int64) \
        if "event_id" in block.column_names else np.zeros(len(s), np.int64)
    w = block["w"].to_numpy(zero_copy_only=False).astype(np.float64) \
        if weighted else np.ones(len(s), np.float64)
    key = (s.astype(np.uint64) * _GOLD) ^ d.astype(np.uint64)
    bk = (((key * _GOLD) >> np.uint64(33)) % np.uint64(P)).astype(np.int64)
    order = np.argsort(bk, kind="stable")
    bounds = np.searchsorted(bk[order], np.arange(P + 1))
    out = []
    for p in range(P):
        sl = order[bounds[p]:bounds[p + 1]]
        out.append((s[sl], d[sl], t[sl], ei[sl], w[sl]))
    return tuple(out) if P > 1 else out[0]


@ray.remote
def _lv_latest(*pieces):
    """One (src,dst) partition: latest-event weight per directed simple
    edge (lexsort by (event_id, t) within edge; keep last)."""
    s = np.concatenate([p[0] for p in pieces])
    if len(s) == 0:
        return (s, s.copy(), np.empty(0, np.float64))
    d = np.concatenate([p[1] for p in pieces])
    t = np.concatenate([p[2] for p in pieces])
    ei = np.concatenate([p[3] for p in pieces])
    w = np.concatenate([p[4] for p in pieces])
    order = np.lexsort((ei, t, d, s))
    s, d, w = s[order], d[order], w[order]
    last = np.r_[(s[1:] != s[:-1]) | (d[1:] != d[:-1]), True]
    return (s[last], d[last], w[last])


def latest_weight_edges(gf, weight_col: str | None):
    """(src, dst, w) of the directed simple-edge graph, w = latest event's
    ``weight_col`` (1.0 when None). Distributed shuffle + per-partition
    reduce; only the reduced simple edges land on the driver."""
    cols = ["src", "dst"]
    sch = gf.edges.schema()
    for c in ("t", "event_id"):
        if c in sch.names:
            cols.append(c)
    weighted = weight_col is not None
    ds = gf.edges
    if weighted:
        if weight_col != "w":
            def ren(b: pa.Table) -> pa.Table:
                return pa.table({**{c: b[c] for c in cols},
                                 "w": b[weight_col]})
            ds = ds.map_batches(ren, batch_format="pyarrow",
                                zero_copy_batch=True)
        else:
            ds = ds.select_columns(cols + ["w"])
    else:
        ds = ds.select_columns(cols)
    refs = ds.materialize().to_arrow_refs()
    P = max(4, min(32, len(refs) * 2))
    splits = [_lv_split.options(num_returns=P if P > 1 else 1)
              .remote(r, P, weighted) for r in refs]

    def piece(row, q):
        return row[q] if P > 1 else row

    parts = ray.get([_lv_latest.remote(*[piece(r, q) for r in splits])
                     for q in range(P)])
    s = np.concatenate([p[0] for p in parts]) if parts else np.empty(0, np.int64)
    d = np.concatenate([p[1] for p in parts]) if parts else np.empty(0, np.int64)
    w = np.concatenate([p[2] for p in parts]) if parts else np.empty(0, np.float64)
    return s, d, w


# ------------------------------------------------------------ local moves

def _group_sum(codes: np.ndarray, w: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n, np.float64)
    np.add.at(out, codes, w)
    return out


def _one_level(u, v, w, self_w, k, n, resolution, tol, rng, max_passes=64):
    """Vectorized local-move passes over one level's undirected half-edge
    list (u, v, w): each pass computes every node's best candidate community
    (modularity.rs move_delta) and applies all improving moves at once.
    Returns (com, moved_any). ``self_w`` is per-node self-loop weight
    (excluded from k per the reference)."""
    com = np.arange(n, dtype=np.int64)
    m2 = float(k.sum())
    if m2 <= 0 or len(u) == 0:
        return com, False
    moved_any = False
    prev_com = com.copy()
    prev_gain = np.inf
    stall = 0
    # active-set pruning: after the first pass, only nodes adjacent to a
    # mover (or movers themselves) can discover a better community, so
    # later passes sort/score only that shrinking edge subset (classic
    # sequential-Louvain queue optimization, vectorized)
    active = np.ones(n, dtype=bool)
    # random per-pass tie-perturbation stands in for the reference's node
    # shuffle (louvain.rs:52): symmetric ties break arbitrarily, not by id
    for _ in range(max_passes):
        k_com = _group_sum(com, k, n)
        au = active[u]
        u_a, v_a, w_a = u[au], v[au], w[au]
        if len(u_a) == 0:
            break
        cv = com[v_a]
        # per (u, com(v)) neighbour-community weights, self-edges excluded
        # at construction; sort once, segment-reduce
        order = np.lexsort((cv, u_a))
        uu, cc, ww = u_a[order], cv[order], w_a[order]
        seg = np.r_[True, (uu[1:] != uu[:-1]) | (cc[1:] != cc[:-1])]
        sidx = np.flatnonzero(seg)
        su = uu[sidx]
        sc = cc[sidx]
        sw = np.add.reduceat(ww, sidx)
        # weight from u to its OWN community, minus nothing (adj excludes
        # self-loops already): a_old_excl
        own = sc == com[su]
        a_old = np.zeros(n, np.float64)
        a_old[su[own]] = sw[own]
        # candidate deltas for sc != com[su]
        cand = ~own
        cu, ccand, cw = su[cand], sc[cand], sw[cand]
        a = 2.0 * (cw - a_old[cu])
        p = 2.0 * (k[cu] * (k_com[ccand] - k_com[com[cu]]) + k[cu] ** 2)
        delta = (a - resolution * p / m2) / m2
        good = delta > tol
        if not np.any(good):
            break
        cu, ccand, delta = cu[good], ccand[good], delta[good]
        # best move per node: argmax delta (ties → random perturbation)
        jitter = rng.random(len(delta)) * 1e-15
        order2 = np.lexsort((delta + jitter, cu))
        last = np.r_[cu[order2][1:] != cu[order2][:-1], True]
        bu = cu[order2][last]
        bc = ccand[order2][last]
        # singleton-swap guard: if both u's community and the target are
        # singletons, only move toward the smaller community id (prevents
        # A<->B oscillation under Jacobi-parallel application)
        sizes = np.bincount(com, minlength=n)
        swap = (sizes[com[bu]] == 1) & (sizes[bc] == 1) & (bc > com[bu])
        # no-return rule: a node may not move back to the community it was
        # in one pass ago — kills 2-cycles under Jacobi application
        ret = prev_com[bu] == bc
        drop = swap | ret
        gain = float(delta[order2][last][~drop].sum()) if len(bu) else 0.0
        bu, bc = bu[~drop], bc[~drop]
        if len(bu) == 0:
            break
        prev_com = com.copy()
        com[bu] = bc
        moved_any = True
        moved = np.zeros(n, dtype=bool)
        moved[bu] = True
        active = np.zeros(n, dtype=bool)
        active[bu] = True
        active[u[moved[v]]] = True        # neighbours of movers
        # stagnation cutoff: longer limit cycles repeat the same gain; a
        # genuine refinement strictly shrinks it pass over pass
        if gain >= prev_gain * 0.999:
            stall += 1
            if stall >= 3:
                break
        else:
            stall = 0
        prev_gain = gain
        # trickle cutoff: when fewer than 0.2% of nodes still move, the
        # modularity gain left in this level is negligible — aggregate
        # (standard Louvain practice; keeps level-0 from spending 60+
        # passes on stragglers)
        if len(bu) < max(8, n // 500):
            break
    return com, moved_any


def _aggregate(u, v, w, self_w, k, com):
    """Coarse-grain to communities (modularity.rs aggregate()): compact
    labels; new half-edges = inter-community sums; new self-loops =
    intra-community sums (old self-loops fold in); new k = k_com."""
    uniq, inv = np.unique(com, return_inverse=True)
    nc = len(uniq)
    cu, cv = inv[u], inv[v]
    inter = cu != cv
    # half-edge list is symmetric, so inter sums stay symmetric
    key = cu[inter].astype(np.int64) * nc + cv[inter]
    order = np.argsort(key, kind="stable")
    kk = key[order]
    seg = np.r_[True, kk[1:] != kk[:-1]]
    sw = np.add.reduceat(w[inter][order], np.flatnonzero(seg))
    nu = (kk[seg] // nc).astype(np.int64)
    nv = (kk[seg] % nc).astype(np.int64)
    # intra-community: old half-edges inside + old self-loops.
    # half-edges count each undirected inside-pair twice (u→v and v→u),
    # matching the reference where aggregate() sums adj_com over members
    # and the new self-loop is neighbours.get(own) (modularity.rs:344-374)
    new_self = np.zeros(nc, np.float64)
    np.add.at(new_self, cu[~inter], w[~inter])
    np.add.at(new_self, inv, self_w)
    new_k = np.zeros(nc, np.float64)
    np.add.at(new_k, inv, k)
    return inv, nu, nv, sw, new_self, new_k, nc


def louvain(gf, resolution: float = 1.0, weight_col: str | None = None,
            tol: float | None = None, seed: int | None = None) -> np.ndarray:
    """Community id per vid (louvain.rs:27-81). Deterministic for a given
    ``seed``; like the reference, the partition is a local optimum."""
    tol = 1e-8 if tol is None else tol
    rng = np.random.default_rng(0 if seed is None else seed)
    s, d, w = latest_weight_edges(gf, weight_col)
    n = gf.n
    # drop sub-tolerance weights (modularity.rs:200 filter w >= tol)
    keep = w >= tol
    s, d, w = s[keep], d[keep], w[keep]
    loop = s == d
    self_w = np.zeros(n, np.float64)
    np.add.at(self_w, s[loop], w[loop])
    s, d, w = s[~loop], d[~loop], w[~loop]
    # undirected half-edges: every directed simple edge seen from both ends
    u = np.concatenate([s, d])
    v = np.concatenate([d, s])
    hw = np.concatenate([w, w])
    k = np.zeros(n, np.float64)
    np.add.at(k, u, hw)

    global_com = np.arange(n, dtype=np.int64)
    nn = n
    while True:
        com, moved = _one_level(u, v, hw, self_w, k, nn, resolution, tol, rng)
        if not moved:
            break
        inv, u, v, hw, self_w, k, nn = _aggregate(u, v, hw, self_w, k, com)
        global_com = inv[com[global_com]]
    # compact final labels
    _, out = np.unique(global_com, return_inverse=True)
    return out.astype(np.int64)


def modularity(gf, com: np.ndarray, resolution: float = 1.0,
               weight_col: str | None = None, tol: float = 1e-8) -> float:
    """Modularity of a partition (modularity.rs value(): e/m2 − r·ΣK²/m2²,
    k and m2 exclude self-loop weights; e includes them)."""
    s, d, w = latest_weight_edges(gf, weight_col)
    keep = w >= tol
    s, d, w = s[keep], d[keep], w[keep]
    loop = s == d
    self_w_sum_by_com = np.zeros(int(com.max()) + 1 if len(com) else 1,
                                 np.float64)
    np.add.at(self_w_sum_by_com, com[s[loop]], w[loop])
    s2, d2, w2 = s[~loop], d[~loop], w[~loop]
    u = np.concatenate([s2, d2])
    v = np.concatenate([d2, s2])
    hw = np.concatenate([w2, w2])
    k = np.zeros(gf.n, np.float64)
    np.add.at(k, u, hw)
    m2 = float(k.sum())
    if m2 <= 0:
        return 0.0
    intra = float(hw[com[u] == com[v]].sum()) + float(self_w_sum_by_com.sum())
    k_com = np.zeros(int(com.max()) + 1, np.float64)
    np.add.at(k_com, com, k)
    return intra / m2 - resolution * float((k_com ** 2).sum()) / (m2 ** 2)
