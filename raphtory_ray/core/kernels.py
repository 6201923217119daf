"""Pure-numpy graph kernels — the vectorized per-partition compute core.

Every distributed algorithm in ``raphtory_ray.algorithms`` decomposes into
these kernels applied per edge-block (inside Ray tasks / ``map_batches``)
plus tiny driver-side combines. They are also the single-partition reference
implementation the conformance tests (FIXTURES.md) run against.

Semantics mirror the reference engine exactly:

- distinct-neighbour degree rules (self-loop counts once, reciprocal pair
  counts once for BOTH):  /root/reference/raphtory-core/src/entities/nodes/structure/adj.rs:96-119
- PageRank recurrence, sink mass, tol*n L1/L2 stopping rule:
  /root/reference/raphtory/src/algorithms/centrality/pagerank.rs:55-179
- sync LPA with (count, label) max tie-break, stop on zero changes:
  /root/reference/raphtory/src/algorithms/community_detection/label_propagation.rs:40-112
- triangle count via s<t forward-neighbour intersection after 2-core peel:
  /root/reference/raphtory/src/algorithms/motifs/triangle_count.rs:64-116
- k-core: alive iff >= k alive distinct (BOTH) neighbours:
  /root/reference/raphtory/src/algorithms/cores/k_core.rs:41-101

All functions take dense int64 vertex ids in [0, n) (see core.ids for the
dict-encoding that produces them) and a directed edge *event* list; functions
that need simple edges dedup internally unless told the input is pre-deduped.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "dedup_pairs",
    "undirected_pairs",
    "out_degree",
    "in_degree",
    "both_degree",
    "pagerank",
    "pagerank_superstep",
    "wcc",
    "lpa",
    "lpa_superstep",
    "kcore_set",
    "triangle_counts",
    "triplet_count",
    "local_clustering",
    "hits",
]


def _as_i64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int64))


def dedup_pairs(src, dst) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (src, dst) pairs, sorted by (src, dst).

    Mirrors adjacency-insert uniqueness (adj.rs:60-69): repeated temporal
    events on one (src, dst) collapse to a single simple edge.
    """
    src, dst = _as_i64(src), _as_i64(dst)
    if len(src) == 0:
        return src, dst
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    keep = np.empty(len(s), dtype=bool)
    keep[0] = True
    np.not_equal(s[1:], s[:-1], out=keep[1:])
    keep[1:] |= d[1:] != d[:-1]
    return s[keep], d[keep]


def undirected_pairs(src, dst) -> tuple[np.ndarray, np.ndarray]:
    """Distinct neighbour pairs (u, v) with both orientations present;
    a self-loop (u, u) appears exactly once.

    Row (u, v) present means "v is a neighbour of u" under the reference's
    deduplicated in∪out union (node.rs:306-315).
    """
    src, dst = _as_i64(src), _as_i64(dst)
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    return dedup_pairs(u, v)


def out_degree(src, dst, n: int) -> np.ndarray:
    s, _ = dedup_pairs(src, dst)
    return np.bincount(s, minlength=n).astype(np.int64)


def in_degree(src, dst, n: int) -> np.ndarray:
    _, d = dedup_pairs(src, dst)
    return np.bincount(d, minlength=n).astype(np.int64)


def both_degree(src, dst, n: int) -> np.ndarray:
    """Distinct-neighbour BOTH degree: |in ∪ out| with self-loop counted once,
    reciprocal pair counted once (adj.rs:105-119)."""
    u, _ = undirected_pairs(src, dst)
    return np.bincount(u, minlength=n).astype(np.int64)


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def pagerank_superstep(
    src: np.ndarray,
    dst: np.ndarray,
    prev: np.ndarray,
    outdeg: np.ndarray,
    n: int,
    damping: float,
) -> np.ndarray:
    """One PageRank superstep over (pre-deduped) directed simple edges.

    new_i = (1-d)/n + d * Σ_{j in in(i)} prev_j / outdeg_j + d * sinkmass / n
    where sinkmass = Σ prev_j over outdeg_j == 0 (pagerank.rs:88-156).
    The per-block distributed version computes only the bincount term.
    """
    contrib = np.bincount(dst, weights=prev[src] / outdeg[src], minlength=n)
    sink = prev[outdeg == 0].sum()
    return (1.0 - damping) / n + damping * contrib + (damping / n) * sink


def pagerank(
    src,
    dst,
    n: int,
    damping: float = 0.85,
    iter_count: int = 20,
    tol: float = 1e-6,
    use_l2_norm: bool = True,
) -> tuple[np.ndarray, int]:
    """Reference-exact PageRank. Returns (scores, iterations_run).

    Stops after the first iteration whose diff norm (L2: sqrt(Σ(prev-curr)²),
    else L1: Σ|prev-curr|) is <= tol * n, or after ``iter_count`` iterations
    (pagerank.rs:143-156 Job::Check).
    """
    src, dst = dedup_pairs(src, dst)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    prev = np.full(n, 1.0 / n)
    it = 0
    for it in range(1, iter_count + 1):
        cur = pagerank_superstep(src, dst, prev, outdeg, n, damping)
        diff = cur - prev
        norm = float(np.sqrt(np.square(diff).sum())) if use_l2_norm else float(np.abs(diff).sum())
        prev = cur
        if norm <= tol * n:
            break
    return prev, it


# ---------------------------------------------------------------------------
# Connected components
# ---------------------------------------------------------------------------

def wcc(src, dst, n: int) -> np.ndarray:
    """Weakly connected components; label = min vertex id in the component
    (connected_components.rs:20-121 — label is min node position).

    Local kernel: hash-min propagation with pointer doubling; O(E · log n).
    """
    label = np.arange(n, dtype=np.int64)
    s, d = dedup_pairs(src, dst)
    while True:
        prev = label.copy()
        np.minimum.at(label, d, label[s])
        np.minimum.at(label, s, label[d])
        while True:  # pointer doubling to the current root
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(prev, label):
            return label


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------

def lpa_superstep(
    und_u: np.ndarray,
    und_v: np.ndarray,
    prev: np.ndarray,
    n: int,
) -> np.ndarray:
    """One synchronous LPA superstep (label_propagation.rs:60-84).

    For each node: counts = {prev_self: 1} + one count per distinct undirected
    neighbour's prev label (self-loop ⇒ self appears among neighbours too).
    New label = argmax by (count, then label).

    ``und_u``/``und_v`` are the deduplicated undirected neighbour pairs from
    :func:`undirected_pairs`.
    """
    # neighbour label votes: (node=und_u, label=prev[und_v]) each weight 1
    # plus self vote (node=i, label=prev[i]) weight 1.
    nodes = np.concatenate([und_u, np.arange(n, dtype=np.int64)])
    labels = np.concatenate([prev[und_v], prev])
    # aggregate counts per (node, label)
    order = np.lexsort((labels, nodes))
    nodes, labels = nodes[order], labels[order]
    boundary = np.empty(len(nodes), dtype=bool)
    boundary[0] = True
    boundary[1:] = (nodes[1:] != nodes[:-1]) | (labels[1:] != labels[:-1])
    idx = np.flatnonzero(boundary)
    g_nodes = nodes[idx]
    g_labels = labels[idx]
    g_counts = np.diff(np.append(idx, len(nodes)))
    # per node pick max by (count, label): lexsort ascending, take last per node
    order2 = np.lexsort((g_labels, g_counts, g_nodes))
    g_nodes, g_labels = g_nodes[order2], g_labels[order2]
    last = np.empty(len(g_nodes), dtype=bool)
    last[-1] = True
    last[:-1] = g_nodes[1:] != g_nodes[:-1]
    out = prev.copy()
    out[g_nodes[last]] = g_labels[last]
    return out


def lpa(src, dst, n: int, iter_count: int = 20, labels: np.ndarray | None = None,
        until_converged: bool = True) -> tuple[np.ndarray, int]:
    """Synchronous label propagation. Returns (labels, iterations_run).

    Initial label defaults to the node id (= node position, matching
    label_propagation.rs:53-57). Stops when an iteration changes no label,
    or after ``iter_count`` iterations.
    """
    und_u, und_v = undirected_pairs(src, dst)
    prev = np.arange(n, dtype=np.int64) if labels is None else labels.astype(np.int64).copy()
    it = 0
    for it in range(1, iter_count + 1):
        cur = lpa_superstep(und_u, und_v, prev, n)
        if until_converged and np.array_equal(cur, prev):
            prev = cur
            break
        prev = cur
    return prev, it


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------

def kcore_set(src, dst, n: int, k: int, iter_count: int = 10**9) -> np.ndarray:
    """Boolean alive mask of the k-core (k_core.rs:41-101).

    alive_0 = BOTH-degree >= k; then alive_{t+1} = (# alive distinct
    neighbours) >= k, iterated to fixpoint.
    """
    und_u, und_v = undirected_pairs(src, dst)
    alive = both_degree(src, dst, n) >= k
    it = 0
    while it < iter_count:
        it += 1
        cnt = np.bincount(und_u[alive[und_v]], minlength=n)
        new_alive = alive & (cnt >= k)
        if np.array_equal(new_alive, alive):
            break
        alive = new_alive
    return alive


# ---------------------------------------------------------------------------
# Triangles
# ---------------------------------------------------------------------------

def _forward_csr(und_u: np.ndarray, und_v: np.ndarray, n: int):
    """CSR of forward neighbours N>(u) = {v in neighbours(u) : u < v}
    (triangle_count.rs:80-83), sorted within each row."""
    mask = und_u < und_v  # also drops self-loops
    fu, fv = und_u[mask], und_v[mask]
    order = np.lexsort((fv, fu))
    fu, fv = fu[order], fv[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(fu, minlength=n), out=indptr[1:])
    return indptr, fv, fu


def triangle_counts(src, dst, n: int, chunk: int = 1 << 20) -> tuple[int, np.ndarray]:
    """(global_count, per_node_count) exact triangle counts.

    Method: orient undirected simple edges u<v, then for each oriented edge
    (a, b) probe wedges (a, c) for c in N>(b) against the oriented edge set —
    each triangle a<b<c is found exactly once, at edge (a, b) with witness c.
    Vectorized: wedge generation by repeat/tile, membership via searchsorted
    over sorted 128-bit-safe keys. Equivalent to the reference's per-node
    forward-set intersections (triangle_count.rs:85-100).
    """
    und_u, und_v = undirected_pairs(src, dst)
    indptr, fv, fu = _forward_csr(und_u, und_v, n)
    m = len(fv)
    local = np.zeros(n, dtype=np.int64)
    total = 0
    if m == 0:
        return 0, local
    # sorted key set for membership probes; n <= ~3e9 keeps a*n+b in int64 —
    # guard and fall back to 2-column searchsorted if larger
    assert n < (1 << 31), "key packing assumes n < 2^31; switch to 128-bit keys"
    keys = fu * n + fv  # lexsorted already ⇒ keys sorted
    # process oriented edges (a, b) in chunks to bound wedge memory
    bdeg = (indptr[1:] - indptr[:-1])  # |N>(x)|
    for start in range(0, m, chunk):
        a = fu[start:start + chunk]
        b = fv[start:start + chunk]
        reps = bdeg[b]
        if reps.sum() == 0:
            continue
        wa = np.repeat(a, reps)
        # gather N>(b) contiguously: build index ranges
        wb = np.repeat(b, reps)
        # index into fv rows of b: offsets within each b-row
        row_start = np.repeat(indptr[b], reps)
        within = np.arange(len(wa)) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        wc = fv[row_start + within]
        wkeys = wa * n + wc
        pos = np.searchsorted(keys, wkeys)
        pos[pos >= len(keys)] = len(keys) - 1
        hit = keys[pos] == wkeys
        total += int(hit.sum())
        if hit.any():
            local += np.bincount(wa[hit], minlength=n)
            local += np.bincount(wb[hit], minlength=n)
            local += np.bincount(wc[hit], minlength=n)
    return total, local


def triplet_count(src, dst, n: int) -> int:
    """Σ_v C(distinct-neighbour degree excluding self, 2)
    (triplet_count.rs:83-113; self-loop neighbour excluded from the choose)."""
    und_u, und_v = undirected_pairs(src, dst)
    mask = und_u != und_v
    deg = np.bincount(und_u[mask], minlength=n).astype(np.int64)
    return int((deg * (deg - 1) // 2).sum())


def local_clustering(src, dst, n: int) -> np.ndarray:
    """Per-node clustering coefficient: triangles(v) / C(deg_v, 2), 0 when
    deg < 2; deg = distinct neighbours excluding self
    (clustering_coefficient/local.rs semantics)."""
    _, tri = triangle_counts(src, dst, n)
    und_u, und_v = undirected_pairs(src, dst)
    mask = und_u != und_v
    deg = np.bincount(und_u[mask], minlength=n).astype(np.float64)
    denom = deg * (deg - 1) / 2.0
    out = np.zeros(n, dtype=np.float64)
    nz = denom > 0
    out[nz] = tri[nz] / denom[nz]
    return out


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

def hits(src, dst, n: int, iter_count: int = 20, tol: float = 0.01) -> tuple[np.ndarray, np.ndarray, int]:
    """Hub/authority scores with REFERENCE normalization (hits.rs:53-158):
    per iteration recv_hub_i = Σ_{j→i} hub_j, recv_auth_i = Σ_{i→j} auth_j
    (previous values); auth = recv_hub / Σ recv_hub and
    hub = recv_auth / Σ recv_auth (sum-normalized, NOT L2 — hits.rs:104-110);
    stop when max |Δhub| ≤ tol AND max |Δauth| ≤ tol (reference fixes
    tol = 0.01, hits.rs:128-140). Returns (hubs, auths, iterations)."""
    s, d = dedup_pairs(src, dst)
    hub = np.ones(n)
    auth = np.ones(n)
    it = 0
    for it in range(1, iter_count + 1):
        recv_hub = np.bincount(d, weights=hub[s], minlength=n)
        recv_auth = np.bincount(s, weights=auth[d], minlength=n)
        th, ta = recv_hub.sum(), recv_auth.sum()
        new_auth = recv_hub / th if th > 0 else recv_hub
        new_hub = recv_auth / ta if ta > 0 else recv_auth
        md_h = np.abs(new_hub - hub).max(initial=0.0)
        md_a = np.abs(new_auth - auth).max(initial=0.0)
        hub, auth = new_hub, new_auth
        if md_h <= tol and md_a <= tol:
            break
    return hub, auth, it
