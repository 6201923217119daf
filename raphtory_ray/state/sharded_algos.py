"""Actor-sharded supersteps for WCC / LPA / k-core / HITS.

Round-1 gap: only PageRank had the at-scale actor path; WCC/LPA/k-core/HITS
``ray.put`` a full O(V) state array from the driver every superstep
(state/shards.py). Here vertex state lives IN partition actors, exactly like
``actor_engine.PRShard``:

- each worker actor owns a stripe of the P hash partitions
  (``_part_of(v) % P``) and holds the label/alive/score slice for its vids;
- topology is the same src-OWNED undirected blocks ``BspGraph.und_refs``
  (HITS additionally uses both directed orientations), pinned once;
- a superstep is one actor-call round: every actor zero-copy-reads the P
  state slices from plasma, gathers neighbour values through a precomputed
  (partition-grouped, int32) index, segment-reduces per owned vertex, and
  publishes its new slice. The driver handles O(P) refs + scalar
  convergence counters per superstep — never O(V) data.

Semantics are bit-identical to the task path (contract-tested in
tests/test_sharded_algos.py):

- wcc   — hash-min: new[u] = min(label[u], min label(nbrs)) until no change
          (connected_components.rs contract: label = min vid in component).
          No driver pointer-doubling: min labels propagate hop-by-hop, so
          rounds = eccentricity of the min vertex instead of log(diameter);
          final labels identical.
- lpa   — synchronous votes incl. self-vote, ties by (count, largest label)
          (label_propagation.rs:84-95).
- k-core— iterate alive &= (#alive nbrs >= k) to fixpoint.
- hits  — recv sums + sum-normalization + max-diff<=tol stop (hits.rs:53-158);
          scores match the task path to float tolerance (summation grouping).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from raphtory_ray.state.actor_engine import (_index_in, _owned_vids,
                                             _part_of, _pos_in_partition)


class _GatherCombine:
    """Static gather/combine structure over an actor's edge rows.

    Rows are (own, gth) pairs where every ``own`` endpoint is owned by this
    actor. Per superstep: values of the ``gth`` endpoints are gathered from
    the P published state slices (rows pre-grouped by gth's owner partition,
    contiguous per-partition fancy-gathers), permuted back to own-sorted
    order, and segment-reduced per owned vertex. Mirrors PRShard's layout
    (actor_engine.py:83-103) with the roles parameterized."""

    def __init__(self, own: np.ndarray, gth: np.ndarray, P: int,
                 pos: np.ndarray, owned: np.ndarray):
        self.P = P
        g_part = _part_of(gth, P)
        gorder = np.argsort(g_part, kind="stable")
        self.gather_bounds = np.searchsorted(g_part[gorder], np.arange(P + 1))
        o_g, g_g = own[gorder], gth[gorder]
        gp = pos[g_g]
        self.gth_idx_g = gp.astype(np.int32) \
            if (len(gp) == 0 or gp.max(initial=0) < 2**31) else gp
        oorder = np.argsort(o_g, kind="stable")
        self.perm = oorder.astype(np.int32) if len(o_g) < 2**31 else oorder
        o_sorted = o_g[oorder]
        # gathered-endpoint VIDs in own-sorted row order — seeds the
        # delta-path row cache locally (initial label ≡ vid), so the
        # owned-delta algorithms start with ZERO transport
        self.gth_sorted = g_g[oorder]
        self.uo, self.start = np.unique(o_sorted, return_index=True)
        self.own_local = _index_in(owned, self.uo) if len(self.uo) \
            else np.empty(0, np.int64)
        # per-row local index of the owning vertex (LPA vote keys)
        self._row_own_local = None
        self._o_sorted = o_sorted
        self._bufs: dict = {}
        self._dx = None

    @property
    def row_own_local(self) -> np.ndarray:
        if self._row_own_local is None:
            seg_len = np.diff(np.r_[self.start, len(self._o_sorted)])
            self._row_own_local = np.repeat(self.own_local, seg_len)
        return self._row_own_local

    def gather(self, slices: list, dtype) -> np.ndarray:
        """Neighbour values for every row, own-sorted order. Buffers reused
        across supersteps (one pair per dtype)."""
        nrows = len(self.gth_idx_g)
        key = np.dtype(dtype).str
        if key not in self._bufs:
            self._bufs[key] = (np.empty(nrows, dtype),
                               np.empty(nrows, dtype))
        w, w2 = self._bufs[key]
        for q in range(self.P):
            lo, hi = self.gather_bounds[q], self.gather_bounds[q + 1]
            if hi > lo:
                w[lo:hi] = slices[q][self.gth_idx_g[lo:hi]]
        np.take(w, self.perm, out=w2)
        return w2

    # ------------------------------------------------- sparse delta path
    def build_delta_index(self):
        """Inverted row index on the gathered-endpoint VID for sparse
        changed-label transport: rows sorted by gth vid, plus each row's
        own-sorted position — a changed (vid, val) delta then updates
        exactly the rows that read that vid (two searchsorted + one
        scatter), instead of re-gathering every row. One structure per
        actor (deltas carry global vids, so partition boundaries don't
        matter on the apply side)."""
        g = np.asarray(self.gth_sorted, dtype=np.int64)
        o = np.argsort(g, kind="stable")
        self._dx = (g[o], o)

    def apply_deltas(self, rows: np.ndarray, deltas) -> np.ndarray:
        """Scatter per-actor (changed_vid, changed_val) deltas into the
        cached own-sorted row array; returns the touched row positions.
        Cost O(Σ changed · log rows + rows touched) — after the first few
        supersteps of LPA/WCC the change set collapses, so this replaces
        an O(rows) full re-gather with near-zero work."""
        sg, rowpos = self._dx
        touched = []
        for d in deltas:
            if d is None:
                continue
            vid, vals = d
            if len(vid) == 0 or not len(sg):
                continue
            st = np.searchsorted(sg, vid)
            en = np.searchsorted(sg, vid, side="right")
            lens = en - st
            m = lens > 0
            if not m.any():
                continue
            L = lens[m]
            base = np.repeat(st[m], L)
            offs = np.arange(int(L.sum())) - np.repeat(np.cumsum(L) - L, L)
            rp = rowpos[base + offs]
            rows[rp] = np.repeat(vals[m], L)
            touched.append(rp)
        return np.concatenate(touched) if touched \
            else np.empty(0, np.int64)


@ray.remote
class AlgoShard:
    """Worker actor for undirected src-owned superstep algorithms
    (WCC / LPA / k-core). Holds owned-vertex state + the gather structure."""

    def __init__(self, part_ids: list, P: int, n: int, block_refs: list,
                 pos_ref):
        blocks = ray.get(list(block_refs))
        pos = ray.get(pos_ref) if isinstance(pos_ref, ray.ObjectRef) else pos_ref
        self.part_ids, self.P, self.n = list(part_ids), P, n
        owned_per = [_owned_vids(n, P, p) for p in self.part_ids]
        self.slice_bounds = np.r_[0, np.cumsum([len(o) for o in owned_per])]
        self.owned = np.concatenate(owned_per) if owned_per \
            else np.empty(0, np.int64)
        us, vs = [], []
        for b in blocks:
            if b.num_rows and "src" in b.column_names:
                us.append(b["src"].to_numpy(zero_copy_only=False))
                vs.append(b["dst"].to_numpy(zero_copy_only=False))
        u = np.concatenate(us) if us else np.empty(0, np.int64)
        v = np.concatenate(vs) if vs else np.empty(0, np.int64)
        self.gc = _GatherCombine(u, v, P, pos, self.owned)
        self.state: np.ndarray = np.empty(0)

    # ------------------------------------------------------------ state mgmt
    def init_labels(self):
        """label[v] = v (WCC / LPA initial labelling)."""
        self.state = self.owned.copy()
        return self._publish()

    def init_alive(self, k: int):
        """k-core seed: alive = degree >= k. Degree = per-owned row count
        (und blocks hold every neighbour row of owned u, dedup'd)."""
        deg = np.zeros(len(self.owned), dtype=np.int64)
        seg_len = np.diff(np.r_[self.gc.start, len(self.gc.gth_idx_g)])
        deg[self.gc.own_local] = seg_len
        self.state = deg >= k
        return self._publish()

    def set_state(self, values: np.ndarray):
        self.state = np.asarray(values)

    def get_state(self):
        return self.owned, self.state

    def _publish(self) -> list:
        return [ray.put(self.state[self.slice_bounds[i]:self.slice_bounds[i + 1]])
                for i in range(len(self.part_ids))]

    # ------------------------------------------------------------ supersteps
    def wcc_step(self, slice_refs: list):
        slices = ray.get(list(slice_refs))
        new = self.state.copy()
        if len(self.gc.uo):
            lv = self.gc.gather(slices, np.int64)
            m = np.minimum.reduceat(lv, self.gc.start)
            new[self.gc.own_local] = np.minimum(new[self.gc.own_local], m)
        changed = int((new != self.state).sum())
        self.state = new
        return self._publish(), changed

    def lpa_step(self, slice_refs: list):
        """Synchronous vote round (label_propagation.rs:84-95): neighbour
        votes + self vote, argmax by (count, then LARGEST label)."""
        slices = ray.get(list(slice_refs))
        n = self.n
        lv = self.gc.gather(slices, np.int64) if len(self.gc.uo) \
            else np.empty(0, np.int64)
        me = np.arange(len(self.owned), dtype=np.int64)
        keys = np.concatenate([self.gc.row_own_local * np.int64(n) + lv,
                               me * np.int64(n) + self.state])
        uk, cnt = np.unique(keys, return_counts=True)
        nodes = uk // n
        labels = uk - nodes * n
        order = np.lexsort((labels, cnt, nodes))
        nodes, labels = nodes[order], labels[order]
        last = np.r_[nodes[1:] != nodes[:-1], True]
        new = self.state.copy()
        new[nodes[last]] = labels[last]
        changed = int((new != self.state).sum())
        self.state = new
        return self._publish(), changed

    def kcore_step(self, slice_refs: list, k: int):
        slices = ray.get(list(slice_refs))
        cnt = np.zeros(len(self.owned), dtype=np.int64)
        if len(self.gc.uo):
            av = self.gc.gather(slices, np.int64)
            cnt[self.gc.own_local] = np.add.reduceat(av, self.gc.start)
        new = self.state & (cnt >= k)
        changed = int((new != self.state).sum())
        self.state = new
        return self._publish(), changed

    # -------------------------------------- owned-slice sparse-delta path
    # (round 5) The per-superstep transport above is W actors × P
    # actor-owned slice ray.puts + every actor ray.get-ing all P slices —
    # the O(W·P) borrowed-ref owner-RPC storm PRShard.step_owned fixed for
    # PageRank. Here BOTH fixes land together: superstep outputs are TASK
    # RETURNS (driver-owned objects, resolved against the idle driver) and
    # they carry only the CHANGED (pos, val) pairs per partition; each
    # actor keeps its gathered-label row cache and applies the sparse
    # deltas. After LPA/WCC's change set collapses (a few rounds in), a
    # superstep moves near-zero bytes.

    # above this vertex count the per-actor dense label cache (8 bytes per
    # vertex; used only to cheapen DENSE delta rounds) is skipped and the
    # searchsorted path handles every round — the algorithm is identical
    _DENSE_CACHE_LIMIT = 1 << 26          # 64M vertices ≈ 512 MB/actor

    def init_delta(self, full=None):
        """Seed state and the gathered-label row cache. Default (fresh
        run): label = vid — entirely locally, the initial label of a
        gathered endpoint IS its vid, which the gather structure already
        stores; no transport. With ``full`` (checkpoint resume): state
        and row cache reconstruct from the broadcast label vector, and
        the first post-resume round runs a FULL recount (correct by the
        synchronous-vote semantics; the affected-set is an optimization
        the resume simply skips for one round)."""
        self._gth_vids = np.asarray(self.gc.gth_sorted, np.int64)
        if self.gc._dx is None:
            self.gc.build_delta_index()
        if full is not None:
            full = np.asarray(full, np.int64)
            self.state = full[self.owned]
            self._rows_lab = full[self._gth_vids].copy()
            self._glob = full.copy() \
                if self.n <= self._DENSE_CACHE_LIMIT else None
        else:
            self.state = self.owned.copy()
            self._rows_lab = np.asarray(self.gc.gth_sorted,
                                        np.int64).copy()
            self._glob = np.arange(self.n, dtype=np.int64) \
                if self.n <= self._DENSE_CACHE_LIMIT else None
        self._first_round = True
        self._self_changed = np.empty(0, np.int64)
        # node-local-idx -> segment index in (uo, start), -1 if no rows
        self._seg_of_node = np.full(len(self.owned), -1, np.int64)
        self._seg_of_node[self.gc.own_local] = \
            np.arange(len(self.gc.own_local))
        self._seg_ends = np.r_[self.gc.start,
                               len(self.gc.gth_idx_g)][1:] \
            if len(self.gc.uo) else np.empty(0, np.int64)

    def _apply_deltas(self, deltas):
        """Update the cached rows from the per-actor deltas. Returns the
        touched row positions, or None when the round was applied densely
        (global-cache scatter + one full regather — measured ~10x cheaper
        than per-delta searchsorted when most labels changed; early LPA /
        WCC rounds are exactly that regime)."""
        if self._glob is not None:
            total = sum(len(d[0]) for d in deltas if d is not None)
            for d in deltas:
                if d is not None and len(d[0]):
                    self._glob[d[0]] = d[1]
            if total * 4 > len(self._gth_vids):
                np.take(self._glob, self._gth_vids, out=self._rows_lab)
                return None
        return self.gc.apply_deltas(self._rows_lab, deltas)

    def _emit_deltas(self, new: np.ndarray):
        """One (changed_vids, new_vals) pair for the whole actor."""
        changed = np.flatnonzero(new != self.state)
        self._self_changed = changed
        return (self.owned[changed], new[changed]), len(changed)

    def _affected_nodes(self, touched_rows: np.ndarray) -> np.ndarray:
        """Owned nodes whose vote inputs changed: nodes with a touched row,
        plus nodes whose own label changed last round (self-vote input)."""
        nbr = self.gc.row_own_local[touched_rows] if len(touched_rows) \
            else np.empty(0, np.int64)
        return np.unique(np.concatenate([nbr, self._self_changed]))

    def lpa_delta_step(self, *deltas):
        """One LPA vote round over the cached rows — recounted ONLY for
        affected nodes (a node's vote can change only if a neighbour's
        label or its own label changed last round). deltas = P (pos, val)
        pairs (top-level args — raylet-resolved, no in-task ray.get).
        Returns (*per-owned-partition deltas, changed) via num_returns."""
        touched = self._apply_deltas(deltas)
        n = self.n
        if self._first_round or touched is None:
            aff = None                        # full vote, no range build
            self._first_round = False
        else:
            aff = self._affected_nodes(touched)
            if len(aff) * 4 > len(self.owned):
                aff = None                    # dense round: full vote wins
        new = self.state.copy()
        if aff is None or len(aff):
            if aff is None:
                rows = slice(None)
                row_nodes = self.gc.row_own_local
                vote_nodes = np.arange(len(self.owned), dtype=np.int64)
            else:
                segs = self._seg_of_node[aff]
                sm = segs >= 0
                segs = segs[sm]
                starts = self.gc.start[segs]
                lens = self._seg_ends[segs] - starts
                base = np.repeat(starts, lens)
                rows = base + (np.arange(int(lens.sum()))
                               - np.repeat(np.cumsum(lens) - lens, lens))
                row_nodes = self.gc.row_own_local[rows]
                vote_nodes = aff
            keys = np.concatenate([
                row_nodes * np.int64(n) + self._rows_lab[rows],
                vote_nodes * np.int64(n) + self.state[vote_nodes]])
            uk, cnt = np.unique(keys, return_counts=True)
            nodes = uk // n
            labels = uk - nodes * n
            order = np.lexsort((labels, cnt, nodes))
            nodes, labels = nodes[order], labels[order]
            last = np.r_[nodes[1:] != nodes[:-1], True]
            new[nodes[last]] = labels[last]
        out, changed = self._emit_deltas(new)
        self.state = new
        return out, changed

    def wcc_delta_step(self, *deltas):
        """One hash-min round over the cached rows. Labels only DECREASE,
        so state already holds the min of everything seen — the update is
        a pure scatter-min over the touched rows (no reduceat)."""
        touched = self._apply_deltas(deltas)
        new = self.state.copy()
        if self._first_round or touched is None:
            self._first_round = False
            if len(self.gc.uo):
                m = np.minimum.reduceat(self._rows_lab, self.gc.start)
                new[self.gc.own_local] = np.minimum(new[self.gc.own_local], m)
        elif len(touched):
            np.minimum.at(new, self.gc.row_own_local[touched],
                          self._rows_lab[touched])
        out, changed = self._emit_deltas(new)
        self.state = new
        return out, changed


@ray.remote
class HitsShard:
    """Worker actor for sharded HITS. Two gather structures: auth-side
    (dst-owned rows, gather hub[src]) and hub-side (src-owned rows, gather
    auth[dst]); state = (hub, auth) slices for owned vids."""

    def __init__(self, part_ids: list, P: int, n: int,
                 dst_block_refs: list, src_block_refs: list, pos_ref):
        dst_blocks = ray.get(list(dst_block_refs))
        src_blocks = ray.get(list(src_block_refs))
        pos = ray.get(pos_ref) if isinstance(pos_ref, ray.ObjectRef) else pos_ref
        self.part_ids, self.P, self.n = list(part_ids), P, n
        owned_per = [_owned_vids(n, P, p) for p in self.part_ids]
        self.slice_bounds = np.r_[0, np.cumsum([len(o) for o in owned_per])]
        self.owned = np.concatenate(owned_per) if owned_per \
            else np.empty(0, np.int64)

        def _cat(blocks, col):
            arrs = [b[col].to_numpy(zero_copy_only=False) for b in blocks
                    if b.num_rows and col in b.column_names]
            return np.concatenate(arrs) if arrs else np.empty(0, np.int64)

        # auth side: rows dst-owned, combine per dst, gather over src
        self.gc_auth = _GatherCombine(_cat(dst_blocks, "dst"),
                                      _cat(dst_blocks, "src"), P, pos, self.owned)
        # hub side: rows src-owned, combine per src, gather over dst
        self.gc_hub = _GatherCombine(_cat(src_blocks, "src"),
                                     _cat(src_blocks, "dst"), P, pos, self.owned)
        self.hub = np.ones(len(self.owned))
        self.auth = np.ones(len(self.owned))
        self.recv_hub = np.zeros(len(self.owned))
        self.recv_auth = np.zeros(len(self.owned))

    def publish(self):
        """([hub_slice_refs], [auth_slice_refs]) in part_ids order."""
        sb = self.slice_bounds
        return ([ray.put(self.hub[sb[i]:sb[i + 1]])
                 for i in range(len(self.part_ids))],
                [ray.put(self.auth[sb[i]:sb[i + 1]])
                 for i in range(len(self.part_ids))])

    def recv_step(self, hub_refs: list, auth_refs: list):
        """Phase 1: raw receive sums. recv_hub[d] = Σ hub[s] over in-edges;
        recv_auth[s] = Σ auth[d] over out-edges. Returns the two partial
        totals for the global sum-normalization."""
        hubs = ray.get(list(hub_refs))
        auths = ray.get(list(auth_refs))
        self.recv_hub[:] = 0.0
        self.recv_auth[:] = 0.0
        if len(self.gc_auth.uo):
            w = self.gc_auth.gather(hubs, np.float64)
            self.recv_hub[self.gc_auth.own_local] = \
                np.add.reduceat(w, self.gc_auth.start)
        if len(self.gc_hub.uo):
            w = self.gc_hub.gather(auths, np.float64)
            self.recv_auth[self.gc_hub.own_local] = \
                np.add.reduceat(w, self.gc_hub.start)
        return (float(self.recv_hub.sum(dtype=np.float64)),
                float(self.recv_auth.sum(dtype=np.float64)))

    def normalize_step(self, th: float, ta: float):
        """Phase 2: sum-normalize with the global totals (hits.rs:119-131),
        publish new slices, return local max-diffs for the stop rule."""
        new_auth = self.recv_hub / th if th > 0 else self.recv_hub.copy()
        new_hub = self.recv_auth / ta if ta > 0 else self.recv_auth.copy()
        md_h = float(np.abs(new_hub - self.hub).max(initial=0.0))
        md_a = float(np.abs(new_auth - self.auth).max(initial=0.0))
        self.hub, self.auth = new_hub, new_auth
        return self.publish(), md_h, md_a

    def get_state(self):
        return self.owned, self.hub, self.auth


class ShardedAlgos:
    """Driver handle: WCC / LPA / k-core over src-owned undirected blocks,
    HITS over the two directed orientations. Driver work per superstep is
    O(P) refs + scalars."""

    def __init__(self, g, num_workers: int | None = None):
        """g: shards.BspGraph (its und_refs/refs are hash-partitioned with
        the same _GOLD multiplier this module's _part_of uses)."""
        self.g = g
        self.n = g.n
        cpus = int(ray.cluster_resources().get("CPU", 8))
        self._W = num_workers or max(1, min(cpus - 1, len(g.und_refs)))
        self._und_pool = None
        self._hits_pool = None

    # ------------------------------------------------------------ pools
    def _stripes(self, P: int) -> list:
        stripes = np.array_split(np.arange(P), min(self._W, P))
        return [s for s in stripes if len(s)]

    def _undirected_pool(self):
        if self._und_pool is None:
            refs = self.g.und_refs
            P = len(refs)
            pos_ref = ray.put(_pos_in_partition(self.n, P))
            stripes = self._stripes(P)
            shards = [AlgoShard.options(num_cpus=1).remote(
                st.tolist(), P, self.n, [refs[p] for p in st], pos_ref)
                for st in stripes]
            self._und_pool = (stripes, shards, P)
        return self._und_pool

    def _compose(self, stripes, per_actor_ref_lists, P) -> list:
        out = [None] * P
        for stripe, refs in zip(stripes, per_actor_ref_lists):
            for pid, r in zip(stripe, refs):
                out[pid] = r
        return out

    def _gather_state(self, shards) -> np.ndarray:
        outs = ray.get([s.get_state.remote() for s in shards])
        full = np.empty(self.n, dtype=np.asarray(outs[0][1]).dtype
                        if outs else np.int64)
        for owned, vals in outs:
            full[owned] = vals
        return full

    # ------------------------------------------------------------ algorithms
    def wcc(self, max_iter: int = 10**9) -> np.ndarray:
        stripes, shards, P = self._undirected_pool()
        slice_refs = self._compose(
            stripes, ray.get([s.init_labels.remote() for s in shards]), P)
        it = 0
        while it < max_iter:
            it += 1
            outs = ray.get([s.wcc_step.remote(slice_refs) for s in shards])
            slice_refs = self._compose(stripes, (o[0] for o in outs), P)
            if sum(o[1] for o in outs) == 0:
                break
        return self._gather_state(shards)

    def lpa(self, iter_count: int = 20, until_converged: bool = True):
        stripes, shards, P = self._undirected_pool()
        slice_refs = self._compose(
            stripes, ray.get([s.init_labels.remote() for s in shards]), P)
        it = 0
        for it in range(1, iter_count + 1):
            outs = ray.get([s.lpa_step.remote(slice_refs) for s in shards])
            slice_refs = self._compose(stripes, (o[0] for o in outs), P)
            if until_converged and sum(o[1] for o in outs) == 0:
                break
        return self._gather_state(shards), it

    def _owned_delta_loop(self, step_of, iter_count: int,
                          until_converged: bool, checkpoint=None,
                          checkpoint_every: int = 5,
                          state_key: str = "label"):
        """Shared driver loop for the owned-slice sparse-delta algorithms:
        O(W) refs per superstep (ONE delta object per actor), all
        superstep outputs driver-owned task returns, only changed labels
        in flight. ``checkpoint`` (pipelines.checkpoint.CheckpointManager)
        saves the label vector every ``checkpoint_every`` rounds and
        resumes mid-convergence from the latest complete manifest (the
        same lineage contract as ShardedPageRank)."""
        from collections import deque
        stripes, shards, P = self._undirected_pool()
        W = len(shards)
        it0 = 0
        full0 = None
        if checkpoint is not None:
            st = checkpoint.load_latest()
            if st is not None:
                it0 = st["iteration"]
                full0 = st["state"][state_key].astype(np.int64)
        fref = ray.put(full0) if full0 is not None else None
        ray.get([s.init_delta.remote(fref) for s in shards])
        empty = (np.empty(0, np.int64), np.empty(0, np.int64))
        delta_refs = [ray.put(empty)] * W     # round 1: nothing changed yet
        # Depth-2 pipelined rounds: the next round needs only the delta
        # REFS (available at submit time), so the driver submits ahead and
        # reads round j's changed-count while round j+1 executes — the
        # driver round-trip leaves the critical path. Convergence detection
        # lags one round; the extra round runs on empty deltas (near-free).
        pending: deque = deque()
        conv_at = None
        last_changed = None
        for it in range(it0 + 1, iter_count + 1):
            rounds = [step_of(s).options(num_returns=2).remote(*delta_refs)
                      for s in shards]
            delta_refs = [r[0] for r in rounds]
            pending.append((it, [r[1] for r in rounds]))
            if len(pending) > 1:
                j, refs = pending.popleft()
                last_changed = sum(ray.get(refs))
                if last_changed == 0 and until_converged:
                    conv_at = j
                    break
            if checkpoint is not None and it % checkpoint_every == 0:
                while pending:            # drain the pipeline, then save
                    j, refs = pending.popleft()
                    last_changed = sum(ray.get(refs))
                    if last_changed == 0 and until_converged:
                        conv_at = j
                checkpoint.save(it, {state_key: self._gather_state(shards)},
                                metrics={"changed": int(last_changed or 0)})
                if conv_at is not None:
                    break
        while conv_at is None and pending:
            j, refs = pending.popleft()
            if sum(ray.get(refs)) == 0 and until_converged:
                conv_at = j
        it = conv_at if conv_at is not None else iter_count
        return self._gather_state(shards), it

    def lpa_owned(self, iter_count: int = 20, until_converged: bool = True,
                  checkpoint=None, checkpoint_every: int = 5):
        """LPA through the owned-slice sparse-delta path (round 5); vote
        semantics identical to lpa/lpa_step (parity-tested); optional
        per-iteration lineage checkpoints (resume mid-convergence)."""
        return self._owned_delta_loop(lambda s: s.lpa_delta_step,
                                      iter_count, until_converged,
                                      checkpoint, checkpoint_every,
                                      state_key="community")

    def wcc_owned(self, max_iter: int = 10**9, checkpoint=None,
                  checkpoint_every: int = 5) -> np.ndarray:
        """Hash-min WCC through the owned-slice sparse-delta path;
        optional per-iteration lineage checkpoints."""
        return self._owned_delta_loop(lambda s: s.wcc_delta_step,
                                      max_iter, True, checkpoint,
                                      checkpoint_every,
                                      state_key="component")[0]

    def kcore_set(self, k: int, max_iter: int = 10**9) -> np.ndarray:
        stripes, shards, P = self._undirected_pool()
        slice_refs = self._compose(
            stripes, ray.get([s.init_alive.remote(k) for s in shards]), P)
        it = 0
        while it < max_iter:
            it += 1
            outs = ray.get([s.kcore_step.remote(slice_refs, k) for s in shards])
            slice_refs = self._compose(stripes, (o[0] for o in outs), P)
            if sum(o[1] for o in outs) == 0:
                break
        return self._gather_state(shards)

    def _hits_shards(self):
        if self._hits_pool is None:
            from raphtory_ray.state.shards import _shuffle_pairs
            dst_refs = self.g.refs                      # dst-partitioned
            P = len(dst_refs)
            src_refs = _shuffle_pairs(dst_refs, P, key="src")
            pos_ref = ray.put(_pos_in_partition(self.n, P))
            stripes = self._stripes(P)
            shards = [HitsShard.options(num_cpus=1).remote(
                st.tolist(), P, self.n,
                [dst_refs[p] for p in st], [src_refs[p] for p in st], pos_ref)
                for st in stripes]
            self._hits_pool = (stripes, shards, P)
        return self._hits_pool

    def hits(self, iter_count: int = 20, tol: float = 0.01):
        stripes, shards, P = self._hits_shards()
        pubs = ray.get([s.publish.remote() for s in shards])
        hub_refs = self._compose(stripes, (p[0] for p in pubs), P)
        auth_refs = self._compose(stripes, (p[1] for p in pubs), P)
        it = 0
        for it in range(1, iter_count + 1):
            partials = ray.get([s.recv_step.remote(hub_refs, auth_refs)
                                for s in shards])
            th = sum(p[0] for p in partials)
            ta = sum(p[1] for p in partials)
            outs = ray.get([s.normalize_step.remote(th, ta) for s in shards])
            hub_refs = self._compose(stripes, (o[0][0] for o in outs), P)
            auth_refs = self._compose(stripes, (o[0][1] for o in outs), P)
            md_h = max(o[1] for o in outs)
            md_a = max(o[2] for o in outs)
            if md_h <= tol and md_a <= tol:
                break
        outs = ray.get([s.get_state.remote() for s in shards])
        hub = np.empty(self.n)
        auth = np.empty(self.n)
        for owned, h, a in outs:
            hub[owned] = h
            auth[owned] = a
        return hub, auth, it

    def shutdown(self):
        for pool in (self._und_pool, self._hits_pool):
            if pool is not None:
                for s in pool[1]:
                    ray.kill(s)
        self._und_pool = self._hits_pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
