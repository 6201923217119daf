"""Cypher-subset execution over a GraphFrame — Ray-Data-native.

The reference transpiles Cypher MATCH chains to SQL joins over per-layer
edge-list tables + a nodes table and runs them on DataFusion
(raphtory-cypher/src/lib.rs:41-158, transpiler/mod.rs, hop/rule.rs —
"graph hops are relational joins over Arrow"). This module is the same
idea expressed on Ray Data:

- every relationship pattern is a SCAN of the GraphFrame's edge-event
  Dataset (map_batches rename + vectorized layer/prop-map filters),
- every hop is a distributed HASH JOIN: both sides are routed into P
  partitions by splitmix64 of the shared node-variable key (explicit
  task shuffle, the engine's standard two-round pattern), and each
  partition joins with ``pyarrow.Table.join`` (Acero C++ hash join),
- WHERE terms apply as vectorized pyarrow.compute filter stages as soon
  as all their variables are bound (earliest-placement pushdown: a
  single-edge-variable term filters that edge's scan BEFORE the join),
- node properties resolve against the driver-resident ``vertices``
  dimension table, broadcast once via ``ray.put`` and gathered per batch
  with ``pc.index_in`` (never shuffled),
- RETURN aggregates map to Ray Data ``groupby().aggregate()`` /
  ``Dataset.aggregate`` partial+final combines; ORDER BY → ``ds.sort``;
  LIMIT → ``ds.limit``.

Semantics match the reference transpiler, NOT full openCypher: bindings
are edge EVENTS (the event table is the exploded edge list), and there
is no relationship-uniqueness filter — Cypher's MATCH is transpiled to
plain SQL joins exactly as raphtory-cypher does, so a DuckDB oracle over
the same tables is exact.

Scale notes: the only all-to-all moves are the hash joins (P partitions,
key-salted by splitmix64 — uniform unless one vertex dominates; the
wedge/join fan-out itself is inherent to the query). Scans prune to the
columns the query references before any shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from raphtory_ray.query.parser import (BinOp, Chain, Func, Lit, Not, Prop,
                                       Query, ReturnItem, Var, expr_text,
                                       parse_cypher)

_GOLD = np.uint64(0x9E3779B97F4A7C15)

# edge property aliases the reference's tests use (e.time == event time)
_EDGE_ALIASES = {"time": "t", "eid": "event_id"}


def _splitmix(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


# ------------------------------------------------------ distributed join

def _empty_from_schema(schema) -> pa.Table:
    """Ray Data Schema → empty pyarrow Table with the same columns."""
    return pa.table({n: pa.array([], t) for n, t in
                     zip(schema.names, schema.types)})


def _partition_ids(tbl: pa.Table, keys: list, P: int) -> np.ndarray:
    """Partition id per row — the ONE hash both the route and the skew
    count pass use (they must agree or the valve miscounts)."""
    h = np.zeros(tbl.num_rows, np.uint64)
    for k in keys:
        col = tbl[k].combine_chunks().cast(pa.int64())
        h = h * _GOLD ^ _splitmix(col.to_numpy(zero_copy_only=False)
                                  .astype(np.int64))
    return (h % np.uint64(P)).astype(np.int64)


@ray.remote
def _route(tbl: pa.Table, keys: list, P: int):
    """One block → P hash partitions on the int64 key columns."""
    if tbl.num_rows == 0:
        return tuple(tbl for _ in range(P)) if P > 1 else tbl
    bk = _partition_ids(tbl, keys, P)
    order = np.argsort(bk, kind="stable")
    b = bk[order]
    bounds = np.searchsorted(b, np.arange(P + 1))
    t = tbl.take(pa.array(order))
    parts = [t.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p]))
             for p in range(P)]
    return tuple(parts) if P > 1 else parts[0]


@ray.remote
def _part_counts(tbl: pa.Table, keys: list, P: int) -> np.ndarray:
    """Per-partition row counts for one block — the cheap first pass of
    the skew-aware route (hash only, no data movement)."""
    if tbl.num_rows == 0:
        return np.zeros(P, np.int64)
    return np.bincount(_partition_ids(tbl, keys, P),
                       minlength=P).astype(np.int64)


@ray.remote
def _join_part(keys: list, nl: int, j: int, k: int, split_left: bool,
               *parts: pa.Table) -> pa.Table:
    """One hash partition (sub-task j of k): concat each side's pieces,
    slice the split side into its j-th contiguous chunk — valid for an
    inner join because any partition of one side's rows partitions the
    output — then Acero inner join."""
    left = pa.concat_tables(parts[:nl], promote_options="default")
    right = pa.concat_tables(parts[nl:], promote_options="default")
    if k > 1:
        side = left if split_left else right
        n = side.num_rows
        lo, hi = (n * j) // k, (n * (j + 1)) // k
        if split_left:
            left = side.slice(lo, hi - lo)
        else:
            right = side.slice(lo, hi - lo)
    return left.join(right, keys=keys, join_type="inner",
                     coalesce_keys=True)


# rows of ONE side of one partition above which the join fans out into
# sub-tasks (a hub key routes its whole neighbourhood to one partition;
# the north rule calls for explicit skew valves at 10^12 scale)
_JOIN_SPLIT_ROWS = 2_000_000


def hash_join(left, right, keys: list, P: int | None = None,
              lhint: pa.Table | None = None,
              rhint: pa.Table | None = None):
    """Distributed inner join of two Datasets on identically-named int64
    key columns. Non-key column names must be disjoint (the compiler
    guarantees it). Returns a Dataset of P joined partitions.

    ``lhint``/``rhint``: empty pa.Tables carrying each side's schema.
    Ray SKIPS map fns on empty blocks, so a fully-empty mapped Dataset
    has zero-column blocks and schema() is None — the hints let the
    empty-result path still produce a correctly-schemaed join output."""
    import ray.data as rd
    if P is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        P = max(8, cpus)
    mat_l, mat_r = left.materialize(), right.materialize()
    rows_l, rows_r = mat_l._block_num_rows(), mat_r._block_num_rows()
    refs_l = [r for r, c in zip(mat_l.to_arrow_refs(), rows_l) if c]
    refs_r = [r for r, c in zip(mat_r.to_arrow_refs(), rows_r) if c]
    if not refs_l or not refs_r:
        # one side is empty: inner join is empty; synthesize the joined
        # schema (left cols + right non-key cols) from the hints
        lt = lhint if lhint is not None else _empty_from_schema(
            left.schema())
        rt = rhint if rhint is not None else _empty_from_schema(
            right.schema())
        return rd.from_arrow(lt.join(rt, keys=keys, join_type="inner",
                                     coalesce_keys=True))
    # skew plan: cheap count pass (hash + bincount per block, no data
    # movement) → per-partition sub-task fan-out for hub-heavy keys.
    # Skipped entirely (k=1 everywhere) when block metadata already
    # proves no partition can exceed the threshold. Count tasks are
    # submitted AFTER the route tasks so the two waves overlap (routes
    # don't depend on counts — only the join-task plan does).
    import os
    split_rows = int(os.environ.get("RA_JOIN_SPLIT_ROWS",
                                    _JOIN_SPLIT_ROWS))
    need_counts = max(sum(rows_l), sum(rows_r)) > split_rows

    parts_l = [_route.options(num_returns=P if P > 1 else 1)
               .remote(r, keys, P) for r in refs_l]
    parts_r = [_route.options(num_returns=P if P > 1 else 1)
               .remote(r, keys, P) for r in refs_r]
    if need_counts:
        count_refs = [_part_counts.remote(r, keys, P)
                      for r in refs_l + refs_r]
        counts = ray.get(count_refs)
        cl = sum(counts[:len(refs_l)])
        cr = sum(counts[len(refs_l):])
    else:
        cl = cr = np.zeros(P, np.int64)
    if P == 1:
        parts_l = [[p] for p in parts_l]
        parts_r = [[p] for p in parts_r]
    joined = []
    for p in range(P):
        big = max(int(cl[p]), int(cr[p]))
        k = max(1, -(-big // split_rows))          # ceil
        split_left = cl[p] >= cr[p]
        for j in range(k):
            joined.append(_join_part.remote(
                keys, len(parts_l), j, k, split_left,
                *[pl[p] for pl in parts_l],
                *[pr[p] for pr in parts_r]))
    return rd.from_arrow_refs(joined)


# ------------------------------------------------------------- compiler

class _Ctx:
    """Compilation context: variable kinds, bound columns, vertices."""

    def __init__(self, gf):
        self.gf = gf
        self.node_vars: set = set()
        self.edge_vars: set = set()
        self.anon = 0
        self.anon_vars: set = set()
        self.edge_schema = gf.edges.schema()
        self.edge_cols = list(self.edge_schema.names)
        vt = gf.vertices
        self.vert_ref = ray.put(vt) if vt is not None else None
        self.vert_cols = list(vt.column_names) if vt is not None else []

    def fresh(self, prefix: str) -> str:
        # '#' cannot appear in a parsed identifier, so generated names can
        # never collide with (or capture) user variables like `_n1`
        self.anon += 1
        name = f"#{prefix}{self.anon}"
        self.anon_vars.add(name)
        return name

    def edge_col(self, var: str, name: str) -> str:
        name = _EDGE_ALIASES.get(name, name)
        if name in ("src", "dst") or name in self.edge_cols:
            return f"{var}__{name}"
        raise KeyError(f"unknown edge property {name!r} "
                       f"(have {self.edge_cols})")


def _vertices_lookup(vert_ref, vid_arr: pa.Array, prop: str) -> pa.Array:
    vt = ray.get(vert_ref) if isinstance(vert_ref, ray.ObjectRef) else vert_ref
    idx = pc.index_in(vid_arr, value_set=vt["vid"].combine_chunks())
    return vt[prop].combine_chunks().take(idx)


def _compile_expr(e, ctx: _Ctx):
    """Expr AST → fn(pa.Table) -> pa.Array | scalar. Node props resolve
    through the broadcast vertices table; edge props through the renamed
    scan columns."""
    if isinstance(e, Lit):
        v = e.value
        return lambda t: v
    if isinstance(e, Var):
        if e.name in ctx.node_vars:
            name = e.name
            return lambda t: t[name].combine_chunks()
        if e.name in ctx.edge_vars:
            # bare edge var in count(e) / comparisons: its src column is
            # the non-null representative of the binding
            col = f"{e.name}__src"
            return lambda t: t[col].combine_chunks()
        raise KeyError(f"bare variable {e.name!r} not usable here")
    if isinstance(e, Prop):
        if e.var in ctx.edge_vars:
            col = ctx.edge_col(e.var, e.name)
            return lambda t: t[col].combine_chunks()
        if e.var in ctx.node_vars:
            if e.name not in ctx.vert_cols:
                raise KeyError(f"unknown node property {e.name!r}")
            var, prop, vref = e.var, e.name, ctx.vert_ref
            return lambda t: _vertices_lookup(
                vref, t[var].combine_chunks(), prop)
        raise KeyError(f"unknown variable {e.var!r}")
    if isinstance(e, Func):
        if e.name == "type":
            if not isinstance(e.arg, Var) or e.arg.name not in ctx.edge_vars:
                raise SyntaxError("type() takes an edge variable")
            if "layer" in ctx.edge_cols:
                col = f"{e.arg.name}__layer"
                return lambda t: t[col].combine_chunks()
            return lambda t: "_default"
        raise SyntaxError(f"aggregate {e.name}() only allowed in RETURN")
    if isinstance(e, Not):
        f = _compile_expr(e.expr, ctx)
        return lambda t: pc.invert(f(t))
    if isinstance(e, BinOp):
        lf = _compile_expr(e.left, ctx)
        rf = _compile_expr(e.right, ctx)
        op = e.op
        kernels = {"=": pc.equal, "<>": pc.not_equal, "<": pc.less,
                   "<=": pc.less_equal, ">": pc.greater,
                   ">=": pc.greater_equal, "+": pc.add, "-": pc.subtract,
                   "and": pc.and_kleene, "or": pc.or_kleene}
        if op in ("contains", "starts_with", "ends_with"):
            if not isinstance(e.right, Lit):
                raise SyntaxError(f"{op} needs a string literal")
            pat = e.right.value
            kern = {"contains": pc.match_substring,
                    "starts_with": pc.starts_with,
                    "ends_with": pc.ends_with}[op]
            return lambda t: kern(lf(t), pattern=pat)
        kern = kernels[op]
        return lambda t: kern(lf(t), rf(t))
    raise SyntaxError(f"cannot compile {e!r}")


def _expr_vars(e) -> set:
    if isinstance(e, (Lit,)):
        return set()
    if isinstance(e, Var):
        return {e.name}
    if isinstance(e, Prop):
        return {e.var}
    if isinstance(e, Func):
        return _expr_vars(e.arg) if e.arg is not None else set()
    if isinstance(e, Not):
        return _expr_vars(e.expr)
    if isinstance(e, BinOp):
        return _expr_vars(e.left) | _expr_vars(e.right)
    return set()


def _and_terms(e) -> list:
    if isinstance(e, BinOp) and e.op == "and":
        return _and_terms(e.left) + _and_terms(e.right)
    return [e]


def _edge_scan(gf, epat, src_var: str, dst_var: str, ctx: _Ctx,
               needed: set):
    """One relationship pattern → Dataset with columns
    (src_var, dst_var, evar__*): rename + layer/prop-map filter +
    column prune, all in one vectorized map_batches pass."""
    evar = epat.var
    if epat.layer is not None and "layer" not in ctx.edge_cols:
        raise KeyError(
            f"relationship type :{epat.layer} used but the graph has no "
            f"'layer' column (columns: {ctx.edge_cols})")
    keep = [] if evar is None else \
        [c for c in ctx.edge_cols if f"{evar}__{c}" in needed]
    emit_src = evar is not None and f"{evar}__src" in needed
    emit_dst = evar is not None and f"{evar}__dst" in needed
    layer, props = epat.layer, dict(epat.props)
    flip = epat.direction == "left"

    def scan(b: pa.Table) -> pa.Table:
        mask = None
        if layer is not None:
            m = pc.equal(b["layer"], layer)
            mask = m if mask is None else pc.and_(mask, m)
        for k, v in props.items():
            col = _EDGE_ALIASES.get(k, k)
            m = pc.equal(b[col], v)
            mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            b = b.filter(pc.fill_null(mask, False))
        s, d = (b["dst"], b["src"]) if flip else (b["src"], b["dst"])
        cols = {}
        if src_var == dst_var:      # (B)-[x]->(B): self-loop pattern
            eq = pc.fill_null(pc.equal(s, d), False)
            b = b.filter(eq)
            s, d = (b["dst"], b["src"]) if flip else (b["src"], b["dst"])
            cols[src_var] = s.combine_chunks().cast(pa.int64())
        else:
            cols[src_var] = s.combine_chunks().cast(pa.int64())
            cols[dst_var] = d.combine_chunks().cast(pa.int64())
        if emit_src:
            cols[f"{evar}__src"] = b["src"].combine_chunks().cast(pa.int64())
        if emit_dst:
            cols[f"{evar}__dst"] = b["dst"].combine_chunks().cast(pa.int64())
        for c in keep:
            if c in ("src", "dst"):
                continue
            cols[f"{evar}__{c}"] = b[c].combine_chunks()
        return pa.table(cols)

    ds = gf.edges.map_batches(scan, batch_format="pyarrow",
                              zero_copy_batch=True)
    if epat.direction == "undirected":
        rev = EdgeScanReverser(gf, epat, src_var, dst_var, ctx, needed)
        ds = ds.union(rev)
    # empty-schema hint: Ray skips map fns on empty blocks, so a scan
    # over zero edges yields zero-column blocks; the hint preserves the
    # scan's schema for the empty-join / empty-projection paths
    return ds, scan(_empty_from_schema(ctx.edge_schema))


def EdgeScanReverser(gf, epat, src_var, dst_var, ctx, needed):
    """Second orientation of an undirected relationship (matches the
    edge in both directions, excluding double-counted self-loops)."""
    from dataclasses import replace
    flipped = replace(epat, direction="left")

    def drop_self(b: pa.Table) -> pa.Table:
        if src_var == dst_var or b.num_rows == 0:
            return b.slice(0, 0)      # self-loops already counted once
        m = pc.invert(pc.fill_null(pc.equal(b[src_var], b[dst_var]), True))
        return b.filter(m)

    fwd, _hint = _edge_scan(gf, flipped, src_var, dst_var, ctx, needed)
    return fwd.map_batches(drop_self, batch_format="pyarrow",
                           zero_copy_batch=True)


def _needed_columns(q: Query, ctx: _Ctx) -> set:
    """Edge-variable columns the query references anywhere (WHERE, RETURN,
    ORDER BY, prop maps) — everything else is pruned at the scan."""
    needed: set = set()

    def visit(e):
        if isinstance(e, Var) and e.name in ctx.edge_vars:
            needed.add(f"{e.name}__src")
        elif isinstance(e, Prop) and e.var in ctx.edge_vars:
            needed.add(ctx.edge_col(e.var, e.name))
        elif isinstance(e, Func):
            if e.name == "type" and isinstance(e.arg, Var) \
                    and "layer" in ctx.edge_cols:
                needed.add(f"{e.arg.name}__layer")
            elif e.arg is not None:
                visit(e.arg)
        elif isinstance(e, Not):
            visit(e.expr)
        elif isinstance(e, BinOp):
            visit(e.left)
            visit(e.right)

    if q.where is not None:
        visit(q.where)
    for it in q.items:
        if isinstance(it.expr, Var) and it.expr.name in ctx.edge_vars:
            for c in ctx.edge_cols:        # bare `RETURN e` keeps all cols
                needed.add(f"{it.expr.name}__{c}")
            needed.add(f"{it.expr.name}__src")
            needed.add(f"{it.expr.name}__dst")
        else:
            visit(it.expr)
    if q.star:
        for ev in ctx.edge_vars:
            for c in ctx.edge_cols:
                needed.add(f"{ev}__{c}")
            needed.add(f"{ev}__src")
            needed.add(f"{ev}__dst")
    for e, _asc in q.order_by:
        visit(e)
    return needed


def _apply_where(ds, pending: list, bound: set, ctx: _Ctx):
    """Attach every pending WHERE term whose variables are all bound."""
    ready = [t for t, vs in pending if vs <= bound]
    rest = [(t, vs) for t, vs in pending if not vs <= bound]
    if ready:
        fns = [_compile_expr(t, ctx) for t in ready]

        def filt(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            m = None
            for f in fns:
                v = f(b)
                m = v if m is None else pc.and_kleene(m, v)
            return b.filter(pc.fill_null(m, False))

        ds = ds.map_batches(filt, batch_format="pyarrow",
                            zero_copy_batch=True)
    return ds, rest


def _node_filters(npat, var: str, ctx: _Ctx) -> list:
    """(n:Label {k: v}) → synthetic WHERE terms on the node variable."""
    terms = []
    if npat.label is not None:
        terms.append(BinOp("=", Prop(var, "node_type"), Lit(npat.label)))
    for k, v in npat.props.items():
        terms.append(BinOp("=", Prop(var, k), Lit(v)))
    return terms


def cypher(gf, query: str, P: int | None = None):
    """Run a Cypher-subset query against a GraphFrame. Returns a
    ray.data.Dataset (streaming) whose columns are the RETURN items
    (aliased with AS, else the expression text)."""
    q = parse_cypher(query)
    ctx = _Ctx(gf)

    # name anonymous node vars; classify (anonymous edges stay unnamed —
    # their scans emit no edge columns at all)
    for ch in q.chains:
        for np_ in ch.nodes:
            if np_.var is None:
                np_.var = ctx.fresh("n")
            ctx.node_vars.add(np_.var)
        for ep in ch.edges:
            if ep.var is not None:
                if ep.var in ctx.edge_vars:
                    raise SyntaxError(
                        f"edge variable {ep.var!r} bound twice")
                ctx.edge_vars.add(ep.var)

    if q.star:
        items = []
        for v in sorted(ctx.node_vars):
            if v not in ctx.anon_vars:
                items.append(ReturnItem(Var(v), None))
        for v in sorted(ctx.edge_vars):
            items.append(ReturnItem(Var(v), None))
        q.items = items

    needed = _needed_columns(q, ctx)
    pending = [(t, _expr_vars(t)) for t in
               (_and_terms(q.where) if q.where is not None else [])]
    for ch in q.chains:
        for np_ in ch.nodes:
            for t in _node_filters(np_, np_.var, ctx):
                pending.append((t, {np_.var}))

    # ---- compose each chain: scan → join → scan → join ...
    chain_results = []
    for ch in q.chains:
        if not ch.edges:               # MATCH (n): all vertices
            import ray.data as rd
            if gf.vertices is not None:
                vt = pa.table({ch.nodes[0].var:
                               gf.vertices["vid"].combine_chunks()})
            else:
                vt = pa.table({ch.nodes[0].var:
                               pa.array(np.arange(gf.n), pa.int64())})
            ds = rd.from_arrow(vt)
            bound = {ch.nodes[0].var}
            ds, pending = _apply_where(ds, pending, bound, ctx)
            chain_results.append((ds, bound, vt.slice(0, 0)))
            continue
        ds, bound, hint = None, set(), None
        for hop, ep in enumerate(ch.edges):
            sv, dv = ch.nodes[hop].var, ch.nodes[hop + 1].var
            scan, scan_hint = _edge_scan(gf, ep, sv, dv, ctx, needed)
            # pushdown: terms over only this scan's vars filter the scan
            # BEFORE it enters the join (shrinks the shuffle)
            scan_vars = {sv, dv} | ({ep.var} if ep.var else set())
            scan, pending = _apply_where(scan, pending, scan_vars, ctx)
            if ds is None:
                ds, new, hint = scan, set(scan_vars), scan_hint
            else:
                shared = sorted(bound & {sv, dv})
                if not shared:
                    raise NotImplementedError(
                        "disconnected hop within a chain")
                # joining on a var the scan re-binds: both sides carry it
                ds = hash_join(ds, scan, shared, P, hint, scan_hint)
                hint = hint.join(scan_hint, keys=shared,
                                 join_type="inner", coalesce_keys=True)
                new = set(scan_vars)
            bound |= new
            ds, pending = _apply_where(ds, pending, bound, ctx)
        chain_results.append((ds, bound, hint))

    # ---- join chains on shared node vars
    ds, bound, hint = chain_results[0]
    for other, ovars, ohint in chain_results[1:]:
        shared = sorted(bound & ovars)
        if not shared:
            raise NotImplementedError("cartesian product across patterns")
        ds = hash_join(ds, other, shared, P, hint, ohint)
        hint = hint.join(ohint, keys=shared, join_type="inner",
                         coalesce_keys=True)
        bound |= ovars
        ds, pending = _apply_where(ds, pending, bound, ctx)
    if pending:
        raise KeyError(f"WHERE references unbound variables: "
                       f"{[expr_text(t) for t, _ in pending]}")

    return _project_and_finish(ds, q, ctx, hint)


# ------------------------------------------------- RETURN / aggregation

def _out_name(it: ReturnItem) -> str:
    return it.alias or expr_text(it.expr)


def _is_agg(e) -> bool:
    return isinstance(e, Func) and e.name != "type"


def _project_and_finish(ds, q: Query, ctx: _Ctx,
                        hint: pa.Table | None = None):
    """RETURN items → final columns; aggregates via Ray partial+final;
    DISTINCT via groupby-first; ORDER BY via ds.sort; LIMIT via
    ds.limit. ``hint`` = empty bindings table carrying the schema: Ray
    skips map fns on empty blocks, so a fully-empty binding set reaches
    here schemaless — unioning one locally-projected empty block
    guarantees the output schema without probing (a schema fetch would
    pre-execute the plan)."""
    import ray.data as rd
    aggs = [it for it in q.items if _is_agg(it.expr)]
    keys = [it for it in q.items if not _is_agg(it.expr)]

    # materialize every non-aggregate output column (+ hidden sort cols)
    hidden = []
    order_cols = []
    for i, (e, _asc) in enumerate(q.order_by):
        match = next((it for it in q.items
                      if expr_text(it.expr) == expr_text(e)
                      or (it.alias and isinstance(e, Var)
                          and e.name == it.alias)), None)
        if match is not None:
            order_cols.append(_out_name(match))
        else:
            if aggs:
                raise SyntaxError("ORDER BY on a non-returned expression "
                                  "is not supported with aggregates")
            if q.distinct:
                # openCypher: with DISTINCT, ORDER BY may only reference
                # returned columns — a hidden sort column would silently
                # leak into the dedup key and break DISTINCT
                raise SyntaxError("ORDER BY with DISTINCT must reference "
                                  "returned columns")
            h = f"__ord{i}"
            hidden.append((h, e))
            order_cols.append(h)

    def _expand(it: ReturnItem, ctx: _Ctx) -> list:
        """bare edge var → one column per edge field, Cypher-style
        `e.src` naming; bare node var → id column."""
        e = it.expr
        if isinstance(e, Var) and e.name in ctx.edge_vars:
            cols = []
            pref = f"{e.name}__"
            cols.append((f"{e.name}.src", Prop(e.name, "src")))
            cols.append((f"{e.name}.dst", Prop(e.name, "dst")))
            for c in ctx.edge_cols:
                if c in ("src", "dst"):
                    continue
                cols.append((f"{e.name}.{c}", Prop(e.name, c)))
            if it.alias:
                raise SyntaxError("cannot alias a whole edge variable")
            return cols
        return [(_out_name(it), e)]

    proj: list = []
    for it in keys:
        proj.extend(_expand(it, ctx))
    for h, e in hidden:
        proj.append((h, e))
    agg_inputs: list = []
    for i, it in enumerate(aggs):
        f: Func = it.expr
        if f.arg is not None:
            agg_inputs.append((f"__agg{i}", f.arg))

    fns = [(name, _compile_expr(e, ctx)) for name, e in proj + agg_inputs]
    # global aggregates need an explicit count column: Ray 2.49's
    # Dataset.aggregate(Count()) without `on=` always returns 0 (the
    # grouped form is fine) — Count(on="__rows") counts correctly
    global_agg = bool(aggs) and not keys

    def project(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {}
        for name, f in fns:
            v = f(b)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * n)
            cols[name] = v
        if global_agg or not cols:
            cols["__rows"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    ds = ds.map_batches(project, batch_format="pyarrow",
                        zero_copy_batch=True)
    if hint is not None:
        ds = ds.union(rd.from_arrow(project(hint)))
    key_names = [name for name, _ in proj if not name.startswith("__ord")]

    if aggs:
        ds = _aggregate(ds, q, aggs, key_names, ctx)
    elif q.distinct:
        ds = _distinct(ds, key_names + [h for h, _ in hidden])

    if order_cols:
        ds = ds.sort(order_cols,
                     descending=[not asc for _e, asc in q.order_by])
    if hidden:
        ds = ds.map_batches(
            lambda b: b.drop_columns([h for h, _ in hidden]),
            batch_format="pyarrow", zero_copy_batch=True)
    if q.limit is not None:
        ds = ds.limit(q.limit)
    return ds


def _distinct(ds, cols: list):
    def first(grp: pa.Table) -> pa.Table:
        return grp.slice(0, 1)
    return ds.groupby(cols).map_groups(first, batch_format="pyarrow")


def _aggregate(ds, q: Query, aggs: list, key_names: list, ctx: _Ctx):
    from ray.data.aggregate import Count, Max, Mean, Min, Sum
    import ray.data as rd

    distinct_aggs = [it for it in aggs if it.expr.distinct]
    if distinct_aggs:
        if len(aggs) > 1:
            raise NotImplementedError(
                "count(DISTINCT x) cannot mix with other aggregates")
        it = aggs[0]
        if it.expr.name != "count":
            raise NotImplementedError("DISTINCT only with count()")
        dcol = "__agg0"
        ds = _distinct(ds, key_names + [dcol])
        if key_names:
            out = ds.groupby(key_names).aggregate(
                Count(alias_name=_out_name(it)))
            return out
        n = ds.count()
        return rd.from_arrow(pa.table({_out_name(it):
                                       pa.array([n], pa.int64())}))

    specs = []
    for i, it in enumerate(aggs):
        f: Func = it.expr
        name = _out_name(it)
        col = f"__agg{i}"
        if f.name == "count":
            if f.arg is None:
                specs.append(Count(alias_name=name) if key_names else
                             Count(on="__rows", ignore_nulls=False,
                                   alias_name=name))
            else:
                specs.append(Count(on=col, ignore_nulls=True,
                                   alias_name=name))
        elif f.name == "sum":
            specs.append(Sum(col, alias_name=name))
        elif f.name == "avg":
            specs.append(Mean(col, alias_name=name))
        elif f.name == "min":
            specs.append(Min(col, alias_name=name))
        elif f.name == "max":
            specs.append(Max(col, alias_name=name))
        else:
            raise NotImplementedError(f"aggregate {f.name}()")

    if key_names:
        return ds.groupby(key_names).aggregate(*specs)
    res = ds.aggregate(*specs)
    names = [_out_name(it) for it in aggs]
    return rd.from_arrow(pa.table(
        {n: pa.array([res.get(n)]) for n in names}))
