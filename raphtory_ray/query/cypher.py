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

Round 4 extends the subset with the three clauses real queries hit
first (they were the top "What's missing" item of the round-3 review):

- ``WITH`` pipeline stages (projection, implicit-group aggregation,
  DISTINCT, HAVING-like ``WHERE``, then another MATCH or RETURN) — the
  carried columns join the next segment's patterns on shared variables,
- bounded variable-length patterns ``(a)-[:L*lo..hi]->(b)`` — iterated
  distributed hash-join expansion with per-level frontier dedup
  (reachability semantics, equivalent to a recursive CTE with UNION
  over (a, b, k); the reference grammar accepts the range literal,
  raphtory-cypher/src/parser/cypher.pest:204, but its AST drops it),
- ``OPTIONAL MATCH`` — the pattern compiled standalone, then a LEFT
  OUTER distributed hash join on the shared variables (the skew valve
  splits only the probe side for outer joins).

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

from raphtory_ray.query.parser import (BinOp, Case, Chain, Func, Lit, Not,
                                       Prop, Query, ReturnItem, Var,
                                       expr_text, parse_cypher)

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
        if col.null_count:
            # null join keys (possible after OPTIONAL MATCH) never match;
            # route them anywhere stable — Acero drops them in the join
            col = pc.fill_null(col, -(2 ** 62))
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
               join_type: str, *parts: pa.Table) -> pa.Table:
    """One hash partition (sub-task j of k): concat each side's pieces,
    slice the split side into its j-th contiguous chunk — valid because
    any partition of the probe side's rows partitions the output (for
    outer joins only a LEFT split is valid, enforced by the caller) —
    then an Acero join."""
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
    return left.join(right, keys=keys, join_type=join_type,
                     coalesce_keys=True)


# rows of ONE side of one partition above which the join fans out into
# sub-tasks (a hub key routes its whole neighbourhood to one partition;
# the north rule calls for explicit skew valves at 10^12 scale)
_JOIN_SPLIT_ROWS = 2_000_000


def hash_join(left, right, keys: list, P: int | None = None,
              lhint: pa.Table | None = None,
              rhint: pa.Table | None = None,
              join_type: str = "inner"):
    """Distributed join ("inner" or "left outer") of two Datasets on
    identically-named int64 key columns. Non-key column names must be
    disjoint (the compiler guarantees it). Returns a Dataset of P joined
    partitions.

    ``lhint``/``rhint``: empty pa.Tables carrying each side's schema.
    Ray SKIPS map fns on empty blocks, so a fully-empty mapped Dataset
    has zero-column blocks and schema() is None — the hints let the
    empty-result path still produce a correctly-schemaed join output."""
    import ray.data as rd
    auto_p = P is None
    if P is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        P = max(8, cpus)
    mat_l, mat_r = left.materialize(), right.materialize()
    rows_l, rows_r = mat_l._block_num_rows(), mat_r._block_num_rows()
    if auto_p:
        # shrink the default fan-out to the input: ~50k rows/partition,
        # CPU-capped — a 3-hop expansion over a few thousand pairs
        # shouldn't pay 32-way route+join task waves per hop
        total = sum(rows_l) + sum(rows_r)
        P = max(1, min(P, -(-total // 50_000)))
    refs_l = [r for r, c in zip(mat_l.to_arrow_refs(), rows_l) if c]
    refs_r = [r for r, c in zip(mat_r.to_arrow_refs(), rows_r) if c]
    if not refs_l or (not refs_r and join_type == "inner"):
        # empty probe side (or empty build side of an inner join):
        # synthesize the joined schema (left cols + right non-key cols)
        lt = lhint if lhint is not None else _empty_from_schema(
            left.schema())
        rt = rhint if rhint is not None else _empty_from_schema(
            right.schema())
        return rd.from_arrow(lt.join(rt, keys=keys, join_type=join_type,
                                     coalesce_keys=True))
    if not refs_r:
        # left outer with an empty right side: every left row survives
        # with nulls in the right columns — no shuffle needed
        rt = rhint if rhint is not None else _empty_from_schema(
            right.schema())
        return rd.from_arrow_refs(
            [_outer_vs_empty.remote(r, rt, keys) for r in refs_l])
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
        # splitting the probe side partitions ANY join's output; the
        # build side may only be split for inner joins (an outer join
        # would emit a null-padded row per sub-chunk)
        split_left = cl[p] >= cr[p] or join_type != "inner"
        for j in range(k):
            joined.append(_join_part.remote(
                keys, len(parts_l), j, k, split_left, join_type,
                *[pl[p] for pl in parts_l],
                *[pr[p] for pr in parts_r]))
    return rd.from_arrow_refs(joined)


@ray.remote
def _outer_vs_empty(tbl: pa.Table, rt: pa.Table, keys: list) -> pa.Table:
    return tbl.join(rt, keys=keys, join_type="left outer",
                    coalesce_keys=True)


# ------------------------------------------------------------- compiler

class _Ctx:
    """Compilation context: variable kinds, bound columns, vertices."""

    def __init__(self, gf):
        self.gf = gf
        self.node_vars: set = set()
        self.edge_vars: set = set()
        self.varlen_vars: set = set()     # [r*lo..hi] bindings (min-hops)
        self.col_vars: set = set()        # scalar columns bound by WITH
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


def _pc_mod(a, b):
    """Modulo — this pyarrow build has no pc.mod kernel; numpy keeps the
    C-truncation semantics DuckDB's % uses for integers. Nulls stay
    NULL (fill-compute-remask), never NaN, and an all-valid int column
    keeps its int type instead of promoting to double."""
    def prep(x):
        if isinstance(x, pa.ChunkedArray):
            x = x.combine_chunks()
        if isinstance(x, pa.Array):
            m = pc.is_null(x).to_numpy(zero_copy_only=False)
            return (x.fill_null(1).to_numpy(zero_copy_only=False), m)
        return x, None
    an, am = prep(a)
    bn, bm = prep(b)
    out = np.fmod(an, bn)
    if np.ndim(out) == 0:
        # literal % literal: pa.array needs a sequence, not a 0-d scalar
        return out.item()
    mask = None
    for m in (am, bm):
        if m is not None and m.any():
            mask = m if mask is None else (mask | m)
    return pa.array(out, mask=mask)



def _as_mask(v, n: int):
    """A WHERE term can compile to a SCALAR (constant predicate, e.g.
    ``5 % 2 = 1``): broadcast it to a boolean mask; null → False per
    Cypher's ternary WHERE."""
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v
    if isinstance(v, pa.Scalar):
        v = v.as_py()
    return pa.array(np.full(n, bool(v) if v is not None else False))

def _compile_expr(e, ctx: _Ctx):
    """Expr AST → fn(pa.Table) -> pa.Array | scalar. Node props resolve
    through the broadcast vertices table; edge props through the renamed
    scan columns."""
    if isinstance(e, Lit):
        v = e.value
        return lambda t: v
    if isinstance(e, Var):
        if e.name in ctx.col_vars:
            # a WITH-projected scalar column (checked before node/edge so
            # an alias shadowing an earlier variable reads the column)
            name = e.name
            return lambda t: t[name].combine_chunks()
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
        if e.var in ctx.col_vars:
            raise KeyError(f"{e.var!r} is a WITH-projected value, "
                           f"not a node — {e.var}.{e.name} is invalid")
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
        if e.name in ("startnode", "endnode"):
            # startNode(r)/endNode(r) → the edge's src/dst vid columns
            # (openCypher 9 §4.4; the reference transpiles the relationship
            # binding's own src/dst columns the same way)
            if not isinstance(e.arg, Var) or e.arg.name not in ctx.edge_vars:
                raise SyntaxError(f"{e.name}() takes an edge variable")
            col = f"{e.arg.name}__src" if e.name == "startnode" \
                else f"{e.arg.name}__dst"
            return lambda t: t[col].combine_chunks()
        if e.name in ("length", "size") and isinstance(e.arg, Var) \
                and e.arg.name in ctx.varlen_vars:
            # length(r) on a [r*lo..hi] binding: the pair's minimum hop
            # count (shortest path length within the bound)
            col = f"{e.arg.name}__hops"
            return lambda t: t[col].combine_chunks()
        if e.name == "length":
            raise SyntaxError("length() takes a variable-length pattern "
                              "binding ([r*lo..hi])")
        if e.name == "size":
            # size(list) / size(string) — pc.list_value_length /
            # utf8_length, both int64 per openCypher
            af = _compile_expr(e.arg, ctx)

            def size(t, _af=af):
                v = _af(t)
                if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                    v = pa.array([v] * t.num_rows)
                if pa.types.is_list(v.type) or \
                        pa.types.is_large_list(v.type):
                    return pc.list_value_length(v).cast(pa.int64())
                return pc.utf8_length(v).cast(pa.int64())
            return size
        if e.name == "id":
            # id(n) — the internal dense vid (transpiler/mod.rs:272 maps
            # node binds onto their "id" column)
            if not isinstance(e.arg, Var) or e.arg.name not in \
                    ctx.node_vars:
                raise SyntaxError("id() takes a node variable")
            name = e.arg.name
            return lambda t: t[name].combine_chunks()
        if e.name == "coalesce":
            args = e.arg if isinstance(e.arg, list) else [e.arg]
            fns = [_compile_expr(a, ctx) for a in args]

            def coalesce(t, _fns=tuple(fns)):
                vals = []
                for f in _fns:
                    v = f(t)
                    if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                        # explicit scalar type: an empty (hint) block
                        # would otherwise infer a null-typed array and
                        # break the coalesce kernel dispatch
                        v = pa.array([v] * t.num_rows,
                                     type=pa.scalar(v).type)
                    vals.append(v)
                good = next((v.type for v in vals
                             if not pa.types.is_null(v.type)), None)
                if good is not None:
                    vals = [v.cast(good) if pa.types.is_null(v.type)
                            else v for v in vals]
                return pc.coalesce(*vals)
            return coalesce
        if e.name in ("abs", "tointeger", "tofloat", "tolower",
                      "toupper", "trim", "ltrim", "rtrim", "reverse",
                      "tostring", "round", "floor", "ceil", "sqrt",
                      "sign"):
            af = _compile_expr(e.arg, ctx)
            kern = {"abs": pc.abs,
                    # openCypher toInteger truncates toward zero
                    "tointeger": lambda v: pc.cast(v, pa.int64(),
                                                   safe=False),
                    "tofloat": lambda v: pc.cast(v, pa.float64()),
                    "tolower": pc.utf8_lower,
                    "toupper": pc.utf8_upper,
                    "trim": pc.utf8_trim_whitespace,
                    "ltrim": pc.utf8_ltrim_whitespace,
                    "rtrim": pc.utf8_rtrim_whitespace,
                    "reverse": pc.utf8_reverse,
                    "tostring": lambda v: pc.cast(v, pa.string()),
                    # openCypher/DuckDB round halves AWAY from zero
                    # (Arrow: half_towards_infinity); pc.round's default
                    # is banker's rounding
                    "round": lambda v: pc.round(
                        v, round_mode="half_towards_infinity"),
                    "floor": pc.floor,
                    "ceil": pc.ceil,
                    "sqrt": pc.sqrt,
                    "sign": pc.sign}[e.name]

            def scalar(t, _af=af, _k=kern):
                v = _af(t)
                if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                    v = pa.array([v] * t.num_rows)
                return _k(v)
            return scalar
        if e.name in ("replace", "substring", "split", "left", "right"):
            # multi-arg string functions; trailing args must be literals
            # (the reference hands these straight to DataFusion SQL too,
            # transpiler/mod.rs:1082)
            args = e.arg if isinstance(e.arg, list) else [e.arg]
            arity = {"replace": (3, 3), "substring": (2, 3),
                     "split": (2, 2), "left": (2, 2), "right": (2, 2)}
            lo_n, hi_n = arity[e.name]
            if not (lo_n <= len(args) <= hi_n):
                raise SyntaxError(
                    f"{e.name}() takes {lo_n}"
                    f"{'' if lo_n == hi_n else f'..{hi_n}'} arguments, "
                    f"got {len(args)}")
            sf = _compile_expr(args[0], ctx)
            lits = []
            for a in args[1:]:
                if not isinstance(a, Lit):
                    raise SyntaxError(
                        f"{e.name}() takes literal arguments after the "
                        f"first")
                lits.append(a.value)

            def strfn(t, _sf=sf, _name=e.name, _lits=tuple(lits)):
                v = _sf(t)
                if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                    v = pa.array([v] * t.num_rows)
                if _name == "replace":
                    return pc.replace_substring(v, pattern=_lits[0],
                                                replacement=_lits[1])
                if _name == "substring":
                    # openCypher substring(s, start[, length]) is 0-based
                    start = int(_lits[0])
                    stop = start + int(_lits[1]) if len(_lits) > 1 else None
                    return pc.utf8_slice_codeunits(v, start=start,
                                                   stop=stop)
                if _name == "split":
                    return pc.split_pattern(v, pattern=_lits[0])
                if _name == "left":
                    return pc.utf8_slice_codeunits(v, start=0,
                                                   stop=int(_lits[0]))
                # right(s, n) — Python-style negative start handles
                # strings shorter than n like the openCypher spec;
                # n == 0 would degenerate to start=0 (whole string)
                n_ = int(_lits[0])
                if n_ == 0:
                    return pc.utf8_slice_codeunits(v, start=0, stop=0)
                return pc.utf8_slice_codeunits(v, start=-n_)
            return strfn
        raise SyntaxError(f"aggregate {e.name}() only allowed in RETURN")
    if isinstance(e, Case):
        opf = _compile_expr(e.operand, ctx) if e.operand is not None \
            else None
        branches = [(_compile_expr(w, ctx), _compile_expr(th, ctx))
                    for w, th in e.whens]
        dff = _compile_expr(e.default, ctx)

        def case(t, _opf=opf, _br=tuple(branches), _df=dff):
            n = t.num_rows

            def as_arr(v, typ=None):
                if isinstance(v, pa.ChunkedArray):
                    return v.combine_chunks()
                if isinstance(v, pa.Array):
                    return v
                if v is None:
                    return pa.nulls(n, typ or pa.null())
                # explicit scalar type so an empty (schema-hint) block
                # still carries the branch's type
                return pa.array([v] * n, type=pa.scalar(v).type)

            conds = []
            ov = as_arr(_opf(t)) if _opf is not None else None
            for wf, _ in _br:
                c = as_arr(wf(t))
                if ov is not None:
                    c = pc.equal(ov, c)
                # null predicate falls through to the next branch
                conds.append(pc.fill_null(c.cast(pa.bool_()), False))
            vals = [as_arr(tf(t)) for _, tf in _br] + [as_arr(_df(t))]
            # unify the branch result type (int+float ⇒ float64)
            types = [v.type for v in vals if not pa.types.is_null(v.type)]
            if not types:
                typ = pa.null()
            elif any(pa.types.is_floating(ty) for ty in types) and \
                    all(pa.types.is_floating(ty) or pa.types.is_integer(ty)
                        for ty in types):
                typ = pa.float64()
            else:
                typ = types[0]
            vals = [v if v.type.equals(typ) else v.cast(typ) for v in vals]
            out = vals[-1]
            for c, r in zip(reversed(conds), reversed(vals[:-1])):
                out = pc.if_else(c, r, out)
            return out
        return case
    if isinstance(e, Not):
        f = _compile_expr(e.expr, ctx)
        return lambda t: pc.invert(f(t))
    if isinstance(e, BinOp):
        lf = _compile_expr(e.left, ctx)
        if e.op == "is_null":
            # x IS NULL — true exactly on null slots (e.g. the unmatched
            # rows of an OPTIONAL MATCH left-outer join)
            def isnull(t, _lf=lf):
                v = _lf(t)
                if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                    return pa.array([v is None] * t.num_rows)
                return pc.is_null(v)
            return isnull
        if e.op == "in":
            # x IN [literals] — SQL InList semantics (NULL x → NULL, so a
            # WHERE filter drops it), matching the reference transpiler's
            # InList (transpiler/mod.rs:1024-1048); literal-list RHS only
            if not (isinstance(e.right, Lit) and
                    isinstance(e.right.value, list)):
                raise SyntaxError("IN needs a literal list on the right")
            vals = [v for v in e.right.value if v is not None]

            def isin(t, _lf=lf, _vals=vals):
                v = _lf(t)
                if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                    v = pa.array([v] * t.num_rows)
                if not _vals:
                    hit = pa.array(np.zeros(len(v), np.bool_))
                else:
                    vset = pa.array(_vals)
                    if pa.types.is_integer(v.type) and \
                            pa.types.is_integer(vset.type):
                        vset = vset.cast(v.type)
                    hit = pc.is_in(v, value_set=vset)
                null = pa.nulls(len(v), pa.bool_())
                return pc.if_else(pc.is_null(v), null, hit)
            return isin
        rf = _compile_expr(e.right, ctx)
        op = e.op
        kernels = {"=": pc.equal, "<>": pc.not_equal, "<": pc.less,
                   "<=": pc.less_equal, ">": pc.greater,
                   ">=": pc.greater_equal, "+": pc.add, "-": pc.subtract,
                   "*": pc.multiply, "/": pc.divide, "%": _pc_mod,
                   "and": pc.and_kleene, "or": pc.or_kleene,
                   "xor": pc.xor}
        if op in ("contains", "starts_with", "ends_with"):
            if not isinstance(e.right, Lit):
                raise SyntaxError(f"{op} needs a string literal")
            pat = e.right.value
            kern = {"contains": pc.match_substring,
                    "starts_with": pc.starts_with,
                    "ends_with": pc.ends_with}[op]
            return lambda t: kern(lf(t), pattern=pat)
        if op == "regex":
            # x =~ 'pat' matches the WHOLE string in openCypher — anchor
            # the (partial-match) Arrow kernel; pairs with DuckDB's
            # regexp_full_match in oracles
            if not isinstance(e.right, Lit):
                raise SyntaxError("=~ needs a string literal pattern")
            pat = f"^(?:{e.right.value})$"
            return lambda t: pc.match_substring_regex(lf(t), pattern=pat)
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
        if isinstance(e.arg, list):
            return set().union(*[_expr_vars(a) for a in e.arg])
        return _expr_vars(e.arg) if e.arg is not None else set()
    if isinstance(e, Not):
        return _expr_vars(e.expr)
    if isinstance(e, BinOp):
        return _expr_vars(e.left) | _expr_vars(e.right)
    if isinstance(e, Case):
        out = _expr_vars(e.operand) if e.operand is not None else set()
        for w, th in e.whens:
            out |= _expr_vars(w) | _expr_vars(th)
        return out | _expr_vars(e.default)
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
            elif e.name in ("startnode", "endnode") \
                    and isinstance(e.arg, Var):
                needed.add(f"{e.arg.name}__src"
                           if e.name == "startnode"
                           else f"{e.arg.name}__dst")
            elif isinstance(e.arg, list):
                for a in e.arg:
                    visit(a)
            elif e.arg is not None:
                visit(e.arg)
        elif isinstance(e, Not):
            visit(e.expr)
        elif isinstance(e, BinOp):
            visit(e.left)
            visit(e.right)
        elif isinstance(e, Case):
            if e.operand is not None:
                visit(e.operand)
            for w, th in e.whens:
                visit(w)
                visit(th)
            visit(e.default)

    if q.where is not None:
        visit(q.where)
    for seg, wc in q.pre:
        if seg.where is not None:
            visit(seg.where)
        for _ocs, ow in seg.optional:
            if ow is not None:
                visit(ow)
        for it in wc.items:
            visit(it.expr)
        if wc.where is not None:
            visit(wc.where)
    for _ocs, ow in q.optional:
        if ow is not None:
            visit(ow)
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
                v = _as_mask(f(b), b.num_rows)
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




def _pair_key64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a * np.int64(2**31) + b     # vids < 2^31 by engine contract


@ray.remote(num_returns=1)
def _closure_seed(sv: str, inner: str, *pieces: pa.Table) -> pa.Table:
    """One seen-partition: distinct level-1 pairs landing here."""
    good = [t for t in pieces if t.num_rows]
    empty = pa.table({sv: pa.array([], pa.int64()),
                      inner: pa.array([], pa.int64())})
    if not good:
        return empty
    t = pa.concat_tables(good).select([sv, inner])
    a = t[sv].to_numpy(zero_copy_only=False)
    b = t[inner].to_numpy(zero_copy_only=False)
    _, idx = np.unique(_pair_key64(a, b), return_index=True)
    return t.take(pa.array(np.sort(idx)))


@ray.remote(num_returns=3)
def _closure_diff(seen: pa.Table, sv: str, inner: str, *pieces: pa.Table):
    """One seen-partition level step: (new_seen, new_pairs, new_count).
    Candidates minus seen via sorted pair-key searchsorted; seen is
    functionally extended (the old object stays immutable in plasma)."""
    good = [t for t in pieces if t.num_rows]
    empty = pa.table({sv: pa.array([], pa.int64()),
                      inner: pa.array([], pa.int64())})
    if not good:
        return seen, empty, 0
    t = pa.concat_tables(good).select([sv, inner])
    a = t[sv].to_numpy(zero_copy_only=False)
    b = t[inner].to_numpy(zero_copy_only=False)
    key, idx = np.unique(_pair_key64(a, b), return_index=True)
    sa = seen[sv].to_numpy(zero_copy_only=False)
    sb = seen[inner].to_numpy(zero_copy_only=False)
    skey = np.sort(_pair_key64(sa, sb))
    if len(skey):
        pos = np.minimum(np.searchsorted(skey, key), len(skey) - 1)
        fresh = skey[pos] != key
    else:
        fresh = np.ones(len(key), bool)
    if not fresh.any():
        return seen, empty, 0
    new = t.take(pa.array(np.sort(idx[fresh])))
    return pa.concat_tables([seen, new]), new, new.num_rows


def _closure_levels(base, frontier, sv: str, inner: str, mid: str,
                    start_k: int, P, lhint, rhint, jhint, tag, ren) -> list:
    """BFS levels start_k+1.. of the unbounded reachability closure: the
    frontier starts as the level-start_k WALK set (so [*lo..] keeps
    Cypher walk semantics — a pair whose shortest walk is shorter than lo
    still matches through a longer walk), each level extends only the
    newly-discovered pairs, and the loop terminates when a level finds
    none. Returns the tagged level Datasets."""
    import ray.data as rd
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    P2 = max(1, min(16, cpus))

    def piece(row, p):
        return row[p] if P2 > 1 else row

    fr = frontier.materialize()
    fr_refs = [r for r, n in zip(fr.to_arrow_refs(), fr._block_num_rows())
               if n]
    routed = [_route.options(num_returns=P2 if P2 > 1 else 1)
              .remote(r, [sv, inner], P2) for r in fr_refs]
    seen = [_closure_seed.remote(sv, inner, *[piece(r, p) for r in routed])
            for p in range(P2)]
    levels = []
    cur = fr
    k = start_k
    while True:
        k += 1
        if k > 100_000:                # backstop; seen is monotone, so
            raise RuntimeError("varlen closure exceeded 100000 levels")
        j = hash_join(ren(cur, inner, mid), ren(base, sv, mid),
                      [mid], P, lhint, rhint)
        cand = _distinct(j.union(rd.from_arrow(jhint)),
                         [sv, inner]).materialize()
        cand_refs = [r for r, n in zip(cand.to_arrow_refs(),
                                       cand._block_num_rows()) if n]
        if not cand_refs:
            break
        routed = [_route.options(num_returns=P2 if P2 > 1 else 1)
                  .remote(r, [sv, inner], P2) for r in cand_refs]
        outs = [_closure_diff.remote(seen[p], sv, inner,
                                     *[piece(r, p) for r in routed])
                for p in range(P2)]
        seen = [o[0] for o in outs]
        counts = ray.get([o[2] for o in outs])
        if sum(counts) == 0:
            break
        new_refs = [o[1] for o, n in zip(outs, counts) if n]
        cur = rd.from_arrow_refs(new_refs).materialize()
        levels.append(tag(cur, k))
    return levels



def _varlen_hop(gf, ep, sv: str, dv: str, ctx: _Ctx, pending: list,
                P: int | None):
    """``(sv)-[:L*lo..hi]->(dv)`` → Dataset of DISTINCT (sv, dv) pairs
    connected by a path of length k ∈ [lo, hi] over the DISTINCT
    layer/prop-filtered edge set (frontier-dedup reachability, NOT path
    enumeration — each expansion level dedups to pairs, so the work per
    level is bounded by distinct pairs, and the semantics match a
    recursive CTE with UNION over (a, b, k)). The reference's grammar
    accepts a RangeLiteral (raphtory-cypher/src/parser/cypher.pest:204)
    but its RelPattern AST drops it, so semantics here follow openCypher
    reachability with per-level dedup.

    Scale notes: each level is one distributed hash join + one distinct
    shuffle, both bounded by the distinct reachable-pair count; the base
    edge set is materialized ONCE and reused by every level. Path-start
    WHERE terms (vars ⊆ {sv}) are consumed here and applied to the
    initial frontier so the expansion never grows paths that would be
    filtered at the end.

    A named binding ``[r*lo..hi]`` additionally carries the MINIMUM hop
    count per pair as column ``r__hops`` (levels tagged with k, group-min
    combine) — ``length(r)``/``size(r)`` read it, giving shortest-path
    length within the bound."""
    import ray.data as rd
    from dataclasses import replace
    lo, hi = ep.var_length
    hopcol = f"{ep.var}__hops" if ep.var is not None else None

    def _tag(ds_, k: int):
        if hopcol is None:
            return ds_

        def f(b: pa.Table, _k=k) -> pa.Table:
            return b.append_column(
                hopcol, pa.array(np.full(b.num_rows, _k), pa.int64()))
        return ds_.map_batches(f, batch_format="pyarrow",
                               zero_copy_batch=True)
    if lo < 0 or (hi is not None and hi < lo):
        raise SyntaxError(f"bad variable-length range *{lo}..{hi}")

    inner = dv if dv != sv else ctx.fresh("v")
    zero_levels = []
    if lo == 0:
        # zero-length paths (round 5): [*0..hi] binds the endpoint to the
        # START node itself — one identity row per vertex, 0 hops, no edge
        # traversed (so edge layer/property filters don't apply; path-start
        # WHERE terms do). Reference: raphtory-cypher/src/hop/rule.rs
        # (hop expansion over an optional zero-length base).
        if gf.vertices is not None:
            vids = gf.vertices["vid"].combine_chunks()
        else:
            vids = pa.array(np.arange(gf.n), pa.int64())
        zt = pa.table({sv: vids, inner: vids})
        zds = rd.from_arrow(zt)
        zpend = [(t, vs) for t, vs in pending if vs <= {sv}]
        if zpend:
            zds, _ = _apply_where(zds, zpend, {sv}, ctx)
        zero_levels = [_tag(zds, 0)]
        lo = 1
        if hi == 0:
            # pure identity pattern [*0..0] / [*0]
            zhint = pa.table({sv: pa.array([], pa.int64()),
                              inner: pa.array([], pa.int64())})
            if hopcol is not None:
                zhint = zhint.append_column(hopcol,
                                            pa.array([], pa.int64()))
            ds = zero_levels[0]
            if inner != dv:            # (a)-[*0]->(a): identity always
                def close0(b: pa.Table) -> pa.Table:
                    keep = [sv] + ([hopcol] if hopcol is not None else [])
                    return b.select(keep)
                ds = ds.map_batches(close0, batch_format="pyarrow",
                                    zero_copy_batch=True)
                zhint = zhint.drop_columns([inner])
            return ds, zhint
    scan, scan_hint = _edge_scan(gf, replace(ep, var_length=None,
                                             var=None),
                                 sv, inner, ctx, set())
    hint = scan_hint

    # distinct simple edges (after layer/prop filters) — the CTE's base
    base = _distinct(scan.union(rd.from_arrow(hint)), [sv, inner])
    # path-START restriction: filter the initial frontier only; the
    # intermediate/base edge set stays unrestricted
    start_filtered = any(vs <= {sv} for _t, vs in pending)
    frontier = base
    if start_filtered:
        frontier, rest = _apply_where(base, pending, {sv}, ctx)
        pending[:] = rest              # consumed in place for the caller
    if hi is None or hi > 1:
        base = base.materialize()      # reused by every expansion level
        frontier = frontier.materialize() if start_filtered else base
    levels = zero_levels + ([_tag(frontier, 1)] if lo <= 1 else [])
    mid = ctx.fresh("m")
    lhint = hint.rename_columns(
        [mid if c == inner else c for c in hint.column_names])
    rhint = hint.rename_columns(
        [mid if c == sv else c for c in hint.column_names])

    def _ren(ds_, old: str, new: str):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                [new if c == old else c for c in b.column_names])
        return ds_.map_batches(f, batch_format="pyarrow",
                               zero_copy_batch=True)

    jhint = lhint.join(rhint, keys=[mid], join_type="inner",
                       coalesce_keys=True)
    cur = frontier
    if hi is None:
        # unbounded [*lo..] (round 5): walk-expand to the floor level lo
        # (same per-level join as the bounded path — Cypher walk
        # semantics), then BFS fixpoint to the reachability closure. The
        # discovered-pair set lives PARTITIONED in the object store
        # (hash(sv, inner) partitions, functionally updated per level);
        # each closure level joins only the NEW frontier against the
        # base, so total join work is O(closure), not O(levels × closure).
        for k in range(2, lo + 1):
            j = hash_join(_ren(cur, inner, mid), _ren(base, sv, mid),
                          [mid], P, lhint, rhint)
            cur = _distinct(j.union(rd.from_arrow(jhint)),
                            [sv, inner]).materialize()
        if lo > 1:
            levels.append(_tag(cur, lo))
        levels += _closure_levels(base, cur, sv, inner, mid, max(lo, 1),
                                  P, lhint, rhint, jhint, _tag, _ren)
        if not levels:                 # lo > reached depth: empty result
            ehint = hint
            if hopcol is not None:
                ehint = ehint.append_column(hopcol,
                                            pa.array([], pa.int64()))
            levels = [rd.from_arrow(ehint)]
    else:
        for k in range(2, hi + 1):
            j = hash_join(_ren(cur, inner, mid), _ren(base, sv, mid),
                          [mid], P, lhint, rhint)
            cur = _distinct(j.union(rd.from_arrow(jhint)), [sv, inner])
            if k >= lo:
                if k < hi:
                    cur = cur.materialize()  # feeds both levels & next hop
                levels.append(_tag(cur, k))
    if hopcol is not None:
        hint = hint.append_column(hopcol, pa.array([], pa.int64()))
    ds = levels[0]
    if len(levels) > 1:
        u = ds.union(*levels[1:]).union(rd.from_arrow(hint))
        if hopcol is not None:
            # min hop count per pair — a pair found at level 2 may
            # reappear at level 3; shortest wins (BFS level)
            ds = _hash_group_agg(u, [sv, inner], hopcol, "min", hopcol)
        else:
            ds = _distinct(u, [sv, inner])
    if inner != dv:                        # (a)-[*..k]->(a): close cycle
        def close(b: pa.Table) -> pa.Table:
            m = pc.fill_null(pc.equal(b[sv], b[inner]), False)
            keep = [sv] + ([hopcol] if hopcol is not None else [])
            return b.filter(m).select(keep)
        ds = ds.map_batches(close, batch_format="pyarrow",
                            zero_copy_batch=True)
        if hopcol is not None:
            ds = _hash_group_agg(ds, [sv], hopcol, "min", hopcol)
            hint = pa.table({sv: pa.array([], pa.int64()),
                             hopcol: pa.array([], pa.int64())})
        else:
            hint = pa.table({sv: pa.array([], pa.int64())})
    return ds, hint


def _compose_chains(gf, ctx: _Ctx, chains: list, pending: list, carry,
                    needed: set, P: int | None):
    """Compose one segment's MATCH chains (scan → join → scan → join ...)
    and join them — plus the carried WITH output, if any — on shared
    variables. Returns (ds, bound, hint, pending)."""
    import ray.data as rd
    chain_results = []
    if carry is not None:
        cds, cvis, chint = carry
        cds, pending = _apply_where(cds, pending, cvis, ctx)
        chain_results.append((cds, set(cvis), chint))
    for ch in chains:
        if not ch.edges:               # MATCH (n): all vertices
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
            if ep.var_length is not None:
                scan, scan_hint = _varlen_hop(gf, ep, sv, dv, ctx,
                                              pending, P)
                scan_vars = set(scan_hint.column_names) \
                    | ({ep.var} if ep.var else set())
            else:
                scan, scan_hint = _edge_scan(gf, ep, sv, dv, ctx, needed)
                # pushdown: terms over only this scan's vars filter the
                # scan BEFORE it enters the join (shrinks the shuffle)
                scan_vars = {sv, dv} | ({ep.var} if ep.var else set())
                scan, pending = _apply_where(scan, pending, scan_vars,
                                             ctx)
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

    # ---- join chains (and the WITH carry) on shared variables
    ds, bound, hint = chain_results[0]
    for other, ovars, ohint in chain_results[1:]:
        shared = sorted(bound & ovars)
        if shared:
            ds = hash_join(ds, other, shared, P, hint, ohint)
            hint = hint.join(ohint, keys=shared, join_type="inner",
                             coalesce_keys=True)
        else:
            # variable-disjoint patterns: first mine pending WHERE
            # equalities that bridge the two sides and use them as
            # distributed join keys (the reference's DataFusion planner
            # turns such predicates into equi-joins too); a genuinely
            # unconstrained product falls back to a guarded broadcast
            # cross join (small side shipped once via the object store).
            pairs, pending = _bridge_eqs(pending, bound, ovars)
            if pairs:
                keys = [f"__bk{i}" for i in range(len(pairs))]
                ds = _with_key_cols(ds, [p[0] for p in pairs], keys, ctx)
                other = _with_key_cols(other, [p[1] for p in pairs],
                                       keys, ctx)
                hint = _hint_key_cols(hint, keys)
                ohint = _hint_key_cols(ohint, keys)
                ds = hash_join(ds, other, keys, P, hint, ohint)
                ds = ds.map_batches(
                    lambda b, _k=tuple(keys): b.drop_columns(list(_k)),
                    batch_format="pyarrow", zero_copy_batch=True)
                hint = hint.join(ohint, keys=keys, join_type="inner",
                                 coalesce_keys=True).drop_columns(keys)
            else:
                ds, hint = _cross_join(ds, other, hint, ohint)
        bound |= ovars
        ds, pending = _apply_where(ds, pending, bound, ctx)
    return ds, bound, hint, pending


def _bridge_eqs(pending: list, bound: set, ovars: set):
    """Pull pending ``=`` terms whose sides reference the two
    variable-disjoint inputs exclusively → [(left_expr, right_expr)]
    oriented (bound-side, other-side), plus the untouched remainder."""
    pairs, rest = [], []
    for t, vs in pending:
        if isinstance(t, BinOp) and t.op == "=":
            lv, rv = _expr_vars(t.left), _expr_vars(t.right)
            if lv and rv:
                if lv <= bound and rv <= ovars:
                    pairs.append((t.left, t.right))
                    continue
                if rv <= bound and lv <= ovars:
                    pairs.append((t.right, t.left))
                    continue
        rest.append((t, vs))
    return pairs, rest


def _with_key_cols(ds, exprs: list, names: list, ctx: _Ctx):
    """Append synthetic int64 join-key columns computed from compiled
    expressions (vectorized per batch). Non-integer-valued keys (string
    or float equality joins) are out of the int64 hash-route's domain."""
    fns = [_compile_expr(e, ctx) for e in exprs]

    def add(b: pa.Table) -> pa.Table:
        for nm, fn in zip(names, fns):
            v = fn(b)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                v = pa.array([v] * b.num_rows)
            if not pa.types.is_integer(v.type):
                raise NotImplementedError(
                    "cross-pattern equality join needs integer-valued "
                    f"key expressions, got {v.type}")
            b = b.append_column(nm, v.cast(pa.int64()))
        return b

    return ds.map_batches(add, batch_format="pyarrow",
                          zero_copy_batch=True)


def _hint_key_cols(hint: pa.Table, names: list) -> pa.Table:
    for nm in names:
        hint = hint.append_column(nm, pa.array([], pa.int64()))
    return hint


import os as _os
_CROSS_CAP = int(_os.environ.get("RA_CROSS_JOIN_CAP", "200000"))


def _cross_join(left, right, lhint: pa.Table, rhint: pa.Table):
    """Cartesian product of two variable-disjoint pattern results with no
    bridging predicate. The smaller side is materialized, capped at
    RA_CROSS_JOIN_CAP rows (an unguarded product is never the right plan
    at scale) and broadcast ONCE via ray.put; each left block emits the
    repeat×tile combination — vectorized takes, no per-row Python."""
    import ray.data as rd
    mat_l, mat_r = left.materialize(), right.materialize()
    cl, cr = mat_l.count(), mat_r.count()
    if min(cl, cr) > _CROSS_CAP:
        raise NotImplementedError(
            f"cartesian product across patterns: both sides exceed "
            f"{_CROSS_CAP} rows ({cl} x {cr}); add a bridging WHERE "
            "equality (compiled to a distributed equi-join) or raise "
            "RA_CROSS_JOIN_CAP")
    if cl < cr:                      # broadcast the smaller side
        mat_l, mat_r = mat_r, mat_l
        lhint, rhint = rhint, lhint
    batches = list(mat_r.iter_batches(batch_format="pyarrow"))
    small = (pa.concat_tables(batches).combine_chunks()
             if batches else rhint)
    small_ref = ray.put(small)

    def prod(b: pa.Table, _ref=small_ref) -> pa.Table:
        s: pa.Table = ray.get(_ref)
        n, m = b.num_rows, s.num_rows
        if n == 0 or m == 0:
            return _cross_schema(b.slice(0, 0), s.slice(0, 0))
        lt = b.take(pa.array(np.repeat(np.arange(n), m)))
        rt = s.take(pa.array(np.tile(np.arange(m), n)))
        for name, col in zip(rt.column_names, rt.columns):
            lt = lt.append_column(name, col)
        return lt

    out = mat_l.map_batches(prod, batch_format="pyarrow")
    hint = _cross_schema(lhint, rhint)
    # emptiness is already known from the side counts — never run the
    # product pipeline just to test it (count() would execute prod over
    # every block and downstream consumption would execute it AGAIN)
    if cl == 0 or cr == 0:
        out = rd.from_arrow(hint)
    return out, hint


def _cross_schema(lt: pa.Table, rt: pa.Table) -> pa.Table:
    for name, col in zip(rt.column_names, rt.columns):
        lt = lt.append_column(name, col)
    return lt


def cypher(gf, query: str, P: int | None = None):
    """Run a Cypher-subset query against a GraphFrame. Returns a
    ray.data.Dataset (streaming) whose columns are the RETURN items
    (aliased with AS, else the expression text). Supports WITH pipeline
    stages (projection / implicit-group aggregation / DISTINCT, with a
    HAVING-like WHERE) and bounded variable-length patterns [*lo..hi]."""
    q = parse_cypher(query)
    if not q.union:
        return _compile_one(gf, q, P)[0]
    # UNION [ALL]: compile each branch independently (own variable
    # scope), require matching output columns, stream-union the
    # branches; plain UNION dedups across the combined rows. A trailing
    # ORDER BY / SKIP / LIMIT (written on the last branch) applies to
    # the COMBINED result — SQL semantics, which is what the reference's
    # DataFusion transpile produces; they are disallowed on earlier
    # branches.
    alls = {a for _sub, a in q.union}
    if len(alls) > 1:
        raise SyntaxError("cannot mix UNION and UNION ALL")
    last = q.union[-1][0]
    order_by, skip, limit = last.order_by, last.skip, last.limit
    last.order_by, last.skip, last.limit = [], None, None
    for sub in [q] + [s for s, _a in q.union[:-1]]:
        if sub.order_by or sub.skip is not None or sub.limit is not None:
            raise SyntaxError("ORDER BY / SKIP / LIMIT inside a UNION "
                              "branch — write it after the last branch "
                              "(it orders the combined result)")
    branches = [_compile_one(gf, q, P)] + \
        [_compile_one(gf, sub, P) for sub, _a in q.union]
    cols = branches[0][1]
    for _ds, names in branches[1:]:
        if names != cols:
            raise SyntaxError(
                f"UNION branches must return the same columns: "
                f"{cols} vs {names}")
    out = branches[0][0].union(*[ds for ds, _n in branches[1:]])
    if not alls.pop():
        out = _distinct(out, cols)
    if order_by:
        order_cols = []
        for e, _asc in order_by:
            match = next((it for it in last.items
                          if expr_text(it.expr) == expr_text(e)
                          or (it.alias and isinstance(e, Var)
                              and e.name == it.alias)), None)
            if match is None:
                raise SyntaxError("ORDER BY after UNION must reference "
                                  "returned columns")
            order_cols.append(_out_name(match))
        out = out.sort(order_cols,
                       descending=[not asc for _e, asc in order_by])
    if skip:
        if limit is not None:
            out = out.limit(skip + limit)
        out = out.split_at_indices([skip])[1]
    elif limit is not None:
        out = out.limit(limit)
    return out


def _compile_one(gf, q: Query, P: int | None):
    """Compile one UNION-free Query → (Dataset, output column names)."""
    ctx = _Ctx(gf)

    segments = [(seg.chains, seg.where, seg.optional, wc)
                for seg, wc in q.pre]
    segments.append((q.chains, q.where, q.optional, None))

    # name anonymous node vars; classify (anonymous edges stay unnamed —
    # their scans emit no edge columns at all)
    for chains, _w, optional, _wc in segments:
        for ch in chains + [c for ocs, _ow in optional for c in ocs]:
            for np_ in ch.nodes:
                if np_.var is None:
                    np_.var = ctx.fresh("n")
                ctx.node_vars.add(np_.var)
            for ep in ch.edges:
                if ep.var is not None:
                    if ep.var in ctx.edge_vars | ctx.varlen_vars:
                        raise SyntaxError(
                            f"edge variable {ep.var!r} bound twice")
                    if ep.var_length is not None:
                        # [r*lo..hi]: r binds the pair's MINIMUM hop
                        # count, readable as length(r)/size(r) — list
                        # bindings are not supported (reachability
                        # semantics, see _varlen_hop)
                        ctx.varlen_vars.add(ep.var)
                    else:
                        ctx.edge_vars.add(ep.var)

    if q.star and q.pre:
        # RETURN * after WITH: in scope = the last WITH's projected names
        # plus variables bound by the FINAL MATCH segment
        wc = q.pre[-1][1]
        names = {it.alias or expr_text(it.expr) for it in wc.items}
        for ch in q.chains:
            for np_ in ch.nodes:
                if np_.var not in ctx.anon_vars:
                    names.add(np_.var)
            for ep in ch.edges:
                if ep.var is not None and ep.var not in ctx.varlen_vars:
                    # a [r*lo..hi] binding is not a projectable scalar
                    # (length(r) is) — skip it, matching plain RETURN *
                    names.add(ep.var)
        q.items = [ReturnItem(Var(n), None) for n in sorted(names)]
    elif q.star:
        items = []
        for v in sorted(ctx.node_vars):
            if v not in ctx.anon_vars:
                items.append(ReturnItem(Var(v), None))
        for v in sorted(ctx.edge_vars):
            items.append(ReturnItem(Var(v), None))
        if not items:
            # MATCH ()-[]->() RETURN * — the reference names the anonymous
            # relationship binding r_1 and selects its columns (transpiler
            # test select_unnamed: SELECT * FROM r_1); late-name the anon
            # edges so their scans emit columns
            k = 0
            for chains, _w, _o, _wc in segments:
                for ch in chains:
                    for ep in ch.edges:
                        if ep.var is None and ep.var_length is None:
                            k += 1
                            ep.var = f"r_{k}"
                            ctx.edge_vars.add(ep.var)
                            items.append(ReturnItem(Var(ep.var), None))
        if not items:
            raise SyntaxError("RETURN * with no variables in scope")
        q.items = items

    needed = _needed_columns(q, ctx)

    carry = None
    if q.unwind:
        # leading UNWIND literal lists → a small driver-built bindings
        # table carried into the first segment; it joins the patterns
        # via bridged equalities or the guarded broadcast cross join
        import itertools
        import ray.data as rd
        names = [n for _v, n in q.unwind]
        if len(set(names)) != len(names):
            raise SyntaxError("duplicate UNWIND variable")
        rows = list(itertools.product(*[v for v, _n in q.unwind]))
        ut = pa.table({n: pa.array([r[i] for r in rows])
                       for i, n in enumerate(names)})
        ctx.col_vars |= set(names)
        carry = (rd.from_arrow(ut), set(names), ut.slice(0, 0))
    for chains, where, optional, wc in segments:
        pending = [(t, _expr_vars(t)) for t in
                   (_and_terms(where) if where is not None else [])]
        for ch in chains:
            for np_ in ch.nodes:
                for t in _node_filters(np_, np_.var, ctx):
                    pending.append((t, {np_.var}))
        ds, bound, hint, pending = _compose_chains(
            gf, ctx, chains, pending, carry, needed, P)
        if pending:
            raise KeyError(f"WHERE references unbound variables: "
                           f"{[expr_text(t) for t, _ in pending]}")
        for ochains, owhere in optional:
            ds, bound, hint = _attach_optional(
                gf, ctx, ds, bound, hint, ochains, owhere, needed, P)
        if wc is None:
            return _project_and_finish(ds, q, ctx, hint)  # (ds, names)
        carry = _apply_with(ds, wc, ctx, hint)
    raise AssertionError("unreachable: final segment returns")


def _attach_optional(gf, ctx: _Ctx, ds, bound: set, hint: pa.Table,
                     ochains: list, owhere, needed: set, P: int | None):
    """OPTIONAL MATCH = the pattern compiled standalone (its WHERE is
    part of the pattern, openCypher semantics), then a LEFT OUTER hash
    join with the rows so far on the shared variables — unmatched rows
    keep nulls in the optional pattern's columns."""
    pending = [(t, _expr_vars(t)) for t in
               (_and_terms(owhere) if owhere is not None else [])]
    for ch in ochains:
        for np_ in ch.nodes:
            for t in _node_filters(np_, np_.var, ctx):
                pending.append((t, {np_.var}))
    ods, obound, ohint, pending = _compose_chains(
        gf, ctx, ochains, pending, None, needed, P)
    if pending:
        raise KeyError(
            "OPTIONAL MATCH ... WHERE may only reference the optional "
            f"pattern's own variables; unbound: "
            f"{[expr_text(t) for t, _ in pending]}")
    shared = sorted(bound & obound)
    if not shared:
        # variable-disjoint OPTIONAL MATCH (round 5; Neo4j semantics):
        # cartesian product when the optional pattern matched anything,
        # otherwise every left row survives with nulls in the optional
        # columns
        mat_o = ods.materialize()
        if mat_o.count() == 0:
            ocols = list(zip(ohint.column_names,
                             [f.type for f in ohint.schema]))

            def pad(b: pa.Table, _oc=tuple(ocols)) -> pa.Table:
                for name, typ in _oc:
                    if name not in b.column_names:
                        b = b.append_column(name, pa.nulls(b.num_rows, typ))
                return b

            ds = ds.map_batches(pad, batch_format="pyarrow",
                                zero_copy_batch=True)
            hint = _cross_schema(hint, ohint)
        else:
            ds, hint = _cross_join(ds, mat_o, hint, ohint)
        return ds, bound | obound, hint
    ds = hash_join(ds, ods, shared, P, hint, ohint,
                   join_type="left outer")
    hint = hint.join(ohint, keys=shared, join_type="left outer",
                     coalesce_keys=True)
    return ds, bound | obound, hint


# ------------------------------------------------- RETURN / aggregation

def _out_name(it: ReturnItem) -> str:
    return it.alias or expr_text(it.expr)


_AGG_FNS = {"count", "sum", "avg", "min", "max", "collect",
            "stdev", "stdevp", "percentilecont", "percentiledisc"}

_PCT_FNS = ("percentilecont", "percentiledisc")


def _agg_input_expr(f):
    """The VALUE expression an aggregate consumes. percentileCont/Disc
    take (expr, p) — the column input is the first arg; p is extracted
    separately by _pct_param."""
    if f.name in _PCT_FNS:
        if not isinstance(f.arg, list) or len(f.arg) != 2:
            raise SyntaxError(f"{f.name}() takes (expression, percentile)")
        return f.arg[0]
    return f.arg


def _pct_param(f) -> float:
    from raphtory_ray.query.parser import Lit
    if not isinstance(f.arg, list) or len(f.arg) != 2 \
            or not isinstance(f.arg[1], Lit):
        raise SyntaxError(f"{f.name}() needs a literal percentile")
    p = float(f.arg[1].value)
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"percentile {p} outside [0, 1]")
    return p



def _is_agg(e) -> bool:
    return isinstance(e, Func) and e.name in _AGG_FNS


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
            agg_inputs.append((f"__agg{i}", _agg_input_expr(f)))

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
                # type literal columns FROM THE VALUE even when n == 0 —
                # pa.array([]) would be null-typed, and this also runs on
                # the empty schema hint, so a null-typed hint column would
                # disagree with every real data block downstream
                v = pa.array([v]).slice(0, 0) if n == 0 \
                    else pa.array([v] * n)
            cols[name] = v
        if global_agg or not cols:
            cols["__rows"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    ds = ds.map_batches(project, batch_format="pyarrow",
                        zero_copy_batch=True)
    phint = project(hint) if hint is not None else None
    if phint is not None:
        ds = ds.union(rd.from_arrow(phint))
    key_names = [name for name, _ in proj if not name.startswith("__ord")]

    if aggs:
        ds = _aggregate(ds, q, aggs, key_names, ctx, phint)
    elif q.distinct:
        ds = _distinct(ds, key_names + [h for h, _ in hidden])

    if order_cols:
        ds = ds.sort(order_cols,
                     descending=[not asc for _e, asc in q.order_by])
    if hidden:
        ds = ds.map_batches(
            lambda b: b.drop_columns([h for h, _ in hidden]),
            batch_format="pyarrow", zero_copy_batch=True)
    if q.skip:
        if q.limit is not None:
            # SKIP+LIMIT pagination: pull only skip+limit rows through
            # the (sorted) stream, then drop the first skip — bounded
            # work regardless of input size
            ds = ds.limit(q.skip + q.limit)
        # no LIMIT: a global row offset needs materialized block counts
        ds = ds.split_at_indices([q.skip])[1]
    elif q.limit is not None:
        ds = ds.limit(q.limit)
    out_names = key_names if not aggs else \
        key_names + [_out_name(it) for it in aggs]
    return ds, out_names


@ray.remote
def _distinct_part(cols: list, *parts: pa.Table) -> pa.Table:
    t = pa.concat_tables(list(parts), promote_options="default")
    if t.num_rows == 0:
        return t.select(cols)
    return t.select(cols).group_by(cols).aggregate([])


@ray.remote
def _agg_part(cols: list, val: str, fn: str, alias: str,
              *parts: pa.Table) -> pa.Table:
    t = pa.concat_tables(list(parts), promote_options="default")
    g = t.group_by(cols).aggregate([(val, fn)])
    g = g.rename_columns([alias if c == f"{val}_{fn}" else c
                          for c in g.column_names])
    return g.select(cols + [alias])


def _int_keys(ds, cols: list) -> bool:
    """True iff every key column is integer-typed (eligible for the
    splitmix `_route` fast path, which casts keys to int64)."""
    try:
        schema = ds.schema()
        types = dict(zip(schema.names, schema.types))
        return all(pa.types.is_integer(types[c]) for c in cols)
    except Exception:
        return False


def route_fanout(mat, keys: list, task, task_args: tuple = (),
                 rows_per_part: int = 50_000):
    """MATERIALIZED Dataset → one ``task(*task_args, *pieces)`` per hash
    partition of the int64 ``keys`` (the join's `_route` tasks; partition
    count ~rows_per_part rows each, CPU-capped — the shared fan-out
    behind `_distinct`, `_hash_group_agg` and the co-purchase pair
    derivation). Returns the list of result refs, or None when every
    block is empty."""
    rows = mat._block_num_rows()
    refs = [r for r, c in zip(mat.to_arrow_refs(), rows) if c]
    if not refs:
        return None
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    P = max(1, min(max(8, cpus), -(-sum(rows) // rows_per_part)))
    parts = [_route.options(num_returns=P if P > 1 else 1)
             .remote(r, keys, P) for r in refs]
    if P == 1:
        return [task.remote(*task_args, *parts)]
    return [task.remote(*task_args, *[parts[i][p]
                                      for i in range(len(refs))])
            for p in range(P)]


def _hash_group_agg(ds, cols: list, val: str, fn: str, alias: str):
    """Grouped decomposable aggregate (fn ∈ sum/min/max — combine of
    partials equals the total): per-block partial (combiner — the shuffle
    moves one row per distinct key per block), then for all-integer keys
    one raw hash-route + per-partition Arrow aggregate — the join's
    `_route` tasks, no sort exchange. Falls back to Ray's groupby for
    non-integer keys."""
    import ray.data as rd

    def local(b: pa.Table) -> pa.Table:
        g = b.select(cols + [val]).group_by(cols).aggregate([(val, fn)])
        return g.rename_columns([val if c == f"{val}_{fn}" else c
                                 for c in g.column_names])

    pre = ds.map_batches(local, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    if not any(pre._block_num_rows()):
        # typed empty result (the input schema survives the local pass)
        try:
            types = dict(zip(pre.schema().names, pre.schema().types))
            z = {c: pa.array([], types[c]) for c in cols}
            z[alias] = pa.array([], types[val])
        except Exception:
            z = {c: pa.array([], pa.int64()) for c in cols}
            z[alias] = pa.array([], pa.int64())
        return rd.from_arrow(pa.table(z))
    if not _int_keys(pre, cols):
        from ray.data.aggregate import Max, Min, Sum
        agg = {"sum": Sum, "min": Min, "max": Max}[fn](val)

        def rn(b: pa.Table) -> pa.Table:
            g = b.rename_columns([alias if c == f"{fn}({val})" else c
                                  for c in b.column_names])
            return g.select(cols + [alias])
        return pre.groupby(cols).aggregate(agg) \
            .map_batches(rn, batch_format="pyarrow", zero_copy_batch=True)
    return rd.from_arrow_refs(
        route_fanout(pre, cols, _agg_part, (cols, val, fn, alias)))


def group_count(ds, cols: list, alias: str = "n"):
    """COUNT(*) grouped by key columns — per-block partial counts then
    the `_hash_group_agg` sum combine."""
    def local(b: pa.Table) -> pa.Table:
        g = b.select(cols).group_by(cols).aggregate([([], "count_all")])
        g = g.rename_columns(["__cnt" if c == "count_all" else c
                              for c in g.column_names])
        return g.select(cols + ["__cnt"])

    pre = ds.map_batches(local, batch_format="pyarrow",
                         zero_copy_batch=True)
    return _hash_group_agg(pre, cols, "__cnt", "sum", alias)


def _distinct(ds, cols: list):
    """DISTINCT over ``cols``: per-block Arrow group_by dedup (combiner —
    shrinks the shuffle to distinct-per-block), then for all-integer keys
    ONE raw hash-route + per-partition Arrow dedup (same `_route` tasks
    as the join; partition count sized to rows like the join's auto-P),
    else Ray's groupby-Count (sort exchange). Never groupby().map_groups,
    which dispatches a Python UDF once PER GROUP (one call per distinct
    row here)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    def local(b: pa.Table) -> pa.Table:
        return b.select(cols).group_by(cols).aggregate([])

    pre = ds.map_batches(local, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
    if not any(pre._block_num_rows()):
        return pre
    if not _int_keys(pre, cols):
        return pre.groupby(cols).aggregate(Count()).select_columns(cols)
    return rd.from_arrow_refs(route_fanout(pre, cols, _distinct_part,
                                           (cols,)))


def _agg_hint(phint: pa.Table, aggs: list, key_names: list) -> pa.Table:
    """Empty table with the post-aggregation schema (key columns + one
    typed column per aggregate) — the carry hint for the segment after a
    WITH with aggregates."""
    cols = {k: phint[k] for k in key_names}
    for i, it in enumerate(aggs):
        f: Func = it.expr
        name = _out_name(it)
        if f.name == "count":
            t = pa.int64()
        elif f.name in ("avg", "stdev", "stdevp"):
            t = pa.float64()
        elif f.name == "collect":
            t = pa.list_(phint[f"__agg{i}"].type)
        else:                          # sum/min/max keep the input type
            t = phint[f"__agg{i}"].type
        cols[name] = pa.array([], t)
    return pa.table(cols)


def _apply_with(ds, wc, ctx: _Ctx, hint: pa.Table):
    """Execute one WITH clause over the segment's bindings: project the
    items (implicit grouping by the non-aggregate items, exactly like
    RETURN), apply DISTINCT, then the clause's WHERE (openCypher's
    HAVING-equivalent: it filters the PROJECTED rows). Returns the carry
    triple (ds, visible names, schema hint) for the next segment, and
    registers the new column/node visibility on ctx."""
    import ray.data as rd
    aggs = [it for it in wc.items if _is_agg(it.expr)]
    keys = [it for it in wc.items if not _is_agg(it.expr)]
    if wc.distinct and aggs:
        raise SyntaxError("WITH DISTINCT cannot combine with aggregates")

    proj: list = []
    new_nodes: set = set()
    new_cols: set = set()
    for it in keys:
        name = _out_name(it)
        if isinstance(it.expr, Var) and it.expr.name in ctx.edge_vars:
            raise NotImplementedError(
                "cannot carry a bare edge variable through WITH — "
                "project the fields you need (e.t AS t, ...)")
        proj.append((name, it.expr))
        if isinstance(it.expr, Var) and it.expr.name in ctx.node_vars:
            new_nodes.add(name)        # node-id passthrough (maybe aliased)
        else:
            new_cols.add(name)
    agg_inputs: list = []
    for i, it in enumerate(aggs):
        f: Func = it.expr
        if f.arg is not None:
            agg_inputs.append((f"__agg{i}", _agg_input_expr(f)))
        new_cols.add(_out_name(it))

    fns = [(name, _compile_expr(e, ctx)) for name, e in proj + agg_inputs]
    global_agg = bool(aggs) and not keys

    def project(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {}
        for name, f in fns:
            v = f(b)
            if not isinstance(v, (pa.Array, pa.ChunkedArray)):
                # type literal columns FROM THE VALUE even when n == 0 —
                # pa.array([]) would be null-typed, and this also runs on
                # the empty schema hint, so a null-typed hint column would
                # disagree with every real data block downstream
                v = pa.array([v]).slice(0, 0) if n == 0 \
                    else pa.array([v] * n)
            cols[name] = v
        if global_agg or not cols:
            cols["__rows"] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    ds = ds.map_batches(project, batch_format="pyarrow",
                        zero_copy_batch=True)
    phint = project(hint)
    ds = ds.union(rd.from_arrow(phint))
    key_names = [name for name, _ in proj]

    if aggs:
        ds = _aggregate(ds, None, aggs, key_names, ctx, phint)
        hint2 = _agg_hint(phint, aggs, key_names)
    elif wc.distinct:
        ds = _distinct(ds, key_names)
        hint2 = phint
    else:
        hint2 = phint

    ctx.node_vars |= new_nodes
    ctx.col_vars |= new_cols
    visible = new_nodes | new_cols

    if wc.where is not None:
        terms = _and_terms(wc.where)
        for t in terms:
            missing = _expr_vars(t) - visible
            if missing:
                raise KeyError(f"WITH ... WHERE references names not "
                               f"projected by the WITH: {sorted(missing)}")
        filt_fns = [_compile_expr(t, ctx) for t in terms]

        def filt(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b
            m = None
            for f in filt_fns:
                v = _as_mask(f(b), b.num_rows)
                m = v if m is None else pc.and_kleene(m, v)
            return b.filter(pc.fill_null(m, False))

        ds = ds.map_batches(filt, batch_format="pyarrow",
                            zero_copy_batch=True).union(
                                rd.from_arrow(hint2))
    return ds, visible, hint2


def _aggregate(ds, q: Query, aggs: list, key_names: list, ctx: _Ctx,
               phint: pa.Table | None = None):
    from ray.data.aggregate import Count, Max, Mean, Min, Sum
    import ray.data as rd

    distinct_aggs = [it for it in aggs if it.expr.distinct]
    if distinct_aggs and not (len(aggs) == 1
                              and aggs[0].expr.name == "count"):
        # DISTINCT inside any other aggregate (or mixed with others):
        # per-group exact path — the group's values dedupe in-task
        # before aggregating (round 5; Neo4j allows DISTINCT in every
        # aggregating function). The lone count(DISTINCT) keeps its
        # fully-distributed distinct+sum fast path below.
        return _aggregate_with_collect(ds, aggs, key_names, phint)
    if distinct_aggs:
        it = aggs[0]
        dcol = "__agg0"
        ds = _distinct(ds, key_names + [dcol])
        # openCypher/SQL count(DISTINCT x) EXCLUDES nulls; the distinct
        # pass keeps one null-keyed row per group, so count the non-null
        # indicator instead of rows (an all-null group still appears,
        # with 0 — matching SQL GROUP BY semantics)
        nn = "__nn"

        def mark(b: pa.Table, _d=dcol, _n=nn) -> pa.Table:
            return b.append_column(
                _n, pc.is_valid(b[_d]).cast(pa.int64()))

        ds = ds.map_batches(mark, batch_format="pyarrow",
                            zero_copy_batch=True)
        if key_names:
            out = ds.groupby(key_names).aggregate(
                Sum(nn, alias_name=_out_name(it)))
            return out
        n = ds.sum(nn) or 0
        return rd.from_arrow(pa.table({_out_name(it):
                                       pa.array([n], pa.int64())}))

    if any(it.expr.name in ("collect", "percentilecont", "percentiledisc")
           for it in aggs):
        return _aggregate_with_collect(ds, aggs, key_names, phint)

    # stDev/stDevP decompose as (n, Σx, Σx²) — three Sum/Count combines
    # feeding sqrt((n·Σx² − (Σx)²) / (n·(n−ddof))) in ONE finalize pass.
    # On integral inputs every partial is an exact float64 integer, so
    # the result is bit-identical to any engine evaluating the same
    # closed form (libm-free: sub/mul exact, div and sqrt correctly
    # rounded). Neo4j semantics: n ≤ ddof (empty group / single sample
    # for stDev) → 0.0.
    sd_plan = [(i, _out_name(it), 1 if it.expr.name == "stdev" else 0)
               for i, it in enumerate(aggs)
               if it.expr.name in ("stdev", "stdevp")]
    if sd_plan:
        sq = [f"__agg{i}" for i, _, _ in sd_plan]

        def add_squares(b: pa.Table, _sq=sq) -> pa.Table:
            for c in _sq:
                x = pc.cast(b[c], pa.float64())
                b = b.append_column(c + "q", pc.multiply(x, x))
            return b

        ds = ds.map_batches(add_squares, batch_format="pyarrow",
                            zero_copy_batch=True)

    specs = []
    for i, it in enumerate(aggs):
        f: Func = it.expr
        name = _out_name(it)
        col = f"__agg{i}"
        if f.name in ("stdev", "stdevp"):
            specs.append(Sum(col, alias_name=f"__sd_s1_{i}"))
            specs.append(Sum(col + "q", alias_name=f"__sd_s2_{i}"))
            specs.append(Count(on=col, ignore_nulls=True,
                               alias_name=f"__sd_n_{i}"))
        elif f.name == "count":
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
        out = ds.groupby(key_names).aggregate(*specs)
        if sd_plan:
            order = key_names + [_out_name(it) for it in aggs]
            out = out.map_batches(
                lambda b, _o=order: _finish_stdev(b, sd_plan).select(_o),
                batch_format="pyarrow", zero_copy_batch=True)
        return out
    res = ds.aggregate(*specs)
    cols = {}
    for i, it in enumerate(aggs):
        name = _out_name(it)
        if it.expr.name in ("stdev", "stdevp"):
            ddof = 1 if it.expr.name == "stdev" else 0
            n = res.get(f"__sd_n_{i}") or 0
            s1 = res.get(f"__sd_s1_{i}") or 0.0
            s2 = res.get(f"__sd_s2_{i}") or 0.0
            den = n * (n - ddof)
            v = float(np.sqrt(max(n * s2 - s1 * s1, 0.0) / den)) \
                if den > 0 else 0.0
            cols[name] = pa.array([v], pa.float64())
        else:
            v = res.get(name)
            if v is None and it.expr.name in ("count", "sum"):
                # openCypher: count/sum of no rows = 0 (typed, not a
                # null-typed column — same rule the collect path applies)
                v = 0
            cols[name] = pa.array([v]) if v is not None \
                else pa.array([None], pa.float64())
    return rd.from_arrow(pa.table(cols))


def _finish_stdev(b: pa.Table, plan: list) -> pa.Table:
    """Turn the (n, Σx, Σx²) combine columns into the stdev column(s)
    and drop the scaffolding. All-null groups have Sum = null → 0."""
    for i, name, ddof in plan:
        n = b[f"__sd_n_{i}"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s1 = pc.fill_null(pc.cast(b[f"__sd_s1_{i}"], pa.float64()),
                          0.0).to_numpy(zero_copy_only=False)
        s2 = pc.fill_null(pc.cast(b[f"__sd_s2_{i}"], pa.float64()),
                          0.0).to_numpy(zero_copy_only=False)
        den = n * (n - ddof)
        num = np.maximum(n * s2 - s1 * s1, 0.0)
        res = np.where(den > 0,
                       np.sqrt(num / np.where(den > 0, den, 1.0)), 0.0)
        b = b.append_column(name, pa.array(res, pa.float64()))
    return b.drop_columns([c for c in b.column_names
                           if c.startswith("__sd_")])


def _aggregate_with_collect(ds, aggs: list, key_names: list,
                            phint: pa.Table | None = None):
    """collect(x) (plus any companion count/sum/avg/min/max) via
    groupby().map_groups — the list is materialized per group, which is
    inherent to collect()'s semantics (a hot key's whole group lands in
    one task; cap group sizes upstream if keys are skewed). Values are
    null-dropped (openCypher collect skips nulls) and sorted ascending:
    openCypher leaves collect order unspecified, and a deterministic
    order makes results reproducible and oracle-checkable."""
    import ray.data as rd
    plan = []                           # (out_name, fn_name, in_col)
    pct = {}                            # out_name -> percentile p
    distinct_names = set()              # aggs with DISTINCT values
    for i, it in enumerate(aggs):
        f: Func = it.expr
        plan.append((_out_name(it), f.name,
                     None if f.arg is None else f"__agg{i}"))
        if f.name in _PCT_FNS:
            pct[_out_name(it)] = _pct_param(f)
        if f.distinct:
            distinct_names.add(_out_name(it))
    grouped = bool(key_names)
    if not grouped:
        ds = ds.map_batches(
            lambda b: b.append_column("__gk", pa.array(
                np.zeros(b.num_rows, np.int8))),
            batch_format="pyarrow", zero_copy_batch=True)
        key_names = ["__gk"]

    def agg_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _collect_empty(g, plan, key_names, grouped)
        cols = {k: g[k].slice(0, 1) for k in key_names if grouped}
        for name, fn, col in plan:
            v = g[col].combine_chunks() if col is not None else None
            if v is not None and name in distinct_names:
                # DISTINCT: dedupe (nulls dropped — count(DISTINCT)
                # excludes them; sum/avg/min/max ignore them anyway)
                v = pc.unique(pc.drop_null(v))
            if fn == "collect":
                vals = pc.array_sort_indices(pc.drop_null(v))
                vals = pc.drop_null(v).take(vals)
                cols[name] = pa.array([vals.to_pylist()],
                                      pa.list_(v.type))
            elif fn == "count":
                n = g.num_rows if v is None else \
                    (len(v) - v.null_count)
                cols[name] = pa.array([n], pa.int64())
            elif fn == "sum":
                cols[name] = pa.array([pc.sum(v).as_py()])
            elif fn == "avg":
                cols[name] = pa.array(
                    [pc.mean(v).as_py()], pa.float64())
            elif fn == "min":
                cols[name] = pa.array([pc.min(v).as_py()], v.type)
            elif fn == "max":
                cols[name] = pa.array([pc.max(v).as_py()], v.type)
            elif fn in ("stdev", "stdevp"):
                x = pc.cast(pc.drop_null(v), pa.float64()).to_numpy(
                    zero_copy_only=False)
                ddof = 1 if fn == "stdev" else 0
                den = len(x) * (len(x) - ddof)
                val = float(np.sqrt(max(
                    len(x) * (x * x).sum() - x.sum() ** 2, 0.0) / den)) \
                    if den > 0 else 0.0
                cols[name] = pa.array([val], pa.float64())
            elif fn in _PCT_FNS:
                # Neo4j semantics: percentileCont = linear interpolation
                # at rank p·(n−1); percentileDisc = nearest-rank (the
                # smallest value with cumulative share ≥ p)
                x = np.sort(pc.cast(pc.drop_null(v), pa.float64())
                            .to_numpy(zero_copy_only=False))
                if len(x) == 0:
                    cols[name] = pa.array([None], pa.float64())
                elif fn == "percentilecont":
                    r = pct[name] * (len(x) - 1)
                    lo, hi = int(np.floor(r)), int(np.ceil(r))
                    cols[name] = pa.array(
                        [float(x[lo] + (x[hi] - x[lo]) * (r - lo))],
                        pa.float64())
                else:
                    idx = max(int(np.ceil(pct[name] * len(x))), 1) - 1
                    cols[name] = pa.array([float(x[idx])], pa.float64())
            else:
                raise NotImplementedError(f"aggregate {fn}()")
        return pa.table(cols)

    out = ds.groupby(key_names).map_groups(agg_group,
                                           batch_format="pyarrow")
    if grouped:
        return out
    # GLOBAL collect: openCypher returns ONE row even on an empty match
    # (collect → [], count → 0); map_groups sees no groups there, so
    # materialize (the global result is ≤1 row) and backfill the default
    parts = [b for b in out.iter_batches(batch_format="pyarrow")
             if b.num_rows]
    if parts:
        return rd.from_arrow(pa.concat_tables(parts,
                                              promote_options="default"))
    cols = {}
    for name, fn, col in plan:
        t = phint[col].type if (phint is not None and col is not None
                                and col in phint.column_names) \
            else pa.int64()
        if fn == "collect":
            cols[name] = pa.array([[]], pa.list_(t))
        elif fn == "count":
            cols[name] = pa.array([0], pa.int64())
        elif fn == "sum":
            cols[name] = pa.array([0], t)     # Cypher: sum of empty = 0
        elif fn in ("stdev", "stdevp"):
            cols[name] = pa.array([0.0], pa.float64())
        elif fn == "avg" or fn in _PCT_FNS:
            cols[name] = pa.array([None], pa.float64())
        else:
            cols[name] = pa.array([None], t)
    return rd.from_arrow(pa.table(cols))


def _collect_empty(g: pa.Table, plan, key_names, grouped) -> pa.Table:
    cols = {k: g[k] for k in key_names if grouped}
    for name, fn, col in plan:
        t = g[col].type if col is not None else pa.int64()
        if fn == "collect":
            cols[name] = pa.array([], pa.list_(t))
        elif fn == "count":
            cols[name] = pa.array([], pa.int64())
        elif fn in ("avg", "stdev", "stdevp") or fn in _PCT_FNS:
            cols[name] = pa.array([], pa.float64())
        else:
            cols[name] = pa.array([], t)
    return pa.table(cols)
