"""Distributed as-of join — the classic temporal "latest value at or
before t" join (DuckDB/kdb ASOF JOIN, pandas merge_asof semantics).

For every left row, attach the right row with the greatest ``on`` value
satisfying ``right.on <= left.on`` (direction="backward"; "forward" and
"nearest" mirror pandas), matching within equal ``by`` keys. Unmatched
left rows keep nulls in the right columns (LEFT ASOF JOIN).

Scale shape (100-TB design notes):
- ONE explicit hash(by) shuffle per side (dedup._route convention — a
  single argsort + take per block, O(P) objects per block), then each
  partition does a local O(n log n) sort + linear galloping merge
  (pandas' C merge_asof kernel). No broadcast, no all-pairs.
- Partitioning assumption: all rows of one ``by`` key are co-located.
  A single pathological hot key is bounded by its own partition; it
  cannot be salted without changing semantics — the documented
  extension for that case is range-partitioning on ``on`` plus a
  boundary exchange of each key's last right row per time slice.
- Output is returned as a Ray Dataset built from the per-partition
  result refs — the join never materializes on the driver.

Determinism: when right has duplicate (by, on) rows, the kernel sorts
right by (on, <value columns>) stable, so the row with the greatest
value tuple wins — re-running or resharding picks the same row.

Reference context: Raphtory has no relational as-of join; its
temporal-property "latest value at time t" accessor
(raphtory/src/db/api/properties/temporal_props.rs) computes the same
per-entity semantics, which this operator generalizes to arbitrary
tables.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
def _route_by(tbl: pa.Table, col: str, P: int):
    from raphtory_ray.data.dedup import _hash_bucket, _route
    k = tbl[col].to_numpy(zero_copy_only=False).astype(np.int64)
    return _route(tbl, _hash_bucket(k, P), P)


@ray.remote
def _merge_part(by: str, on: str, direction: str, schema: pa.Schema,
                nl: int, *pieces: pa.Table) -> pa.Table:
    import pandas as pd
    lefts = [t for t in pieces[:nl] if t.num_rows]
    rights = [t for t in pieces[nl:] if t.num_rows]

    def finish(df: "pd.DataFrame") -> pa.Table:
        # column-wise conversion with from_pandas=True so NaN from
        # unmatched rows becomes null instead of poisoning int columns
        return pa.table(
            {f.name: pa.array(df[f.name], type=f.type, from_pandas=True)
             for f in schema}, schema=schema)

    if not lefts:
        return schema.empty_table()
    L = pa.concat_tables(lefts).to_pandas()
    rcols = [f.name for f in schema
             if f.name not in L.columns]        # right value columns
    if not rights:
        for c in rcols:
            L[c] = None
        return finish(L)
    R = pa.concat_tables(rights).to_pandas()
    L = L.sort_values(on, kind="mergesort", ignore_index=True)
    R = R.sort_values([on] + [c for c in R.columns if c not in (by, on)],
                      kind="mergesort", ignore_index=True)
    out = pd.merge_asof(L, R, on=on, by=by, direction=direction,
                        allow_exact_matches=True)
    return finish(out)


def asof_join(left, right, by: str, on: str,
              direction: str = "backward") -> "ray.data.Dataset":
    """LEFT ASOF JOIN of two Ray Datasets on (``by`` equality, ``on``
    as-of inequality). ``by`` must be int-typed (hash-routed); ``on`` is
    any ordered type shared by both sides. Right columns other than
    (by, on) are appended to the left schema (pre-rename them on the
    right Dataset if they collide with left names). Returns a Dataset;
    row order is partition order (sort downstream if needed)."""
    import ray.data as rd
    lrefs = left.materialize().to_arrow_refs()
    rrefs = right.materialize().to_arrow_refs()
    ls, rs = left.schema(), right.schema()
    lnames = list(ls.names)
    rval = [n for n in rs.names if n not in (by, on)]
    clash = set(lnames) & set(rval)
    if clash:
        raise ValueError(f"right value columns collide with left: {clash}"
                         " — rename them on the right side first")
    fields = [pa.field(n, ls.types[i]) for i, n in enumerate(lnames)]
    fields += [pa.field(n, rs.types[rs.names.index(n)]) for n in rval]
    schema = pa.schema(fields)

    P = max(1, min(32, max(len(lrefs), len(rrefs))))
    nr = P if P > 1 else 1
    lrouted = [_route_by.options(num_returns=nr).remote(r, by, P)
               for r in lrefs]
    rrouted = [_route_by.options(num_returns=nr).remote(r, by, P)
               for r in rrefs]
    if P == 1:
        lcols, rcols = [[r] for r in lrouted], [[r] for r in rrouted]
        lcols, rcols = [sum(lcols, [])], [sum(rcols, [])]
    else:
        lcols = [[lrouted[i][p] for i in range(len(lrouted))]
                 for p in range(P)]
        rcols = [[rrouted[i][p] for i in range(len(rrouted))]
                 for p in range(P)]
    parts = [_merge_part.remote(by, on, direction, schema, len(lc),
                                *(lc + rc))
             for lc, rc in zip(lcols, rcols)]
    return rd.from_arrow_refs(parts)
