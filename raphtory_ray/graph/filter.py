"""Composable typed property-filter algebra over Arrow batches.

Mirrors the reference's filter model (filter/mod.rs:13-21 and
model/filter_operator.rs: Eq/Ne/Lt/Le/Gt/Ge/IsIn/IsNotIn/Contains/
NotContains/StartsWith/EndsWith/IsSome/IsNone/FuzzySearch, composed with
And/Or/Not — python surface python/raphtory/filter/__init__.pyi FilterExpr /
PropertyFilterOps). Here a filter is a small expression tree whose leaves
evaluate to boolean masks with pyarrow.compute kernels, so a filter view is
one vectorized ``map_batches`` stage — no per-row Python in the hot path.

Usage::

    from raphtory_ray.graph.filter import Prop, Field
    f = (Prop("event_type") == "purchase") & (Prop("value") > 10.0)
    gf.filter_exploded_edges(f)        # per-event
    gf.filter_edges(f)                 # per-edge, latest event's properties
    gf.filter_nodes(Field("gid").starts_with("org1/"))
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class FilterExpr:
    """Boolean expression tree; combine with ``&``, ``|``, ``~``."""

    def __init__(self, kind: str, children=None, leaf=None):
        self.kind = kind          # "and" | "or" | "not" | "leaf"
        self.children = children or []
        self.leaf = leaf          # (op, column, value, extra)

    def __and__(self, other: "FilterExpr") -> "FilterExpr":
        return FilterExpr("and", [self, other])

    def __or__(self, other: "FilterExpr") -> "FilterExpr":
        return FilterExpr("or", [self, other])

    def __invert__(self) -> "FilterExpr":
        return FilterExpr("not", [self])

    # ------------------------------------------------------------ evaluation
    def mask(self, tbl: pa.Table) -> pa.Array:
        """Boolean mask over the table's rows. Missing columns behave like
        all-null columns (reference semantics: comparisons on absent
        properties are false; is_none is true)."""
        if self.kind == "and":
            m = self.children[0].mask(tbl)
            for c in self.children[1:]:
                m = pc.and_kleene(m, c.mask(tbl))
            return _false_nulls(m)
        if self.kind == "or":
            m = self.children[0].mask(tbl)
            for c in self.children[1:]:
                m = pc.or_kleene(m, c.mask(tbl))
            return _false_nulls(m)
        if self.kind == "not":
            return _false_nulls(pc.invert(self.children[0].mask(tbl)))
        return _false_nulls(_eval_leaf(self.leaf, tbl))


def _false_nulls(m) -> pa.Array:
    """Null comparison results count as non-matching (reference: filters on
    absent/None props drop the row)."""
    if isinstance(m, pa.ChunkedArray):
        m = m.combine_chunks()
    return pc.fill_null(m, False)


def _col(tbl: pa.Table, name: str):
    if name in tbl.column_names:
        c = tbl[name]
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    return pa.nulls(tbl.num_rows)


def _levenshtein_leq(a: str, b: str, k: int) -> bool:
    """Banded Levenshtein ≤ k (early-exit DP). Matches the reference's
    FuzzySearch levenshtein_distance bound."""
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return False
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        lo = max(1, i - k)
        hi = min(lb, i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        for j in range(lo, hi + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        if min(cur[max(0, lo - 1):hi + 1]) > k:
            return False
        prev = cur
    return prev[lb] <= k


def _eval_leaf(leaf, tbl: pa.Table):
    op, name, value, extra = leaf
    if op == "selfloop":
        # structural edge predicate (GqlEdgeFilter::IsSelfLoop,
        # raphtory-graphql filtering.rs): src == dst on the edge table
        return pc.equal(_col(tbl, "src"), _col(tbl, "dst"))
    col = _col(tbl, name)
    if op == "is_none":
        return pc.is_null(col)
    if op == "is_some":
        return pc.is_valid(col)
    if op == "eq":
        return pc.equal(col, value)
    if op == "ne":
        return pc.not_equal(col, value)
    if op == "lt":
        return pc.less(col, value)
    if op == "le":
        return pc.less_equal(col, value)
    if op == "gt":
        return pc.greater(col, value)
    if op == "ge":
        return pc.greater_equal(col, value)
    if op == "is_in":
        return pc.is_in(col, value_set=pa.array(list(value)))
    if op == "is_not_in":
        return pc.invert(pc.is_in(col, value_set=pa.array(list(value))))
    if op == "contains":
        return pc.match_substring(col, value)
    if op == "not_contains":
        return pc.invert(pc.match_substring(col, value))
    if op == "starts_with":
        return pc.starts_with(col, pattern=value)
    if op == "ends_with":
        return pc.ends_with(col, pattern=value)
    if op == "fuzzy":
        # per-UNIQUE-value Levenshtein (dictionary-encode first): the DP is
        # Python, but runs once per distinct string, not per row
        dist, prefix = extra
        dd = pc.dictionary_encode(col)
        uniq = dd.dictionary.to_pylist()
        ok = np.zeros(len(uniq), dtype=bool)
        q = value.lower()
        for i, u in enumerate(uniq):
            if u is None:
                continue
            s = u.lower()
            if prefix and s.startswith(q):
                ok[i] = True
            else:
                ok[i] = _levenshtein_leq(q, s, dist)
        idx = dd.indices.to_numpy(zero_copy_only=False)
        res = np.zeros(len(idx), dtype=bool)
        valid = idx >= 0
        res[valid] = ok[idx[valid]]
        return pa.array(res)
    raise ValueError(f"unknown filter op {op}")


class PropertyFilterOps:
    """Builder for a single column/property; each comparison returns a
    FilterExpr leaf (python surface: filter.PropertyFilterOps)."""

    def __init__(self, name: str):
        self.name = name

    def _leaf(self, op, value=None, extra=None) -> FilterExpr:
        return FilterExpr("leaf", leaf=(op, self.name, value, extra))

    def __eq__(self, value):          # type: ignore[override]
        return self._leaf("eq", value)

    def __ne__(self, value):          # type: ignore[override]
        return self._leaf("ne", value)

    def __lt__(self, value):
        return self._leaf("lt", value)

    def __le__(self, value):
        return self._leaf("le", value)

    def __gt__(self, value):
        return self._leaf("gt", value)

    def __ge__(self, value):
        return self._leaf("ge", value)

    def is_in(self, values) -> FilterExpr:
        return self._leaf("is_in", values)

    def is_not_in(self, values) -> FilterExpr:
        return self._leaf("is_not_in", values)

    def contains(self, value: str) -> FilterExpr:
        return self._leaf("contains", value)

    def not_contains(self, value: str) -> FilterExpr:
        return self._leaf("not_contains", value)

    def starts_with(self, value: str) -> FilterExpr:
        return self._leaf("starts_with", value)

    def ends_with(self, value: str) -> FilterExpr:
        return self._leaf("ends_with", value)

    def is_some(self) -> FilterExpr:
        return self._leaf("is_some")

    def is_none(self) -> FilterExpr:
        return self._leaf("is_none")

    def fuzzy_search(self, value: str, levenshtein_distance: int = 2,
                     prefix_match: bool = False) -> FilterExpr:
        return self._leaf("fuzzy", value,
                          (levenshtein_distance, prefix_match))


def Prop(name: str) -> PropertyFilterOps:
    """Property accessor (reference filter.Prop): a property is a column of
    the edge-event / node table."""
    return PropertyFilterOps(name)


def Field(name: str) -> PropertyFilterOps:
    """Structural field accessor (Node.name / Node.node_type equivalents;
    for this engine: 'gid', 'node_type', 'src', 'dst', 't', 'layer')."""
    return PropertyFilterOps(name)
