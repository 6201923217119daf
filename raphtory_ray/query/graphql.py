"""GraphQL-subset read surface over a GraphFrame — server-less.

The reference fronts its engine with a GraphQL server
(raphtory-graphql/src/model/graph/graph.rs:107-577: view transforms,
counts, node/edge pagination; nodes.rs/edges.rs page over sorted lists).
The sandbox has no network, and SURVEY §2.11 scopes the server itself
out — but the QUERY surface is pure read API, so this module executes
GraphQL documents directly against a GraphFrame: ``execute(gf, doc)``
parses the selection set and resolves each field through the engine's
existing view algebra / kernels, returning the standard
``{"data": ...}`` JSON shape.

Supported fields (camelCase, mirroring graph.rs resolver names):

- view transforms, each returning a nested graph context:
  ``window(start, end)``, ``at(time)``, ``before(time)``,
  ``after(time)``, ``snapshotAt(time)``, ``snapshotLatest``,
  ``shrinkWindow(start, end)``, ``shrinkStart(time)``,
  ``shrinkEnd(time)``, ``layer(name)`` / ``layers(names: [...])``,
  ``excludeLayer(name)`` / ``excludeLayers(names: [...])``,
  ``defaultLayer``, ``subgraph(nodes: [...])``,
  ``subgraphNodeTypes(nodeTypes: [...])``, ``excludeNodes(nodes:
  [...])``; plus ``rolling(window, step)`` / ``expanding(step)``
  WindowSets returning LISTS of window contexts with ``start``/``end``
- composable filter views (filtering.rs input objects):
  ``filterNodes(expr: NodeFilter)`` — node field/property conditions
  (eq/ne/gt/ge/lt/le/contains/startsWith/endsWith/isIn/isNotIn/
  isSome/isNone/fuzzySearch) combined with and/or/not; edges survive
  only when both endpoints match. ``filterEdges(expr: EdgeFilter)`` —
  property (latest-event), temporalProperty (any-event), metadata,
  src/dst endpoint NodeFilters, layers, isSelfLoop, and/or/not; nodes
  remain in the view. ``applyViews(views: [...])`` folds an ordered
  list of one-of view variants left-to-right (graph.rs apply_views)
- ``searchNodes(filter, limit, offset)`` / ``searchEdges(filter,
  limit, offset)`` — exact filter match + deterministic page
  (graph.rs:801,829; the engine's vectorized FilterExpr mask plays
  the role of the reference's tantivy exact search)
- scalars: ``countNodes`` (under a time view: event-active nodes only,
  graph.rs windowed semantics), ``countEdges`` (distinct simple
  edges), ``countTemporalEdges`` (event rows), ``earliestTime``,
  ``latestTime``, ``earliestEdgeTime``, ``latestEdgeTime``,
  ``hasNode(name)``, ``hasEdge(src, dst)``; graph-level
  ``properties`` / ``metadata(key?)`` / ``propertyHistory(key)``
  (window-aware latest values + history); ``schema`` introspection
  (node types, per-layer (srcType, dstType) combos, property columns)
- ``nodes(offset, limit)`` — vid-ordered page; node fields: ``id``,
  ``name`` (gid), ``nodeType``, ``degree``, ``inDegree``,
  ``outDegree``, ``neighbours`` / ``inNeighbours`` /
  ``outNeighbours(limit)`` (node.rs:458-498), ``metadata(key?)``,
  ``properties(keys?)`` (latest values),
  ``propertyHistory(key)``; temporal accessors ``earliestTime`` /
  ``latestTime`` / ``firstUpdate`` / ``lastUpdate`` / ``history`` /
  ``edgeHistoryCount`` / ``isActive`` (page-batched: one edge pass
  per page); per-node ``edges`` / ``outEdges`` / ``inEdges(select:
  EdgeFilter)`` pages, ``inComponent`` / ``outComponent`` (frontier
  BFS), and node-level view transforms + ``rolling`` / ``expanding``
  WindowSets (node.rs:73-267)
- ``node(name)`` — single node by gid (or vid when no vertices table)
- ``edge(src, dst)`` — single-edge accessors (edge.rs): times,
  ``history``, ``layerNames``, ``property(key)`` (latest event),
  ``propertyHistory(key)``, ``explode``, ``isSelfLoop``
- ``sharedNeighbours(node1, node2)`` — neighbour-set intersection
- ``edges(offset, limit)`` — (src, dst, t, eventId)-ordered page; edge
  fields: ``src``, ``dst``, ``time``, ``eventId``, ``layer``, plus any
  temporal property column by name
- ``vectorSearchNodes(query, limit)`` — semantic top-k over a
  ``VectorisedGraph`` passed to ``execute(..., vectors=vg)``

Pagination is deterministic (explicit sort keys) so pages are stable
across runs and cluster sizes; the edges page runs a per-block
top-(offset+limit) selection and merges only blocks × (offset+limit)
rows on the driver — never a full all-to-all sort. Degrees come from
the engine's cached BspGraph; per-node lookups (names, metadata,
neighbours, property histories) are batched one pass per page, not one
scan per node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# --------------------------------------------------------------- parser

class _Tok:
    def __init__(self, src: str):
        self.toks: list = []
        i, n = 0, len(src)
        while i < n:
            c = src[i]
            if c.isspace() or c == ",":
                i += 1
                continue
            if c == "#":
                while i < n and src[i] != "\n":
                    i += 1
                continue
            if c in "{}():[]":
                self.toks.append(("p", c))
                i += 1
                continue
            if c == '"':
                j = i + 1
                while j < n and src[j] != '"':
                    j += 1
                if j >= n:
                    raise SyntaxError(f"unterminated string literal at {i}")
                self.toks.append(("str", src[i + 1:j]))
                i = j + 1
                continue
            if c.isdigit() or c == "-":
                j = i + 1
                while j < n and (src[j].isdigit() or src[j] == "."):
                    j += 1
                text = src[i:j]
                try:
                    self.toks.append(
                        ("num", float(text) if "." in text else int(text)))
                except ValueError:
                    # bare '-' / '1.2.3' — malformed input, not a crash
                    raise SyntaxError(f"bad numeric literal {text!r} at {i}")
                i = j
                continue
            if c.isalpha() or c == "_":
                j = i
                while j < n and (src[j].isalnum() or src[j] == "_"):
                    j += 1
                self.toks.append(("name", src[i:j]))
                i = j
                continue
            raise SyntaxError(f"unexpected char {c!r} at {i}")
        self.toks.append(("eof", None))
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        t = self.next()
        if t[0] != kind or (val is not None and t[1] != val):
            raise SyntaxError(f"expected {val or kind}, got {t}")
        return t


class Field:
    __slots__ = ("name", "alias", "args", "sel")

    def __init__(self, name, alias, args, sel):
        self.name, self.alias, self.args, self.sel = name, alias, args, sel

    @property
    def out(self):
        return self.alias or self.name


def _parse_value(tk: _Tok):
    t = tk.next()
    if t[0] in ("str", "num"):
        return t[1]
    if t == ("name", "true"):
        return True
    if t == ("name", "false"):
        return False
    if t == ("name", "null"):
        return None
    if t == ("p", "["):
        vals = []
        while tk.peek() != ("p", "]"):
            vals.append(_parse_value(tk))
        tk.next()
        return vals
    if t == ("p", "{"):
        # input-object literal (filter expressions, applyViews entries)
        obj = {}
        while tk.peek() != ("p", "}"):
            k = tk.expect("name")[1]
            tk.expect("p", ":")
            obj[k] = _parse_value(tk)
        tk.next()
        return obj
    if t[0] == "name":
        if t[1] in ("true", "false"):
            return t[1] == "true"
        if t[1] == "null":
            return None
        return t[1]                      # enum value (NODE_NAME, ...)
    raise SyntaxError(f"bad value {t}")


def _parse_selection(tk: _Tok) -> list:
    tk.expect("p", "{")
    fields = []
    while tk.peek() != ("p", "}"):
        name = tk.expect("name")[1]
        alias = None
        if tk.peek() == ("p", ":"):
            tk.next()
            alias, name = name, tk.expect("name")[1]
        args = {}
        if tk.peek() == ("p", "("):
            tk.next()
            while tk.peek() != ("p", ")"):
                k = tk.expect("name")[1]
                tk.expect("p", ":")
                args[k] = _parse_value(tk)
            tk.next()
        sel = None
        if tk.peek() == ("p", "{"):
            sel = _parse_selection(tk)
        fields.append(Field(name, alias, args, sel))
    tk.next()
    return fields


def parse_document(doc: str) -> tuple[str, list]:
    """(operation, root fields) — operation is 'query' or 'mutation'."""
    tk = _Tok(doc)
    op = "query"
    if tk.peek() in (("name", "query"), ("name", "mutation")):
        op = tk.next()[1]
        if tk.peek()[0] == "name":        # operation name
            tk.next()
    return op, _parse_selection(tk)


def parse_graphql(doc: str) -> list:
    op, roots = parse_document(doc)
    if op != "query":
        raise SyntaxError("per-graph executor takes query documents only")
    return roots


# ------------------------------------------------------------- executor

_VIEW_FIELDS = {"window", "at", "before", "after", "snapshotAt",
                "snapshotLatest", "shrinkWindow", "shrinkStart",
                "shrinkEnd", "layer", "layers", "excludeLayer",
                "excludeLayers", "defaultLayer",
                "subgraph", "subgraphNodeTypes", "excludeNodes",
                "filterNodes", "filterEdges", "applyViews", "valid"}


class _GraphCtx:
    """Per-(view, execution) resolver cache. ``node_set`` (sorted vids or
    None = full [0, n)) carries node-restricting views
    (subgraph/excludeNodes/subgraphNodeTypes) so countNodes / nodes pages
    / hasNode / node() honor the restriction like the reference's
    resolvers do; TIME views additionally narrow the universe to
    event-active nodes (graph.rs windowed count_nodes semantics), via
    the ``node_set`` property's cached one-pass active-set scan. Layer
    views keep the full universe (a node exists regardless of which
    layers its events are on). Degrees and the simple-edge count come
    from the engine's cached BspGraph (one dedup shuffle per frame,
    shared with every algorithm)."""

    def __init__(self, gf, node_set: np.ndarray | None = None,
                 vectors=None):
        self.gf = gf
        self.vectors = vectors
        self._node_set = node_set
        self._active = None
        self._deg = None
        self._vidx: dict | None = None
        self._nbr_cache: dict = {}
        self._hist_cache: dict = {}
        self._nhist_cache: dict = {}

    @property
    def node_set(self) -> np.ndarray | None:
        """Effective node universe. Under a TIME view the reference
        counts/pages only event-active nodes (graph.rs count_nodes on a
        windowed graph), so windowed contexts compute the active set
        (one edge-Dataset pass, cached) and intersect it with any
        explicit node restriction."""
        gf = self.gf
        if gf.start is None and gf.end is None:
            return self._node_set
        if self._active is None:
            # the engine's shared active-set scan (node_events are
            # already window-filtered inside the view)
            act = gf.active_vids()
            if self._node_set is not None:
                act = act[np.isin(act, self._node_set)]
            self._active = act
        return self._active

    def _graph(self):
        from raphtory_ray.algorithms import _bsp
        return _bsp(self.gf)

    def _degrees(self):
        if self._deg is None:
            g = self._graph()
            self._deg = (g.in_degree, g.out_degree, g.both_degree)
        return self._deg

    def count_nodes(self) -> int:
        return len(self.node_set) if self.node_set is not None else self.gf.n

    def count_simple_edges(self) -> int:
        return self._graph().num_edges

    def in_set(self, vid: int) -> bool:
        if not (0 <= vid < self.gf.n):
            return False
        if self.node_set is None:
            return True
        i = np.searchsorted(self.node_set, vid)
        return i < len(self.node_set) and self.node_set[i] == vid

    def page_vids(self, offset: int, limit: int):
        if self.node_set is not None:
            return [int(v) for v in self.node_set[offset:offset + limit]]
        return list(range(offset, min(offset + limit, self.gf.n)))

    def _gids(self):
        vt = self.gf.vertices
        return vt["gid"] if vt is not None and "gid" in vt.column_names \
            else None

    def _vid_index(self) -> dict:
        """vid → vertices-table row index, built ONCE per context —
        name_of / nodeType / metadata / vid_of all read it instead of
        running an O(V) pc.index scan per node."""
        if self._vidx is None:
            vt = self.gf.vertices
            self._vidx = {} if vt is None else {
                int(v): i for i, v in enumerate(
                    vt["vid"].to_numpy(zero_copy_only=False))}
        return self._vidx

    def row_of(self, vid: int) -> int | None:
        return self._vid_index().get(int(vid))

    def vid_of(self, name) -> int | None:
        gids = self._gids()
        if gids is None:
            try:
                v = int(name)
            except (TypeError, ValueError):
                return None
            return v if self.in_set(v) else None
        idx = pc.index(gids, pa.scalar(str(name))).as_py()
        if idx < 0:
            return None
        vid = self.gf.vertices["vid"][idx].as_py()
        return vid if self.in_set(vid) else None

    def name_of(self, vid: int) -> str:
        """Node display name — ALWAYS a string, like the reference's
        String-typed name resolver (vid-only graphs and missing vertices
        rows both fall back to str(vid))."""
        gids = self._gids()
        if gids is None:
            return str(vid)
        idx = self.row_of(vid)
        return gids[idx].as_py() if idx is not None else str(vid)

    def batch_property_history(self, vids: list, key: str) -> dict:
        """One pass over node_events for a whole page — NOT a scan per
        node. Missing node_events → empty histories (clean, no assert)."""
        ck = (key,)
        cache = self._hist_cache.setdefault(ck, {})
        todo = [v for v in vids if v not in cache]
        if todo:
            for v in todo:
                cache[v] = []
            ne = self.gf.node_events
            if ne is not None:
                want = np.array(sorted(todo), dtype=np.int64)

                def filt(b: pa.Table) -> pa.Table:
                    v = b["vid"].to_numpy(zero_copy_only=False)
                    return b.select(["vid", "t", key]).filter(
                        pa.array(np.isin(v, want)))

                parts = [t for t in ne.map_batches(
                    filt, batch_format="pyarrow", zero_copy_batch=True)
                    .iter_batches(batch_format="pyarrow") if t.num_rows]
                if parts:
                    tbl = pa.concat_tables(parts).sort_by("t")
                    for v, t, val in zip(tbl["vid"].to_pylist(),
                                         tbl["t"].to_pylist(),
                                         tbl[key].to_pylist()):
                        cache[v].append({"time": t, "value": val})
        return {v: cache[v] for v in vids}

    def batch_neighbours(self, vids: list, direction: str = "both") \
            -> dict:
        """One pass over the edge Dataset for a whole page of nodes —
        NOT a scan per node. ``direction``: both (deduped in∪out union,
        node.rs:458) | in (:472) | out (:486). A single scan fills ALL
        THREE directional caches (both = in ∪ out), so a page selecting
        neighbours + inNeighbours + outNeighbours costs one pass."""
        cache = self._nbr_cache.setdefault(direction, {})
        todo = [v for v in vids if v not in cache]
        if todo:
            want = np.array(sorted(todo), dtype=np.int64)
            gf = self.gf

            def nbr(b: pa.Table) -> pa.Table:
                s = b["src"].to_numpy(zero_copy_only=False)
                d = b["dst"].to_numpy(zero_copy_only=False)
                ms = np.isin(s, want)
                md = np.isin(d, want)
                return pa.table({
                    "v": pa.array(np.r_[s[ms], d[md]], pa.int64()),
                    "nb": pa.array(np.r_[d[ms], s[md]], pa.int64()),
                    "o": pa.array(np.r_[np.ones(int(ms.sum()), np.bool_),
                                        np.zeros(int(md.sum()),
                                                 np.bool_)])})

            parts = gf.edges.map_batches(nbr, batch_format="pyarrow",
                                         zero_copy_batch=True)
            vs, nbs, os_ = [], [], []
            for b in parts.iter_batches(batch_format="pyarrow"):
                vs.append(b["v"].to_numpy())
                nbs.append(b["nb"].to_numpy())
                os_.append(b["o"].to_numpy(zero_copy_only=False))
            v = np.concatenate(vs) if vs else np.empty(0, np.int64)
            nb_ = np.concatenate(nbs) if nbs else np.empty(0, np.int64)
            om = np.concatenate(os_) if os_ else np.empty(0, np.bool_)
            caches = {d: self._nbr_cache.setdefault(d, {})
                      for d in ("in", "out", "both")}
            for t in todo:
                mt = v == t
                outs = np.unique(nb_[mt & om])
                ins = np.unique(nb_[mt & ~om])
                caches["out"].setdefault(t, outs)
                caches["in"].setdefault(t, ins)
                caches["both"].setdefault(t, np.union1d(ins, outs))
        return {v: cache[v] for v in vids}


    def batch_node_history(self, vids: list) -> dict:
        """Sorted event times touching each node — edge events at either
        endpoint plus temporal node-property events (node.rs history /
        earliest_time / last_update / is_active resolvers read the same
        union). One pass over the edge Dataset per PAGE of nodes, cached
        per context — never a scan per node."""
        todo = [v for v in vids if v not in self._nhist_cache]
        if todo:
            want = np.array(sorted(todo), dtype=np.int64)

            def times(b: pa.Table) -> pa.Table:
                s = b["src"].to_numpy(zero_copy_only=False)
                d = b["dst"].to_numpy(zero_copy_only=False)
                t = b["t"].to_numpy(zero_copy_only=False)
                ms, md = np.isin(s, want), np.isin(d, want)
                # a SELF-LOOP event matches both branches but is ONE
                # update — drop it from the dst branch (node.rs history
                # counts one entry per event)
                md = md & (s != d)
                return pa.table({
                    "v": pa.array(np.r_[s[ms], d[md]], pa.int64()),
                    "t": pa.array(np.r_[t[ms], t[md]], pa.int64())})

            evs, ets = [], []
            for b in self.gf.edges.map_batches(
                    times, batch_format="pyarrow", zero_copy_batch=True
                    ).iter_batches(batch_format="pyarrow"):
                if b.num_rows:
                    evs.append(b["v"].to_numpy(zero_copy_only=False))
                    ets.append(b["t"].to_numpy(zero_copy_only=False))
            nvs, nts = [], []
            ne = self.gf.node_events
            if ne is not None:
                def ntimes(b: pa.Table) -> pa.Table:
                    v = b["vid"].to_numpy(zero_copy_only=False)
                    m = np.isin(v, want)
                    return pa.table({
                        "v": b["vid"].filter(pa.array(m)),
                        "t": b["t"].filter(pa.array(m))})

                for b in ne.map_batches(
                        ntimes, batch_format="pyarrow",
                        zero_copy_batch=True
                        ).iter_batches(batch_format="pyarrow"):
                    if b.num_rows:
                        nvs.append(b["v"].to_numpy(zero_copy_only=False))
                        nts.append(b["t"].to_numpy(zero_copy_only=False))
            ev = np.concatenate(evs) if evs else np.empty(0, np.int64)
            et = np.concatenate(ets) if ets else np.empty(0, np.int64)
            nv = np.concatenate(nvs) if nvs else np.empty(0, np.int64)
            nt = np.concatenate(nts) if nts else np.empty(0, np.int64)
            for x in todo:
                edge_t = et[ev == x]
                # (sorted union history, edge-event-only count):
                # edge_history_count (node.rs:360) excludes property events
                self._nhist_cache[x] = (
                    np.sort(np.r_[edge_t, nt[nv == x]]), len(edge_t))
        return {v: self._nhist_cache[v] for v in vids}


# per-node fields whose resolution reads the batched node history
_NODE_HIST_FIELDS = {"earliestTime", "latestTime", "firstUpdate",
                     "lastUpdate", "history", "edgeHistoryCount",
                     "isActive"}

# node-level view transforms (node.rs:73-267): time/layer views return a
# NEW node context over the narrowed graph view; node-restricting views
# don't exist at node level
_NODE_VIEW_FIELDS = {"window", "at", "before", "after", "snapshotAt",
                     "snapshotLatest", "shrinkWindow", "shrinkStart",
                     "shrinkEnd", "layer", "layers", "excludeLayer",
                     "excludeLayers", "defaultLayer", "applyViews"}


def _resolve_node(ctx: _GraphCtx, vid: int, sel: list):
    ideg, odeg, bdeg = ctx._degrees()
    vt = ctx.gf.vertices
    out = {}
    for f in sel:
        if f.name == "id":
            out[f.out] = int(vid)
        elif f.name == "name":
            out[f.out] = ctx.name_of(vid)
        elif f.name == "nodeType":
            if vt is None or "node_type" not in vt.column_names:
                out[f.out] = None
            else:
                idx = ctx.row_of(vid)
                out[f.out] = vt["node_type"][idx].as_py() \
                    if idx is not None else None
        elif f.name == "degree":
            out[f.out] = int(bdeg[vid])
        elif f.name == "inDegree":
            out[f.out] = int(ideg[vid])
        elif f.name == "outDegree":
            out[f.out] = int(odeg[vid])
        elif f.name in ("neighbours", "inNeighbours", "outNeighbours"):
            limit = f.args.get("limit", 20)
            d = {"neighbours": "both", "inNeighbours": "in",
                 "outNeighbours": "out"}[f.name]
            nbrs = ctx.batch_neighbours([vid], d)[vid][:limit]
            out[f.out] = [_resolve_node(ctx, int(v), f.sel or
                                        [Field("name", None, {}, None)])
                          for v in nbrs]
        elif f.name == "metadata":
            # constant node metadata = the vertices-table row
            # (node.rs metadata resolver); key filters to one entry —
            # same {key: None} shape whether the table or row is missing
            key = f.args.get("key")
            if vt is None:
                row = {}
            else:
                idx = ctx.row_of(vid)
                row = {c: vt[c][idx].as_py() for c in vt.column_names
                       if c != "vid"} if idx is not None else {}
            out[f.out] = {key: row.get(key)} if key else row
        elif f.name == "propertyHistory":
            # temporal node property history (node.rs properties()
            # .temporal() resolver) → [{time, value}]; batched page-wide
            out[f.out] = ctx.batch_property_history(
                [vid], f.args["key"])[vid]
        elif f.name == "properties":
            # node.rs:383 properties: temporal node properties resolved
            # to their latest value in the view; ``keys`` narrows
            ne = ctx.gf.node_events
            if ne is None:
                out[f.out] = {}
            else:
                keys = f.args.get("keys")
                if keys is None:
                    keys = [c for c in ne.schema().names
                            if c not in ("vid", "t", "event_id")]
                elif isinstance(keys, str):
                    keys = [keys]
                row = {}
                for k in keys:
                    h = ctx.batch_property_history([vid], k)[vid]
                    row[k] = h[-1]["value"] if h else None
                out[f.out] = row
        elif f.name in _NODE_VIEW_FIELDS:
            sub, _ns = _apply_view(ctx.gf, f, ctx._node_set)
            out[f.out] = _resolve_node(
                _GraphCtx(sub, ctx._node_set, vectors=ctx.vectors),
                vid, f.sel or [])
        elif f.name in ("rolling", "expanding"):
            # node-level WindowSets (node.rs:122,155): a LIST of node
            # contexts, one per window, with start/end scalars
            from raphtory_ray.algorithms.extra import expanding, rolling
            if f.name == "rolling":
                views = rolling(ctx.gf, f.args["window"],
                                f.args.get("step"))
            else:
                views = expanding(ctx.gf, f.args["step"])
            items = []
            for v in views:
                sub_sel = [s for s in (f.sel or [])
                           if s.name not in ("start", "end")]
                o = _resolve_node(
                    _GraphCtx(v, ctx._node_set, vectors=ctx.vectors),
                    vid, sub_sel)
                for s in (f.sel or []):
                    if s.name in ("start", "end"):
                        o[s.out] = getattr(v, s.name)
                items.append(o)
            out[f.out] = items
        elif f.name in ("edges", "outEdges", "inEdges"):
            # node.rs:425-447 edges/out_edges/in_edges(select:
            # EdgeFilter): this node's incident events, optionally
            # edge-filtered, as the standard deterministic page
            from raphtory_ray.graph.filter import Prop as _P
            if f.name == "edges":
                fe = (_P("src") == vid) | (_P("dst") == vid)
            elif f.name == "outEdges":
                fe = _P("src") == vid
            else:
                fe = _P("dst") == vid
            sub = ctx.gf.filter_exploded_edges(fe)
            if f.args.get("select"):
                efe, mode = _edge_filter_expr(ctx.gf, f.args["select"])
                sub = sub.filter_edges(efe, mode)
            sub_ctx = _GraphCtx(sub, ctx._node_set, vectors=ctx.vectors)
            out[f.out] = _resolve_edges_page(sub_ctx, f.args,
                                             f.sel or [])
        elif f.name in ("inComponent", "outComponent"):
            # node.rs:414,419: ancestors / descendants of this node —
            # the engine's single-source frontier BFS (no edge pull)
            from raphtory_ray.algorithms import (in_component,
                                                 out_component)
            fn = in_component if f.name == "inComponent" else \
                out_component
            members = [int(v) for v in np.sort(fn(ctx.gf, vid))
                       if ctx.in_set(int(v))]
            sub_sel = f.sel or [Field("name", None, {}, None)]
            out[f.out] = [_resolve_node(ctx, v, sub_sel)
                          for v in members]
        elif f.name in _NODE_HIST_FIELDS:
            # node temporal accessors (node.rs:320-365): all read the
            # union of edge events at the node + node-property events,
            # gathered once per page via batch_node_history
            h, edge_n = ctx.batch_node_history([vid])[vid]
            if f.name in ("earliestTime", "firstUpdate"):
                out[f.out] = int(h[0]) if len(h) else None
            elif f.name in ("latestTime", "lastUpdate"):
                out[f.out] = int(h[-1]) if len(h) else None
            elif f.name == "history":
                out[f.out] = [int(x) for x in h]
            elif f.name == "edgeHistoryCount":
                out[f.out] = int(edge_n)
            else:                                   # isActive
                out[f.out] = bool(len(h))
        else:
            raise KeyError(f"unknown node field {f.name!r}")
    return out


def _resolve_schema(ctx: _GraphCtx, sel: list):
    """graph.rs schema → GraphSchema (model/schema/*.rs): node types
    with their property columns, and per-layer edge schemas with the
    (srcType, dstType) combinations present — the endpoint-type pairs
    come from ONE distributed pass over the edge Dataset against a
    broadcast vid→type array, not a per-edge lookup loop."""
    gf = ctx.gf
    vt = gf.vertices

    def ptype(t: pa.DataType) -> str:
        return str(t)

    out = {}
    want = {s.name for s in sel} or {"nodes", "layers"}
    if "nodes" in want:
        nodes = []
        prop_cols = []
        ne = gf.node_events
        if ne is not None:
            sch = ne.schema()
            prop_cols = [{"key": n, "propertyType": ptype(t)}
                         for n, t in zip(sch.names, sch.types)
                         if n not in ("vid", "t", "event_id")]
        meta_cols = [] if vt is None else [
            {"key": c, "propertyType": ptype(vt.schema.field(c).type)}
            for c in vt.column_names
            if c not in ("vid", "gid", "node_type")]
        if vt is not None and "node_type" in vt.column_names:
            tnames = sorted(set(
                x for x in vt["node_type"].to_pylist() if x is not None))
        else:
            tnames = []
        for tn in (tnames or ["None"]):
            nodes.append({"typeName": tn, "properties": prop_cols,
                          "metadata": meta_cols})
        out["nodes"] = nodes
    if "layers" in want:
        sch = gf.edges.schema()
        eprops = [{"key": n, "propertyType": ptype(t)}
                  for n, t in zip(sch.names, sch.types)
                  if n not in ("src", "dst", "t", "event_id", "layer")]
        has_layer = "layer" in sch.names
        if vt is not None and "node_type" in vt.column_names:
            tmap = np.full(gf.n, None, dtype=object)
            tmap[vt["vid"].to_numpy(zero_copy_only=False)] = \
                np.asarray(vt["node_type"].to_pylist(), dtype=object)
        else:
            tmap = None

        def combos(b: pa.Table) -> pa.Table:
            lay = b["layer"] if has_layer else \
                pa.array(["_default"] * b.num_rows)
            if tmap is not None:
                s = tmap[b["src"].to_numpy(zero_copy_only=False)]
                d = tmap[b["dst"].to_numpy(zero_copy_only=False)]
            else:
                s = np.full(b.num_rows, "None", dtype=object)
                d = s
            t = pa.table({"layer": lay,
                          "srcType": pa.array(s, pa.string()),
                          "dstType": pa.array(d, pa.string())})
            return t.group_by(["layer", "srcType", "dstType"]) \
                    .aggregate([])

        seen = {}
        for b in gf.edges.map_batches(
                combos, batch_format="pyarrow",
                zero_copy_batch=True).iter_batches(
                    batch_format="pyarrow"):
            for lay, st, dt in zip(b["layer"].to_pylist(),
                                   b["srcType"].to_pylist(),
                                   b["dstType"].to_pylist()):
                seen.setdefault(lay, set()).add((st, dt))
        out["layers"] = [
            {"name": lay,
             "edges": [{"srcType": st, "dstType": dt,
                        "properties": eprops}
                       for st, dt in sorted(pairs)]}
            for lay, pairs in sorted(seen.items())]
    return out


def _resolve_edge(ctx: _GraphCtx, args: dict, sel: list):
    """graph.rs edge(src, dst) → GqlEdge subset (edge.rs accessors):
    one filtered pass gathers the edge's events; scalars resolve from
    the gathered table. Returns None when the edge doesn't exist."""
    gf = ctx.gf
    s, d = ctx.vid_of(args["src"]), ctx.vid_of(args["dst"])
    if s is None or d is None:
        return None

    def probe(b: pa.Table, s=s, d=d) -> pa.Table:
        m = pc.and_(pc.equal(b["src"], s), pc.equal(b["dst"], d))
        return b.filter(pc.fill_null(m, False))

    parts = [t for t in gf.edges.map_batches(
        probe, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow") if t.num_rows]
    if not parts:
        return None
    ev = pa.concat_tables(parts, promote_options="default")
    order = [("t", "ascending")] + ([("event_id", "ascending")]
                                    if "event_id" in ev.column_names
                                    else [])
    ev = ev.sort_by(order)
    times = ev["t"].to_pylist()
    out = {}
    for f in sel:
        if f.name == "src":
            out[f.out] = int(s)
        elif f.name == "dst":
            out[f.out] = int(d)
        elif f.name == "srcName":
            out[f.out] = ctx.name_of(s)
        elif f.name == "dstName":
            out[f.out] = ctx.name_of(d)
        elif f.name == "earliestTime":
            out[f.out] = times[0]
        elif f.name in ("latestTime", "time"):
            out[f.out] = times[-1]
        elif f.name == "history":
            out[f.out] = times
        elif f.name == "countEvents":
            out[f.out] = ev.num_rows
        elif f.name == "isSelfLoop":
            out[f.out] = bool(s == d)
        elif f.name in ("layerNames", "layers"):
            out[f.out] = sorted(set(
                ev["layer"].to_pylist())) if "layer" in ev.column_names \
                else ["_default"]
        elif f.name == "layerName":
            lays = set(ev["layer"].to_pylist()) \
                if "layer" in ev.column_names else {"_default"}
            if len(lays) != 1:
                raise KeyError("layerName on a multi-layer edge — "
                               "use layerNames")
            out[f.out] = lays.pop()
        elif f.name == "propertyHistory":
            k = f.args["key"]
            vals = ev[k].to_pylist() if k in ev.column_names \
                else [None] * ev.num_rows
            out[f.out] = [{"time": t, "value": v}
                          for t, v in zip(times, vals)]
        elif f.name == "property":
            k = f.args["key"]
            out[f.out] = ev[k][ev.num_rows - 1].as_py() \
                if k in ev.column_names else None
        elif f.name == "properties":
            # edge.rs:properties — latest value per temporal property
            # column in the view; ``keys`` narrows
            keys = f.args.get("keys")
            if keys is None:
                keys = [c for c in ev.column_names
                        if c not in ("src", "dst", "t", "event_id",
                                     "layer")]
            elif isinstance(keys, str):
                keys = [keys]
            out[f.out] = {k: (ev[k][ev.num_rows - 1].as_py()
                              if k in ev.column_names else None)
                          for k in keys}
        elif f.name == "explode":
            out[f.out] = ev.to_pylist()
        else:
            raise KeyError(f"unknown edge field {f.name!r}")
    return out


def _resolve_edges_page(ctx: _GraphCtx, args: dict, sel: list):
    gf = ctx.gf
    offset = int(args.get("offset", 0))
    limit = int(args.get("limit", 20))
    sort_keys = ["src", "dst"]
    cols = set(gf.edges.schema().names)
    for k in ("t", "event_id"):
        if k in cols:
            sort_keys.append(k)
    # top-(offset+limit) per block + driver merge — a page never needs
    # the full all-to-all sort a Dataset.sort would run; the driver holds
    # at most blocks × (offset+limit) rows
    need = offset + limit
    order = [(k, "ascending") for k in sort_keys]

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows <= need:
            return b
        return b.sort_by(order).slice(0, need)

    parts = [t for t in gf.edges.map_batches(
        local_top, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow") if t.num_rows]
    if not parts:
        return []
    merged = pa.concat_tables(parts, promote_options="default")
    page = merged.sort_by(order).slice(offset, limit).to_pylist()
    rows = []
    field_map = {"src": "src", "dst": "dst", "time": "t",
                 "eventId": "event_id", "layer": "layer"}
    for r in page:
        o = {}
        for f in sel:
            col = field_map.get(f.name, f.name)
            if col not in r:
                if f.name == "layer":
                    # no layer column ⇒ every edge is on the default
                    # layer, like the reference's layer resolver
                    o[f.out] = "_default"
                    continue
                raise KeyError(f"unknown edge field {f.name!r}")
            o[f.out] = r[col]
        rows.append(o)
    return rows


def _resolve_graph(ctx: _GraphCtx, sel: list):
    gf = ctx.gf
    out = {}
    for f in sel:
        if f.name in _VIEW_FIELDS:
            # pass the RAW explicit restriction, not the resolved active
            # set: the child context re-derives activity from its own
            # (already narrower) view, so resolving it here would force
            # the parent's full active-set scan even when no child field
            # needs a node universe
            sub, node_set = _apply_view(gf, f, ctx._node_set)
            out[f.out] = _resolve_graph(
                _GraphCtx(sub, node_set, vectors=ctx.vectors),
                f.sel or [])
        elif f.name in ("rolling", "expanding"):
            # WindowSet resolvers (graph.rs rolling/expanding): a LIST of
            # window contexts, each resolving the same graph fields;
            # ``start``/``end`` surface the window bounds
            from raphtory_ray.algorithms.extra import expanding, rolling
            if f.name == "rolling":
                views = rolling(gf, f.args["window"], f.args.get("step"))
            else:
                views = expanding(gf, f.args["step"])
            items = []
            for v in views:
                sub_sel = [s for s in (f.sel or [])
                           if s.name not in ("start", "end")]
                o = _resolve_graph(
                    _GraphCtx(v, ctx._node_set, vectors=ctx.vectors),
                    sub_sel)
                for s in (f.sel or []):
                    if s.name in ("start", "end"):
                        o[s.out] = getattr(v, s.name)
                items.append(o)
            out[f.out] = items
        elif f.name == "uniqueLayers":
            # graph.rs unique_layers — the engine's own scan (null →
            # '_default', single source of the distinct-layer logic)
            out[f.out] = gf.unique_layers()
        elif f.name == "start":
            out[f.out] = gf.start
        elif f.name == "end":
            out[f.out] = gf.end
        elif f.name == "countNodes":
            out[f.out] = ctx.count_nodes()
        elif f.name == "countEdges":
            out[f.out] = ctx.count_simple_edges()
        elif f.name == "countTemporalEdges":
            out[f.out] = gf.edges.count()
        elif f.name == "earliestTime":
            out[f.out] = gf.earliest_time()
        elif f.name == "latestTime":
            out[f.out] = gf.latest_time()
        elif f.name == "hasNode":
            out[f.out] = ctx.vid_of(f.args["name"]) is not None
        elif f.name == "hasEdge":
            s, d = ctx.vid_of(f.args["src"]), ctx.vid_of(f.args["dst"])
            if s is None or d is None:
                out[f.out] = False
            else:
                def probe(b: pa.Table, s=s, d=d) -> pa.Table:
                    m = pc.and_(pc.equal(b["src"], s),
                                pc.equal(b["dst"], d))
                    return b.select(["src"]).filter(
                        pc.fill_null(m, False))
                out[f.out] = gf.edges.map_batches(
                    probe, batch_format="pyarrow",
                    zero_copy_batch=True).count() > 0
        elif f.name == "edge":
            # graph.rs edge(src, dst): one edge's events gathered in a
            # single filtered pass → scalar accessors + history
            out[f.out] = _resolve_edge(ctx, f.args, f.sel or [])
        elif f.name == "sharedNeighbours":
            # graph.rs shared_neighbours(node1, node2): intersection of
            # the two distinct-neighbour sets (one batched edge pass)
            v1 = ctx.vid_of(f.args["node1"])
            v2 = ctx.vid_of(f.args["node2"])
            if v1 is None or v2 is None:
                out[f.out] = []
            else:
                nb = ctx.batch_neighbours([v1, v2])
                both = np.intersect1d(nb[v1], nb[v2])
                sub_sel = f.sel or [Field("name", None, {}, None)]
                out[f.out] = [_resolve_node(ctx, int(v), sub_sel)
                              for v in both if ctx.in_set(int(v))]
        elif f.name in ("earliestEdgeTime", "latestEdgeTime"):
            # edge-event bounds (graph.rs earliest/latest_edge_time);
            # the frame's time bounds are edge-event bounds already
            out[f.out] = gf.earliest_time() \
                if f.name == "earliestEdgeTime" else gf.latest_time()
        elif f.name == "latest":
            lt = gf.latest_time()
            sub = gf.at(int(lt)) if lt is not None else gf
            out[f.out] = _resolve_graph(
                _GraphCtx(sub, ctx._node_set, vectors=ctx.vectors),
                f.sel or [])
        elif f.name == "properties":
            # graph temporal properties resolved to latest values
            # (graph_frame.latest_graph_properties, window-aware); key
            # narrows to one entry like the node metadata resolver
            props = gf.latest_graph_properties()
            key = f.args.get("key")
            out[f.out] = {key: props.get(key)} if key else props
        elif f.name in ("metadata", "graphMetadata"):
            meta = dict(gf.graph_meta)
            key = f.args.get("key")
            out[f.out] = {key: meta.get(key)} if key else meta
        elif f.name == "propertyHistory":
            t = gf.graph_property_history(f.args["key"])
            out[f.out] = [{"time": ti, "value": v} for ti, v in
                          zip(t["t"].to_pylist(), t["value"].to_pylist())]
        elif f.name == "schema":
            out[f.out] = _resolve_schema(ctx, f.sel or [])
        elif f.name == "node":
            vid = ctx.vid_of(f.args["name"])
            out[f.out] = None if vid is None else \
                _resolve_node(ctx, vid, f.sel or [])
        elif f.name == "nodes":
            offset = int(f.args.get("offset", 0))
            limit = int(f.args.get("limit", 20))
            vids = ctx.page_vids(offset, limit)
            for nm, d in (("neighbours", "both"), ("inNeighbours",
                          "in"), ("outNeighbours", "out")):
                if any(s.name == nm for s in (f.sel or [])):
                    ctx.batch_neighbours(vids, d)   # one scan per page
            if any(s.name in _NODE_HIST_FIELDS for s in (f.sel or [])):
                ctx.batch_node_history(vids)    # one scan for the page
            for s in (f.sel or []):             # same for histories
                if s.name == "propertyHistory":
                    ctx.batch_property_history(vids, s.args["key"])
                elif s.name == "properties" and \
                        ctx.gf.node_events is not None:
                    # warm per KEY for the whole page — without this the
                    # per-node resolver pays one node_events pass per
                    # (node, key)
                    ks = s.args.get("keys")
                    if ks is None:
                        ks = [c for c in ctx.gf.node_events.schema().names
                              if c not in ("vid", "t", "event_id")]
                    elif isinstance(ks, str):
                        ks = [ks]
                    for k in ks:
                        ctx.batch_property_history(vids, k)
            out[f.out] = [_resolve_node(ctx, v, f.sel or []) for v in vids]
        elif f.name == "vectorSearchNodes":
            # reference GraphQL exposes vector similarity search over the
            # vectorised graph (raphtory-graphql vector search surface);
            # here the VectorisedGraph is passed to execute(vectors=...)
            if ctx.vectors is None:
                raise KeyError("vectorSearchNodes needs execute("
                               "..., vectors=VectorisedGraph)")
            top = ctx.vectors.nodes_by_similarity(
                f.args["query"], int(f.args.get("limit", 10)))
            out[f.out] = [
                {"id": int(v), "name": ctx.name_of(int(v)),
                 "cosine": float(c), "rank": int(r)}
                for v, c, r in zip(top["vec_id"].to_pylist(),
                                   top["cosine"].to_pylist(),
                                   top["rank"].to_pylist())]
        elif f.name == "searchNodes":
            # graph.rs:801 search_nodes(filter, limit, offset): exact
            # filter match over the node set, vid-ordered page. The
            # reference routes this through its tantivy index; the
            # engine's vectorized FilterExpr mask over the vertex
            # dimension table IS the exact-match evaluation.
            assert gf.vertices is not None, "no vertex dimension table"
            fe = _node_filter_expr(f.args["filter"])
            m = pc.fill_null(fe.mask(gf.vertices), False)
            hits = np.unique(gf.vertices["vid"].filter(m)
                             .to_numpy(zero_copy_only=False)
                             .astype(np.int64))
            if ctx._node_set is not None:
                hits = hits[np.isin(hits, ctx._node_set)]
            off = int(f.args.get("offset", 0))
            lim = int(f.args.get("limit", 20))
            vids = [int(v) for v in hits[off:off + lim]]
            for nm, d in (("neighbours", "both"), ("inNeighbours",
                          "in"), ("outNeighbours", "out")):
                if any(s.name == nm for s in (f.sel or [])):
                    ctx.batch_neighbours(vids, d)
            if any(s.name in _NODE_HIST_FIELDS for s in (f.sel or [])):
                ctx.batch_node_history(vids)
            for s in (f.sel or []):
                if s.name == "propertyHistory":
                    ctx.batch_property_history(vids, s.args["key"])
                elif s.name == "properties" and \
                        ctx.gf.node_events is not None:
                    ks = s.args.get("keys")
                    if ks is None:
                        ks = [c for c in ctx.gf.node_events.schema().names
                              if c not in ("vid", "t", "event_id")]
                    elif isinstance(ks, str):
                        ks = [ks]
                    for k in ks:
                        ctx.batch_property_history(vids, k)
            out[f.out] = [_resolve_node(ctx, v, f.sel or []) for v in vids]
        elif f.name == "searchEdges":
            # graph.rs:829 search_edges(filter, limit, offset): filter
            # the edge view, then the standard deterministic edge page
            fe, mode = _edge_filter_expr(gf, f.args["filter"])
            sub = gf.filter_edges(fe, mode)
            sub_ctx = _GraphCtx(sub, ctx._node_set, vectors=ctx.vectors)
            out[f.out] = _resolve_edges_page(
                sub_ctx, {"offset": f.args.get("offset", 0),
                          "limit": f.args.get("limit", 20)}, f.sel or [])
        elif f.name == "edges":
            out[f.out] = _resolve_edges_page(ctx, f.args, f.sel or [])
        elif f.name == "algorithms":
            # graph algorithm plugin surface (graph.rs:641-645 →
            # plugins/graph_algorithm_plugin.rs): pagerank + shortestPath
            # run the engine's distributed algorithms on THIS view's
            # GraphFrame and resolve through the same node-name mapping
            out[f.out] = _resolve_algorithms(ctx, f.sel or [])
        else:
            raise KeyError(f"unknown graph field {f.name!r}")
    return out


def _resolve_algorithms(ctx: _GraphCtx, sel: list):
    """The reference's GraphAlgorithmPlugin fields
    (raphtory-graphql/src/model/plugins/algorithms.rs):

    - ``pagerank(iterCount!, tol, dampingFactor) { name rank }`` →
      unweighted_page_rank over the view, one output row per node,
    - ``shortestPath(source!, targets!, direction) { target nodes }`` →
      hop-count shortest paths (the reference passes weight=None to
      dijkstra, i.e. unit weights) over OUT-edges; only direction "out"
      is supported, matching the engine's BFS orientation.

    Algorithms run on ctx.gf, so nesting under window/layer views scopes
    them exactly like every other resolver."""
    gf = ctx.gf
    out = {}
    for f in sel:
        if f.name == "pagerank":
            from raphtory_ray.algorithms import _bsp
            g = _bsp(gf)               # reuses gf._bsp when built
            iters = int(f.args["iterCount"])
            tol = float(f.args.get("tol", 1e-7))
            damping = float(f.args.get("dampingFactor", 0.85))
            scores, _iters, _secs = g.pagerank(
                damping=damping, iter_count=iters, tol=tol)
            rows = []
            for v in range(gf.n):
                row = {}
                for s in (f.sel or []):
                    if s.name == "name":
                        row[s.out] = ctx.name_of(v)
                    elif s.name == "id":
                        row[s.out] = v
                    elif s.name == "rank":
                        row[s.out] = float(scores[v])
                    else:
                        raise KeyError(
                            f"unknown pagerank field {s.name!r}")
                rows.append(row)
            out[f.out] = rows
        elif f.name == "shortestPath":
            from raphtory_ray.algorithms import single_source_shortest_path
            direction = f.args.get("direction", "out")
            if direction not in ("out", "in", "both"):
                raise KeyError(f"invalid direction {direction!r}")
            src = ctx.vid_of(f.args["source"])
            if src is None:
                raise KeyError(f"unknown source node "
                               f"{f.args['source']!r}")
            g2 = gf
            if direction != "out":
                # in/both (plugins/algorithms.rs:136-140): run the same
                # BFS over a direction-transformed edge view — reversed
                # for "in", symmetrized (union of both orientations) for
                # "both"; one streaming column swap, no new shuffle
                def _flip(b: pa.Table) -> pa.Table:
                    names = ["dst" if c == "src" else
                             "src" if c == "dst" else c
                             for c in b.column_names]
                    return b.rename_columns(names)
                flipped = gf.edges.map_batches(
                    _flip, batch_format="pyarrow", zero_copy_batch=True)
                from raphtory_ray.graph.graph_frame import GraphFrame
                g2 = GraphFrame(flipped if direction == "in"
                                else gf.edges.union(flipped),
                                gf.n, gf.vertices)
            paths = single_source_shortest_path(g2, src)
            rows = []
            for tname in f.args["targets"]:
                tv = ctx.vid_of(tname)
                if tv is None or tv not in paths:
                    continue                  # unreachable: no output row
                row = {}
                for s in (f.sel or []):
                    if s.name == "target":
                        row[s.out] = ctx.name_of(tv)
                    elif s.name == "nodes":
                        row[s.out] = [ctx.name_of(v) for v in paths[tv]]
                    else:
                        raise KeyError(
                            f"unknown shortestPath field {s.name!r}")
                rows.append(row)
            out[f.out] = rows
        else:
            raise KeyError(f"unknown algorithms field {f.name!r}")
    return out


# ------------------------------------------ filter inputs (filtering.rs)
#
# The reference exposes composable NodeFilter / EdgeFilter GraphQL input
# objects (raphtory-graphql/src/model/graph/filtering.rs:310-900:
# PropertyFilterNew + PropCondition one-ofs, NodeFieldFilterNew over
# node_id/node_name/node_type, And/Or/Not recursion, Src/Dst endpoint
# filters on edges) consumed by the graph.rs filter_nodes / filter_edges /
# search_nodes resolvers. Here the same input shapes convert to the
# engine's FilterExpr algebra (graph/filter.py) and run through the
# existing distributed filter views. Keys accept both camelCase (the
# GraphQL wire form) and PascalCase (the Rust variant names used in the
# reference's doc examples).

_NODE_FIELD_COL = {"NODE_ID": "vid", "NODE_NAME": "gid",
                   "NODE_TYPE": "node_type",
                   "NODEID": "vid", "NODENAME": "gid",
                   "NODETYPE": "node_type"}


def _norm_key(k: str) -> str:
    return k[0].lower() + k[1:] if k else k


def _cond_to_expr(ops, where: dict):
    """PropCondition / NodeFieldCondition (filtering.rs:340,545) →
    FilterExpr, with ``ops`` a PropertyFilterOps bound to the column."""
    from raphtory_ray.graph.filter import FilterExpr
    if not isinstance(where, dict) or len(where) != 1:
        raise SyntaxError("condition takes exactly one operator key")
    (op, v), = where.items()
    op = _norm_key(op)
    if op == "eq":
        return ops == v
    if op == "ne":
        return ops != v
    if op == "gt":
        return ops > v
    if op == "ge":
        return ops >= v
    if op == "lt":
        return ops < v
    if op == "le":
        return ops <= v
    if op == "contains":
        return ops.contains(v)
    if op == "notContains":
        return ops.not_contains(v)
    if op == "startsWith":
        return ops.starts_with(v)
    if op == "endsWith":
        return ops.ends_with(v)
    if op == "isIn":
        return ops.is_in(list(v))
    if op == "isNotIn":
        return ops.is_not_in(list(v))
    if op == "isSome":
        e = ops.is_some()
        return e if v in (True, None) else ~e
    if op == "isNone":
        e = ops.is_none()
        return e if v in (True, None) else ~e
    if op == "fuzzySearch":
        if isinstance(v, dict):
            return ops.fuzzy_search(
                v["value"],
                int(v.get("levenshteinDistance", 2)),
                bool(v.get("prefixMatch", False)))
        return ops.fuzzy_search(v)
    if op == "and":
        es = [_cond_to_expr(ops, c) for c in v]
        out = es[0]
        for e in es[1:]:
            out = out & e
        return out
    if op == "or":
        es = [_cond_to_expr(ops, c) for c in v]
        out = es[0]
        for e in es[1:]:
            out = out | e
        return out
    if op == "not":
        return ~_cond_to_expr(ops, v)
    raise NotImplementedError(f"PropCondition operator {op!r}")


def _node_filter_expr(d: dict):
    """GqlNodeFilter (filtering.rs:675) → FilterExpr over the vertex
    dimension table (gid / node_type / metadata + latest-property
    columns — the engine's filter_nodes evaluation surface)."""
    from raphtory_ray.graph.filter import Prop
    if not isinstance(d, dict) or len(d) != 1:
        raise SyntaxError("NodeFilter takes exactly one variant key")
    (k, v), = d.items()
    k = _norm_key(k)
    if k == "node":
        field = str(v["field"]).upper()
        col = _NODE_FIELD_COL.get(field) or \
            _NODE_FIELD_COL.get(field.replace("_", ""))
        if col is None:
            raise SyntaxError(f"unknown NodeField {v['field']!r}")
        return _cond_to_expr(Prop(col), v.get("where") or v.get("where_"))
    if k in ("property", "metadata", "temporalProperty"):
        return _cond_to_expr(Prop(v["name"]),
                             v.get("where") or v.get("where_"))
    if k == "and":
        es = [_node_filter_expr(c) for c in v]
        out = es[0]
        for e in es[1:]:
            out = out & e
        return out
    if k == "or":
        es = [_node_filter_expr(c) for c in v]
        out = es[0]
        for e in es[1:]:
            out = out | e
        return out
    if k == "not":
        return ~_node_filter_expr(v)
    raise NotImplementedError(f"NodeFilter variant {k!r}")


def _edge_filter_expr(gf, d: dict):
    """GqlEdgeFilter (filtering.rs:802) → (FilterExpr, mode) for
    GraphFrame.filter_edges. ``property``/``metadata`` leaves use the
    reference's resolved-value semantics (latest event per edge);
    ``temporalProperty`` leaves match ANY event. The two modes can't mix
    in one expression (one distributed pass applies one reduction).
    ``src``/``dst`` endpoint filters evaluate the nested NodeFilter on
    the vertices table and compile to a broadcast vid semi-join."""
    from raphtory_ray.graph.filter import Prop
    modes: set = set()

    def conv(d):
        if not isinstance(d, dict) or len(d) != 1:
            raise SyntaxError("EdgeFilter takes exactly one variant key")
        (k, v), = d.items()
        k = _norm_key(k)
        if k in ("property", "metadata"):
            modes.add("latest")
            return _cond_to_expr(Prop(v["name"]),
                                 v.get("where") or v.get("where_"))
        if k == "temporalProperty":
            modes.add("any")
            return _cond_to_expr(Prop(v["name"]),
                                 v.get("where") or v.get("where_"))
        if k in ("src", "dst"):
            assert gf.vertices is not None, "no vertex dimension table"
            nf = _node_filter_expr(v)
            mask = pc.fill_null(nf.mask(gf.vertices), False)
            vids = gf.vertices["vid"].filter(mask).to_pylist()
            return Prop(k).is_in(vids)
        if k == "layers":
            names = v["names"] if isinstance(v, dict) else list(v)
            inner = Prop("layer").is_in(list(names))
            if isinstance(v, dict) and v.get("expr"):
                return inner & conv(v["expr"])
            return inner
        if k == "isSelfLoop":
            from raphtory_ray.graph.filter import FilterExpr
            e = FilterExpr("leaf", leaf=("selfloop", None, None, None))
            return e if v in (True, None) else ~e
        if k == "and":
            es = [conv(c) for c in v]
            out = es[0]
            for e in es[1:]:
                out = out & e
            return out
        if k == "or":
            es = [conv(c) for c in v]
            out = es[0]
            for e in es[1:]:
                out = out | e
            return out
        if k == "not":
            return ~conv(v)
        raise NotImplementedError(f"EdgeFilter variant {k!r}")

    fe = conv(d)
    if len(modes) > 1:
        raise NotImplementedError(
            "mixed latest-property and temporal-property edge filter")
    return fe, (modes.pop() if modes else "latest")



def _view_vids(gf, nodes) -> np.ndarray:
    """subgraph/excludeNodes node lists accept NAMES (the reference's
    graph.rs subgraph takes names, like node(name:)) or integer vids."""
    arr = np.asarray(list(nodes) if not isinstance(nodes, np.ndarray)
                     else nodes)
    if arr.dtype.kind in "iu":
        return arr.astype(np.int64)
    if gf.vertices is None:
        raise KeyError("node names need a vertex table")
    gids = gf.vertices["gid"].to_numpy(zero_copy_only=False).astype(str)
    vids = gf.vertices["vid"].to_numpy(zero_copy_only=False)
    order = np.argsort(gids)
    names = arr.astype(str)
    pos = np.searchsorted(gids[order], names)
    ok = pos < len(gids)
    ok[ok] = gids[order[pos[ok]]] == names[ok]
    if not ok.all():
        raise KeyError(f"unknown node(s) {arr[~ok][:3].tolist()}")
    return vids[order[pos]].astype(np.int64)

def _apply_view(gf, f: Field, parent_set: np.ndarray | None):
    """→ (sub_gf, node_set): node-restricting views intersect the parent
    restriction; time/layer views inherit it unchanged."""
    a = f.args

    def restrict(vids: np.ndarray):
        vids = np.unique(vids.astype(np.int64))
        if parent_set is not None:
            vids = vids[np.isin(vids, parent_set)]
        return vids

    if f.name == "window":
        return gf.window(int(a["start"]), int(a["end"])), parent_set
    if f.name == "at":
        return gf.at(int(a["time"])), parent_set
    if f.name == "snapshotAt":
        return gf.snapshot_at(int(a["time"])), parent_set
    if f.name == "snapshotLatest":
        return gf.snapshot_latest(), parent_set
    if f.name == "shrinkWindow":
        return gf.shrink_window(int(a["start"]), int(a["end"])), parent_set
    if f.name == "shrinkStart":
        return gf.shrink_start(int(a["time"])), parent_set
    if f.name == "shrinkEnd":
        return gf.shrink_end(int(a["time"])), parent_set
    if f.name == "before":
        return gf.before(int(a["time"])), parent_set
    if f.name == "after":
        return gf.after(int(a["time"])), parent_set
    if f.name == "layer":
        return gf.layer(a["name"]), parent_set
    if f.name == "layers":
        ns = a["names"]
        return gf.layer([ns] if isinstance(ns, str) else list(ns)), \
            parent_set
    if f.name == "excludeLayer":
        return gf.exclude_layer(a["name"]), parent_set
    if f.name == "excludeLayers":
        ns = a["names"]
        return gf.exclude_layer(
            [ns] if isinstance(ns, str) else list(ns)), parent_set
    if f.name == "defaultLayer":
        return gf.default_layer(), parent_set
    if f.name == "subgraph":
        keep = restrict(_view_vids(gf, a["nodes"]))
        return gf.subgraph(keep), keep
    if f.name == "excludeNodes":
        drop = _view_vids(gf, a["nodes"])
        base = parent_set if parent_set is not None \
            else np.arange(gf.n, dtype=np.int64)
        keep = base[~np.isin(base, drop)]
        return gf.subgraph(keep), keep
    if f.name == "subgraphNodeTypes":
        assert gf.vertices is not None, "no vertex dimension table"
        types = [a["nodeTypes"]] if isinstance(a["nodeTypes"], str) \
            else list(a["nodeTypes"])
        m = pc.fill_null(pc.is_in(
            gf.vertices["node_type"],
            value_set=pa.array(types, pa.string())), False)
        keep = restrict(gf.vertices["vid"].filter(m)
                        .to_numpy(zero_copy_only=False))
        return gf.subgraph(keep), keep
    if f.name == "filterNodes":
        # graph.rs:736 filter_nodes(expr: NodeFilter): nodes that match
        # the composite filter; edges kept only if both endpoints survive
        # (the engine's induced-subgraph semantics)
        assert gf.vertices is not None, "no vertex dimension table"
        fe = _node_filter_expr(a["expr"])
        m = pc.fill_null(fe.mask(gf.vertices), False)
        keep = restrict(gf.vertices["vid"].filter(m)
                        .to_numpy(zero_copy_only=False))
        return gf.subgraph(keep), keep
    if f.name == "filterEdges":
        # graph.rs:756 filter_edges(expr: EdgeFilter): edges restricted,
        # nodes remain in the view even if all their edges are dropped —
        # so the node restriction set is inherited unchanged
        fe, mode = _edge_filter_expr(gf, a["expr"])
        return gf.filter_edges(fe, mode), parent_set
    if f.name == "valid":
        # GraphViewCollection::Valid — PersistentGraph-only view
        return gf.valid(), parent_set
    if f.name == "applyViews":
        # graph.rs apply_views(views: [GraphViewCollection]): ordered
        # one-of variants folded left-to-right over the running view
        sub, ns = gf, parent_set
        for entry in a["views"]:
            if not isinstance(entry, dict) or len(entry) != 1:
                raise SyntaxError("applyViews entry takes one variant key")
            (k, v), = entry.items()
            k = _norm_key(k)
            if k in ("defaultLayer", "snapshotLatest", "valid"):
                if v is False:
                    continue
                sf = Field(k, None, {}, None)
            elif k == "latest":
                if v is False:
                    continue
                lt = sub.latest_time()
                if lt is None:        # zero-event graph: latest = no-op
                    continue
                sf = Field("at", None, {"time": lt}, None)
            elif k in ("window", "shrinkWindow"):
                sf = Field(k, None, {"start": v["start"],
                                     "end": v["end"]}, None)
            elif k in ("at", "snapshotAt", "before", "after",
                       "shrinkStart", "shrinkEnd"):
                sf = Field(k, None, {"time": v}, None)
            elif k in ("layers", "excludeLayers"):
                sf = Field(k, None, {"names": v}, None)
            elif k == "excludeLayer":
                sf = Field(k, None, {"name": v}, None)
            elif k in ("subgraph", "excludeNodes"):
                sf = Field(k, None, {"nodes": v}, None)
            elif k == "subgraphNodeTypes":
                sf = Field(k, None, {"nodeTypes": v}, None)
            elif k == "nodeFilter":
                sf = Field("filterNodes", None, {"expr": v}, None)
            elif k == "edgeFilter":
                sf = Field("filterEdges", None, {"expr": v}, None)
            else:
                raise NotImplementedError(f"applyViews variant {k!r}")
            sub, ns = _apply_view(sub, sf, ns)
        return sub, ns
    raise KeyError(f.name)


def execute(gf, document: str, vectors=None) -> dict:
    """Execute a GraphQL document against a GraphFrame. The root
    selection must contain a single ``graph`` field (the reference's
    per-graph resolver — server-managed GraphFolders don't apply here).
    ``vectors``: an optional ``data.vectors.VectorisedGraph`` enabling
    the ``vectorSearchNodes(query, limit)`` field. Returns
    ``{"data": {...}}``."""
    roots = parse_graphql(document)
    data = {}
    for f in roots:
        if f.name != "graph":
            raise KeyError("root field must be 'graph'")
        data[f.out] = _resolve_graph(_GraphCtx(gf, vectors=vectors),
                                     f.sel or [])
    return {"data": data}
