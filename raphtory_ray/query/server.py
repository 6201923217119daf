"""Server-less graph management plane — the reference's GraphServer
working-dir model (raphtory-graphql/src/data.rs + model/mod.rs:666-860),
minus network transport and auth (no server can run in this sandbox; the
resolver/mutation algebra is the portable part).

A *work dir* is a namespace tree on a filesystem every Ray node can read
(NFS / object-store mount at scale). Each graph is a folder:

    <work_dir>/<namespace...>/<name>/
        edges/*.parquet           loaders.to_parquet layout (rap_* columns,
        vertices.parquet          100k row groups) — partitioned, resumable
        .raph/meta.json           graph_type, counts, created/last_updated

Graph folders are recognized by the ``.raph`` marker (the reference's
GraphFolder detection); every other directory is a namespace. Path rules
mirror paths.rs:43-183: relative, '/'-separated, no '', '.', '..',
backslash, double slash or hidden components, and a graph folder can never
be an ancestor of another graph.

All mutations are driver-side METADATA operations (mkdir/rename/copy of
parquet folders) — the heavy data stays in partitioned parquet and is
never routed through the driver; copy streams file-by-file.
"""

from __future__ import annotations

import base64
import io
import json
import os
import shutil
import time
import zipfile

import numpy as np
import pyarrow as pa

_META_DIR = ".raph"
_META_FILE = "meta.json"



def _swap_in(tmp: str, dst: str) -> None:
    """Crash-safe replace of a graph directory (ADVICE r4: the previous
    rmtree(dst)-then-rename lost the destination if the process died
    between the two steps). The destination is renamed ASIDE first, the
    finished tmp renames in, and only then is the old copy removed — a
    crash at any point leaves either the old or the new complete graph
    on disk under a recoverable name (a stale .<name>.old sibling is the
    only debris, removed on the next successful swap). Still two renames,
    not one atomic op; single-writer-per-path is assumed (documented)."""
    old = os.path.join(os.path.dirname(dst), f".{os.path.basename(dst)}.old")
    shutil.rmtree(old, ignore_errors=True)
    had = os.path.exists(dst)
    if had:
        os.rename(dst, old)
    try:
        os.rename(tmp, dst)
    except Exception:
        if had:
            os.rename(old, dst)        # restore the original
        raise
    if had:
        shutil.rmtree(old, ignore_errors=True)

class InvalidPath(ValueError):
    """paths.rs InvalidPathReason equivalent."""


class GraphNotFound(KeyError):
    pass


def parent_namespace(path: str) -> str:
    """model/mod.rs:301-303."""
    return path.rsplit("/", 1)[0] if "/" in path else ""


def validate_path(path: str) -> list[str]:
    """Component-wise path validation (paths.rs:43-183 rules)."""
    if path.startswith("/"):
        raise InvalidPath(f"root not allowed: {path!r}")
    if "\\" in path:
        raise InvalidPath(f"backslash not allowed: {path!r}")
    if "//" in path:
        raise InvalidPath(f"double forward slash: {path!r}")
    comps = [c for c in path.split("/")] if path else []
    for c in comps:
        if c == "" or c == ".":
            raise InvalidPath(f"empty/curdir component in {path!r}")
        if c == "..":
            raise InvalidPath(f"parent dir not allowed: {path!r}")
        if c.startswith("."):
            raise InvalidPath(f"hidden component not allowed: {path!r}")
    return comps


class GraphWorkDir:
    """The reference's ``Data`` (data.rs): graph CRUD over a work dir.

    Graphs are engine GraphFrames / PersistentGraphFrames persisted in the
    canonical parquet layout; ``graph_type`` ('EVENT' | 'PERSISTENT')
    controls both the stored flavour and the query-time reinterpretation
    override (model/mod.rs graph(path, graphType))."""

    def __init__(self, work_dir: str):
        self.work_dir = os.path.abspath(work_dir)
        os.makedirs(self.work_dir, exist_ok=True)

    # ------------------------------------------------------------ paths
    def _fs(self, path: str) -> str:
        validate_path(path)
        return os.path.join(self.work_dir, *path.split("/")) if path \
            else self.work_dir

    def _is_graph(self, fs_path: str) -> bool:
        return os.path.isdir(os.path.join(fs_path, _META_DIR))

    def _require_graph(self, path: str) -> str:
        fs = self._fs(path)
        if not self._is_graph(fs):
            raise GraphNotFound(path)
        return fs

    def _check_no_graph_ancestor(self, comps: list[str]):
        """paths.rs:178 ParentIsGraph: no component prefix may already be
        a graph folder."""
        cur = self.work_dir
        for c in comps[:-1]:
            cur = os.path.join(cur, c)
            if self._is_graph(cur):
                raise InvalidPath(
                    f"parent {os.path.relpath(cur, self.work_dir)!r} "
                    "is a graph")

    def _prepare_insert(self, path: str, overwrite: bool) -> str:
        """data.rs validate_path_for_insert: destination must be free
        (unless overwrite) and not inside another graph."""
        comps = validate_path(path)
        if not comps:
            raise InvalidPath("graph path cannot be the root namespace")
        self._check_no_graph_ancestor(comps)
        fs = self._fs(path)
        if os.path.exists(fs):
            if not self._is_graph(fs):
                raise InvalidPath(f"{path!r} is a namespace")
            if not overwrite:
                raise FileExistsError(f"graph already exists at {path!r}")
            shutil.rmtree(fs)
        os.makedirs(os.path.join(fs, _META_DIR))
        return fs

    # ------------------------------------------------------- meta + io
    def _meta(self, path: str) -> dict:
        fs = self._require_graph(path)
        with open(os.path.join(fs, _META_DIR, _META_FILE)) as f:
            return json.load(f)

    def _write_meta(self, fs: str, meta: dict):
        with open(os.path.join(fs, _META_DIR, _META_FILE), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)

    def _touch(self, fs: str):
        mf = os.path.join(fs, _META_DIR, _META_FILE)
        with open(mf) as f:
            meta = json.load(f)
        meta["last_updated"] = time.time()
        self._write_meta(fs, meta)

    # ---------------------------------------------------------- queries
    def graph(self, path: str, graph_type: str | None = None):
        """Load a stored graph; ``graph_type`` re-interprets semantics at
        query time (EVENT <-> PERSISTENT), defaulting to the stored type
        (model/mod.rs:424-474)."""
        fs = self._require_graph(path)
        meta = self._meta(path)
        stored = meta.get("graph_type", "EVENT")
        if not os.path.isdir(os.path.join(fs, "edges")):
            gf = _empty_graph(stored, meta.get("node_count", 0))
        elif stored == "PERSISTENT":
            gf = _to_persistent(fs, meta.get("node_count", 0))
        else:
            from raphtory_ray.sources.loaders import from_parquet
            gf = from_parquet(fs)
            # vertex-less graphs: from_parquet infers n = max(vid)+1, which
            # silently drops trailing isolated nodes — the meta sidecar
            # records the true vid-space size at upload time
            meta_n = int(meta.get("node_count", 0) or 0)
            if meta_n > gf.n:
                gf.n = meta_n
        want = (graph_type or stored).upper()
        if want == stored:
            return gf
        if want == "PERSISTENT":
            from raphtory_ray.graph.persistent import persistent_graph
            return persistent_graph(gf)
        return gf.event_graph()

    def graph_metadata(self, path: str) -> dict:
        """Lightweight counts/timestamps WITHOUT loading the graph
        (model/mod.rs graph_metadata — reads the meta sidecar only)."""
        meta = self._meta(path)
        return {"path": path, "name": path.rsplit("/", 1)[-1],
                "graphType": meta.get("graph_type", "EVENT"),
                "nodeCount": meta.get("node_count"),
                "edgeEventCount": meta.get("edge_event_count"),
                "created": meta.get("created"),
                "lastUpdated": meta.get("last_updated")}

    def namespaces(self) -> list[str]:
        """All namespaces (root first, then every descendant, sorted —
        Namespace::get_all_children)."""
        out = [""]
        for base, dirs, _files in os.walk(self.work_dir):
            if self._is_graph(base):
                dirs[:] = []        # never descend into a graph folder
                continue
            dirs[:] = [d for d in dirs if not d.startswith(".")]
            for d in sorted(dirs):
                fs = os.path.join(base, d)
                if not self._is_graph(fs):
                    out.append(os.path.relpath(fs, self.work_dir)
                               .replace(os.sep, "/"))
        return sorted(out)

    def namespace(self, path: str) -> dict:
        """One namespace's direct graphs + child namespaces."""
        fs = self._fs(path)
        if not os.path.isdir(fs) or self._is_graph(fs):
            raise GraphNotFound(f"no namespace at {path!r}")
        graphs, children = [], []
        for d in sorted(os.listdir(fs)):
            if d.startswith("."):
                continue
            sub = os.path.join(fs, d)
            if not os.path.isdir(sub):
                continue
            rel = f"{path}/{d}" if path else d
            (graphs if self._is_graph(sub) else children).append(rel)
        return {"path": path, "graphs": graphs, "children": children}

    # -------------------------------------------------------- mutations
    def new_graph(self, path: str, graph_type: str = "EVENT") -> bool:
        """Create an empty graph; errors if one exists
        (model/mod.rs:689-715, overwrite always false there too)."""
        graph_type = graph_type.upper()
        assert graph_type in ("EVENT", "PERSISTENT"), graph_type
        fs = self._prepare_insert(path, overwrite=False)
        now = time.time()
        self._write_meta(fs, {"graph_type": graph_type, "node_count": 0,
                              "edge_event_count": 0, "created": now,
                              "last_updated": now})
        return True

    def delete_graph(self, path: str) -> bool:
        fs = self._require_graph(path)
        shutil.rmtree(fs)
        return True

    def copy_graph(self, path: str, new_path: str,
                   overwrite: bool = False) -> bool:
        """Duplicate; source preserved (model/mod.rs:747-772). File-level
        copy of the parquet folder — the driver never materializes the
        graph."""
        src = self._require_graph(path)
        if os.path.abspath(src) == os.path.abspath(self._fs(new_path)):
            # overwrite=True would rmtree the SOURCE before copying it
            raise InvalidPath("source and destination are the same graph")
        # copy-then-swap like upload_graph: an overwritten destination
        # must survive a mid-copy failure
        comps = validate_path(new_path)
        if not comps:
            raise InvalidPath("graph path cannot be the root namespace")
        self._check_no_graph_ancestor(comps)
        dst = self._fs(new_path)
        if os.path.exists(dst):
            if not self._is_graph(dst):
                raise InvalidPath(f"{new_path!r} is a namespace")
            if not overwrite:
                raise FileExistsError(
                    f"graph already exists at {new_path!r}")
        else:
            os.makedirs(os.path.dirname(dst) or self.work_dir,
                        exist_ok=True)
        tmp = os.path.join(os.path.dirname(dst),
                           f".{os.path.basename(dst)}.copying")
        shutil.rmtree(tmp, ignore_errors=True)
        try:
            shutil.copytree(src, tmp)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        _swap_in(tmp, dst)
        self._touch(dst)
        return True

    def move_graph(self, path: str, new_path: str,
                   overwrite: bool = False) -> bool:
        """Copy-then-delete, like the reference (model/mod.rs:722-742 —
        'Atomic: copies first, then deletes the source')."""
        self.copy_graph(path, new_path, overwrite)
        self.delete_graph(path)
        return True

    def upload_graph(self, path: str, gf, overwrite: bool = False,
                     graph_type: str | None = None) -> str:
        """Insert a client-built GraphFrame / PersistentGraphFrame under
        ``path`` (the upload_graph seam — multipart transport replaced by
        an in-process handle; serialized-bytes transport is send_graph)."""
        from raphtory_ray.graph.persistent import PersistentGraphFrame
        from raphtory_ray.sources.loaders import to_parquet
        if graph_type is None:
            graph_type = "PERSISTENT" \
                if isinstance(gf, PersistentGraphFrame) else "EVENT"
        # write-then-swap (send_graph's atomicity, review fix): the
        # existing graph must survive a mid-write failure, so encode into
        # a HIDDEN tmp sibling (listings skip dot-dirs) and only replace
        # the destination after the whole write + meta succeeded
        comps = validate_path(path)
        if not comps:
            raise InvalidPath("graph path cannot be the root namespace")
        self._check_no_graph_ancestor(comps)
        fs = self._fs(path)
        if os.path.exists(fs):
            if not self._is_graph(fs):
                raise InvalidPath(f"{path!r} is a namespace")
            if not overwrite:
                raise FileExistsError(f"graph already exists at {path!r}")
        tmp = os.path.join(os.path.dirname(fs),
                           f".{os.path.basename(fs)}.uploading")
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, _META_DIR))
        try:
            if graph_type == "PERSISTENT":
                _persist_events(gf, tmp)
            else:
                to_parquet(gf, tmp)
            n, m = gf.n, _count_rows(os.path.join(tmp, "edges"))
            now = time.time()
            self._write_meta(tmp, {"graph_type": graph_type,
                                   "node_count": int(n),
                                   "edge_event_count": int(m),
                                   "created": now, "last_updated": now})
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        _swap_in(tmp, fs)
        return path

    def send_graph(self, path: str, graph_b64: str,
                   overwrite: bool = False) -> str:
        """Insert a graph serialized by receive_graph (base64 zip of the
        parquet folder — the reference's base64-bincode body transport,
        model/mod.rs:795-820)."""
        comps = validate_path(path)
        if not comps:
            raise InvalidPath("graph path cannot be the root namespace")
        self._check_no_graph_ancestor(comps)
        fs = self._fs(path)
        if os.path.exists(fs):
            if not self._is_graph(fs):
                # same guard as _prepare_insert: overwrite must never
                # rmtree a NAMESPACE (it may hold unrelated graphs)
                raise InvalidPath(f"{path!r} is a namespace")
            if not overwrite:
                raise FileExistsError(f"graph already exists at {path!r}")
        buf = io.BytesIO(base64.b64decode(graph_b64))
        tmp = fs + ".part"
        shutil.rmtree(tmp, ignore_errors=True)
        with zipfile.ZipFile(buf) as z:
            names = z.namelist()
            if any(n.startswith("/") or ".." in n for n in names):
                raise InvalidPath("unsafe member path in graph archive")
            z.extractall(tmp)
        if not os.path.isdir(os.path.join(tmp, _META_DIR)):
            shutil.rmtree(tmp)
            raise InvalidPath("archive is not a graph folder")
        _swap_in(tmp, fs)
        self._touch(fs)
        return path

    def receive_graph(self, path: str) -> str:
        """Encode a stored graph for client download: deterministic zip of
        the graph folder, base64 (model/mod.rs:629-650)."""
        fs = self._require_graph(path)
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            for base, dirs, files in os.walk(fs):
                dirs.sort()
                for fname in sorted(files):
                    full = os.path.join(base, fname)
                    arc = os.path.relpath(full, fs)
                    info = zipfile.ZipInfo(arc)   # fixed date → stable bytes
                    with open(full, "rb") as fh:
                        z.writestr(info, fh.read(),
                                   zipfile.ZIP_DEFLATED)
        return base64.b64encode(buf.getvalue()).decode()

    def create_subgraph(self, parent_path: str, nodes: list,
                        new_path: str, overwrite: bool = False) -> str:
        """Persist the node-induced subgraph of a stored graph as a new
        graph (model/mod.rs:823-852). ``nodes`` are gids (names) or vids."""
        gf = self.graph(parent_path)
        vids = _resolve_node_ids(gf, nodes)
        sub = gf.subgraph(vids).materialize()
        return self.upload_graph(new_path, sub, overwrite)

    def create_index(self, path: str) -> bool:
        """Build a node-name full-text index sidecar (the create_index /
        searchNodes experimental surface; tantivy replaced by the engine's
        inverted index, data/search.py)."""
        import pyarrow.parquet as pq
        from raphtory_ray.data.search import build_text_index
        import ray.data as rd
        fs = self._require_graph(path)
        gf = self.graph(path)
        if gf.vertices is None:
            return False
        docs = rd.from_arrow(pa.table({
            "doc_id": gf.vertices["vid"].cast(pa.int64()),
            "text": gf.vertices["gid"].cast(pa.string())}))
        postings = build_text_index(docs)
        tbl = pa.concat_tables(
            postings.iter_batches(batch_format="pyarrow"))
        pq.write_table(tbl, os.path.join(fs, _META_DIR, "index.parquet"))
        self._touch(fs)
        return True

    def search_nodes(self, path: str, query: str, limit: int = 10) -> list:
        """Query the create_index sidecar: node names matching ALL query
        terms (data/search.py AND semantics), smallest vid first."""
        import pyarrow.parquet as pq
        import ray.data as rd
        from raphtory_ray.data.search import search, tokenize_batch
        fs = self._require_graph(path)
        idx = os.path.join(fs, _META_DIR, "index.parquet")
        if not os.path.exists(idx):
            raise GraphNotFound(f"no index for {path!r} — createIndex first")
        # query tokenized EXACTLY like the indexed names
        qt = tokenize_batch(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array([query], pa.string())}))
        terms = qt["token"].to_pylist()
        res = search(rd.from_arrow(pq.read_table(idx)), terms, mode="and")
        vids = res["doc_id"].to_pylist()[:limit]
        # resolve names from the vertices sidecar alone — O(limit) take,
        # never rebuilds the graph or materializes the full gid column
        vt = pq.read_table(os.path.join(fs, "vertices.parquet"),
                           columns=["vid", "gid"])
        import pyarrow.compute as pc
        pos = pc.index_in(pa.array(vids, pa.int64()), vt["vid"])
        names = vt["gid"].take(pos)
        return [{"id": int(v), "name": str(names[i].as_py())}
                for i, v in enumerate(vids)]


# ------------------------------------------------------------- helpers

def _count_rows(parquet_dir: str) -> int:
    import pyarrow.parquet as pq
    total = 0
    for base, _dirs, files in os.walk(parquet_dir):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(base, f)).metadata.num_rows
    return total


def _persist_events(pgf, fs: str):
    """Persistent-graph encode: the event stream incl. the op column
    (rap_deleted flag — parquet_encoder layout + deletion marker)."""
    import pyarrow.parquet as pq

    def encode(b: pa.Table) -> pa.Table:
        cols = {
            "rap_time": b["t"],
            "rap_secondary_index": b["event_id"],
            "rap_src_vid": b["src"], "rap_dst_vid": b["dst"],
            "rap_deleted": b["op"] if "op" in b.column_names else
            pa.array(np.zeros(b.num_rows, bool)),
        }
        if "layer" in b.column_names:
            cols["rap_layer"] = b["layer"]
        return pa.table(cols)

    (pgf.events.map_batches(encode, batch_format="pyarrow",
                            zero_copy_batch=True)
     .write_parquet(os.path.join(fs, "edges"), row_group_size=100_000))
    vertices = getattr(pgf, "vertices", None)
    if vertices is not None:          # same sidecar layout as to_parquet
        pq.write_table(vertices, os.path.join(fs, "vertices.parquet"))


def _empty_graph(graph_type: str, n: int):
    """Zero-edge graph for a freshly new_graph'd path."""
    import ray.data as rd
    cols = {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
            "t": pa.array([], pa.int64()), "event_id": pa.array([], pa.int64())}
    if graph_type == "PERSISTENT":
        from raphtory_ray.graph.persistent import PersistentGraphFrame
        cols["op"] = pa.array([], pa.bool_())
        return PersistentGraphFrame(rd.from_arrow(pa.table(cols)), n=n)
    from raphtory_ray.graph.graph_frame import GraphFrame
    return GraphFrame(rd.from_arrow(pa.table(cols)), n=n)


def _to_persistent(fs: str, n: int):
    """Re-hydrate a PERSISTENT-stored folder: decode the rap_deleted flag
    back into the op column."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from raphtory_ray.graph.persistent import PersistentGraphFrame
    edges = rd.read_parquet(os.path.join(fs, "edges"))
    vertices = None
    vp = os.path.join(fs, "vertices.parquet")
    if os.path.exists(vp):
        vertices = pq.read_table(vp)
        n = max(n, vertices.num_rows)

    def decode(b: pa.Table) -> pa.Table:
        cols = {"src": b["rap_src_vid"], "dst": b["rap_dst_vid"],
                "t": b["rap_time"], "event_id": b["rap_secondary_index"],
                "op": b["rap_deleted"] if "rap_deleted" in b.column_names
                else pa.array(np.zeros(b.num_rows, bool))}
        if "rap_layer" in b.column_names:
            cols["layer"] = b["rap_layer"]
        return pa.table(cols)

    return PersistentGraphFrame(
        edges.map_batches(decode, batch_format="pyarrow",
                          zero_copy_batch=True), n=n, vertices=vertices)


def _resolve_node_ids(gf, nodes: list) -> np.ndarray:
    if gf.vertices is not None and nodes and isinstance(nodes[0], str):
        # map names through the vid COLUMN, not the row position — a
        # vertices table need not be positionally dense (review fix;
        # same contract as graphql.vid_of)
        gids = gf.vertices["gid"].to_pylist()
        vids = gf.vertices["vid"].to_numpy(zero_copy_only=False)
        index = {g: int(vids[i]) for i, g in enumerate(gids)}
        return np.array(sorted(index[x] for x in nodes if x in index),
                        dtype=np.int64)
    return np.unique(np.asarray(nodes, dtype=np.int64))


# --------------------------------------------------- GraphQL entry point

def _pick(d: dict, sel: list | None) -> dict:
    """Project a plain dict through a GraphQL selection."""
    if not sel:
        return dict(d)
    return {f.out: d[f.name] for f in sel}


def _resolve_namespace(wd: GraphWorkDir, path: str, sel: list | None):
    ns = wd.namespace(path)
    out = {}
    for f in (sel or []):
        if f.name == "path":
            out[f.out] = ns["path"]
        elif f.name == "graphs":
            out[f.out] = [
                _pick(wd.graph_metadata(g), f.sel) if f.sel else g
                for g in ns["graphs"]]
        elif f.name == "children":
            out[f.out] = [_resolve_namespace(wd, c, f.sel) if f.sel else c
                          for c in ns["children"]]
        else:
            raise KeyError(f"unknown namespace field {f.name}")
    return out


def execute_server(work_dir, document: str, version: str = "raphtory-ray"
                   ) -> dict:
    """Execute a GraphQL document against a work dir — the reference's
    server root resolvers (model/mod.rs QueryRoot + Mut), server-less.
    ``work_dir`` is a GraphWorkDir or a path string. Query fields: hello,
    version, graph(path, graphType){...} (full per-graph resolver algebra,
    query/graphql.py), graphMetadata(path){...}, namespaces{...},
    namespace(path){...}, root{...}, receiveGraph(path),
    searchNodes(path, query, limit){id name}. Mutation fields: newGraph,
    deleteGraph, moveGraph, copyGraph, sendGraph, createSubgraph,
    createIndex."""
    from raphtory_ray.query.graphql import (_GraphCtx, _resolve_graph,
                                            parse_document)
    wd = work_dir if isinstance(work_dir, GraphWorkDir) \
        else GraphWorkDir(work_dir)
    op, roots = parse_document(document)
    data = {}
    for f in roots:
        a = f.args
        if op == "mutation":
            if f.name == "newGraph":
                data[f.out] = wd.new_graph(a["path"],
                                           a.get("graphType", "EVENT"))
            elif f.name == "deleteGraph":
                data[f.out] = wd.delete_graph(a["path"])
            elif f.name == "moveGraph":
                data[f.out] = wd.move_graph(a["path"], a["newPath"],
                                            a.get("overwrite", False))
            elif f.name == "copyGraph":
                data[f.out] = wd.copy_graph(a["path"], a["newPath"],
                                            a.get("overwrite", False))
            elif f.name == "sendGraph":
                data[f.out] = wd.send_graph(a["path"], a["graph"],
                                            a.get("overwrite", False))
            elif f.name == "createSubgraph":
                data[f.out] = wd.create_subgraph(
                    a["parentPath"], a["nodes"], a["newPath"],
                    a.get("overwrite", False))
            elif f.name == "createIndex":
                data[f.out] = wd.create_index(a["path"])
            else:
                raise KeyError(f"unknown mutation field {f.name}")
            continue
        if f.name == "hello":
            data[f.out] = "Hello world from raphtory-ray"
        elif f.name == "version":
            data[f.out] = version
        elif f.name == "graph":
            # reference returns null for a missing graph (model/mod.rs:437)
            try:
                gf = wd.graph(a["path"], a.get("graphType"))
            except GraphNotFound:
                data[f.out] = None
                continue
            data[f.out] = _resolve_graph(_GraphCtx(gf), f.sel or [])
        elif f.name == "graphMetadata":
            try:
                data[f.out] = _pick(wd.graph_metadata(a["path"]), f.sel)
            except GraphNotFound:
                data[f.out] = None
        elif f.name == "namespaces":
            paths = wd.namespaces()
            data[f.out] = [_resolve_namespace(wd, p, f.sel) if f.sel else p
                           for p in paths]
        elif f.name == "namespace":
            data[f.out] = _resolve_namespace(wd, a["path"], f.sel)
        elif f.name == "root":
            data[f.out] = _resolve_namespace(wd, "", f.sel)
        elif f.name == "receiveGraph":
            data[f.out] = wd.receive_graph(a["path"])
        elif f.name == "searchNodes":
            hits = wd.search_nodes(a["path"], a["query"],
                                   int(a.get("limit", 10)))
            data[f.out] = [_pick(h, f.sel) for h in hits]
        else:
            raise KeyError(f"unknown query field {f.name}")
    return {"data": data}
