"""Deterministic synthetic source-repo corpus (FIXTURES.md §A).

Produces the engine's real input table per ``BASELINE.json`` ``input_hint``:
``corpus.parquet(repo:string, path:string, commit:string, lang:string,
content:string)``. Import statements written into ``content`` reference other
files and ARE the ground-truth file→file edges, so edge extraction is a pure,
checkable transform.

Everything is derived per global file index with a vectorized splitmix64
counter RNG → generation is partition-independent and reproducible at any
parallelism (the same file index always yields the same row, whichever Ray
block generates it).

Node identity (gid) is the module identity ``{repo}/{path-minus-extension}``
— imports don't carry file extensions, so extraction maps import strings back
to gids without knowing the target's language.

``commit`` encodes the commit timestamp in its first 12 hex chars (ingest
derives ``t = int(commit[:12], 16)``, mirroring FIXTURES.md "t derived from
commit ordinal").
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

SEED = 42
FILES_PER_REPO = 50
N_ORGS = 20
N_PKGS = 13
LANGS = ("py", "rs", "js", "go")
EXT = {"py": "py", "rs": "rs", "js": "js", "go": "go"}
MAX_IMPORTS = 5          # k_i = 1 + u%5 ∈ {1..5}, mean 3
INTRA_REPO_PROB = 0.7    # imports biased within the repo
ZIPF_ALPHA = 3.0         # target index ~ floor(N * u^alpha): hub files exist
T0 = 1_600_000_000_000   # base commit timestamp (ms)
T_STEP = 3_600_000       # one commit-hour per file ordinal

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def n_files_for_sf(sf: float) -> int:
    return max(200, int(round(2_000_000 * sf)))


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over a uint64 vector."""
    z = (x + _C1).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _C2
    z = (z ^ (z >> np.uint64(27))) * _C3
    return z ^ (z >> np.uint64(31))


def _rand_u64(i: np.ndarray, stream: int) -> np.ndarray:
    i = np.asarray(i, dtype=np.uint64)
    off = np.uint64((stream * 0xC2B2AE3D27D4EB4F + SEED) % (1 << 64))
    return _mix(i * np.uint64(0x85EBCA77C2B2AE63) + off)


def _rand_u01(i: np.ndarray, stream: int) -> np.ndarray:
    return _rand_u64(i, stream).astype(np.float64) / float(2**64)


def file_meta(idx: np.ndarray, n_files: int):
    """Vectorized per-file metadata for global file indices ``idx``.

    Returns dict of numpy arrays: org, repo_idx, pkg, lang_idx, t.
    """
    idx = np.asarray(idx, dtype=np.int64)
    repo_idx = idx // FILES_PER_REPO
    j = idx % FILES_PER_REPO
    org = (_rand_u64(repo_idx, 101) % np.uint64(N_ORGS)).astype(np.int64)
    pkg = j % N_PKGS
    lang_idx = (_rand_u64(idx, 3) % np.uint64(len(LANGS))).astype(np.int64)
    t = T0 + idx * T_STEP
    return {"idx": idx, "repo_idx": repo_idx, "j": j, "org": org, "pkg": pkg,
            "lang_idx": lang_idx, "t": t}


def import_targets(idx: np.ndarray, n_files: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Ground-truth import edges for files ``idx``.

    Returns (src_idx, dst_idx, slot) — one row per import statement; targets
    Zipf-skewed (global hubs near index 0, per-repo hubs at each repo's first
    files), self-imports redirected to (i+1) % n.
    """
    idx = np.asarray(idx, dtype=np.int64)
    k = 1 + (_rand_u64(idx, 11) % np.uint64(MAX_IMPORTS)).astype(np.int64)
    src = np.repeat(idx, k)
    slot = np.concatenate([np.arange(c) for c in k]) if len(k) else np.empty(0, np.int64)
    slot = slot.astype(np.int64)
    key = src * np.int64(MAX_IMPORTS + 1) + slot
    u = _rand_u01(key, 21)
    intra = _rand_u01(key, 22) < INTRA_REPO_PROB
    zipf = np.power(u, ZIPF_ALPHA)
    repo_base = (src // FILES_PER_REPO) * FILES_PER_REPO
    n_in_repo = np.minimum(FILES_PER_REPO, n_files - repo_base)
    local = repo_base + np.floor(zipf * n_in_repo).astype(np.int64)
    glob = np.floor(zipf * n_files).astype(np.int64)
    dst = np.where(intra, local, glob)
    dst = np.where(dst == src, (dst + 1) % n_files, dst)
    return src, dst, slot


def gid_of(meta: dict, pos: np.ndarray | None = None) -> list[str]:
    """gid = '{repo}/{path minus extension}' for rows of a file_meta dict."""
    sel = slice(None) if pos is None else pos
    org, r, p, j = (meta["org"][sel], meta["repo_idx"][sel],
                    meta["pkg"][sel], meta["j"][sel])
    return [f"org{o}/repo{ri}/src/pkg{pk}/mod_{jj}"
            for o, ri, pk, jj in zip(org.tolist(), r.tolist(), p.tolist(), j.tolist())]


def _import_line(lang: str, o: int, r: int, p: int, j: int, slot: int) -> str:
    if lang == "py":
        return f"from org{o}_repo{r}.pkg{p}.mod_{j} import handler_{slot}"
    if lang == "rs":
        return f"use org{o}_repo{r}::pkg{p}::mod_{j}::Item{slot};"
    if lang == "js":
        return f'import {{ sym{slot} }} from "@org{o}/repo{r}/pkg{p}/mod_{j}";'
    return f'import m{slot} "example.com/org{o}/repo{r}/pkg{p}/mod_{j}"'


_FILLER = {
    "py": 'def fn_{k}(x):\n    return (x * {c}) % 997\n',
    "rs": 'pub fn fn_{k}(x: i64) -> i64 {{ (x * {c}) % 997 }}\n',
    "js": 'export function fn_{k}(x) {{ return (x * {c}) % 997; }}\n',
    "go": 'func Fn{k}(x int64) int64 {{ return (x * {c}) % 997 }}\n',
}


def generate_batch(idx: np.ndarray, n_files: int) -> pa.Table:
    """Generate corpus rows for global file indices ``idx`` (any subset, any
    order) — the map_batches body of the Ray generation pipeline."""
    idx = np.asarray(idx, dtype=np.int64)
    meta = file_meta(idx, n_files)
    src_i, dst_i, slot = import_targets(idx, n_files)
    dmeta = file_meta(dst_i, n_files)
    # group import lines per src (src_i is sorted ascending by construction)
    lines_by_src: dict[int, list[str]] = {}
    langs = [LANGS[li] for li in meta["lang_idx"].tolist()]
    lang_of = dict(zip(idx.tolist(), langs))
    for s, o, r, p, j, sl in zip(src_i.tolist(), dmeta["org"].tolist(),
                                 dmeta["repo_idx"].tolist(), dmeta["pkg"].tolist(),
                                 dmeta["j"].tolist(), slot.tolist()):
        lines_by_src.setdefault(s, []).append(
            _import_line(lang_of[s], o, r, p, j, sl))
    repos, paths, commits, contents = [], [], [], []
    fill_c = (_rand_u64(idx, 31) % np.uint64(8999) + np.uint64(1000)).astype(np.int64)
    n_fill = (2 + _rand_u64(idx, 32) % np.uint64(6)).astype(np.int64)
    rand_tail = _rand_u64(idx, 33)
    for pos in range(len(idx)):
        i = int(idx[pos])
        o, r, p, j = (int(meta["org"][pos]), int(meta["repo_idx"][pos]),
                      int(meta["pkg"][pos]), int(meta["j"][pos]))
        lang = langs[pos]
        repo = f"org{o}/repo{r}"
        path = f"src/pkg{p}/mod_{j}.{EXT[lang]}"
        t = int(meta["t"][pos])
        commit = f"{t:012x}{int(rand_tail[pos]):016x}{'0' * 12}"
        cm = "#" if lang == "py" else "//"
        body = [f"{cm} module mod_{j} of {repo} @ {commit[:12]}"]
        body += lines_by_src.get(i, [])
        tmpl = _FILLER[lang]
        body += [tmpl.format(k=k, c=int(fill_c[pos]) + k)
                 for k in range(int(n_fill[pos]))]
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        contents.append("\n".join(body) + "\n")
    return pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def truth_edges(n_files: int):
    """Ground-truth dict-encoded edge list for tests: returns
    (src_gid, dst_gid, t, event_id) numpy/str arrays, one row per import."""
    idx = np.arange(n_files, dtype=np.int64)
    src_i, dst_i, slot = import_targets(idx, n_files)
    smeta = file_meta(src_i, n_files)
    dmeta = file_meta(dst_i, n_files)
    t = T0 + src_i * T_STEP
    event_id = src_i * np.int64(MAX_IMPORTS + 1) + slot
    return gid_of(smeta), gid_of(dmeta), t, event_id


def corpus_path(tag: str, root: str = "/tmp/raphtory_ray_cache") -> str:
    return os.path.join(root, f"corpus_{tag}")


def ensure_corpus(sf: float | None = None, n_files: int | None = None,
                  root: str = "/tmp/raphtory_ray_cache",
                  parallelism: int | None = None) -> str:
    """Generate (once, cached) the corpus parquet directory for a scale factor
    via a Ray Data pipeline; returns the directory path.

    Layout is partitioned parquet (one file per generation block) so a rerun
    skips finished corpora entirely (the _SUCCESS marker gates reuse).
    """
    import ray.data as rd

    if n_files is None:
        n_files = n_files_for_sf(sf)
    tag = f"n{n_files}"
    out = corpus_path(tag, root)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    nf = n_files
    ds = rd.range(nf, override_num_blocks=parallelism or max(4, min(64, nf // 5000 + 1)))
    ds.map_batches(
        lambda b: generate_batch(b["id"], nf),
        batch_format="numpy", batch_size=8192, zero_copy_batch=True,
    ).write_parquet(out)
    with open(marker, "w") as f:
        f.write(str(nf))
    return out
