"""Deduplication operators over a document / embedding Dataset.

Five families (training-data pipeline core ops):

- exact          — md5(text) → groupby(hash) keep min doc_id
- minhash_lsh    — char-shingle → minhash signature → band buckets →
                   candidate pairs → exact-Jaccard verify → clusters
- simhash        — 64-bit simhash → 4×16-bit band buckets → hamming verify
- ngram_jaccard  — exact k-shingle Jaccard over candidate pairs
- embedding      — cosine near-dup over list<float> column via random
                   hyperplane LSH buckets (brute verify within bucket)

Architecture: every family is  map_batches(signature kernel)  →
groupby(bucket)  →  per-group vectorized verify  →  driver-side union-find
over surviving duplicate pairs (pairs are assumed sparse — the dup graph,
not the data, lives on the driver; at 100 TB the pair list is still tiny
relative to the corpus, and the union-find can fall back to the engine's
distributed WCC (state/shards.BspGraph.wcc) if it is not).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from raphtory_ray.data.text import _flat_utf8, kgram_hashes

MERSENNE61 = np.uint64((1 << 61) - 1)


# --------------------------------------------------------------------- exact

def md5_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, h=md5hex). hashlib per row — hashing IS the per-row compute;
    the loop body is C."""
    buf, offsets = _flat_utf8(batch[text_col])
    hs = [hashlib.md5(buf[offsets[i]:offsets[i + 1]].tobytes()).hexdigest()
          for i in range(batch.num_rows)]
    return pa.table({"doc_id": batch["doc_id"], "h": pa.array(hs, pa.string())})


def exact_dedup(ds, text_col: str = "text"):
    """→ Dataset(h, keep_id=min doc_id, n_docs). The shuffle key is the
    16-byte hash — uniformly distributed, skew-free by construction."""
    hashed = ds.map_batches(lambda b: md5_batch(b, text_col),
                            batch_format="pyarrow", zero_copy_batch=True)
    agg = hashed.groupby("h").aggregate(
        _min_agg("doc_id", "keep_id"), _count_agg("n_docs"))
    return agg


def _min_agg(col, name):
    from ray.data.aggregate import Min
    return Min(col, alias_name=name)


def _count_agg(name):
    from ray.data.aggregate import Count
    return Count(alias_name=name)


# ------------------------------------------------------------------- minhash

def _shingle_set(buf: np.ndarray, lo: int, hi: int, k: int) -> np.ndarray:
    return np.unique(kgram_hashes(buf[lo:hi], k))


class MinHashStage:
    """Actor-pool stage: per-doc minhash signature over char k-shingles.
    The (a, b) permutation tables are built once per actor.

    h_i(x) = (a_i * x + b_i) mod p  over the shingle's 61-bit rolling hash;
    signature = min over shingles, per permutation.
    """

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(MERSENNE61), num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(MERSENNE61), num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, np.uint64)
        x = (shingles & MERSENNE61)[:, None]
        hv = (x * self.a[None, :] + self.b[None, :]) % MERSENNE61
        return hv.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        buf, offsets = _flat_utf8(batch["text"])
        sigs = np.empty((batch.num_rows, self.num_perm), dtype=np.uint64)
        for i in range(batch.num_rows):
            sigs[i] = self.signature(
                _shingle_set(buf, offsets[i], offsets[i + 1], self.k))
        return pa.table({
            "doc_id": batch["doc_id"],
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1), pa.uint64()), self.num_perm),
        })


def _band_rows(sig_tbl: pa.Table, bands: int) -> pa.Table:
    """Explode signatures into (band_key, doc_id) rows; band_key = hash of
    the band slice (salted by band index) — the LSH bucket shuffle key."""
    doc = sig_tbl["doc_id"].to_numpy(zero_copy_only=False)
    sig_col = sig_tbl["sig"].combine_chunks() if isinstance(sig_tbl["sig"], pa.ChunkedArray) else sig_tbl["sig"]
    num_perm = sig_col.type.list_size
    sigs = np.asarray(sig_col.values).reshape(len(doc), num_perm)
    r = num_perm // bands
    keys, docs = [], []
    for bi in range(bands):
        sl = sigs[:, bi * r:(bi + 1) * r].copy()
        acc = np.full(len(doc),
                      np.uint64((bi * 0x9E3779B97F4A7C15) % (1 << 64)),
                      dtype=np.uint64)
        for c in range(r):
            acc = (acc ^ sl[:, c]) * np.uint64(0x100000001B3)
        keys.append(acc)
        docs.append(doc)
    return pa.table({"band_key": pa.array(np.concatenate(keys), pa.uint64()),
                     "doc_id": pa.array(np.concatenate(docs), pa.int64())})


def _pairs_in_buckets(df: pd.DataFrame, max_bucket: int = 2000) -> pa.Table:
    """Candidate pairs within each bucket key (vectorized per size-class, as
    in tpch_graph._pairs_within_groups). Buckets larger than ``max_bucket``
    are degenerate (near-identical boilerplate floods); they are truncated —
    dedup keeps correctness because every truncated member still shares the
    bucket with the kept head members."""
    from raphtory_ray.pipelines.tpch_graph import _pairs_within_groups
    key = df.iloc[:, 0].to_numpy()
    doc = df["doc_id"].to_numpy()
    order = np.argsort(key, kind="stable")
    key, doc = key[order], doc[order]
    boundary = np.r_[True, key[1:] != key[:-1]]
    gidx = np.cumsum(boundary) - 1
    rank = np.arange(len(key)) - np.repeat(np.flatnonzero(boundary),
                                           np.diff(np.r_[np.flatnonzero(boundary), len(key)]))
    keep = rank < max_bucket
    a, b = _pairs_within_groups(gidx[keep], doc[keep], doc[keep])
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    m = lo != hi
    uniq = np.unique(np.stack([lo[m], hi[m]]), axis=1)
    return pa.table({"a": pa.array(uniq[0], pa.int64()),
                     "b": pa.array(uniq[1], pa.int64())})


def jaccard_verify(pairs: pd.DataFrame, texts: dict[int, str], k: int,
                   threshold: float) -> pd.DataFrame:
    """Exact k-shingle Jaccard on candidate pairs (driver/task side; texts
    fetched for candidates only)."""
    if len(pairs) == 0:
        return pairs.assign(jaccard=np.empty(0))
    cache: dict[int, np.ndarray] = {}

    def sh(i):
        if i not in cache:
            b = np.frombuffer(texts[i].encode(), dtype=np.uint8)
            cache[i] = np.unique(kgram_hashes(b, k))
        return cache[i]

    js = np.empty(len(pairs))
    for n, (a, b) in enumerate(zip(pairs["a"], pairs["b"])):
        sa, sb = sh(int(a)), sh(int(b))
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        js[n] = inter / union if union else 1.0
    out = pairs.assign(jaccard=js)
    return out[out["jaccard"] >= threshold]


def union_find_clusters(pairs_a: np.ndarray, pairs_b: np.ndarray,
                        ids: np.ndarray) -> np.ndarray:
    """cluster_id = min doc_id in each dup component (driver-side union-find
    over the sparse dup-pair graph)."""
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs_a.tolist(), pairs_b.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return np.array([find(int(i)) for i in ids], dtype=np.int64)


def minhash_lsh_dedup(ds, num_perm: int = 64, bands: int = 16, k: int = 5,
                      threshold: float = 0.7):
    """→ pyarrow Table(doc_id, cluster_id): near-dup clusters, cluster_id =
    min member doc_id; non-dups map to themselves.

    Pipeline: MinHashStage actor pool → band explode → groupby(band_key)
    pairs → Jaccard verify on candidate texts → union-find.
    """
    sig = ds.map_batches(MinHashStage, fn_constructor_kwargs={
        "num_perm": num_perm, "k": k}, batch_format="pyarrow",
        zero_copy_batch=True, concurrency=(2, 8))
    bandrows = sig.map_batches(lambda b: _band_rows(b, bands),
                               batch_format="pyarrow", zero_copy_batch=True)
    cand = (bandrows.groupby("band_key")
            .map_groups(_pairs_in_buckets, batch_format="pandas")
            .to_pandas().drop_duplicates())
    doc_ids_tbl = ds.select_columns(["doc_id"]).to_pandas()
    all_ids = doc_ids_tbl["doc_id"].to_numpy()
    if len(cand):
        need = set(cand["a"]) | set(cand["b"])
        texts = _fetch_texts(ds, need)
        verified = jaccard_verify(cand, texts, k, threshold)
    else:
        verified = cand.assign(jaccard=np.empty(0))
    cluster = union_find_clusters(verified["a"].to_numpy() if len(verified) else np.empty(0, np.int64),
                                  verified["b"].to_numpy() if len(verified) else np.empty(0, np.int64),
                                  all_ids)
    return pa.table({"doc_id": pa.array(all_ids, pa.int64()),
                     "cluster_id": pa.array(cluster, pa.int64())})


def _fetch_texts(ds, ids: set[int]) -> dict[int, str]:
    """Pull candidate texts only (semi-join against the small id set)."""
    idarr = np.array(sorted(ids), dtype=np.int64)

    def filt(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(idarr, d)
        pos[pos >= len(idarr)] = len(idarr) - 1
        return b.filter(pa.array(idarr[pos] == d))

    out = {}
    for b in (ds.select_columns(["doc_id", "text"])
              .map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
              .iter_batches(batch_format="pyarrow")):
        for i, t in zip(b["doc_id"].to_pylist(), b["text"].to_pylist()):
            out[i] = t
    return out


# ------------------------------------------------------------------- simhash

class SimHashStage:
    """64-bit simhash over word-token hashes (unit weight): bit b of the
    fingerprint = sign of sum over tokens of (+1 / -1) per token-hash bit."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch["text"]), r"\W+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        fb, fo = _flat_utf8(flat)
        th = np.empty(len(flat), dtype=np.uint64)
        for i in range(len(flat)):
            th[i] = np.uint64(int.from_bytes(
                hashlib.blake2b(fb[fo[i]:fo[i + 1]].tobytes(),
                                digest_size=8).digest(), "little"))
        keep = (fo[1:] - fo[:-1]) > 0
        th, parent = th[keep], parent[keep]
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64) * 2 - 1
        acc = np.zeros((batch.num_rows, 64), dtype=np.int64)
        np.add.at(acc, parent, bits)
        fp = (np.packbits((acc > 0).astype(np.uint8)[:, ::-1], axis=1,
                          bitorder="little")
              .view(np.uint64).reshape(-1))
        return pa.table({"doc_id": batch["doc_id"],
                         "simhash": pa.array(fp, pa.uint64())})


def simhash_signatures(ds, concurrency=(2, 8)):
    return ds.map_batches(SimHashStage, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency)


def simhash_dedup(ds, max_hamming: int = 3):
    """Near-dup clusters by simhash: bucket on each of 4 16-bit bands (two
    fingerprints within hamming ≤3 share at least one exact band), verify
    hamming distance, union-find."""
    sig = simhash_signatures(ds).to_pandas()
    doc = sig["doc_id"].to_numpy()
    fp = sig["simhash"].to_numpy().astype(np.uint64)
    keys, docs, fps = [], [], []
    for bi in range(4):
        band = (fp >> np.uint64(16 * bi)) & np.uint64(0xFFFF)
        keys.append(band * np.uint64(4) + np.uint64(bi))
        docs.append(doc)
        fps.append(fp)
    key = np.concatenate(keys)
    dd = np.concatenate(docs)
    ff = np.concatenate(fps)
    from raphtory_ray.pipelines.tpch_graph import _pairs_within_groups
    order = np.argsort(key, kind="stable")
    a, b = _pairs_within_groups(key[order], dd[order], dd[order])
    fa, fb = _pairs_within_groups(key[order], ff[order], ff[order])
    if len(a):
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        m = lo != hi
        ham = np.array([bin(int(x ^ y)).count("1") for x, y in
                        zip(fa[m].tolist(), fb[m].tolist())])
        ok = ham <= max_hamming
        pa_, pb_ = lo[m][ok], hi[m][ok]
    else:
        pa_ = pb_ = np.empty(0, np.int64)
    cluster = union_find_clusters(pa_, pb_, doc)
    return pa.table({"doc_id": pa.array(doc, pa.int64()),
                     "cluster_id": pa.array(cluster, pa.int64())})


# ------------------------------------------------------------ ngram jaccard

def ngram_jaccard_dedup(ds, k: int = 5, threshold: float = 0.8):
    """Exact k-shingle Jaccard dedup using minhash-LSH candidates with a
    high-recall setting (bands=num_perm → every single-perm band is a
    bucket) then exact verification."""
    return minhash_lsh_dedup(ds, num_perm=32, bands=32, k=k,
                             threshold=threshold)


# --------------------------------------------------------- embedding cosine

class HyperplaneLSH:
    """Random-hyperplane signatures for cosine LSH bucketing: sign bits of
    X @ H for ``nbits`` gaussian hyperplanes (built once per actor)."""

    def __init__(self, dim: int, nbits: int = 16, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.h = rng.standard_normal((dim, nbits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = embedding_matrix(batch["embedding"])
        bits = (emb @ self.h) > 0
        key = np.packbits(bits, axis=1, bitorder="little")
        pad = np.zeros((len(ids), 8), dtype=np.uint8)
        pad[:, :key.shape[1]] = key
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "bucket": pa.array(pad.view(np.uint64).reshape(-1), pa.uint64()),
        })


def embedding_matrix(col) -> np.ndarray:
    """list<float> column → (rows, dim) float64 matrix, zero-copy values."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        return np.asarray(col.values, dtype=np.float64).reshape(-1, dim)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0])
    vals = np.asarray(col.values, dtype=np.float64)
    return vals[offs[0]:offs[-1]].reshape(-1, dim)


def embedding_dedup(ds, threshold: float = 0.95, nbits: int = 12,
                    dim: int | None = None):
    """Cosine near-dup clusters over an embedding Dataset
    (vec_id, embedding:list<float>).

    Hyperplane-LSH bucket shuffle → within-bucket brute cosine (vectorized
    matmul) → union-find. With b sign bits, a pair at cosine θ collides with
    prob (1 - θ/π)^b per table; we union candidates from the single table —
    recall is tested against the brute-force oracle on the test corpus."""
    if dim is None:
        first = ds.take_batch(1, batch_format="pyarrow")
        dim = embedding_matrix(first["embedding"]).shape[1]
    lsh = HyperplaneLSH(dim, nbits)
    h_ref = None

    def sig_and_unit(b: pa.Table) -> pa.Table:
        """One stage computes both the LSH bucket and the unit vector —
        avoids shipping the embedding through a shuffle join. ``unit`` rides
        the bucket groupby as a plain list<double> column."""
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        emb = embedding_matrix(b["embedding"])
        bits = (emb @ lsh.h) > 0
        key = np.packbits(bits, axis=1, bitorder="little")
        pad = np.zeros((len(ids), 8), dtype=np.uint8)
        pad[:, :key.shape[1]] = key
        nrm = np.linalg.norm(emb, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        unit = emb / nrm
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "bucket": pa.array(pad.view(np.uint64).reshape(-1), pa.uint64()),
            "unit": pa.ListArray.from_arrays(
                pa.array(np.arange(len(ids) + 1) * unit.shape[1], pa.int32()),
                pa.array(unit.reshape(-1), pa.float64())),
        })

    joined = ds.map_batches(sig_and_unit, batch_format="pyarrow",
                            zero_copy_batch=True)

    def bucket_pairs(df: pd.DataFrame) -> pa.Table:
        ids = df["vec_id"].to_numpy()
        mat = np.stack(df["unit"].to_numpy())
        sims = mat @ mat.T
        iu, ju = np.triu_indices(len(ids), 1)
        hit = sims[iu, ju] >= threshold
        return pa.table({
            "a": pa.array(np.minimum(ids[iu[hit]], ids[ju[hit]]), pa.int64()),
            "b": pa.array(np.maximum(ids[iu[hit]], ids[ju[hit]]), pa.int64())})

    pairs = (joined.groupby("bucket")
             .map_groups(bucket_pairs, batch_format="pandas")
             .to_pandas().drop_duplicates())
    all_ids = ds.select_columns(["vec_id"]).to_pandas()["vec_id"].to_numpy()
    cluster = union_find_clusters(pairs["a"].to_numpy() if len(pairs) else np.empty(0, np.int64),
                                  pairs["b"].to_numpy() if len(pairs) else np.empty(0, np.int64),
                                  all_ids)
    return pa.table({"vec_id": pa.array(all_ids, pa.int64()),
                     "cluster_id": pa.array(cluster, pa.int64())})
