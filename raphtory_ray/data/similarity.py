"""Similarity search over an embedding Dataset (vec_id, embedding:list<float>).

- ``knn_bruteforce`` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every block computes a vectorized matmul and emits its
  LOCAL top-k per query (the partial-combine pattern: k × num_queries rows
  per block, never the full similarity matrix), and the driver's final
  combine is a tiny merge.
- ``knn_ivf`` — IVF scale path: k-means centroids trained via
  map_batches partial-sum supersteps, vectors bucketed by nearest centroid
  (one shuffle), queries probe only the ``nprobe`` nearest buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from raphtory_ray.data.dedup import embedding_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BlockTopK:
    """Actor-pool stage holding the broadcast normalized query matrix."""

    def __init__(self, q_ref, k: int):
        self.q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        emb = _normalize(embedding_matrix(batch["embedding"]))
        sims = self.q @ emb.T                      # (nq, rows)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        nq = sims.shape[0]
        qi = np.repeat(np.arange(nq), k)
        ni = part.reshape(-1)
        return pa.table({
            "query_id": pa.array(qi, pa.int64()),
            "neighbor_id": pa.array(ids[ni], pa.int64()),
            "cosine": pa.array(sims[qi, ni], pa.float64()),
        })


def knn_bruteforce(ds, queries: np.ndarray, k: int = 5,
                   query_ids: np.ndarray | None = None) -> pa.Table:
    """Exact top-k cosine neighbours of each query row.

    Returns Table(query_id, neighbor_id, cosine, rank) with rank 1..k,
    ties broken by neighbor_id ascending (deterministic at any
    parallelism)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    partials = ds.map_batches(
        _BlockTopK, fn_constructor_args=(q_ref, k),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=(2, 8)).to_pandas()
    # driver-side final combine: top-k of the per-block top-ks
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"],
        ascending=[True, False, True], kind="stable")
    top = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    if query_ids is not None:
        top["query_id"] = np.asarray(query_ids)[top["query_id"].to_numpy()]
    return pa.Table.from_pandas(top, preserve_index=False)


# ----------------------------------------------------------------------- IVF

def train_centroids(ds, n_clusters: int, iters: int = 5,
                    seed: int = 3) -> np.ndarray:
    """Distributed k-means on unit vectors: per-block partial (sum, count)
    per centroid via map_batches; driver recomputes centroids — the same
    partial+final combine as every BSP superstep in this engine."""
    first = ds.take_batch(256, batch_format="pyarrow")
    boot = _normalize(embedding_matrix(first["embedding"]))
    rng = np.random.default_rng(seed)
    cent = boot[rng.choice(len(boot), min(n_clusters, len(boot)),
                           replace=False)]

    for _ in range(iters):
        c_ref = ray.put(cent)

        def partial(b: pa.Table, c_ref=c_ref) -> pa.Table:
            c = ray.get(c_ref) if isinstance(c_ref, ray.ObjectRef) else c_ref
            emb = _normalize(embedding_matrix(b["embedding"]))
            assign = np.argmax(emb @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, emb)
            cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.arange(len(c)), pa.int64()),
                "vsum": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.reshape(-1), pa.float64()), c.shape[1]),
                "cnt": pa.array(cnt, pa.int64())})

        agg = (ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas())
        sums = np.zeros_like(cent)
        cnts = np.zeros(len(cent), dtype=np.int64)
        cid = agg["cid"].to_numpy()
        np.add.at(cnts, cid, agg["cnt"].to_numpy())
        vs = np.stack(agg["vsum"].to_numpy())
        np.add.at(sums, cid, vs)
        nz = cnts > 0
        cent[nz] = _normalize(sums[nz] / cnts[nz][:, None])
    return cent


def knn_ivf(ds, queries: np.ndarray, k: int = 5, n_clusters: int = 16,
            nprobe: int = 4) -> pa.Table:
    """Approximate top-k: bucket vectors by nearest centroid, probe only the
    ``nprobe`` closest buckets per query. Same output schema as
    knn_bruteforce; recall tested against it."""
    cent = train_centroids(ds, n_clusters)
    c_ref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(c_ref) if isinstance(c_ref, ray.ObjectRef) else c_ref
        emb = _normalize(embedding_matrix(b["embedding"]))
        a = np.argmax(emb @ c.T, axis=1)
        return b.append_column("bucket", pa.array(a.astype(np.int64)))

    bucketed = ds.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]   # (nq, nprobe)
    # query q is searched only against rows whose bucket ∈ probe[q]
    probe_ref = ray.put(probe)
    q_ref = ray.put(qn)
    kk = k

    def block_topk(b: pa.Table) -> pa.Table:
        q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        pr = ray.get(probe_ref) if isinstance(probe_ref, ray.ObjectRef) else probe_ref
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        bk = b["bucket"].to_numpy(zero_copy_only=False)
        emb = _normalize(embedding_matrix(b["embedding"]))
        sims = q @ emb.T
        mask = np.zeros_like(sims, dtype=bool)
        for j in range(pr.shape[1]):
            mask |= bk[None, :] == pr[:, j][:, None]
        sims = np.where(mask, sims, -np.inf)
        k2 = min(kk, sims.shape[1])
        part = np.argpartition(-sims, k2 - 1, axis=1)[:, :k2]
        qi = np.repeat(np.arange(sims.shape[0]), k2)
        ni = part.reshape(-1)
        keep = np.isfinite(sims[qi, ni])
        return pa.table({
            "query_id": pa.array(qi[keep], pa.int64()),
            "neighbor_id": pa.array(ids[ni[keep]], pa.int64()),
            "cosine": pa.array(sims[qi, ni][keep], pa.float64())})

    partials = bucketed.map_batches(block_topk, batch_format="pyarrow",
                                    zero_copy_batch=True).to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", "neighbor_id"],
        ascending=[True, False, True], kind="stable")
    top = partials.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(top, preserve_index=False)
