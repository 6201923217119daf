"""Distributed PCA over an embedding column — the classic combiner-pattern
two-pass: (1) one streaming pass accumulating per-block moment partials
(n, Σx, ΣxᵀX) that the driver combines into mean + covariance (O(d²)
driver state, never O(rows)); (2) a 64×64 (O(d³)) driver eigendecomposition;
(3) one streaming map_batches pass projecting every row onto the top-k
components.

Reference context: Raphtory has no dimensionality-reduction operator; this
is training-data-pipeline tooling (embedding compression / whitening before
ANN or clustering). The MOMENTS are the distributed computation and are
SQL-oracle-gated bit-near-exactly (`emb_pca_cov`); the eigensolve is a
driver-local dense op with invariant tests (orthonormality, variance
ordering, reconstruction).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


def _moments_block(b: pa.Table, col: str) -> tuple:
    from raphtory_ray.data.dedup import embedding_matrix
    X = embedding_matrix(b[col]).astype(np.float64)
    return len(X), X.sum(axis=0), X.T @ X


@ray.remote
def _moments_remote(b: pa.Table, col: str) -> tuple:
    return _moments_block(b, col)


def pca_moments(ds, col: str = "embedding") -> tuple:
    """(n, Σx, ΣXᵀX) over the Dataset — per-block partials, driver
    combine (all O(d)/O(d²))."""
    refs = ds.select_columns([col]).materialize().to_arrow_refs()
    parts = ray.get([_moments_remote.remote(r, col) for r in refs])
    parts = [p for p in parts if p[0]]
    if not parts:
        raise ValueError("empty dataset")
    n = sum(p[0] for p in parts)
    s = np.sum([p[1] for p in parts], axis=0)
    ss = np.sum([p[2] for p in parts], axis=0)
    return n, s, ss


def pca_fit(ds, k: int, col: str = "embedding") -> dict:
    """Top-k principal components. Covariance = ΣXᵀX/n − μμᵀ (the same
    op order the SQL oracle uses); eigenvectors sign-fixed so the
    largest-|entry| coordinate is positive (deterministic across BLAS)."""
    n, s, ss = pca_moments(ds, col)
    mu = s / n
    cov = ss / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    w = vecs[:, order]
    for j in range(w.shape[1]):
        i = int(np.argmax(np.abs(w[:, j])))
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
    return {"mean": mu, "components": w,
            "explained_variance": vals[order]}


def pca_transform(ds, model: dict, col: str = "embedding",
                  out_col: str = "pca"):
    """Streaming projection (x − μ)W — one zero-copy Arrow pass; the
    (d × k) model is closure-captured (broadcast once per task by Ray)."""
    mu, w = model["mean"], model["components"]

    def project(b: pa.Table) -> pa.Table:
        from raphtory_ray.data.dedup import embedding_matrix
        X = embedding_matrix(b[col]).astype(np.float64)
        Y = (X - mu) @ w
        return b.drop_columns([col]).append_column(
            out_col, pa.array(list(Y), pa.list_(pa.float64())))

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)
