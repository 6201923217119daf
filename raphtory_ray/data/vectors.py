"""VectorisedGraph — semantic search over graph entities.

Reference: raphtory/src/vectors/ (vectorisable.rs: every node/edge renders
a DOCUMENT via a template, an embedding function maps documents to vectors,
and a VectorisedGraph answers nodes_by_similarity / edges_by_similarity /
entities_by_similarity; python surface vectors/__init__.pyi:45-118).

Ray decomposition:
- vectorise(): two actor-pool map_batches passes (nodes from the vertex
  table, edges from the event Dataset reduced to simple edges) — the
  template renders text vectorized per batch, the embedding function runs
  once per batch (model-in-__init__ pattern when the caller passes a
  class). The result is two Datasets of (id, text, embedding).
- *_by_similarity(): the brute-force broadcast top-k from
  data/similarity.py (exact; the IVF path is the scale variant).

The container has no real embedding model (same constraint as
data/multimodal.py); default_embedding is a DETERMINISTIC bag-of-words
hash projection — real plumbing, swappable model, honest about the model.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

EMB_DIM = 32


def default_embedding(texts: list[str], dim: int = EMB_DIM) -> np.ndarray:
    """Deterministic bag-of-words hash projection (stand-in model: each
    token adds a unit vector at a hashed coordinate; L2-normalized)."""
    import zlib
    out = np.zeros((len(texts), dim), np.float64)
    for i, s in enumerate(texts):
        for tok in s.lower().split():
            out[i, zlib.crc32(tok.encode()) % dim] += 1.0
    n = np.linalg.norm(out, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return out / n


def default_node_template(gids: list[str]) -> list[str]:
    return [f"node {g}" for g in gids]


def default_edge_template(src: list[str], dst: list[str]) -> list[str]:
    return [f"edge from {a} to {b}" for a, b in zip(src, dst)]


class VectorisedGraph:
    """node_docs / edge_docs: Datasets of (vec_id, text, embedding)."""

    def __init__(self, node_docs, edge_docs, gids: np.ndarray):
        self.node_docs = node_docs
        self.edge_docs = edge_docs
        self._gids = gids

    def _query_vec(self, query, embed: Callable) -> np.ndarray:
        if isinstance(query, str):
            return np.asarray(embed([query]))
        return np.asarray([query], dtype=np.float64)

    def _search(self, docs, query, limit, embed) -> pa.Table:
        from raphtory_ray.data.similarity import knn_bruteforce
        q = self._query_vec(query, embed)
        top = knn_bruteforce(docs, q, k=limit)
        return top.select(["neighbor_id", "cosine", "rank"]).rename_columns(
            ["vec_id", "cosine", "rank"])

    def nodes_by_similarity(self, query, limit: int,
                            embed: Callable = default_embedding) -> pa.Table:
        """(vec_id=vid, cosine, rank) of the ``limit`` most similar node
        documents (vectors/__init__.pyi nodes_by_similarity)."""
        return self._search(self.node_docs, query, limit, embed)

    def edges_by_similarity(self, query, limit: int,
                            embed: Callable = default_embedding) -> pa.Table:
        return self._search(self.edge_docs, query, limit, embed)

    def entities_by_similarity(self, query, limit: int,
                               embed: Callable = default_embedding
                               ) -> pa.Table:
        """Nodes and edges pooled, ranked together; vec_id of an edge is
        offset by the node count (entity id space concatenation)."""
        n = self._search(self.node_docs, query, limit, embed).to_pandas()
        e = self._search(self.edge_docs, query, limit, embed).to_pandas()
        n["kind"] = "node"
        e["kind"] = "edge"
        import pandas as pd
        both = pd.concat([n, e]).sort_values(
            ["cosine", "kind", "vec_id"],
            ascending=[False, True, True]).head(limit)
        both["rank"] = np.arange(1, len(both) + 1)
        return pa.Table.from_pandas(both.reset_index(drop=True),
                                    preserve_index=False)


def vectorise(gf, node_template: Callable = default_node_template,
              edge_template: Callable = default_edge_template,
              embed: Callable = default_embedding) -> VectorisedGraph:
    """Render every node and simple edge into an embedded document
    (vectorisable.rs Vectorisable::vectorise)."""
    import ray.data as rd
    assert gf.vertices is not None, "vectorise needs the vertex table"
    gids = gf.vertices["gid"].to_numpy(zero_copy_only=False)

    def node_batch(b: pa.Table) -> pa.Table:
        texts = node_template(b["gid"].to_pylist())
        emb = embed(texts)
        return pa.table({
            "vec_id": b["vid"],
            "text": pa.array(texts, pa.string()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float64()), emb.shape[1])})

    node_docs = rd.from_arrow(gf.vertices).map_batches(
        node_batch, batch_format="pyarrow", zero_copy_batch=True)

    gvec = gids  # closure broadcast (small dimension table)

    def edge_batch(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        # one doc per distinct (src, dst) within the batch; global dedup
        # happens upstream when the caller passes dedup'd simple edges
        key = np.unique(s * np.int64(gf.n) + d)
        ss, dd = key // gf.n, key % gf.n
        texts = edge_template(list(gvec[ss]), list(gvec[dd]))
        emb = embed(texts)
        return pa.table({
            "vec_id": pa.array(key, pa.int64()),   # src*n + dst
            "text": pa.array(texts, pa.string()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1), pa.float64()), emb.shape[1])})

    edge_docs = gf.edges.map_batches(edge_batch, batch_format="pyarrow",
                                     zero_copy_batch=True)
    return VectorisedGraph(node_docs, edge_docs, gids)
