"""Full-text search over a document Dataset — the engine's stand-in for
the reference's tantivy index (raphtory/src/search/, feature-gated there;
declared core-adjacent here because a 100-TB corpus pipeline needs lookup).

Design (Ray-Data-first):
- build_text_index: ONE vectorized map_batches pass tokenizes (Arrow
  utf8_lower + split_pattern_regex on non-alphanumerics) and emits exact
  per-(token, doc) term frequencies — a document lives entirely inside its
  row, so no cross-batch combine is needed. The postings Dataset can be
  hash-partitioned by token and written as resumable parquet for reuse.
- search: prune the postings to the query's terms with a broadcast
  vectorized is_in (no shuffle — the match set is tiny relative to the
  corpus), then a driver-side combine ranks docs by summed tf. AND
  semantics require every term present; OR ranks any match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_SPLIT = r"[^a-z0-9]+"


def tokenize_batch(b: pa.Table, text_col: str = "text",
                   id_col: str = "doc_id") -> pa.Table:
    """(token, doc_id, tf) rows for one batch — exact tf per document."""
    toks = pc.split_pattern_regex(pc.utf8_lower(b[text_col].combine_chunks()),
                                  _TOKEN_SPLIT)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    parent = parent[keep]
    flat = flat.filter(pa.array(keep))
    ids = b[id_col].to_numpy(zero_copy_only=False)[parent]
    # exact tf: dictionary-encode tokens, count (doc, token) pairs
    dd = pc.dictionary_encode(flat)
    codes = dd.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nv = len(dd.dictionary)
    key = ids * np.int64(max(nv, 1)) + codes
    ukey, tf = np.unique(key, return_counts=True)
    return pa.table({
        "token": dd.dictionary.take(pa.array(ukey % max(nv, 1))),
        "doc_id": pa.array((ukey // max(nv, 1)).astype(np.int64)),
        "tf": pa.array(tf.astype(np.int64)),
    })


def build_text_index(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Postings Dataset (token, doc_id, tf). Lazy — write_parquet it for a
    persistent, resumable index (one file per block, token-prunable via
    parquet row-group stats when sorted by token)."""
    return ds.map_batches(
        lambda b: tokenize_batch(b, text_col, id_col),
        batch_format="pyarrow", zero_copy_batch=True)


def search(postings, terms, mode: str = "and") -> pa.Table:
    """Rank documents against ``terms`` over a postings Dataset:
    (doc_id, n_terms, score=Σtf), score-desc / doc_id-asc. ``and`` keeps
    docs containing EVERY term; ``or`` any."""
    assert mode in ("and", "or")
    term_set = pa.array(sorted({t.lower() for t in terms}), pa.string())

    def prune(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["token"], value_set=term_set))

    hits = [t for t in postings.map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow") if t.num_rows]
    if not hits:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_terms": pa.array([], pa.int64()),
                         "score": pa.array([], pa.int64())})
    t = pa.concat_tables(hits)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    tf = t["tf"].to_numpy(zero_copy_only=False)
    uids, inv = np.unique(ids, return_inverse=True)
    score = np.zeros(len(uids), np.int64)
    nterm = np.zeros(len(uids), np.int64)
    np.add.at(score, inv, tf)
    np.add.at(nterm, inv, 1)
    if mode == "and":
        keep = nterm == len(term_set)
    else:
        keep = np.ones(len(uids), dtype=bool)
    uids, score, nterm = uids[keep], score[keep], nterm[keep]
    order = np.lexsort((uids, -score))
    return pa.table({"doc_id": pa.array(uids[order]),
                     "n_terms": pa.array(nterm[order]),
                     "score": pa.array(score[order])})


def search_documents(ds, terms, mode: str = "and",
                     text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """One-shot search (index built inline, streamed — nothing persists)."""
    return search(build_text_index(ds, text_col, id_col), terms, mode)
