"""Inverted-index text search: tf exactness, AND/OR semantics, ranking."""

from __future__ import annotations

import pyarrow as pa


def _docs(ray_session):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "Data data DATA! query",
            "query query plan",
            "data warehouse",
            "unrelated words here",
        ], pa.string())}))


def test_search_and_or(ray_session):
    from raphtory_ray.data.search import search_documents
    ds = _docs(ray_session)
    t = search_documents(ds, ["data", "query"], "and")
    assert t["doc_id"].to_pylist() == [0]          # only doc 0 has both
    assert t["score"].to_pylist() == [4]           # tf: data=3 + query=1
    assert t["n_terms"].to_pylist() == [2]
    t2 = search_documents(ds, ["data", "query"], "or")
    assert t2["doc_id"].to_pylist() == [0, 1, 2]   # ranked 4, 2, 1
    assert t2["score"].to_pylist() == [4, 2, 1]


def test_index_build_and_reuse(ray_session):
    from raphtory_ray.data.search import build_text_index, search
    ds = _docs(ray_session)
    idx = build_text_index(ds).materialize()
    a = search(idx, ["plan"], "and")
    assert a["doc_id"].to_pylist() == [1] and a["score"].to_pylist() == [1]
    b = search(idx, ["absent_token"], "and")
    assert b.num_rows == 0


def test_bm25_matches_local_formula(ray_session):
    """round-5 BM25 (Lucene/tantivy formula): distributed result equals a
    local numpy reimplementation; rare terms outrank common ones at equal
    tf; dl normalization penalizes long docs."""
    import math
    import ray.data as rd
    texts = [
        "data query engine",                      # short, both terms
        "data " * 30 + "query",                   # long, tf-heavy on data
        "data pipeline tooling stack",            # only 'data'
        "query planner",                          # only 'query'
        "unrelated text entirely here",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(3)
    from raphtory_ray.data.search import search_documents
    got = search_documents(ds, ["data", "query"], "and",
                           scoring="bm25").to_pandas()
    # local oracle
    toks = [t.lower().split() for t in texts]
    dls = [len(t) for t in toks]
    n, avgdl = len(texts), sum(dls) / len(texts)
    k1, b = 1.2, 0.75

    def bm25(doc):
        s = 0.0
        for term in ("data", "query"):
            tf = toks[doc].count(term)
            if tf == 0:
                return None
            df = sum(1 for t in toks if term in t)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[doc] / avgdl))
        return s
    want = {d: bm25(d) for d in range(5) if bm25(d) is not None}
    assert set(got["doc_id"]) == set(want)
    for _, r in got.iterrows():
        assert abs(r["score"] - want[r["doc_id"]]) < 1e-12
    # or-mode includes single-term docs; quantized column name
    got_or = search_documents(ds, ["data", "query"], "or",
                              scoring="bm25", quantize=1e6).to_pandas()
    assert set(got_or["doc_id"]) == {0, 1, 2, 3}
    assert "score_q" in got_or.columns


def test_fuzzy_search_edit_distance(ray_session):
    """round-5 fuzzy term matching: tokens within edit distance 1 match;
    variant hits collapse per query term; AND still requires all terms."""
    import ray.data as rd
    texts = ["data query engine",        # exact both
             "dta quary engine",         # both at distance 1
             "dat entirely other",       # only 'data' (distance 1)
             "completely unrelated"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(2)
    from raphtory_ray.data.search import search_documents, levenshtein
    assert levenshtein("data", "dta", 2) == 1
    assert levenshtein("data", "query", 2) == 3   # capped at cap+1
    exact = search_documents(ds, ["data", "query"], "and").to_pandas()
    assert set(exact["doc_id"]) == {0}
    fz = search_documents(ds, ["data", "query"], "and",
                          fuzzy=1).to_pandas()
    assert set(fz["doc_id"]) == {0, 1}
    fz_or = search_documents(ds, ["data", "query"], "or",
                             fuzzy=1).to_pandas()
    assert set(fz_or["doc_id"]) == {0, 1, 2}
    # variant collapse: doc with 'data' AND 'dta' counts ONE term, tf=2
    tbl2 = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array(["data dta"])})
    fz2 = search_documents(rd.from_arrow(tbl2), ["data"], "and",
                           fuzzy=1).to_pandas()
    assert fz2["n_terms"].tolist() == [1]
    assert fz2["score"].tolist() == [2]
    # fuzzy BM25 runs end to end
    fzb = search_documents(ds, ["data"], "or", scoring="bm25",
                           fuzzy=1).to_pandas()
    assert set(fzb["doc_id"]) == {0, 1, 2}
    assert (fzb["score"] > 0).all()
