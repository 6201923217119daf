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
