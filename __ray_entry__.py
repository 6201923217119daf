"""Driver contract: entry() smoke, queries() ↔ oracle_sql() correctness gate.

Ray is initialised by the driver BEFORE this module is imported — nothing
here (or in raphtory_ray) calls ray.init()/ray.shutdown().

Query families:
- ``copurchase_*`` — link-graph operators over the part co-purchase graph
  derived from lineitem (directed edge event per intra-order lineitem pair,
  ``a.l_linenumber < b.l_linenumber``). Degrees / density / triangles /
  reciprocity / clustering have full SQL oracles; the iterative algorithms
  (pagerank, wcc, lpa, k-core, hits) are non-SQL-expressible in DuckDB 1.0
  (no iterative CTE) → rows-only checks here, golden-fixture + oracle
  conformance lives in tests/ (FIXTURES.md).
- ``user_*`` — temporal user-interaction graph from events (LEAD within
  event_type) exercising the window-view algebra.
- ``doc_*`` — training-data text ops over documents (token counts, quality
  stats, exact/minhash/simhash dedup, language id, fingerprints).
- ``emb_*`` — embedding ops (brute-force knn with SQL oracle, IVF, cosine
  near-dup).
- ``corpus_*`` — the source-repo corpus pipeline per BASELINE.json
  input_hint (synthesized deterministically; no DuckDB view → rows-only).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa


# --------------------------------------------------------------- shared state

_GRAPH_CACHE: dict[tuple, Any] = {}


def _copurchase(sf_dir: str):
    """(BspGraph, node_ids) for the co-purchase graph, cached per sf_dir —
    the driver calls every query in one process; topology is shuffled once."""
    key = ("copurchase", sf_dir)
    if key not in _GRAPH_CACHE:
        from raphtory_ray.pipelines.tpch_graph import (compact_graph,
                                                       copurchase_edges)
        from raphtory_ray.state.shards import BspGraph
        gf, node_ids = compact_graph(copurchase_edges(sf_dir))
        g = BspGraph.from_graph(gf)
        gf._bsp = g
        _GRAPH_CACHE[key] = (gf, g, node_ids)
    return _GRAPH_CACHE[key]


def _docs(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet")


def _embs(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def _nodestate_table(node_ids: np.ndarray, values: np.ndarray, name: str,
                     typ=None, keep=None) -> pa.Table:
    m = keep if keep is not None else np.ones(len(node_ids), dtype=bool)
    vals = pa.array(values[m]) if typ is None else pa.array(values[m], typ)
    return pa.table({"vid": pa.array(node_ids[m], pa.int64()), name: vals})


# ------------------------------------------------------------- graph queries

def _q_edge_dedup(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count
    from raphtory_ray.pipelines.tpch_graph import copurchase_edges
    ds = (copurchase_edges(sf_dir).groupby(["src", "dst"])
          .aggregate(Count(alias_name="n_events")))
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return t.select(["src", "dst", "n_events"])


def _q_out_degree(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    deg = g.out_degree
    return _nodestate_table(ids, deg, "out_degree", pa.int64(), keep=deg > 0)


def _q_in_degree(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    deg = g.in_degree
    return _nodestate_table(ids, deg, "in_degree", pa.int64(), keep=deg > 0)


def _q_degree(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    deg = g.both_degree
    return _nodestate_table(ids, deg, "degree", pa.int64())


def _q_degree_centrality(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    deg = g.both_degree.astype(np.float64)
    return _nodestate_table(ids, deg / deg.max(), "degree_centrality",
                            pa.float64())


def _q_density(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    n, e = len(ids), g.num_edges
    return pa.table({"num_nodes": pa.array([n], pa.int64()),
                     "num_edges": pa.array([e], pa.int64()),
                     "density": pa.array([e / (n * (n - 1))], pa.float64())})


def _q_triangles(sf_dir: str) -> pa.Table:
    _, g, _ = _copurchase(sf_dir)
    total, _local = g.triangle_counts()
    return pa.table({"n_triangles": pa.array([total], pa.int64())})


def _q_local_triangles(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    _, local = g.triangle_counts()
    return _nodestate_table(ids, local, "n_triangles", pa.int64(),
                            keep=local > 0)


def _q_triplets(sf_dir: str) -> pa.Table:
    gf, _, _ = _copurchase(sf_dir)
    from raphtory_ray.algorithms import triplet_count
    return pa.table({"n_triplets": pa.array([triplet_count(gf)], pa.int64())})


def _q_reciprocity(sf_dir: str) -> pa.Table:
    gf, _, _ = _copurchase(sf_dir)
    from raphtory_ray.algorithms import global_reciprocity
    return pa.table({"reciprocity":
                     pa.array([global_reciprocity(gf)], pa.float64())})


def _q_pagerank(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    scores, _it, _ = g.pagerank()
    return _nodestate_table(ids, scores, "pagerank", pa.float64())


def _q_wcc(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    labels = g.wcc()
    return _nodestate_table(ids, ids[labels], "component", pa.int64())


def _q_lpa(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    labels, _it = g.lpa()
    return _nodestate_table(ids, ids[labels], "label", pa.int64())


def _q_kcore(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    alive = g.kcore_set(4)
    return pa.table({"vid": pa.array(ids[alive], pa.int64())})


def _q_hits(sf_dir: str) -> pa.Table:
    _, g, ids = _copurchase(sf_dir)
    hub, auth, _it = g.hits()
    t = _nodestate_table(ids, hub, "hub", pa.float64())
    return t.append_column("auth", pa.array(auth, pa.float64()))


# ----------------------------------------------------------- temporal / user

def _q_user_edges(sf_dir: str):
    from raphtory_ray.pipelines.tpch_graph import user_edges
    return user_edges(sf_dir)


def _user_window(sf_dir: str) -> tuple[int, int]:
    """Deterministic mid-half window [t0, t1) over the event time range."""
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    ts = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"])["ts"]
    tmin = pc.min(ts).cast(pa.int64()).as_py() // 1000   # us → ms, floor
    tmax = pc.max(ts).cast(pa.int64()).as_py() // 1000
    span = tmax - tmin
    return tmin + span // 4, tmin + (3 * span) // 4


def _q_user_window_out_degree(sf_dir: str) -> pa.Table:
    from raphtory_ray.pipelines.tpch_graph import user_graph
    t0, t1 = _user_window(sf_dir)
    gf = user_graph(sf_dir).window(t0, t1)
    from raphtory_ray.state.shards import BspGraph
    g = BspGraph.from_graph(gf)
    deg = g.out_degree
    vids = np.arange(gf.n, dtype=np.int64)
    return _nodestate_table(vids, deg, "out_degree", pa.int64(), keep=deg > 0)


# -------------------------------------------------------------- doc queries

def _q_doc_tokens(sf_dir: str):
    from raphtory_ray.data.text import token_counts
    return token_counts(_docs(sf_dir))


def _q_doc_quality(sf_dir: str):
    from raphtory_ray.data.text import quality_stats
    return quality_stats(_docs(sf_dir))


def _q_doc_exact_dedup(sf_dir: str):
    from raphtory_ray.data.dedup import exact_dedup
    ds = exact_dedup(_docs(sf_dir))
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow"))
    return t.select(["h", "keep_id", "n_docs"])


def _q_doc_lang_counts(sf_dir: str):
    from ray.data.aggregate import Count
    ds = (_docs(sf_dir).groupby("lang").aggregate(Count(alias_name="n_docs")))
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow")) \
        .select(["lang", "n_docs"])


def _q_doc_lang_id(sf_dir: str):
    from raphtory_ray.data.text import language_id
    return language_id(_docs(sf_dir))


def _q_doc_fingerprints(sf_dir: str) -> pa.Table:
    from ray.data.aggregate import Count, Min
    from raphtory_ray.data.text import fingerprints
    ds = (fingerprints(_docs(sf_dir)).groupby("doc_id")
          .aggregate(Count(alias_name="n_fingerprints"),
                     Min("fingerprint", alias_name="min_fingerprint")))
    return pa.concat_tables(ds.iter_batches(batch_format="pyarrow")) \
        .select(["doc_id", "n_fingerprints", "min_fingerprint"])


def _q_doc_minhash_dedup(sf_dir: str) -> pa.Table:
    from raphtory_ray.data.dedup import minhash_lsh_dedup
    return minhash_lsh_dedup(_docs(sf_dir))


def _q_doc_simhash_dedup(sf_dir: str) -> pa.Table:
    from raphtory_ray.data.dedup import simhash_dedup
    return simhash_dedup(_docs(sf_dir))


# -------------------------------------------------------- embedding queries

N_KNN_QUERIES = 10
KNN_K = 5


def _query_matrix(sf_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq
    from raphtory_ray.data.dedup import embedding_matrix
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    keep = t.filter(pa.compute.less(t["vec_id"], N_KNN_QUERIES))
    keep = keep.sort_by("vec_id")
    return embedding_matrix(keep["embedding"])


def _q_knn_bruteforce(sf_dir: str) -> pa.Table:
    from raphtory_ray.data.similarity import knn_bruteforce
    t = knn_bruteforce(_embs(sf_dir), _query_matrix(sf_dir), k=KNN_K)
    return t.select(["query_id", "neighbor_id", "rank"])


def _q_knn_ivf(sf_dir: str) -> pa.Table:
    from raphtory_ray.data.similarity import knn_ivf
    t = knn_ivf(_embs(sf_dir), _query_matrix(sf_dir), k=KNN_K)
    return t.select(["query_id", "neighbor_id", "rank"])


def _q_embedding_dedup(sf_dir: str) -> pa.Table:
    from raphtory_ray.data.dedup import embedding_dedup
    return embedding_dedup(_embs(sf_dir))


# ------------------------------------------------------------ corpus queries

def _corpus_sf(sf_dir: str) -> float:
    name = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.001


def _q_corpus_files(sf_dir: str):
    from raphtory_ray.pipelines.ingest import files_table, read_corpus
    from raphtory_ray.sources.corpus import ensure_corpus
    path = ensure_corpus(sf=_corpus_sf(sf_dir))
    return files_table(read_corpus(path)).select_columns(
        ["gid", "sha256", "t", "n_bytes"])


def _q_corpus_pagerank(sf_dir: str) -> pa.Table:
    from raphtory_ray.algorithms import pagerank
    from raphtory_ray.pipelines.ingest import load_graph
    from raphtory_ray.sources.corpus import ensure_corpus
    path = ensure_corpus(sf=_corpus_sf(sf_dir))
    gf, _files = load_graph(path)
    return pagerank(gf).to_arrow()


# ---------------------------------------------------------------- contract

def entry() -> Any:
    """Flagship: co-purchase graph from sf0.001 → PageRank per vertex."""
    return _q_pagerank("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "copurchase_edge_dedup": _q_edge_dedup,
        "copurchase_out_degree": _q_out_degree,
        "copurchase_in_degree": _q_in_degree,
        "copurchase_degree": _q_degree,
        "copurchase_degree_centrality": _q_degree_centrality,
        "copurchase_density": _q_density,
        "copurchase_triangle_count": _q_triangles,
        "copurchase_local_triangles": _q_local_triangles,
        "copurchase_triplet_count": _q_triplets,
        "copurchase_reciprocity": _q_reciprocity,
        "copurchase_pagerank": _q_pagerank,
        "copurchase_wcc": _q_wcc,
        "copurchase_lpa": _q_lpa,
        "copurchase_kcore4": _q_kcore,
        "copurchase_hits": _q_hits,
        "user_graph_edges": _q_user_edges,
        "user_window_out_degree": _q_user_window_out_degree,
        "doc_token_counts": _q_doc_tokens,
        "doc_quality_stats": _q_doc_quality,
        "doc_exact_dedup": _q_doc_exact_dedup,
        "doc_lang_counts": _q_doc_lang_counts,
        "doc_lang_id": _q_doc_lang_id,
        "doc_fingerprints": _q_doc_fingerprints,
        "doc_minhash_dedup": _q_doc_minhash_dedup,
        "doc_simhash_dedup": _q_doc_simhash_dedup,
        "emb_knn_bruteforce": _q_knn_bruteforce,
        "emb_knn_ivf": _q_knn_ivf,
        "emb_cosine_dedup": _q_embedding_dedup,
        "corpus_files": _q_corpus_files,
        "corpus_pagerank": _q_corpus_pagerank,
    }


# SQL building blocks -------------------------------------------------------

_PAIRS = """pairs AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
)"""

_DEDUP = "dedup AS (SELECT DISTINCT src, dst FROM pairs)"

_UND = """und AS (
  SELECT src AS u, dst AS v FROM dedup
  UNION
  SELECT dst AS u, src AS v FROM dedup
)"""

_ORIENTED = """oriented AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM dedup WHERE src <> dst
)"""

_TRI = """tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM oriented e1
  JOIN oriented e2 ON e1.b = e2.a
  JOIN oriented e3 ON e3.a = e1.a AND e3.b = e2.b
)"""

_USER_EDGES = """user_edges AS (
  SELECT user_id AS src, LEAD(user_id) OVER w AS dst,
         epoch_ms(ts) AS t, event_id
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
  QUALIFY dst IS NOT NULL
)"""


def oracle_sql() -> dict[str, str]:
    return {
        "copurchase_edge_dedup": f"""
WITH {_PAIRS}
SELECT src, dst, COUNT(*)::BIGINT AS n_events FROM pairs GROUP BY src, dst
""",
        "copurchase_out_degree": f"""
WITH {_PAIRS}
SELECT src AS vid, COUNT(DISTINCT dst)::BIGINT AS out_degree
FROM pairs GROUP BY src
""",
        "copurchase_in_degree": f"""
WITH {_PAIRS}
SELECT dst AS vid, COUNT(DISTINCT src)::BIGINT AS in_degree
FROM pairs GROUP BY dst
""",
        "copurchase_degree": f"""
WITH {_PAIRS}, {_DEDUP}, {_UND}
SELECT u AS vid, COUNT(DISTINCT v)::BIGINT AS degree FROM und GROUP BY u
""",
        "copurchase_degree_centrality": f"""
WITH {_PAIRS}, {_DEDUP}, {_UND},
deg AS (SELECT u AS vid, COUNT(DISTINCT v) AS d FROM und GROUP BY u)
SELECT vid, d::DOUBLE / (SELECT MAX(d) FROM deg) AS degree_centrality FROM deg
""",
        "copurchase_density": f"""
WITH {_PAIRS}, {_DEDUP},
nn AS (SELECT COUNT(*) AS n FROM (SELECT src AS x FROM dedup
                                  UNION SELECT dst FROM dedup)),
ee AS (SELECT COUNT(*) AS e FROM dedup)
SELECT n::BIGINT AS num_nodes, e::BIGINT AS num_edges,
       e::DOUBLE / (n * (n - 1)) AS density
FROM nn, ee
""",
        "copurchase_triangle_count": f"""
WITH {_PAIRS}, {_DEDUP}, {_ORIENTED}, {_TRI}
SELECT COUNT(*)::BIGINT AS n_triangles FROM tri
""",
        "copurchase_local_triangles": f"""
WITH {_PAIRS}, {_DEDUP}, {_ORIENTED}, {_TRI},
roles AS (
  SELECT x AS vid FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
)
SELECT vid, COUNT(*)::BIGINT AS n_triangles FROM roles GROUP BY vid
""",
        "copurchase_triplet_count": f"""
WITH {_PAIRS}, {_DEDUP}, {_UND},
deg AS (SELECT u, COUNT(DISTINCT v) AS d FROM und WHERE u <> v GROUP BY u)
SELECT COALESCE(SUM((d * (d - 1)) // 2), 0)::BIGINT AS n_triplets FROM deg
""",
        "copurchase_reciprocity": f"""
WITH {_PAIRS},
ds AS (SELECT DISTINCT src, dst FROM pairs WHERE src <> dst)
SELECT (SELECT COUNT(*) FROM ds x JOIN ds y
        ON x.src = y.dst AND x.dst = y.src)::DOUBLE
     / (SELECT COUNT(*) FROM ds) AS reciprocity
""",
        "user_graph_edges": f"""
WITH {_USER_EDGES}
SELECT src, dst, t, event_id FROM user_edges
""",
        "user_window_out_degree": f"""
WITH {_USER_EDGES},
bounds AS (
  SELECT MIN(epoch_ms(ts)) AS tmin, MAX(epoch_ms(ts)) AS tmax FROM events
),
win AS (
  SELECT tmin + (tmax - tmin) // 4 AS t0,
         tmin + (3 * (tmax - tmin)) // 4 AS t1 FROM bounds
)
SELECT src AS vid, COUNT(DISTINCT dst)::BIGINT AS out_degree
FROM user_edges, win WHERE t >= t0 AND t < t1 GROUP BY src
""",
        "doc_token_counts": r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\s+')) END::BIGINT
         AS n_tokens
FROM documents
""",
        "doc_quality_stats": r"""
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::BIGINT AS n_alpha,
       length(regexp_replace(text, '[^0-9]', '', 'g'))::BIGINT AS n_digit,
       length(regexp_replace(text, '\S', '', 'g'))::BIGINT AS n_space,
       length(regexp_replace(text, '[^.,;:!?''"()\[\]{}-]', '', 'g'))::BIGINT
         AS n_punct,
       length(regexp_replace(text, '[^A-Z]', '', 'g'))::BIGINT AS n_upper
FROM documents
""",
        "doc_exact_dedup": """
SELECT md5(text) AS h, MIN(doc_id)::BIGINT AS keep_id,
       COUNT(*)::BIGINT AS n_docs
FROM documents GROUP BY 1
""",
        "doc_lang_counts": """
SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY lang
""",
        "emb_knn_bruteforce": f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {N_KNN_QUERIES}),
sims AS (SELECT q.qid, e.vec_id AS nid,
                list_cosine_similarity(q.qe, e.embedding) AS sim
         FROM q CROSS JOIN embeddings e),
ranked AS (SELECT qid, nid,
                  ROW_NUMBER() OVER (PARTITION BY qid
                                     ORDER BY sim DESC, nid) AS rank
           FROM sims)
SELECT qid AS query_id, nid AS neighbor_id, rank::BIGINT AS rank
FROM ranked WHERE rank <= {KNN_K}
""",
    }
