"""Query registry: every SURVEY §2 operator as (Spark callable, DuckDB oracle).

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLES[name]`` is
ANSI SQL DuckDB runs on the same parquet views. Column names/aliases
match exactly; float columns are rounded to 6 decimals on both sides
AFTER any ordering/ranking on full precision, so value-hashes agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import vector as V
from .operators import knn
from .sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# DuckDB snippets for dot/norm with sequential double accumulation
# (matches functions.vector exactly — see its module docstring).
def _dd_dot(a: str, b: str) -> str:
    return f"list_sum(list_transform(list_zip(({a})::DOUBLE[], ({b})::DOUBLE[]), x -> x[1]*x[2]))"


def _dd_norm(a: str) -> str:
    return f"sqrt(list_sum(list_transform(({a})::DOUBLE[], x -> x*x)))"


def _dd_cosine(a: str, b: str) -> str:
    return f"({_dd_dot(a, b)} / ({_dd_norm(a)} * {_dd_norm(b)}))"


# ---------------------------------------------------------------------------
# Vector store / RAG core (reference parity: scripts/milvus_db.py)
# ---------------------------------------------------------------------------


@query(
    "collection_stats",
    oracle="""
    SELECT source,
           count(*) AS n_rows,
           sum(n_chars) AS total_chars,
           round(avg(n_chars), 6) AS avg_chars,
           min(doc_id) AS min_id,
           max(doc_id) AS max_id
    FROM documents
    GROUP BY source
    """,
)
def collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection describe/stats (milvus_db.py:70 get_collection_stats)."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@query(
    "query_entities_filter",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE lang = 'en' AND n_chars > 300
    ORDER BY doc_id
    LIMIT 50
    """,
)
def query_entities_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered entity query with projection + limit (milvus_db.py:51
    query_entities). Filter + projection push down to the parquet scan."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("lang") == "en") & (F.col("n_chars") > 300))
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
        .limit(50)
    )


@query(
    "scan_paginated",
    oracle="""
    SELECT doc_id, source,
           CAST(floor((row_number() OVER (ORDER BY doc_id) - 1) / 100) AS BIGINT) AS page
    FROM documents
    """,
)
def scan_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable-order paginated full scan (milvus_db.py:77 get_all_entities).
    Page = batch index at batch_size=100."""
    w = Window.orderBy("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.floor((F.row_number().over(w) - 1) / 100).cast("long").alias("page"),
        )
    )


@query(
    "get_entities_by_ids",
    oracle="""
    SELECT doc_id, text, n_chars
    FROM documents
    WHERE doc_id IN (3, 7, 11, 101, 263, 499)
    """,
)
def get_entities_by_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by id list (milvus_db.py:99 get_entities_by_ids)."""
    ids = [3, 7, 11, 101, 263, 499]
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin(ids))
        .select("doc_id", "text", "n_chars")
    )


@query(
    "insert_upsert",
    oracle="""
    WITH existing AS (
        SELECT vec_id, label, 0 AS batch FROM embeddings WHERE vec_id < 100
    ), incoming AS (
        SELECT vec_id, label + 1000 AS label, 1 AS batch
        FROM embeddings WHERE vec_id >= 50 AND vec_id < 150
    ), unioned AS (
        SELECT * FROM existing UNION ALL SELECT * FROM incoming
    )
    SELECT vec_id, label, batch FROM (
        SELECT *, row_number() OVER (ORDER BY batch DESC, vec_id) AS _rn,
               row_number() OVER (PARTITION BY vec_id ORDER BY batch DESC) AS rn
        FROM unioned
    ) WHERE rn = 1
    """,
)
def insert_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert with last-write-wins upsert by primary key (milvus_db.py:61
    insert_vectors). Window dedup, newest batch wins."""
    emb = load_table(spark, sf_dir, "embeddings")
    existing = emb.filter(F.col("vec_id") < 100).select(
        "vec_id", "label", F.lit(0).alias("batch")
    )
    incoming = emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 150)).select(
        "vec_id", (F.col("label") + 1000).alias("label"), F.lit(1).alias("batch")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("batch").desc())
    return (
        existing.unionAll(incoming)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "batch")
    )


@query(
    "vector_norms",
    oracle=f"""
    SELECT vec_id, round({_dd_norm('embedding')}, 6) AS norm
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms (reference normalize_embeddings=True check,
    prepare_data.py:54 / tests/model_test.py)."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select("vec_id", F.round(V.l2_norm(F.col("embedding")), 6).alias("norm"))
    )


@query(
    "knn_topk_cosine",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round(score, 6) AS score FROM (
        SELECT e.vec_id, {_dd_cosine('e.embedding', 'q.qv')} AS score
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY score DESC, e.vec_id
        LIMIT 10
    )
    """,
)
def knn_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query brute-force cosine top-k (milvus_db.py:107
    search_vectors). Plan: narrow projection + TakeOrderedAndProject
    (per-partition k-heap, no full sort)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    out = knn.topk(emb.filter(F.col("vec_id") != 0), list(qv), k=10)
    return out.withColumn("score", F.round("score", 6))


@query(
    "knn_batch",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS query_vec
        FROM embeddings WHERE vec_id < 5
    ), scored AS (
        SELECT q.query_id, e.vec_id,
               {_dd_cosine('e.embedding', 'q.query_vec')} AS score
        FROM embeddings e, q
    ), ranked AS (
        SELECT query_id, vec_id, score,
               row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id) AS rank
        FROM scored
    )
    SELECT query_id, vec_id, round(score, 6) AS score, rank
    FROM ranked WHERE rank <= 10
    """,
)
def knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch retrieval: per-query top-k (eval.py:80 retrieval loop,
    vectorized). Broadcast query side; two-phase partial top-k prune."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn.topk_batch(emb, queries, k=10)
    return out.select(
        "query_id", "vec_id", F.round("score", 6).alias("score"), F.col("rank").cast("long")
    )


@query(
    "similarity_matrix",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_dd_cosine('a.embedding', 'b.embedding')}, 6) AS score
    FROM embeddings a, embeddings b
    WHERE a.vec_id < 20 AND b.vec_id < 20
    """,
)
def similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine matrix on a bounded subset (prepare_data.py:101
    test_similarity)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    out = knn.similarity_matrix(emb)
    return out.withColumn("score", F.round("score", 6))
