"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the SURVEY §2 inventory for the duckdb-oracle
correctness gate. Implementations live in
``rag_system_vector_db_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rag_system_vector_db_spark.registry import (  # noqa: E402
    LAZY_ORACLES,
    ORACLES,
    QUERIES,
)

# The driver's oracle run is fixed at sf0.01; data-dependent oracles
# (IVF centroid literals) are rendered for that directory here.
_ORACLE_SF_DIR = "/root/testdata/sf0.01"

# The driver's correctness run checks the FIRST 50 dict entries only.
# r5 rotation (VERDICT r4 item 1): every entry whose code changed
# AFTER its last green driver stamp verifies first — the r5-new /
# r5-changed operators, then the 43 r3-stamped entries that r4's perf
# surgery touched (hybrid rrf_fuse rework, shared shingle pipeline,
# chunker word-count semantics, analytics broadcast drops). The r4
# cohort (CORRECTNESS_r04: 50/50 green, code untouched since) rotates
# out and follows in registration order.
_VERIFY_FIRST = [
    # new in r5 / code changed in r5 after their r4 stamp
    "ivf_probe_sweep",
    "minhash_accuracy",
    "sequence_packing",
    "skew_profile",
    "semdedup_clusters",
    "eval_results_artifact",
    # new r5 op (incremental_dedup rotated out: its r4 green stamp is
    # current — that code did not change in r5)
    "quality_classifier",
    # the 43 r3-stamped entries whose code moved in r4 (and some again
    # in r5: chunk_diary/chunk_stats word_count, dedup_ngram_jaccard /
    # join_revenue_topn / local_supplier_volume broadcast drops,
    # dedup_cluster observe convergence)
    "hybrid_search_rrf",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "chunk_documents",
    "chunk_diary",
    "chunk_stats",
    "split_large_chunks",
    "extract_dates",
    "regex_extract_meta",
    "dedup_exact",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_cluster",
    "knn_topk_cosine",
    "knn_batch",
    "similarity_matrix",
    "vector_norms",
    "rag_retrieve",
    "rag_eval_retrieval",
    "ann_lsh_cosine",
    "ann_lsh_multiprobe",
    "ann_ivf",
    "ann_ivf_rerank",
    "ann_recall_at_k",
    "ann_probe_sweep",
    "lang_id",
    "lang_id_ngram",
    "text_quality",
    "token_count",
    "bpe_token_count",
    "doc_fingerprint",
    "tfidf_top_terms",
    "ngram_counts",
    "label_centroids",
    "agg_pricing_summary",
    "join_revenue_topn",
    "local_supplier_volume",
    "rollup_pricing",
    "order_priority_pivot",
    "multimodal_pipeline",
    "multimodal_stats",
    "multimodal_frames",
    # positions 51+: next-in-line if the driver window ever widens —
    # the remaining never-driver-checked r5 ops (pytest-green at the
    # driver's sf), then everything else in registration order
    "hard_negative_mining",
    "cluster_purity",
    "keyword_index_batch",
    "hybrid_index_batch",
    # rrf_fuse now delegates to rrf_fuse_batch (r5) — re-stamp the
    # index-served hybrid path too (hybrid_search_rrf is in-window)
    "hybrid_index_rrf",
]


def _ordered(d: dict) -> dict:
    # QUERIES must contain every _VERIFY_FIRST name (a typo here would
    # silently drop an entry out of the driver's 50-entry window).
    missing = set(_VERIFY_FIRST) - set(QUERIES)
    if missing:
        raise KeyError(f"_VERIFY_FIRST names not in registry: {sorted(missing)}")
    head = [k for k in _VERIFY_FIRST if k in d]
    return {k: d[k] for k in (*head, *[k for k in d if k not in set(head)])}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: brute-force cosine top-k retrieval (the reference's
    search_vectors) on /root/testdata/sf0.001."""
    return QUERIES["knn_topk_cosine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    resolved = dict(ORACLES)
    for name, fn in LAZY_ORACLES.items():
        resolved[name] = fn(_ORACLE_SF_DIR)
    return _ordered(resolved)
