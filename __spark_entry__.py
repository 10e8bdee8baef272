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
# r8 rotation (per VERDICT r7 "Next round #1"): (a) the stale trio
# first — knn_batch_np / rag_pipeline_e2e / eval_results_artifact
# carry pre-r7 `no_oracle` stamps in the driver ledger even though r7
# gave them real oracles; re-stamp them green. Then (b) the next 47
# never-stamped entries in registry (§2) order: the rest of the part03
# closing wave (session_paths .. dau_stickiness), then part05's head
# (embedding_dedup_recall .. seasonal_residual_anomaly). 69 oracle-
# backed entries remain never-stamped after this window (plus the
# three r8-registered entries: dedup_minhash_lsh_capped,
# hot_bucket_report, dedup_simhash_capped) — r9 continues with those
# three, then lorenz_curve_points .. and part06+ in §2 order.
_VERIFY_FIRST = [
    # (a) stale-stamp trio (oracles added r7; driver ledger re-stamp)
    "knn_batch_np",
    "rag_pipeline_e2e",
    "eval_results_artifact",
    # (b) part03 closing wave, §2 order
    "session_paths",
    "skipgram_pairs",
    "temporal_split",
    "ann_ivf_sq8",
    "dataset_card",
    "quantization_recall",
    "embedding_quality_checks",
    "bpe_train_rounds",
    "label_outliers",
    "tfidf_vsm_topk",
    "vocab_coverage",
    "knn_graph_2hop",
    "multimodal_shard_plan",
    "pre_post_analysis",
    "hybrid_combsum",
    "chunk_overlap",
    "dedup_containment",
    "percolate_queries",
    "snapshot_diff",
    "events_twa",
    "events_anomaly_mad",
    "vocab_drift",
    "split_ngram_leakage",
    "discount_elasticity",
    "revenue_concentration",
    "seasonality_profile",
    "topk_stability",
    "exactly_once_ingest",
    "slo_burn_rate",
    "audience_overlap",
    "market_basket_lift",
    "dau_stickiness",
    # (c) part05 head, §2 order
    "embedding_dedup_recall",
    "order_backlog_timeseries",
    "rollup_grain_advisor",
    "seasonal_decompose",
    "dedup_keep_best",
    "intraclass_correlation",
    "dedup_threshold_sweep",
    "embedding_dim_profile",
    "eb_rate_shrinkage",
    "simpson_paradox_check",
    "bloom_filter_sizing",
    "recall_at_k_sweep",
    "uncertainty_sampling",
    "source_ngram_similarity",
    "seasonal_residual_anomaly",
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
