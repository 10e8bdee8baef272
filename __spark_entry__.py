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
# r7 rotation (per VERDICT r6 "Next round #1", operator growth frozen):
# continue stamping never-stamped entries. Nothing in the r6 window
# needs re-stamping (no code/oracle moves since dedeaa7 at rotation
# time). This window = (a) the r5-continuation statistical-testing
# wave (part04: corr_matrix .. filter_selectivity_estimate, 35
# entries), then (b) the first 15 of the part03 closing wave in §2
# order (events_gap_fill .. lm_perplexity_bigram). 116 oracle-backed
# entries remain never-stamped after this window — r8 continues with
# the rest of part03 (session_paths ..) then part05+ in §2 order.
_VERIFY_FIRST = [
    # (a) statistical-testing wave (part04, §2 order)
    "corr_matrix",
    "cusum_changepoint",
    "events_interarrival",
    "ab_welch_ttest",
    "corpus_temperature_mix",
    "token_budget_plan",
    "retrieval_mmr",
    "classifier_calibration",
    "describe_collection",
    "chi_square_independence",
    "layout_skipping_compare",
    "events_decayed_topk",
    "grouped_ols_slopes",
    "mann_whitney_u",
    "knn_classifier_eval",
    "survival_km",
    "silhouette_simplified",
    "zipf_fit",
    "jackknife_variance",
    "bootstrap_ci",
    "partition_plan_sim",
    "postings_compression_stats",
    "source_distinctive_terms",
    "psi_drift",
    "knn_graph_assortativity",
    "bm25_tuning_grid",
    "snippet_extraction",
    "cross_source_duplication",
    "holt_forecast",
    "kendall_tau_ranks",
    "ab_power_analysis",
    "classifier_pr_curve",
    "brier_decomposition",
    "join_cardinality_estimate",
    "filter_selectivity_estimate",
    # (b) part03 closing wave, §2 order
    "events_gap_fill",
    "events_ohlc",
    "lineitem_priority_mix",
    "train_test_split",
    "lang_confusion",
    "pmi_collocations",
    "ann_binary_hamming",
    "ann_sq8",
    "revenue_cube",
    "events_ewma",
    "incremental_agg_maintenance",
    "token_entropy",
    "faceted_search_counts",
    "rfm_segments",
    "lm_perplexity_bigram",
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
