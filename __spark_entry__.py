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
# r6 rotation (per VERDICT r5 "Next round #1", operator growth frozen):
# (a) the 14 changed-after-stamp entries FIRST — their r3/r4 stamps
# predate the current code, so the stale-stamp risk outranks the
# never-stamped cohort. Every entry whose code or oracle moved later
# in r6 is ALSO inside this window: join_revenue_topn (revenue_topn
# dropped its forced repartition) and hll_merge_rollup /
# sliding_window_hll (oracle rho-fill fix caught by the sf1 sweep),
# so the driver stamps all of them against current code.
# (b) the quantile family whose exact/approx parameterization landed
# this round (quantile_stats had a pass-r4 stamp; the others were
# never stamped).
# (c) never-stamped flagships: curation/sample-gen, the sketch family
# (HLL/KMV/CMS/CountSketch/histogram), lakehouse merge + feature-store
# joins, and the judge-named retrieval/attribution flagships.
# Unslotted entries follow at positions 51+ in registration order;
# 151 oracle-backed entries remain never-stamped after this window —
# r7 should continue the rotation (next up: the remaining r5-cont.
# statistical-testing wave, then the closing waves in §2 order).
_VERIFY_FIRST = [
    # (a) stale stamps — code changed after last driver-green stamp
    "dedup_minhash_lsh",
    "dedup_simhash",
    "minhash_accuracy",
    "knn_graph_lsh",
    "skew_profile",
    "semdedup_clusters",
    "hybrid_index_rrf",
    "chunk_documents",
    "dedup_cluster",
    "join_revenue_topn",
    "split_large_chunks",
    "extract_dates",
    "local_supplier_volume",
    "regex_extract_meta",
    # (b) exact-quantile family parameterized this round
    "quantile_stats",
    "conversion_latency",
    "grouped_latency_slo",
    "trimmed_mean_stats",
    "events_histogram_equidepth",
    "quantile_confidence_bands",
    # (c) never-stamped flagships
    "curation_pipeline",
    "kmeans_refine",
    "salted_join_topn",
    "triangle_count",
    "data_quality_checks",
    "mlm_mask_corpus",
    "span_corrupt_corpus",
    "fim_transform",
    "merge_into_apply",
    "pit_feature_join",
    "window_funnel",
    "cascade_retrieval_sim",
    "hll_distinct",
    "hll_merge_rollup",
    "sliding_window_hll",
    "kmv_distinct_by_group",
    "kmv_set_ops",
    "cms_heavy_hitters",
    "count_sketch_estimate",
    "histogram_quantile_sketch",
    "markov_attribution",
    "ucb_bandit_replay",
    "graph_random_walks",
    "seeding_quality_eval",
    "wand_pruning_sim",
    "soft_dedup_weights",
    "rag_context_budget",
    "query_expansion_prf",
    "rerank_two_stage",
    "qlm_dirichlet_topk",
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
