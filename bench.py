"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rag_system_vector_db_spark.registry import QUERIES  # noqa: E402
from rag_system_vector_db_spark.session import get_spark  # noqa: E402

# Headliners: vector search + dedup-ish + analytics; every registered
# query that exists is eligible, this list is the stable scored subset.
HEADLINE = [
    # vector search / RAG core
    "knn_topk_cosine",
    "knn_batch",
    "knn_batch_np",
    "similarity_matrix",
    "rag_retrieve",
    "rag_eval_retrieval",
    "hybrid_search_rrf",
    "ann_lsh_cosine",
    "ann_lsh_multiprobe",
    # store surface
    "collection_stats",
    "insert_upsert",
    # chunking + text analysis
    "chunk_documents",
    "chunk_diary",
    "doc_fingerprint",
    "text_quality",
    # dedup
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_lsh",
    "tfidf_top_terms",
    "redact_pii",
    "normalize_text",
    "kmv_distinct",
    # analytics
    "agg_pricing_summary",
    "column_profile",
    "join_revenue_topn",
    "local_supplier_volume",
    "rollup_pricing",
    "order_priority_pivot",
    "dormant_customers",
    "window_events",
    "sliding_window_events",
    "sessionize_events",
    "events_json_extract",
    "topk_per_group",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = get_spark("bench")
    # warm the JVM + parquet footers once
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    # Untimed warmup pass: compiles + caches each query's whole-stage
    # codegen classes so the timed runs measure steady-state engine
    # throughput rather than one-off JIT compilation.
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is not None:
            fn(spark, sf_dir).count()

    # Best-of-2 timed passes: steady-state engine throughput, not
    # scheduler/GC jitter (single-pass numbers swing ±40% locally).
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
            assert n >= 0
        timings[name] = round(best, 4)
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
