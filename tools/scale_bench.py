"""sf0.1 -> sf1.0 scaling study (VERDICT r5 "Next round #4").

Times a representative query set at sf0.1 (driver bench scale) and at
the derived sf1.0 (tools/gen_sf1.py, 10x rows), then reports the
per-query scaling exponent  e = log(t_sf1 / t_sf01) / log(10)  —
e ~ 1.0 is linear scaling, e < 1 means fixed overheads still dominate
at sf1, e > 1 flags superlinear candidate-volume growth (the judge's
concern for the pair-generating dedup family). Best-of-2 after an
untimed warmup pass, same protocol as bench.py.

Usage: python tools/scale_bench.py [--quick]   (prints one JSON line
and writes SCALE_sf1.json at the repo root).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from rag_system_vector_db_spark.registry import QUERIES  # noqa: E402
from rag_system_vector_db_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(ROOT, ".scratch", "sf1.0")

# The judge-named candidate-volume-bound operators plus one
# representative per major family.
SET = [
    # pair-generating dedup: the superlinear suspects
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "weighted_jaccard_pairs",
    "dedup_cluster_stats",   # iterative connected components
    "semdedup_clusters",
    "substring_dedup",
    "dedup_exact",
    # r8: the corpus-sized LSH family (planes_for) — the verdict's
    # done-criterion is exponent <= ~0.7 for the first two
    "dedup_embedding_lsh",
    "knn_graph_lsh",
    "dedup_embedding_cosine",
    "hard_negative_mining",
    "mutual_knn",
    # vector search
    "knn_topk_cosine",
    "ann_lsh_cosine",
    "ann_ivf",
    # text/curation single-pass
    "quality_filters",
    "curation_pipeline",
    "tfidf_top_terms",
    # sketches (bounded state: should be ~linear in scan time)
    "hll_distinct",
    "cms_heavy_hitters",
    # relational analytics
    "agg_pricing_summary",
    "join_revenue_topn",
    "sessionize_events",
    "window_events",
]


def time_set(spark, sf_dir: str, names: list[str]) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warm: codegen + shuffle files
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        print(f"  {sf_dir.rsplit('/',1)[-1]} {name}: {out[name]}s", file=sys.stderr, flush=True)
    return out


def main() -> None:
    names = SET[:6] if "--quick" in sys.argv else SET
    if not os.path.isdir(SF1):
        sys.exit("run tools/gen_sf1.py first")
    spark = get_spark("scale-bench")
    spark.read.parquet(f"{SF01}/lineitem.parquet").count()
    spark.read.parquet(f"{SF1}/lineitem.parquet").count()
    t01 = time_set(spark, SF01, names)
    t1 = time_set(spark, SF1, names)
    rows = {}
    for n in names:
        e = math.log(t1[n] / t01[n]) / math.log(10)
        rows[n] = {"t_sf0.1": t01[n], "t_sf1": t1[n], "exponent": round(e, 3)}
    result = {
        "metric": "sf1_scaling",
        "n_rep": 10,
        "queries": rows,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }
    with open(os.path.join(ROOT, "SCALE_sf1.json"), "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
