"""Skewed-data scale study (VERDICT r6 "Next round #6"): measures the
join + dedup family on the deliberately-skewed 10x corpus
(tools/gen_skew.py) against the same queries at sf0.1, so the SURVEY's
AQE-skew-join and hot-bucket claims are measured, not asserted.

Exponent e = log(t_skew / t_sf0.1) / log(10): the skew corpus is 10x
rows, so e ~ 1 means the skew cost is absorbed (AQE split / salting /
map-side combine did the job); e >> 1 isolates a genuine skew
bottleneck. The banding dedup entries run with the cap
(max_bucket=512) because the corpus carries a ~10k-doc boilerplate
clique BY CONSTRUCTION — the uncapped plan would emit ~10^8 clique
pairs, which is the exact failure the cap exists to drop (the study
records the capped plan as the 100 TB-honest configuration; dedup_exact
runs uncapped since its hot class reduces in the aggregate).

Usage: python tools/skew_bench.py   (writes SCALE_sf1_skew.json)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from rag_system_vector_db_spark.registry import QUERIES  # noqa: E402
from rag_system_vector_db_spark.session import get_spark  # noqa: E402
from rag_system_vector_db_spark.sources import load_table  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SKEW = os.path.join(ROOT, ".scratch", "sf1.0_skew")
CAP = 512


def _capped_minhash(spark, sf_dir):
    from rag_system_vector_db_spark.operators import dedup

    return dedup.dedup_minhash_lsh(
        load_table(spark, sf_dir, "documents"), max_bucket=CAP
    )


def _capped_simhash(spark, sf_dir):
    from rag_system_vector_db_spark.operators import dedup

    return dedup.dedup_simhash(load_table(spark, sf_dir, "documents"), max_bucket=CAP)


def _hot_bucket_report(spark, sf_dir):
    from rag_system_vector_db_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    b = dedup.lsh_band_buckets(
        dedup.minhash_signatures(dedup.shingle_set(docs, 3), 8), 4, 2
    )
    return dedup.hot_bucket_report(b, ["band", "band_sig"], CAP)


SET = {
    # hot o_custkey (30% one customer): AQE skew-join + TakeOrdered
    "join_revenue_topn": QUERIES["join_revenue_topn"],
    # explicit salting strategy on the same-shaped join
    "salted_join_topn": QUERIES["salted_join_topn"],
    # hot l_partkey (20% one part): part<->lineitem join
    "promo_revenue": QUERIES["promo_revenue"],
    # groupBy on the hot key: map-side combine absorbs it or not
    "customer_order_distribution": QUERIES["customer_order_distribution"],
    # hot user (25% of events): one giant window partition
    "sessionize_events": QUERIES["sessionize_events"],
    # boilerplate clique: hash-agg dedup (hot class reduces in-agg)
    "dedup_exact": QUERIES["dedup_exact"],
    # banding dedup with the cap — the 100 TB configuration
    "dedup_minhash_lsh_capped": _capped_minhash,
    "dedup_simhash_capped": _capped_simhash,
    # the dropped-bucket audit itself must also be cheap
    "hot_bucket_report": _hot_bucket_report,
}


def time_set(spark, sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for name, fn in SET.items():
        fn(spark, sf_dir).count()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
        print(
            f"  {sf_dir.rsplit('/', 1)[-1]} {name}: {out[name]}s",
            file=sys.stderr,
            flush=True,
        )
    return out


def main() -> None:
    if not os.path.isdir(SKEW):
        sys.exit("run tools/gen_skew.py first")
    spark = get_spark("skew-bench")
    spark.read.parquet(f"{SF01}/lineitem.parquet").count()
    spark.read.parquet(f"{SKEW}/lineitem.parquet").count()
    t01 = time_set(spark, SF01)
    t1 = time_set(spark, SKEW)
    rows = {}
    for n in SET:
        e = math.log(t1[n] / t01[n]) / math.log(10)
        rows[n] = {"t_sf0.1": t01[n], "t_skew": t1[n], "exponent": round(e, 3)}
    # skew facts so the record is self-describing
    hot = {
        "hot_custkey_share": 0.3,
        "hot_partkey_share": 0.2,
        "hot_user_share": 0.25,
        "boilerplate_doc_share": 0.2,
        "dedup_cap": CAP,
    }
    result = {
        "metric": "sf1_skew_scaling",
        "n_rep": 10,
        "skew": hot,
        "queries": rows,
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }
    with open(os.path.join(ROOT, "SCALE_sf1_skew.json"), "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
