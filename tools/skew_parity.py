"""Skew-corpus CORRECTNESS parity (VERDICT r7 "Next round #6"):
SCALE_sf1_skew.json times the join/dedup family on the engineered-skew
corpus but never oracle-checks results there — this tool runs the
driver-faithful compare (tests/oracle.py) for the nine skew-bench
queries on the skew directory, including the registered capped dedup
entries whose oracles replay the cap, and writes SKEW_PARITY_r8.json.

The capped entries are where skew actually changes behavior: on the
10x corpus the boilerplate clique and the replica near-dup groups
exceed the caps, so the cap-replaying oracles exercise the non-trivial
drop path cross-engine (at gate scales most of it is a no-op).

Usage: python tools/skew_parity.py [--sf .scratch/sf1.0_skew]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

# The SCALE_sf1_skew query set, re-expressed on the registered surface:
# the study's ad-hoc capped@512 variants correspond to the registered
# capped entries (minhash cap 4 / simhash cap 128) + hot_bucket_report.
NAMES = [
    "join_revenue_topn",
    "salted_join_topn",
    "promo_revenue",
    "customer_order_distribution",
    "sessionize_events",
    "dedup_exact",
    "dedup_minhash_lsh_capped",
    "dedup_simhash_capped",
    "hot_bucket_report",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(ROOT, ".scratch", "sf1.0_skew"))
    ap.add_argument("--names", default="")
    ap.add_argument("--out", default=os.path.join(ROOT, "SKEW_PARITY_r8.json"))
    args = ap.parse_args()
    names = [n for n in args.names.split(",") if n] or NAMES

    from oracle import compare, duck_connection

    from rag_system_vector_db_spark.registry import LAZY_ORACLES, ORACLES, QUERIES
    from rag_system_vector_db_spark.session import get_spark

    if not os.path.isdir(args.sf):
        sys.exit(f"skew corpus missing: {args.sf} (run tools/gen_skew.py)")
    spark = get_spark("skew-parity")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(args.sf)
    results: dict = {}
    fails = 0
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            sql = ORACLES[name] if name in ORACLES else LAZY_ORACLES[name](args.sf)
            df = QUERIES[name](spark, args.sf)
            compare(df, con, sql)
            results[name] = {"match": True, "sec": round(time.time() - t0, 1)}
            print(f"[{i}/{len(names)}] MATCH {name} ({results[name]['sec']}s)", flush=True)
        except Exception as e:
            fails += 1
            results[name] = {
                "match": False,
                "err": f"{type(e).__name__}: {e}"[:400],
                "sec": round(time.time() - t0, 1),
            }
            print(f"[{i}/{len(names)}] FAIL {name}: {results[name]['err'][:200]}", flush=True)
            traceback.print_exc(file=sys.stderr)
    manifest = {
        "sf_dir": args.sf,
        "queries": results,
        "n_match": len(names) - fails,
        "n_total": len(names),
        "all_match": fails == 0,
    }
    with open(args.out, "w") as f:
        json.dump(manifest, f, indent=1)
        f.write("\n")
    print(f"SKEW PARITY {len(names) - fails}/{len(names)} -> {args.out}")
    return 0 if fails == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
