"""Driver-sim correctness gate: run registry queries against their
DuckDB oracles with the driver-faithful compare (tests/oracle.py).

Usage:
    python tools/gate.py                       # all oracle-backed entries at sf0.01
    python tools/gate.py --sf /root/testdata/sf0.001
    python tools/gate.py --names a,b,c         # subset
    python tools/gate.py --window              # the current _VERIFY_FIRST 50

Prints one line per entry (MATCH / MISMATCH / ERROR) and a final
"GATE DONE <n> entries, <k> failures" line.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--names", default="")
    ap.add_argument("--window", action="store_true", help="gate the _VERIFY_FIRST window")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from rag_system_vector_db_spark.registry import LAZY_ORACLES, ORACLES, QUERIES
    from tests.oracle import compare, duck_connection

    if args.window:
        import __spark_entry__ as se

        names = list(se._VERIFY_FIRST)
    elif args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        names = [n for n in QUERIES if n in ORACLES or n in LAZY_ORACLES]

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("gate")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(args.sf)

    failures = 0
    for i, name in enumerate(names, 1):
        t0 = time.time()
        try:
            df = QUERIES[name](spark, args.sf)
            if name in ORACLES:
                compare(df, con, ORACLES[name])
            elif name in LAZY_ORACLES:
                compare(df, con, LAZY_ORACLES[name](args.sf))
            else:
                n = df.count()
                print(f"[{i}/{len(names)}] ROWS-ONLY {name} rows={n} ({time.time()-t0:.1f}s)")
                continue
            print(f"[{i}/{len(names)}] MATCH {name} ({time.time()-t0:.1f}s)")
        except AssertionError as e:
            failures += 1
            print(f"[{i}/{len(names)}] MISMATCH {name}: {str(e)[:300]}")
        except Exception:
            failures += 1
            print(f"[{i}/{len(names)}] ERROR {name}:")
            traceback.print_exc(limit=5)
        sys.stdout.flush()
    print(f"GATE DONE {len(names)} entries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
