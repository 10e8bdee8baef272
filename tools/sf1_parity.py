"""Driver-faithful oracle parity at 10x gate scale (the r6 sweep that
caught the HLL rho-fill bug, now a committed tool — VERDICT r6 "Next
round #4").

Runs a set of registry entries against their DuckDB oracles on the
derived sf1 corpus (tools/gen_sf1.py). Entries whose sf1 result is too
large to collect (dedup_simhash: 100.5M pairs) are compared by an
ENGINE-SIDE count + order-free checksum instead of being skipped: both
engines reduce the full result to (row_count, sum of a 60-bit md5 of
the '|'-joined row rendered with columns sorted by name) — no
full-value collect, zero rows cross the driver, and a single flipped
value anywhere in 100M rows still fails the sum. Only valid for
integer/string result columns (float rendering differs between
engines); the tool enforces that.

Usage:
    python tools/sf1_parity.py                  # the r6 window (CORRECTNESS_r06.json keys)
    python tools/sf1_parity.py --names a,b,c
    python tools/sf1_parity.py --sf .scratch/sf1.0
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

# Entries whose sf1 result volume exceeds a sane driver collect — the
# checksum path is their declared compare.
CHECKSUM = {"dedup_simhash"}

_INT_STR = {"bigint", "int", "smallint", "tinyint", "string", "boolean", "date"}


def checksum_compare(spark_df, con, sql: str, name: str) -> None:
    from pyspark.sql import functions as F

    from rag_system_vector_db_spark.functions import hashing as H

    bad = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.simpleString() not in _INT_STR
    ]
    if bad:
        raise TypeError(f"{name}: checksum compare needs int/str columns, got {bad}")
    cols = sorted(spark_df.columns)
    srow = spark_df.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(
                H.md5_long(
                    F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
                ).cast("decimal(38,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("chk"),
    ).collect()[0]
    dd_concat = "concat_ws('|', " + ", ".join(f"({c})::VARCHAR" for c in cols) + ")"
    drow = con.sql(
        f"SELECT count(*) AS n, coalesce(sum({H.dd_md5_long(dd_concat)}), 0) AS chk"
        f" FROM ({sql})"
    ).fetchone()
    assert int(srow["n"]) == int(drow[0]), f"row count differs: {srow['n']} vs {drow[0]}"
    assert int(srow["chk"]) == int(drow[1]), f"checksum differs: {srow['chk']} vs {drow[1]}"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(ROOT, ".scratch", "sf1.0"))
    ap.add_argument("--names", default="")
    ap.add_argument(
        "--window",
        default="",
        help="driver round to re-check at sf1, e.g. r07 (reads CORRECTNESS_<round>.json)",
    )
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument(
        "--per-entry-timeout",
        type=int,
        default=0,
        help="seconds per entry before interrupting both engines and "
        "recording TIMEOUT (0 = no limit). Entries whose ORACLES are "
        "deliberately naive-quadratic (dedup_fuzzy_edit's theta "
        "levenshtein, events_range_join's theta band join) are "
        "intractable at 10x — the timeout records them explicitly "
        "instead of hanging the sweep; spot-check those with bounded "
        "slices (see .sf1_parity_r8all.log tail).",
    )
    args = ap.parse_args()

    from oracle import compare, duck_connection

    from rag_system_vector_db_spark.registry import LAZY_ORACLES, ORACLES, QUERIES
    from rag_system_vector_db_spark.session import get_spark

    if args.names:
        names = [n.strip() for n in args.names.split(",") if n.strip()]
    else:
        rnd = args.window or "r06"
        with open(os.path.join(ROOT, f"CORRECTNESS_{rnd}.json")) as f:
            names = list(json.load(f))

    spark = get_spark("sf1-parity", cpus=int(args.cpus))
    con = duck_connection(args.sf)
    failures = 0
    timeouts = []
    import threading

    for i, name in enumerate(names, 1):
        t0 = time.time()
        timed_out = threading.Event()
        timer = None
        if args.per_entry_timeout:
            def _kill(con=con, ev=timed_out):
                ev.set()
                try:
                    con.interrupt()
                except Exception:
                    pass
                try:
                    spark.sparkContext.cancelAllJobs()
                except Exception:
                    pass

            timer = threading.Timer(args.per_entry_timeout, _kill)
            timer.start()
        try:
            df = QUERIES[name](spark, args.sf)
            sql = ORACLES.get(name) or LAZY_ORACLES[name](args.sf)
            if name in CHECKSUM:
                checksum_compare(df, con, sql, name)
                tag = "MATCH-CHECKSUM"
            else:
                compare(df, con, sql)
                tag = "MATCH"
            print(f"[{i}/{len(names)}] {tag} {name} ({time.time()-t0:.1f}s)")
        except AssertionError as e:
            if timed_out.is_set():
                timeouts.append(name)
                print(f"[{i}/{len(names)}] TIMEOUT {name} (>{args.per_entry_timeout}s)")
            else:
                failures += 1
                print(f"[{i}/{len(names)}] MISMATCH {name}: {str(e)[:300]}")
        except Exception:
            if timed_out.is_set():
                timeouts.append(name)
                print(f"[{i}/{len(names)}] TIMEOUT {name} (>{args.per_entry_timeout}s)")
            else:
                failures += 1
                print(f"[{i}/{len(names)}] ERROR {name}:")
                traceback.print_exc(limit=5)
        finally:
            if timer is not None:
                timer.cancel()
        sys.stdout.flush()
    if timeouts:
        print(f"TIMEOUTS ({len(timeouts)}): {', '.join(timeouts)}")
    print(f"SF1 PARITY DONE {len(names)} entries, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
