"""Parquet table sources.

Declarative `spark.read.parquet` scans so Catalyst gets predicate
pushdown + column pruning for free. At cluster scale the same call
reads a partitioned directory tree; nothing here assumes local mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Tables whose operators do CPU-heavy per-row work (shingling, hashing,
# vector math). A small local file arrives as ONE scan split (single
# row group, nothing for maxPartitionBytes to split), which would
# serialize all that per-row work on one core — so these are shuffle-
# split across the cluster by default when the scan has fewer splits
# than defaultParallelism. At real scale (thousands of input splits)
# the gate makes this a no-op — no extra exchange appears in the plan.
#
# `embeddings` is NOT split by default: the kNN/RAG queries fetch query
# vectors with separate driver actions and broadcast sub-relations of
# the same scan, and a repartition under those re-runs per action and
# forces AQE to materialize an exchange before each broadcast —
# measured 2-6x slower. Call sites with heavy map-side vector math
# (LSH bucketing, pairwise cosine) opt in with ``split=True``.
DEFAULT_SPLIT_TABLES = ("documents",)

# (sf_dir, name) -> decided partition count (0 = leave alone); memoized
# so repeated registry calls don't re-plan the scan RDD.
_SPLIT_DECISION: dict[tuple[str, str], int] = {}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, split: bool | None = None
) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the Spark reader
        # rejects natively; read it as raw nanos (long). Event-time
        # queries do exact integer arithmetic on `ts_ns` (matching the
        # oracle's epoch_ns) — `ts` stays available as a micros-precision
        # timestamp for streaming/watermark use. The legacy conf is
        # captured at read-build time, so it is saved/restored around
        # the read instead of leaking into the session (where it would
        # silently turn later TIMESTAMP(NANOS) reads into longs).
        from pyspark.sql import functions as F

        key = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "true")
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        return df.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if split is None:
        split = name in DEFAULT_SPLIT_TABLES
    if split:
        key = (sf_dir, name)
        if key not in _SPLIT_DECISION:
            dp = spark.sparkContext.defaultParallelism
            _SPLIT_DECISION[key] = dp if df.rdd.getNumPartitions() < dp else 0
        if _SPLIT_DECISION[key]:
            df = df.repartition(_SPLIT_DECISION[key])
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle's
    pre-registered views, so SQL text can be shared)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
