"""Parquet table sources.

Declarative `spark.read.parquet` scans so Catalyst gets predicate
pushdown + column pruning for free. At cluster scale the same call
reads a partitioned directory tree; nothing here assumes local mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which the Spark reader
        # rejects natively; read it as raw nanos (long). Event-time
        # queries do exact integer arithmetic on `ts_ns` (matching the
        # oracle's epoch_ns) — `ts` stays available as a micros-precision
        # timestamp for streaming/watermark use.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return (
            spark.read.parquet(f"{sf_dir}/{name}.parquet")
            .withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle's
    pre-registered views, so SQL text can be shared)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
