"""Partitioned parquet writers — the layout side of scale.

At 100 TB the single biggest scan lever is not reading data at all:
hive-style partition directories (lang=en/, ds=2026-08-13/) let the
planner prune entire directories from a filtered scan (visible as
PartitionFilters in the plan, asserted in tests/test_sources.py),
and per-partition file sizing keeps splits balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write hive-partitioned parquet. maxRecordsPerFile bounds file
    size (the other half of split balance: huge files bound task
    parallelism, tiny files bound the scheduler)."""
    (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a partitioned layout; filters on partition columns
    prune directories before any I/O."""
    return spark.read.parquet(path)
