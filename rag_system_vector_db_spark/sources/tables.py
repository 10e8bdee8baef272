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
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle's
    pre-registered views, so SQL text can be shared)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
