"""Local replica of the driver's t2 correctness gate: run a registry
query in Spark and its oracle SQL in DuckDB over the same parquet,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb

from rag_system_vector_db_spark.sources import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return str(v)


def canon_rows(rows, colnames):
    """Order-insensitive canonical form, columns sorted by name."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str):
    srows = spark_df.collect()
    scols = spark_df.columns
    rel = con.sql(sql)
    drows = rel.fetchall()
    dcols = list(rel.columns)
    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"row count differs: {len(srows)} vs {len(drows)}"
    sc = canon_rows([tuple(r) for r in srows], scols)
    dc = canon_rows(drows, dcols)
    mism = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert sc == dc, f"values differ; first mismatches: {mism[:3]}"
