"""JSONL document-corpus source — the wire format web-scale training
corpora actually arrive in (one JSON object per line, gzip-friendly,
splittable when uncompressed).

Spark-first posture: ``spark.read.schema(...).json`` with
PERMISSIVE mode + ``columnNameOfCorruptRecord`` so malformed lines
land in a quarantine column instead of failing the 100-TB job; the
explicit schema prevents the full-data inference pass Spark would
otherwise run. Readers return (docs, corrupt) as separate DataFrames
so the pipeline can count/route bad lines (the standard
bronze-layer contract).

Reference parity: prepare_data.py builds its corpus from local PDF
text; this is the same ingest step for the format the dedup/quality
operators (SURVEY §2 #21-27, 70-75) consume at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# documents-table contract (TESTDATA.md): doc_id, text, lang, source,
# n_chars — n_chars is derived, not trusted from the wire.
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_jsonl_docs(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus into the documents-table contract.

    Returns (docs, corrupt): docs has (doc_id, text, lang, source,
    n_chars) for parseable lines with the required fields present;
    corrupt has (line,) — the raw text of every line that failed JSON
    parsing or was missing doc_id/text. PERMISSIVE mode keeps the scan
    single-pass and non-failing; the corrupt column must be
    materialized together with the filter (Spark requires referencing
    it from the same scan), which both selects below do."""
    raw = (
        spark.read.schema(DOC_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    ok = (
        raw.filter(
            F.col("_corrupt").isNull()
            & F.col("doc_id").isNotNull()
            & F.col("text").isNotNull()
        )
        .select(
            "doc_id",
            "text",
            # normalize optional fields to the table contract
            F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("jsonl")).alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    corrupt = (
        raw.filter(
            F.col("_corrupt").isNotNull()
            | F.col("doc_id").isNull()
            | F.col("text").isNull()
        )
        .select(
            F.coalesce(F.col("_corrupt"), F.to_json(F.struct("doc_id", "text", "lang", "source")))
            .alias("line")
        )
    )
    return ok, corrupt


def write_jsonl_docs(docs: DataFrame, path: str) -> None:
    """Round-trip writer (debug/export): one JSON object per line,
    partitioned however the input is — at scale prefer parquet
    (sources/writer.py); JSONL is the interchange format, not the
    storage format."""
    docs.select("doc_id", "text", "lang", "source").write.mode("overwrite").json(path)
