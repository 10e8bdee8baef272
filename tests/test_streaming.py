"""Structured Streaming smoke: file source → memory sink, driven to
completion with processAllAvailable."""

from __future__ import annotations

import os

import pytest

from rag_system_vector_db_spark.streaming import pipeline as P


@pytest.fixture(scope="module")
def stream_dirs(sf_dir, tmp_path_factory):
    """File stream sources need directories; stage symlinks."""
    base = tmp_path_factory.mktemp("stream_src")
    dirs = {}
    for t in ("documents", "events"):
        d = base / t
        d.mkdir()
        os.symlink(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
        dirs[t] = str(d)
    return dirs


def test_streaming_ingest_chunks_and_embeds(spark, sf_dir, stream_dirs):
    stream = P.stream_documents(spark, stream_dirs["documents"])
    out = P.ingest_pipeline(stream, chunk_window=40)
    assert out.isStreaming
    P.run_to_memory(out, "ingest_out")
    got = spark.sql("SELECT * FROM ingest_out")
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert got.count() >= n_docs  # ≥1 chunk per doc
    row = got.first()
    assert len(row.embedding) == 64
    batch_equiv = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from rag_system_vector_db_spark.operators.chunking import chunk_by_tokens

    assert got.count() == chunk_by_tokens(batch_equiv, 40).count()


def test_streaming_windowed_counts(spark, sf_dir, stream_dirs):
    ev = P.stream_events(spark, stream_dirs["events"])
    agg = P.windowed_event_counts(ev, window="1 hour", watermark="2 hours")
    P.run_complete_to_memory(agg, "win_out")
    got = spark.sql("SELECT * FROM win_out")
    assert got.count() > 0
    assert set(got.columns) == {"win_start", "win_end", "event_type", "n", "sum_value"}
    # totals must reconcile with the batch count
    total = got.groupBy().sum("n").first()[0]
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_streaming_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState keep-first dedup: a hash seen in an
    earlier micro-batch must be suppressed in later ones."""
    import pandas as pd

    src = tmp_path / "docs"
    src.mkdir()

    def write_batch(name, doc_ids, texts):
        pdf = pd.DataFrame(
            {
                "doc_id": pd.array(doc_ids, dtype="int64"),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
            }
        )
        pdf.to_parquet(src / name)

    write_batch("b1.parquet", [1, 2], ["alpha text", "beta text"])
    out = P.streaming_dedup(P.stream_documents(spark, str(src)))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: doc 3 duplicates doc 1's content, doc 4 is new
        write_batch("b2.parquet", [3, 4], ["alpha text", "gamma text"])
        q.processAllAvailable()
    finally:
        q.stop()
    keepers = {r.keeper_id for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert keepers == {1, 2, 4}  # 3 suppressed as duplicate of 1


def test_streaming_session_windows(spark, sf_dir, stream_dirs):
    ev = P.stream_events(spark, stream_dirs["events"])
    agg = P.session_event_counts(ev, gap="30 minutes", watermark="2 hours")
    P.run_complete_to_memory(agg, "sess_out")
    got = spark.sql("SELECT * FROM sess_out")
    assert got.count() > 0
    total = got.groupBy().sum("n_events").first()[0]
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()
