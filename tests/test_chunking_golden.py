"""Replay the reference's OWN golden chunk fixtures.

The reference repo ships the recorded output of its diary chunker run
on the real Dr. Voss diary PDF:

- ``tests/diary_line_chunks.json``  — every significant line with its
  day attribution (2,227 lines, 123 days),
- ``tests/diary_chunks_3breaks.json`` — the chunk-per-3-lines output
  (872 chunks) of ``src/chunking_strategy.py:19
  process_diary_chunks``, fields chunk_number / chunk_text / date /
  day_metadata{full_date,title} / line_count / word_count /
  is_date_chunk plus the corpus metadata rollup,
- ``tests/diary_chunks_3breaks_v2.json`` — same chunks with
  ``palavras_maiusculas`` (capitalized-word) day metadata
  (archive/chunking_strategy_v3.py:62),
- ``tests/diary_data_analysis.json`` — the archive day+paragraph
  variant's per-paragraph word/char counts.

These tests reconstruct the diary text from the line fixture and
assert FIELD-LEVEL equality of our Spark chunker against the recorded
chunks — parity with the reference demonstrated on the reference's own
data, not a synthetic stand-in (tests/test_chunking_reference.py keeps
the synthetic edge cases).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from rag_system_vector_db_spark.operators.chunking import (
    DATE_PATTERN,
    chunk_diary,
    diary_stats,
)

REF_TESTS = Path("/root/reference/tests")

pytestmark = pytest.mark.skipif(
    not (REF_TESTS / "diary_chunks_3breaks.json").exists(),
    reason="reference fixtures not present",
)


@pytest.fixture(scope="module")
def golden():
    return json.loads((REF_TESTS / "diary_chunks_3breaks.json").read_text())


@pytest.fixture(scope="module")
def golden_lines():
    return json.loads((REF_TESTS / "diary_line_chunks.json").read_text())


@pytest.fixture(scope="module")
def lines_df(spark, golden_lines):
    rows = [
        (1, int(c["line_number"]), c["line_text"])
        for c in golden_lines["chunks"]
    ]
    return spark.createDataFrame(rows, "doc_id long, line_no long, line string")


@pytest.fixture(scope="module")
def ours(spark, lines_df):
    """Our chunker's output in the reference's global chunk order:
    (day_id asc, date chunk first, then content chunks) — exactly the
    stream order process_diary_chunks emits (the pending buffer
    flushes BEFORE the next date chunk is appended)."""
    out = chunk_diary(lines_df, lines_per_chunk=3).orderBy("day_id", "chunk_id")
    return out.collect()


def test_golden_chunk_count_and_numbering(golden, ours):
    assert len(ours) == golden["metadata"]["total_chunks"] == 872
    # global chunk_number = position in (day_id, chunk_id) order
    for i, (rec, ref) in enumerate(zip(ours, golden["chunks"])):
        assert ref["chunk_number"] == i


def test_golden_field_level_equality(golden, ours):
    """Every chunk: text, date, title, line_count, word_count,
    is_date_chunk must equal the reference's recorded output."""
    full_date_by_day = {r.day_id: r.chunk_text for r in ours if r.is_date_chunk}
    mismatches = []
    for rec, ref in zip(ours, golden["chunks"]):
        checks = {
            "chunk_text": (rec.chunk_text, ref["chunk_text"]),
            "date": (full_date_by_day[rec.day_id], ref["date"]),
            "full_date": (full_date_by_day[rec.day_id], ref["day_metadata"]["full_date"]),
            "title": (rec.title, ref["day_metadata"]["title"]),
            "line_count": (rec.line_count, ref["line_count"]),
            "word_count": (rec.word_count, ref["word_count"]),
            "is_date_chunk": (rec.is_date_chunk, ref.get("is_date_chunk", False)),
        }
        for field, (got, want) in checks.items():
            if got != want:
                mismatches.append((ref["chunk_number"], field, got, want))
    assert not mismatches, f"{len(mismatches)} field mismatches, first 5: {mismatches[:5]}"


def test_golden_metadata_rollup(spark, golden, lines_df):
    """chunk_stats' totals vs the fixture's metadata block."""
    meta = golden["metadata"]
    stats = diary_stats(chunk_diary(lines_df, lines_per_chunk=3)).collect()
    assert len(stats) == 1
    s = stats[0]
    assert s.total_days == meta["total_days"] == 123
    assert s.total_chunks == meta["total_chunks"] == 872
    assert float(s.avg_chunks_per_day) == pytest.approx(
        meta["avg_chunks_per_day"], abs=1e-6
    )


def test_golden_chunks_per_day(golden, ours):
    """chunks_per_day keyed by the full date line (defaultdict
    semantics: same-date days would merge — keyed by text, not day_id)."""
    full_date_by_day = {r.day_id: r.chunk_text for r in ours if r.is_date_chunk}
    got: dict[str, int] = {}
    for r in ours:
        k = full_date_by_day[r.day_id]
        got[k] = got.get(k, 0) + 1
    assert got == dict(golden["metadata"]["chunks_per_day"])


def test_golden_line_attribution(spark, golden_lines, lines_df):
    """diary_line_chunks.json replay: our date-regex detection and
    running-day attribution must match every line's recorded
    is_date_line and date."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("line_no")
    lined = (
        lines_df.withColumn("is_date", F.col("line").rlike(DATE_PATTERN))
        .withColumn("day_id", F.sum(F.col("is_date").cast("int")).over(w))
    )
    date_of_day = {
        r.day_id: r.line for r in lined.filter("is_date").collect()
    }
    got = {r.line_no: (r.is_date, date_of_day.get(r.day_id)) for r in lined.collect()}
    for c in golden_lines["chunks"]:
        is_date, date = got[int(c["line_number"])]
        assert is_date == c["is_date_line"], c["line_number"]
        assert date == c["date"], c["line_number"]
    assert golden_lines["metadata"]["total_lines"] == 2227
    assert golden_lines["metadata"]["total_days"] == 123


def test_golden_v2_capitalized_words(spark, golden_lines):
    """v2 fixture (chunking_strategy_v3.py:62): per-day
    palavras_maiusculas = re.findall(r'\\b[A-Z]\\w*\\b') on the date
    line — our capitalized-word extraction must reproduce the recorded
    list for every one of the 123 days."""
    v2 = json.loads((REF_TESTS / "diary_chunks_3breaks_v2.json").read_text())
    date_rows = [c for c in v2["chunks"] if c.get("is_date_chunk")]
    assert len(date_rows) == 123
    df = spark.createDataFrame(
        [(i, c["chunk_text"]) for i, c in enumerate(date_rows)], "i long, line string"
    )
    got = {
        r.i: r.caps
        for r in df.select(
            "i", F.expr(r"regexp_extract_all(line, '\\b[A-Z]\\w*\\b', 0)").alias("caps")
        ).collect()
    }
    for i, c in enumerate(date_rows):
        assert got[i] == c["day_metadata"]["palavras_maiusculas"], c["chunk_text"]


def test_golden_paragraph_counts(spark):
    """diary_data_analysis.json (archive day+paragraph variant): our
    word/char count expressions reproduce the recorded per-paragraph
    word_count (Python str.split() semantics) and char_count."""
    da = json.loads((REF_TESTS / "diary_data_analysis.json").read_text())
    paras = da["chunks"]
    assert len(paras) == da["metadata"]["total_paragraphs"] == 11
    df = spark.createDataFrame(
        [(i, c["paragraph_text"]) for i, c in enumerate(paras)], "i long, t string"
    )
    got = {
        r.i: (r.wc, r.cc)
        for r in df.select(
            "i",
            F.size(F.split(F.trim("t"), r"\s+")).alias("wc"),
            F.length("t").alias("cc"),
        ).collect()
    }
    for i, c in enumerate(paras):
        assert got[i] == (c["word_count"], c["char_count"]), i
