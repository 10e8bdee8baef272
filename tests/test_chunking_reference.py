"""Diary chunker semantics vs the reference implementation's behavior
(src/chunking_strategy.py process_diary_chunks), hand-checked on a
synthetic diary."""

from __future__ import annotations

from rag_system_vector_db_spark.operators.chunking import (
    chunk_diary,
    split_large_chunks,
)

DIARY = """3rd Day of March 1887 - The Expedition Begins
We set out at dawn with heavy packs.
The mountain pass was icy.
Supplies are holding for now.
Morale remains high among the crew.
12th Day of April 1888 - Strange Findings
A curious mineral formation appeared.
It glowed faintly in the dark."""


def _lines_df(spark):
    rows = [(1, i, ln) for i, ln in enumerate(DIARY.split("\n"))]
    return spark.createDataFrame(rows, "doc_id long, line_no long, line string")


def test_diary_day_detection_and_grouping(spark):
    out = chunk_diary(_lines_df(spark), lines_per_chunk=3).collect()
    by_key = {(r.day_id, r.chunk_id): r for r in out}

    # two date lines → two days, each with its own date chunk
    date_chunks = [r for r in out if r.is_date_chunk]
    assert len(date_chunks) == 2
    assert {r.title for r in date_chunks} == {"The Expedition Begins", "Strange Findings"}

    # day 1: 4 content lines → chunks of 3 + 1
    c10 = by_key[(1, 0)]
    assert c10.line_count == 3 and not c10.is_date_chunk
    assert c10.chunk_text.startswith("We set out at dawn")
    c11 = by_key[(1, 1)]
    assert c11.line_count == 1
    assert c11.chunk_text == "Morale remains high among the crew."

    # day 2: 2 content lines → one chunk
    c20 = by_key[(2, 0)]
    assert c20.line_count == 2
    assert c20.word_count == len("A curious mineral formation appeared.".split()) + len(
        "It glowed faintly in the dark.".split()
    )
    # every chunk carries its day's title
    assert c10.title == "The Expedition Begins"
    assert c20.title == "Strange Findings"


def test_content_before_first_date_dropped(spark):
    rows = [(1, 0, "orphan line before any date"),
            (1, 1, "5th Day of May 1890 - Valid Day"),
            (1, 2, "content line")]
    df = spark.createDataFrame(rows, "doc_id long, line_no long, line string")
    out = chunk_diary(df).collect()
    texts = [r.chunk_text for r in out]
    assert "orphan line before any date" not in texts
    assert len(out) == 2  # date chunk + one content chunk


def test_split_large_chunks_matches_reference_semantics(spark):
    # reference greedy split: prefer '.', then ' ', else hard cut
    long_text = ("word " * 60).strip() + ". " + ("tail " * 30).strip()
    df = spark.createDataFrame([(1, long_text)], "doc_id long, chunk_text string")
    parts = [r.part_text for r in split_large_chunks(df, max_size=100).orderBy("part_no").collect()]

    # reimplementation of archive/chunking_strategy.py:4 as the oracle
    def ref_split(chunk, max_size=100):
        out = []
        while len(chunk) > max_size:
            cut = chunk.rfind(".", 0, max_size)
            if cut == -1:
                cut = chunk.rfind(" ", 0, max_size)
            if cut == -1:
                cut = max_size
            out.append(chunk[: cut + 1].strip())
            chunk = chunk[cut + 1 :].strip()
        if chunk:
            out.append(chunk)
        return out

    assert parts == ref_split(long_text)
    assert all(len(p) <= 105 for p in parts)
