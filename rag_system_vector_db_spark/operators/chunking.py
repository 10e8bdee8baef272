"""Chunking operators — Spark-first re-expression of the reference's
chunking strategies.

Reference parity:
- src/chunking_strategy.py:19 ``process_diary_chunks``: date-regex day
  detection (``N{st,nd,rd,th} Day of <Month> 18xx - <title>``), date
  lines become their own chunks, content chunks every 3 lines, per-chunk
  line_count/word_count/is_date_chunk + day metadata (full_date, title).
- src/archive/chunking_strategy.py:4 ``split_large_chunk``: max-size
  splitting at sentence/space boundaries.

Scale design: everything is windowed **per document** (partitionBy
doc_id) — a corpus of diaries parallelizes across executors; no global
ordering, no driver-side loops. The reference's single-stream loop
becomes window cumsums + groupBy, all JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DATE_PATTERN = r"^\d{1,2}(st|nd|rd|th)? Day of [A-Za-z]+ 18\d{2} - .+$"
TITLE_PATTERN = r" - (.+)$"


def chunk_by_tokens(
    docs: DataFrame,
    window: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed token-window chunking (the generic strategy).

    Returns (id, chunk_number, chunk_text, word_count, n_chars).
    transform(sequence) + posexplode stays inside codegen; one narrow
    projection per doc, no shuffle.
    """
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(window)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * window + 1, window)),
    )
    return (
        docs.select(F.col(id_col), F.posexplode(chunks).alias("chunk_number", "chunk_text"))
        .select(
            F.col(id_col),
            F.col("chunk_number").cast("long"),
            "chunk_text",
            F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias("word_count"),
            F.length("chunk_text").cast("long").alias("n_chars"),
        )
    )


def diary_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_per_line: int = 5,
) -> DataFrame:
    """Synthesize a diary-shaped line stream from flat documents: a
    deterministic date header line + the text re-wrapped N tokens per
    line. Lets the diary chunker run on the synthetic corpus with an
    exactly reproducible oracle."""
    toks = F.split(F.col(text_col), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(tokens_per_line)).cast("int")
    body = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * tokens_per_line + 1, tokens_per_line)),
    )
    header = F.concat(
        (F.col(id_col) % 28 + 1).cast("string"),
        F.lit(" Day of March 1887 - Entry "),
        F.col(id_col).cast("string"),
    )
    lines = F.concat(F.array(header), body)
    return docs.select(
        F.col(id_col), F.posexplode(lines).alias("line_no", "line")
    ).select(F.col(id_col), F.col("line_no").cast("long"), "line")


def chunk_diary(
    lines: DataFrame,
    lines_per_chunk: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Diary chunker (chunking_strategy.py:19) over a (doc, line_no,
    line) stream. Date-header lines open a new day and emit their own
    chunk; content lines group into ``lines_per_chunk`` chunks within
    the day. Content before the first date line is dropped (reference
    behavior).

    Returns (doc_id, day_id, chunk_id, is_date_chunk, chunk_text,
    line_count, word_count, title).

    Reference-exact details (replayed against the reference's own
    golden fixtures in tests/test_chunking_golden.py): lines are
    stripped and blank lines dropped (chunking_strategy.py's
    ``line.strip(); if line:``), and word_count counts WHITESPACE-RUN
    tokens (Python ``str.split()``), not single-space fields — the
    PDF-extracted diary text is full of double spaces and the two
    differ on every such line.
    """
    lines = lines.select(
        F.col(id_col), F.col("line_no"), F.trim("line").alias("line")
    ).filter(F.col("line") != "")
    is_date = F.col("line").rlike(DATE_PATTERN)
    w_doc = Window.partitionBy(id_col).orderBy("line_no")
    lined = lines.withColumn("is_date", is_date).withColumn(
        "day_id", F.sum(F.col("is_date").cast("int")).over(w_doc)
    )

    # Day metadata (full_date, title) — one row per day, broadcast-join back.
    days = (
        lined.filter("is_date")
        .select(
            id_col,
            "day_id",
            F.col("line").alias("full_date"),
            F.regexp_extract("line", TITLE_PATTERN, 1).alias("title"),
        )
    )

    date_chunks = lined.filter("is_date").select(
        F.col(id_col),
        "day_id",
        F.lit(-1).cast("long").alias("chunk_id"),
        F.lit(True).alias("is_date_chunk"),
        F.col("line").alias("chunk_text"),
        F.lit(1).cast("long").alias("line_count"),
        F.size(F.split("line", r"\s+")).cast("long").alias("word_count"),
    )

    w_day = Window.partitionBy(id_col, "day_id").orderBy("line_no")
    content = (
        lined.filter((~F.col("is_date")) & (F.col("day_id") >= 1))
        .withColumn("rn", F.row_number().over(w_day))
        .withColumn("chunk_id", F.floor((F.col("rn") - 1) / lines_per_chunk))
    )
    content_chunks = (
        content.groupBy(id_col, "day_id", "chunk_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda x: x["line"],
                ),
            ).alias("chunk_text"),
            F.count("*").cast("long").alias("line_count"),
            # per-line whitespace-token sum == tokens of '\n'.join(buffer)
            # because every buffered line is stripped and non-empty
            F.sum(F.size(F.split("line", r"\s+"))).cast("long").alias("word_count"),
        )
        .withColumn("is_date_chunk", F.lit(False))
        .select(
            id_col, "day_id", "chunk_id", "is_date_chunk",
            "chunk_text", "line_count", "word_count",
        )
    )

    # days is one row per detected day heading — corpus-proportional,
    # so no forced broadcast; AQE promotes the join when it is small.
    return (
        date_chunks.unionByName(content_chunks)
        .join(days.select(id_col, "day_id", "title"), [id_col, "day_id"])
    )


def diary_stats(chunks: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Corpus metadata rollup (chunking_strategy.py:115): per doc
    total_days, total_chunks, avg_chunks_per_day."""
    return chunks.groupBy(id_col).agg(
        F.countDistinct("day_id").cast("long").alias("total_days"),
        F.count("*").cast("long").alias("total_chunks"),
        F.round(F.count("*") / F.countDistinct("day_id"), 6).alias("avg_chunks_per_day"),
    )


def split_large_chunks(
    chunks: DataFrame,
    max_size: int = 800,
    text_col: str = "chunk_text",
) -> DataFrame:
    """Greedy max-size splitting at sentence/space boundaries
    (archive/chunking_strategy.py:4 ``split_large_chunk``).

    The greedy rfind loop is inherently sequential per chunk → Arrow
    pandas_udf via mapInPandas (batched, no per-row pickling). Emits
    one row per part with ``part_no``; all other columns pass through.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in chunks.schema.fields
    ) + ", part_no bigint, part_text string"

    def split_text(text: str) -> list[str]:
        parts: list[str] = []
        while len(text) > max_size:
            cut = text.rfind(".", 0, max_size)
            if cut == -1:
                cut = text.rfind(" ", 0, max_size)
            if cut == -1:
                cut = max_size
            parts.append(text[: cut + 1].strip())
            text = text[cut + 1 :].strip()
        if text:
            parts.append(text)
        return parts

    def gen(batches):
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                for i, part in enumerate(split_text(rec[text_col])):
                    rows.append({**rec, "part_no": i, "part_text": part})
            yield pd.DataFrame(rows, columns=list(pdf.columns) + ["part_no", "part_text"])

    return chunks.mapInPandas(gen, schema=out_schema)


def sequence_packing(
    docs: DataFrame,
    seq_len: int = 512,
    shard_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
) -> DataFrame:
    """GPT-style sequence packing layout: per group (language shard),
    documents are concatenated in id order into one token stream cut
    every ``seq_len`` tokens; each doc's byte-position in that stream
    is its prefix token sum.

    The prefix sum is computed the SCALE-SAFE two-phase way, not with
    one global window: (1) docs get a shard id (``id div shard_size``);
    a window inside each (group, shard) computes the within-shard
    prefix — bounded partitions, no global sort; (2) per-shard totals
    (a small frame: one row per shard) get a cumulative window per
    group, giving each shard its stream offset; an equi-join (AQE
    broadcasts it when small) adds the two. Result is bit-identical
    to the naive full-stream cumsum —
    which is exactly what the oracle computes — while the only
    full-data sort is per-shard.

    Token count is the allocation-free spaces+1 scalar (single-space
    tokenization). Returns (group, doc_id, n_tokens, start_offset,
    first_pack, last_pack, n_packs) — first/last pack index the
    seq_len-token training sequences the doc lands in."""
    n_tok = (
        F.length(F.col(text_col))
        - F.length(F.translate(F.col(text_col), " ", ""))
        + 1
    ).cast("long")
    d = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col),
        n_tok.alias("n_tokens"),
        # integer div, not float division: float truncates toward zero
        # for negative ids and loses precision past 2^53.
        F.expr(f"{id_col} div {shard_size}").cast("long").alias("_shard"),
    )
    w_in = (
        Window.partitionBy("grp", "_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = d.withColumn("_pre", F.sum("n_tokens").over(w_in) - F.col("n_tokens"))
    totals = d.groupBy("grp", "_shard").agg(F.sum("n_tokens").alias("_tot"))
    w_sh = (
        Window.partitionBy("grp")
        .orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.withColumn(
        "_off", F.sum("_tot").over(w_sh) - F.col("_tot")
    ).select("grp", "_shard", "_off")
    # offsets is one row per shard — corpus/shard_size, so it is NOT
    # fixed-size; no forced broadcast (AQE promotes when small).
    out = within.join(offsets, ["grp", "_shard"]).select(
        F.col("grp").alias(group_col),
        F.col(id_col),
        "n_tokens",
        (F.col("_pre") + F.col("_off")).alias("start_offset"),
    )
    first = F.expr(f"start_offset div {seq_len}")
    last = F.expr(f"(start_offset + n_tokens - 1) div {seq_len}")
    return out.select(
        group_col,
        id_col,
        "n_tokens",
        "start_offset",
        first.cast("long").alias("first_pack"),
        last.cast("long").alias("last_pack"),
        (last - first + 1).cast("long").alias("n_packs"),
    )


def chunk_overlapping(
    docs: DataFrame,
    window: int = 40,
    stride: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking — the RAG chunk_overlap
    parameter (LangChain/LlamaIndex's overlap = window − stride):
    chunks start every ``stride`` tokens and span ``window``, so
    adjacent chunks share ``window − stride`` tokens and no sentence
    is ever split across a retrieval boundary without a copy that
    contains it whole. Start count = 1 + ceil(max(n − window, 0) /
    stride) — the final start is the last one that adds new tokens.

    Same codegen shape as chunk_by_tokens (transform(sequence) +
    posexplode, no shuffle); returns (id, chunk_number, start_token,
    chunk_text, word_count)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_starts = (
        F.lit(1)
        + F.ceil(F.greatest(n - F.lit(window), F.lit(0)) / F.lit(stride))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_starts - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, window)),
    )
    return (
        docs.select(F.col(id_col), F.posexplode(chunks).alias("chunk_number", "chunk_text"))
        .select(
            F.col(id_col),
            F.col("chunk_number").cast("long"),
            (F.col("chunk_number") * stride).cast("long").alias("start_token"),
            "chunk_text",
            F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias("word_count"),
        )
    )
