"""Source-layer behavior: partition pruning on hive layouts and the
gated small-scan split."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from rag_system_vector_db_spark.sources import load_table
from rag_system_vector_db_spark.sources.writer import (
    read_partitioned,
    write_partitioned,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def part_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("part") / "docs_by_lang")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    write_partitioned(docs, out, ["lang"])
    return out


def test_partitioned_layout_on_disk(part_dir, spark, sf_dir):
    langs = {
        r.lang
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang")
        .distinct()
        .collect()
    }
    dirs = {d for d in os.listdir(part_dir) if d.startswith("lang=")}
    assert dirs == {f"lang={lang}" for lang in langs}


def test_partition_filter_prunes_directories(part_dir, spark, sf_dir):
    df = read_partitioned(spark, part_dir).filter(F.col("lang") == "en")
    plan = _plan(df)
    # the lang predicate is a PartitionFilter (directory pruning),
    # not a data filter evaluated per row
    assert "PartitionFilters: [" in plan
    assert "lang" in plan.split("PartitionFilters")[1][:120]
    n_en = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("lang") == "en")
        .count()
    )
    assert df.count() == n_en


def test_roundtrip_preserves_rows(part_dir, spark, sf_dir):
    orig = spark.read.parquet(f"{sf_dir}/documents.parquet")
    back = read_partitioned(spark, part_dir)
    assert back.count() == orig.count()
    a = {r.doc_id for r in back.select("doc_id").collect()}
    b = {r.doc_id for r in orig.select("doc_id").collect()}
    assert a == b


def test_small_scan_split_gate(spark, sf_dir):
    """documents splits to defaultParallelism; a table not in the
    default list stays at its natural split count unless opted in."""
    dp = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents")
    assert docs.rdd.getNumPartitions() == dp
    nation = load_table(spark, sf_dir, "nation")
    assert nation.rdd.getNumPartitions() < dp


def test_pdf_ingest_fake_decoder(spark, tmp_path):
    """binaryFile -> mapInPandas decode plumbing with the deterministic
    fake decoder (real codec not installed); page breaks become
    newlines, exactly the reference's page-join."""
    from rag_system_vector_db_spark.sources.pdf import pdf_to_documents

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "a.pdf").write_bytes(b"page one\x0cpage two")
    (d / "b.pdf").write_bytes(b"single page")
    out = {r.path.split("/")[-1]: r for r in pdf_to_documents(
        spark, str(d), decoder="fake"
    ).collect()}
    assert out["a.pdf"].text == "page one\npage two"
    assert out["b.pdf"].text == "single page"
    assert out["b.pdf"].n_chars == 11


def test_pdf_decoder_auto_and_real(spark, tmp_path):
    """decoder='auto' uses real pypdf extraction when the wheel exists,
    falls back to the fake codec otherwise; decoder='real' never
    silently degrades."""
    from rag_system_vector_db_spark.sources import pdf as pdf_mod

    d = tmp_path / "pdfs_auto"
    d.mkdir()
    if pdf_mod._HAVE_PDF:
        from io import BytesIO

        # build a tiny real PDF via the installed lib, round-trip it
        writer = pdf_mod._PDF_MOD.PdfWriter()
        writer.add_blank_page(width=72, height=72)
        buf = BytesIO()
        writer.write(buf)
        (d / "real.pdf").write_bytes(buf.getvalue())
        rows = pdf_mod.pdf_to_documents(spark, str(d)).collect()
        assert len(rows) == 1  # decoded by the real path, no raise
    else:
        (d / "fake.pdf").write_bytes(b"page one\x0cpage two")
        rows = pdf_mod.pdf_to_documents(spark, str(d)).collect()  # auto->fake
        assert rows[0].text == "page one\npage two"
        # the real path is an explicit stub until a codec lands
        with pytest.raises(NotImplementedError):
            pdf_mod.extract_text_from_pdf(b"%PDF-1.4 ...")
        with pytest.raises(NotImplementedError):
            pdf_mod.pdf_to_documents(spark, str(d), decoder="real")


def test_pdf_ingest_feeds_chunker(spark, tmp_path):
    """PDF text flows into the normal chunk operator unchanged."""
    from rag_system_vector_db_spark.operators.chunking import chunk_by_tokens
    from rag_system_vector_db_spark.sources.pdf import pdf_to_documents

    d = tmp_path / "pdfs2"
    d.mkdir()
    (d / "diary.pdf").write_bytes(" ".join(f"w{i}" for i in range(100)).encode())
    docs = pdf_to_documents(spark, str(d), decoder="fake").withColumn(
        "doc_id", F.lit(0)
    )
    chunks = chunk_by_tokens(docs, window=40)
    assert chunks.count() == 3  # 100 tokens / 40 per window


# --- JSONL corpus source -------------------------------------------------


def test_jsonl_roundtrip_and_quarantine(spark, sf_dir, tmp_path):
    """Parseable lines land in the docs contract, malformed/incomplete
    lines in the quarantine frame; parquet documents round-trip
    loss-free through JSONL."""
    from rag_system_vector_db_spark.sources.jsonl import (
        read_jsonl_docs,
        write_jsonl_docs,
    )

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "s1"}\n'
        '{"doc_id": 2, "text": "gamma"}\n'  # optional fields defaulted
        'not json at all\n'
        '{"doc_id": 3}\n'  # missing text -> quarantine
        '{"text": "no id"}\n'  # missing doc_id -> quarantine
    )
    docs, corrupt = read_jsonl_docs(spark, str(p))
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == {1, 2}
    assert rows[2].lang == "und" and rows[2].source == "jsonl"
    assert rows[1].n_chars == len("alpha beta")
    assert corrupt.count() == 3

    # round-trip the real documents table through JSONL
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = tmp_path / "export"
    write_jsonl_docs(src, str(out))
    back, bad = read_jsonl_docs(spark, str(out))
    assert bad.count() == 0
    assert back.count() == src.count()
    a = {(r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in back.collect()}
    b = {(r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in src.collect()}
    assert a == b


def _minimal_pdf(text: str) -> bytes:
    """Hand-assembled single-page PDF (no library): catalog, page tree,
    one Helvetica text stream, byte-accurate xref table. Any conforming
    reader extracts ``text`` from it."""
    stream = f"BT /F1 12 Tf 72 712 Td ({text}) Tj ET".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def test_pdf_real_decode_on_handmade_pdf(spark, tmp_path):
    """A minimal VALID PDF built from raw bytes (no pdf library needed
    to produce it) proves the real decode path end to end whenever
    pypdf/PyPDF2 is installed; without the wheel, the real path must
    refuse loudly (never silently degrade) and auto must fall back to
    the fake codec over the same file."""
    import pytest

    from rag_system_vector_db_spark.sources import pdf as pdf_mod

    d = tmp_path / "pdfs_handmade"
    d.mkdir()
    pdf_bytes = _minimal_pdf("Hello Spark PDF")
    (d / "hand.pdf").write_bytes(pdf_bytes)

    if pdf_mod._HAVE_PDF:
        # real branch: driver-side decode AND the distributed path
        assert "Hello Spark PDF" in pdf_mod.extract_text_from_pdf(pdf_bytes)
        rows = pdf_mod.pdf_to_documents(spark, str(d), decoder="real").collect()
        assert len(rows) == 1
        assert "Hello Spark PDF" in rows[0].text
    else:
        with pytest.raises(NotImplementedError, match="pypdf"):
            pdf_mod.extract_text_from_pdf(pdf_bytes)
        with pytest.raises(NotImplementedError, match="pypdf"):
            pdf_mod.pdf_to_documents(spark, str(d), decoder="real")
        # auto -> fake: plumbing still runs over the same binary file
        rows = pdf_mod.pdf_to_documents(spark, str(d), decoder="auto").collect()
        assert len(rows) == 1
        assert rows[0].n_chars == len(rows[0].text) > 0


@pytest.fixture()
def qa_pair_files(tmp_path):
    sets = []
    for i, n in enumerate((3, 2)):
        q = tmp_path / f"questions_{i}.txt"
        a = tmp_path / f"answers_{i}.txt"
        q.write_text("".join(f"set{i} question {j}?\n" for j in range(n)) + "trailing unmatched q\n")
        a.write_text("".join(f"set{i} answer {j}\n" for j in range(n)))
        sets.append((str(q), str(a)))
    return sets


def test_qa_python_datasource_matches_driver_parser(spark, qa_pair_files):
    """The Spark 4 Python DataSource connector must produce exactly
    what the driver-side parser produces, per pair — including the
    dropped unmatched trailing line."""
    from rag_system_vector_db_spark.sources.qa_datasource import QAFileDataSource
    from rag_system_vector_db_spark.sources.qa_files import load_qa_pairs

    spark.dataSource.register(QAFileDataSource)
    pairs_opt = ",".join(f"{q}:{a}" for q, a in qa_pair_files)
    df = spark.read.format("qa_files").option("pairs", pairs_opt).load()
    got = {
        (r.pair_id, r.qa_id, r.question, r.expected_answer) for r in df.collect()
    }
    want = set()
    for pid, (q, a) in enumerate(qa_pair_files):
        for r in load_qa_pairs(spark, q, a).collect():
            want.add((pid, r.qa_id, r.question, r.expected_answer))
    assert got == want
    assert len(got) == 5  # 3 + 2, trailing question dropped


def test_qa_python_datasource_partitions_per_pair(spark, qa_pair_files):
    """Each file pair is its own InputPartition — the distributed-read
    contract (a directory of eval sets scans in parallel)."""
    from pyspark.sql import functions as F

    from rag_system_vector_db_spark.sources.qa_datasource import QAFileDataSource

    spark.dataSource.register(QAFileDataSource)
    pairs_opt = ",".join(f"{q}:{a}" for q, a in qa_pair_files)
    df = spark.read.format("qa_files").option("pairs", pairs_opt).load()
    per_part = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.collect_set("pair_id").alias("pairs"))
        .collect()
    )
    # every Spark partition holds rows of exactly one file pair
    assert all(len(r.pairs) == 1 for r in per_part)
    assert len(per_part) == 2


def test_qa_python_datasource_single_pair_options(spark, qa_pair_files):
    from rag_system_vector_db_spark.sources.qa_datasource import QAFileDataSource

    spark.dataSource.register(QAFileDataSource)
    q, a = qa_pair_files[0]
    df = (
        spark.read.format("qa_files")
        .option("questions", q)
        .option("answers", a)
        .load()
    )
    rows = df.collect()
    assert {r.qa_id for r in rows} == {0, 1, 2}
    assert all(r.pair_id == 0 for r in rows)


def test_qa_python_datasource_requires_options(spark):
    from rag_system_vector_db_spark.sources.qa_datasource import QAFileReader

    with pytest.raises(ValueError, match="qa_files needs"):
        QAFileReader({})


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """Schema evolution across parquet batches (the ingest reality of
    a long-lived corpus: later batches add columns): mergeSchema
    reconciles old and new footers, old rows null-fill the added
    column, and an explicit unified schema reads the same without
    footer merging (the cheap production path — mergeSchema footer
    scans are O(n_files))."""
    out = str(tmp_path / "evolving")
    docs = load_table(spark, sf_dir, "documents")
    docs.select("doc_id", "text").write.parquet(f"{out}/batch=0")
    docs.select(
        "doc_id", "text", F.lit("crawl-2").alias("origin")
    ).write.parquet(f"{out}/batch=1")
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"doc_id", "text", "origin", "batch"}
    n = docs.count()
    assert merged.count() == 2 * n
    assert merged.filter(F.col("origin").isNull()).count() == n
    # production path: explicit schema, no footer merge
    explicit = spark.read.schema(merged.schema).parquet(out)
    assert explicit.count() == 2 * n
    assert explicit.filter((F.col("batch") == 1) & F.col("origin").isNull()).count() == 0


def test_duck_parquet_path_layouts(tmp_path):
    """Single-file sfs (shipped testdata) pass through; Spark
    directory-style sfs (derived, e.g. tools/gen_sf1.py) glob their
    part files — the contract the in-process DuckDB fits rely on."""
    import duckdb

    from rag_system_vector_db_spark.sources.tables import duck_parquet_path

    sf = str(tmp_path)
    # file layout
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({"vec_id": [1, 2], "v": [0.5, 1.5]})
    pq.write_table(t, f"{sf}/embeddings.parquet")
    p = duck_parquet_path(sf, "embeddings")
    assert p == f"{sf}/embeddings.parquet"
    assert duckdb.sql(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0] == 2
    # directory layout
    import os

    os.makedirs(f"{sf}/documents.parquet")
    pq.write_table(t, f"{sf}/documents.parquet/part-00000.parquet")
    pq.write_table(t, f"{sf}/documents.parquet/part-00001.parquet")
    p = duck_parquet_path(sf, "documents")
    assert p.endswith("/*.parquet")
    assert duckdb.sql(f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0] == 4
