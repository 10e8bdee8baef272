"""Materialized inverted text index: build + pruned BM25 serving.

Mirrors the reference's retrieval surface (hybrid BM25 tower) served
from a bucket-partitioned postings layout instead of per-query corpus
tokenization — the text analog of tests/test_pq.py's IVF layout checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_system_vector_db_spark.operators import hybrid, text_index

TERMS = ["spark", "join", "fast"]


def _build(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "kw_index")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text_index.keyword_index_build(docs, idx, n_buckets=32)
    return idx, docs


def test_index_serving_matches_direct_bm25(spark, sf_dir, tmp_path):
    """The index-served top-k must equal re-tokenizing the corpus."""
    idx, docs = _build(spark, sf_dir, tmp_path)
    served = text_index.keyword_index_topk(spark, idx, TERMS, k=10).collect()
    direct = (
        hybrid.bm25_scores(docs, TERMS)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(10)
        .collect()
    )
    assert [r.doc_id for r in served] == [r.doc_id for r in direct]
    for s, d in zip(served, direct):
        assert abs(s.bm25 - d.bm25) < 1e-6


def test_postings_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The bucket IN filter must reach the scan as a PartitionFilter
    (directory-level skip), and term buckets must be consistent
    between the Python twin and the build's column expression."""
    idx, docs = _build(spark, sf_dir, tmp_path)
    buckets = sorted({text_index.term_bucket_py(t, 32) for t in TERMS})
    pruned = spark.read.parquet(f"{idx}/postings").filter(
        F.col("bucket").isin(buckets)
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:160]
    # bucket twin consistency: every queried term's postings are found
    # inside the pruned slice
    found = {
        r.term
        for r in pruned.filter(F.col("term").isin(TERMS)).select("term").distinct().collect()
    }
    full = {
        r.term
        for r in spark.read.parquet(f"{idx}/postings")
        .filter(F.col("term").isin(TERMS))
        .select("term")
        .distinct()
        .collect()
    }
    assert found == full


def test_batch_serving_matches_per_query_topk(spark, sf_dir, tmp_path):
    """One batch plan must reproduce each query's single-query
    index-served top-k exactly, and the batch postings scan stays
    partition-pruned to the union of the queries' term buckets."""
    idx, docs = _build(spark, sf_dir, tmp_path)
    queries = [(0, TERMS), (1, ["vector", "data"]), (2, ["window", "stream"])]
    batch = text_index.keyword_index_batch(spark, idx, queries, k=10)
    rows = batch.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, terms in queries:
        single = text_index.keyword_index_topk(spark, idx, terms, k=10).collect()
        got = sorted(by_q[qid], key=lambda r: r.rank)
        assert [(r.rank, r.doc_id) for r in got] == [
            (s.rank, s.doc_id) for s in single
        ], qid
        for g, s in zip(got, single):
            assert abs(g.bm25 - s.bm25) < 1e-6
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:160]
    # every postings scan in the plan must be the PRUNED one (the df
    # tower re-reads the same pruned slice — two directory-skipped
    # scans of |query buckets| files, not two corpus passes)
    assert plan.count("FileScan parquet") <= 6


def test_hybrid_batch_matches_single_query_hybrid(spark, sf_dir, tmp_path):
    """The keyed batch fusion must reproduce each query's single-query
    hybrid_index_rrf output exactly."""
    idx, docs = _build(spark, sf_dir, tmp_path)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = [(0, TERMS), (1, ["vector", "data"])]
    qv = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = text_index.hybrid_index_batch(
        spark, idx, emb, queries, qv, k=10, depth=20
    ).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, terms in queries:
        one_vec = emb.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("qv")
        )
        single = text_index.hybrid_index_rrf(
            spark, idx, emb, terms, one_vec, k=10, depth=20
        ).collect()
        got = sorted(by_q[qid], key=lambda r: r.rank)
        assert [(r.rank, r.doc_id, r.bm25_rank, r.vec_rank) for r in got] == [
            (s.rank, s.doc_id, s.bm25_rank, s.vec_rank) for s in single
        ], qid
        for g, s in zip(got, single):
            assert abs(g.fused - s.fused) < 1e-9


def test_phrase_query_positional_index(spark, sf_dir, tmp_path):
    """Phrase serving: positional-index phrase counts must equal a
    brute-force adjacency count from the raw corpus, and the
    postings_pos scan must be partition-pruned to the phrase terms'
    buckets."""
    idx = str(tmp_path / "kwpos_index")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text_index.positional_index_build(docs, idx, n_buckets=32)
    phrase = ["part", "filter"]
    got = text_index.phrase_topk(spark, idx, phrase, k=10)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:160]
    rows = got.collect()
    assert rows, "phrase should match at least one doc"
    # brute force: count adjacent (part, filter) token pairs per doc
    toks = docs.select(
        F.col("doc_id"), F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    a = toks.filter(F.col("term") == phrase[0]).select("doc_id", "pos")
    b = toks.filter(F.col("term") == phrase[1]).select(
        F.col("doc_id").alias("doc_id2"), F.col("pos").alias("pos2")
    )
    brute = (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_id2"))
            & (F.col("pos2") == F.col("pos") + 1),
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
    )
    expect = {r.doc_id: r.n for r in brute.collect()}
    for r in rows:
        assert expect[r.doc_id] == r.n_phrase
    # three-term phrase sanity: never more matches than the two-term prefix
    got3 = {
        r.doc_id: r.n_phrase
        for r in text_index.phrase_topk(
            spark, idx, ["part", "filter", "small"], k=50
        ).collect()
    }
    two = {r.doc_id: r.n_phrase for r in text_index.phrase_topk(spark, idx, phrase, k=50).collect()}
    for d, n in got3.items():
        assert n <= two.get(d, 0)


def test_merge_equals_rebuild(spark, sf_dir, tmp_path):
    """Incremental maintenance contract: bulk-build on half the corpus
    + merge of the other half must serve EXACTLY what a full rebuild
    serves (ids and scores), for single-term df and stats alike."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merged = str(tmp_path / "kw_merged")
    rebuilt = str(tmp_path / "kw_rebuilt")
    text_index.mergeable_index_build(docs.filter(F.col("doc_id") % 2 == 0), merged)
    out = text_index.keyword_index_merge(
        spark, docs.filter(F.col("doc_id") % 2 == 1), merged, batch_id=1
    )
    assert out == "merged"
    text_index.keyword_index_build(docs, rebuilt, n_buckets=32)
    a = text_index.keyword_index_topk(spark, merged, TERMS, k=10).collect()
    b = text_index.keyword_index_topk(spark, rebuilt, TERMS, k=10).collect()
    assert [(r.doc_id, r.bm25) for r in a] == [(r.doc_id, r.bm25) for r in b]


def test_merge_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Replaying a committed merge must not duplicate postings or
    change served results; the ledger short-circuits it."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "kw_replay")
    text_index.mergeable_index_build(docs.filter(F.col("doc_id") % 2 == 0), idx)
    text_index.keyword_index_merge(
        spark, docs.filter(F.col("doc_id") % 2 == 1), idx, batch_id=1
    )
    n_before = spark.read.parquet(f"{idx}/postings").count()
    served_before = text_index.keyword_index_topk(spark, idx, TERMS, k=10).collect()
    out = text_index.keyword_index_merge(
        spark, docs.filter(F.col("doc_id") % 2 == 1), idx, batch_id=1
    )
    assert out == "skipped"
    assert spark.read.parquet(f"{idx}/postings").count() == n_before
    served_after = text_index.keyword_index_topk(spark, idx, TERMS, k=10).collect()
    assert served_before == served_after


def test_merge_crash_before_ledger_converges(spark, sf_dir, tmp_path):
    """Crash-convergence: postings written but ledger row missing (the
    crash window between write and commit). The replay's DYNAMIC
    partition overwrite replaces the orphan batch partitions instead of
    appending duplicates, and the end state equals a clean merge."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = str(tmp_path / "kw_crash")
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    text_index.mergeable_index_build(docs.filter(F.col("doc_id") % 2 == 0), idx)
    # simulate the torn merge: batch-1 postings land, no ledger commit
    post = text_index._batch_postings(odd, 1, 32, "doc_id", "text")
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        post.repartition("bucket").write.partitionBy("batch", "bucket").mode(
            "overwrite"
        ).parquet(f"{idx}/postings")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    out = text_index.keyword_index_merge(spark, odd, idx, batch_id=1)
    assert out == "merged"
    # no duplicate (term, doc) postings survived the replay
    p = spark.read.parquet(f"{idx}/postings")
    assert p.count() == p.select("term", "doc_id").distinct().count()
    # stats reflect the full corpus
    stats = spark.read.parquet(f"{idx}/stats").collect()[0]
    assert stats.n_docs == docs.count()


def test_prf_expansion_terms_and_pruned_first_tower(spark, sf_dir, tmp_path):
    """RM3 PRF: expansion terms must exclude the query terms, weights
    must decrease with rank, and the BM25 first tower must stay
    bucket-pruned (the corpus is only touched through the ≤10-doc
    feedback broadcast)."""
    idx, docs = _build(spark, sf_dir, tmp_path)
    df = text_index.query_expansion_prf(spark, docs, idx, TERMS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the POSTINGS scan (not the docs scan) must carry the bucket prune
    assert any(
        "bucket" in seg[:160] for seg in plan.split("PartitionFilters")[1:]
    )
    assert "BroadcastExchange" in plan  # feedback set broadcast onto docs
    rows = df.collect()
    assert len(rows) == 10
    assert [r.rank for r in rows] == list(range(1, 11))
    assert all(r.term not in TERMS for r in rows)
    weights = [r.weight for r in rows]
    assert weights == sorted(weights, reverse=True)
    assert all(1 <= r.n_docs <= 10 for r in rows)


def test_unseen_term_queries_are_empty_not_errors(spark, sf_dir, tmp_path):
    """A query term that appears nowhere (or hashes to an empty
    bucket) must yield empty results — not a scan error, not a
    div-by-zero in idf/cf. Exercises BM25, QLM and PRF on the same
    index."""
    idx, docs = _build(spark, sf_dir, tmp_path)
    ghost = ["zzzghostterm"]
    assert text_index.keyword_index_topk(spark, idx, ghost, k=5).count() == 0
    assert text_index.qlm_dirichlet_topk(spark, idx, ghost, k=5).count() == 0
    # PRF with no feedback docs: no expansion terms, empty frame
    assert (
        text_index.query_expansion_prf(spark, docs, idx, ghost).count() == 0
    )


def test_qlm_and_bm25_agree_on_easy_winner(spark, sf_dir, tmp_path):
    """Sanity cross-check between the two scorers: both must retrieve
    overlapping candidates for the same query (they rank differently,
    but the candidate pool — docs containing query terms — is
    identical, so top-10 sets intersect heavily on a 500-doc corpus)."""
    idx, docs = _build(spark, sf_dir, tmp_path)
    bm = {r.doc_id for r in text_index.keyword_index_topk(spark, idx, TERMS, k=10).collect()}
    ql = {r.doc_id for r in text_index.qlm_dirichlet_topk(spark, idx, TERMS, k=10).collect()}
    assert len(bm & ql) >= 3
