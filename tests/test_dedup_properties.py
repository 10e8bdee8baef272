"""Property-based checks of the dedup math on random corpora —
the invariants the scale optimizations rely on:

- Prefix filtering (dedup_ngram_jaccard) must equal the unfiltered
  brute-force Jaccard join on ANY input (candidate recall is exact).
- SimHash byte-banding must find EVERY pair with hamming <= 3
  (pigeonhole over 4x8-bit bands).
- MinHash-LSH candidates must include every identical-text pair
  (identical signatures share all bands).

Hypothesis drives small random word-soup corpora through the same
operators the registry uses; Spark runs once per generated corpus.
Python reference implementations (itertools brute force) are the
ground truth — independent of both Spark and DuckDB.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rag_system_vector_db_spark.operators import dedup

WORDS = ["spark", "join", "scan", "hash", "row", "agg", "key", "table"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_strategy)
def test_prefix_filtered_jaccard_equals_bruteforce(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_ngram_jaccard(docs, n=3, threshold=0.5).collect()
    }
    expected = {}
    sh = [_shingles(t) for t in texts]
    for a, b in combinations(range(len(texts)), 2):
        if not sh[a] or not sh[b]:
            continue
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        j = inter / union
        if j >= 0.5:
            expected[(a, b)] = round(j, 6)
    assert set(got) == set(expected)
    for k in got:
        assert abs(got[k] - expected[k]) < 1e-6


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_strategy)
def test_simhash_banding_finds_all_close_pairs(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sims = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.dedup_simhash(docs, max_hamming=3).collect()
    }
    for a, b in combinations(sorted(sims), 2):
        h = bin(sims[a] ^ sims[b]).count("1")
        if h <= 3:
            assert (a, b) in got and got[(a, b)] == h  # pigeonhole guarantee
    # and nothing below the bar sneaks in
    for (a, b), h in got.items():
        assert h <= 3 and bin(sims[a] ^ sims[b]).count("1") == h


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus_strategy)
def test_minhash_lsh_catches_identical_texts(spark, texts):
    # force at least one exact duplicate pair
    texts = list(texts) + [texts[0]]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pairs = {
        (r.doc_a, r.doc_b) for r in dedup.dedup_minhash_lsh(docs).collect()
    }
    dup = (0, len(texts) - 1)
    if _shingles(texts[0]):
        assert dup in pairs  # identical signatures share every band


# --- r4: PassJoin fuzzy-edit recall + sequence-packing invariants --------

# character soup with a narrow alphabet so ed<=2 pairs actually occur
_char_texts = st.lists(
    st.text(alphabet="abcd ", min_size=32, max_size=40),
    min_size=2,
    max_size=6,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_char_texts)
def test_passjoin_fuzzy_edit_recall_is_exact(spark, texts):
    """PassJoin blocking must find EVERY levenshtein<=2 pair on the
    32-char prefix key — the pigeonhole guarantee, vs a Python
    brute-force ground truth independent of both engines."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in dedup.dedup_fuzzy_edit(docs, key_len=32, k=2).collect()
    }
    keys = [t[:32].lower() for t in texts]
    expected = {}
    for a, b in combinations(range(len(texts)), 2):
        if len(texts[a]) < 32 or len(texts[b]) < 32:
            continue
        d = _lev(keys[a], keys[b])
        if d <= 2:
            expected[(a, b)] = d
    assert got == expected


@pytest.mark.slow
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=30).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_sequence_packing_offsets_are_contiguous(spark, texts):
    """The two-phase prefix sum must produce the same contiguous
    stream layout as a sequential scan: per group, offsets in id
    order are exactly the running token total."""
    from rag_system_vector_db_spark.operators.chunking import sequence_packing

    docs = spark.createDataFrame(
        [(i, t, "en" if i % 2 else "de") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    rows = sorted(
        sequence_packing(docs, seq_len=16, shard_size=2).collect(),
        key=lambda r: (r.lang, r.doc_id),
    )
    running: dict[str, int] = {}
    for r in rows:
        assert r.start_offset == running.get(r.lang, 0)
        running[r.lang] = r.start_offset + r.n_tokens
        assert r.first_pack == r.start_offset // 16
        assert r.last_pack == (r.start_offset + r.n_tokens - 1) // 16


# --- hot-bucket cap (VERDICT r6 "Next round #3") ---


def _docs_df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _pairs(df):
    return sorted((r[0], r[1]) for r in df.collect())


def test_hot_bucket_cap_is_identity_on_benign_corpus(spark):
    """capped ≡ uncapped when no bucket exceeds the cap — for all three
    capped operators (the property that makes the cap safe to leave on
    in production)."""
    texts = [f"alpha beta gamma delta {i} epsilon zeta" for i in range(12)] + [
        "totally different words here okay fine",
        "yet another unrelated document text body",
    ]
    docs = _docs_df(spark, texts)
    base_mh = _pairs(dedup.dedup_minhash_lsh(docs))
    assert _pairs(dedup.dedup_minhash_lsh(docs, max_bucket=10_000)) == base_mh
    base_sh = _pairs(dedup.dedup_simhash(docs))
    assert _pairs(dedup.dedup_simhash(docs, max_bucket=10_000)) == base_sh


def test_hot_bucket_cap_drops_mega_bucket_and_reports_it(spark):
    """A boilerplate clique (every doc sharing the same shingles) forms
    one mega-bucket; a cap below the clique size must kill its pairs
    entirely and the side report must name the dropped buckets with
    their true membership."""
    from pyspark.sql import functions as F

    boiler = ["lorem ipsum dolor sit amet consectetur"] * 30
    organic = [f"organic doc {i} unique text payload {i}" for i in range(3)]
    docs = _docs_df(spark, boiler + organic)

    uncapped = dedup.dedup_minhash_lsh(docs)
    assert uncapped.count() >= 30 * 29 // 2  # the clique's pair mass

    capped = dedup.dedup_minhash_lsh(docs, max_bucket=10)
    boiler_ids = set(range(30))
    for a, b in _pairs(capped):
        assert not ({a, b} <= boiler_ids), "mega-bucket pair survived the cap"

    # the report names the over-cap buckets with their membership
    b = dedup.lsh_band_buckets(
        dedup.minhash_signatures(dedup.shingle_set(docs, 3), 8), 4, 2
    )
    rep = dedup.hot_bucket_report(b, ["band", "band_sig"], 10).collect()
    assert rep and all(r.n_members == 30 for r in rep)
    assert len(rep) == 4  # the clique saturates every band


def test_knn_graph_bucket_cap_identity_and_drop(spark, sf_dir):
    """kNN-graph build: capped ≡ uncapped with a generous cap; a cap of
    1 leaves no co-bucketed candidates at all."""
    from rag_system_vector_db_spark.registry_parts.part02_index_build_diag_curation import (
        _knn_graph_edges,
    )

    base = sorted(
        (r.src, r.dst, r.rank) for r in _knn_graph_edges(spark, sf_dir).collect()
    )
    generous = sorted(
        (r.src, r.dst, r.rank)
        for r in _knn_graph_edges(spark, sf_dir, max_bucket=10_000_000).collect()
    )
    assert base == generous
    assert _knn_graph_edges(spark, sf_dir, max_bucket=1).count() == 0


def test_ngram_jaccard_cap_identity_and_clique_drop(spark):
    """Prefix-posting-list cap: identity under a generous cap; a
    boilerplate clique's shared hot shingles are dropped so its pairs
    disappear while organic near-dups survive."""
    boiler = ["the same boilerplate sentence repeated in every document"] * 25
    organic = [
        "an organic document with enough distinct words here",
        "an organic document with enough distinct words there",
    ]
    docs = _docs_df(spark, boiler + organic)
    base = _pairs(dedup.dedup_ngram_jaccard(docs, threshold=0.5))
    assert _pairs(dedup.dedup_ngram_jaccard(docs, threshold=0.5, max_bucket=10_000)) == base
    capped = _pairs(dedup.dedup_ngram_jaccard(docs, threshold=0.5, max_bucket=10))
    clique = set(range(25))
    assert all(not ({a, b} <= clique) for a, b in capped)
    assert (25, 26) in capped  # the organic near-dup pair survives


def test_with_report_returns_pairs_and_audit_together(spark):
    """ADVICE r7: the capped path must be able to EMIT its own audit.
    with_report=True returns (pairs, report) from one build; the report
    names exactly the over-cap buckets, and the pairs equal the plain
    capped call's pairs."""
    boiler = ["lorem ipsum dolor sit amet consectetur"] * 30
    organic = [f"organic doc {i} unique text payload {i}" for i in range(3)]
    docs = _docs_df(spark, boiler + organic)

    pairs, rep = dedup.dedup_minhash_lsh(docs, max_bucket=10, with_report=True)
    assert _pairs(pairs) == _pairs(dedup.dedup_minhash_lsh(docs, max_bucket=10))
    rows = rep.collect()
    assert rows and all(r.n_members == 30 for r in rows)

    pairs, rep = dedup.dedup_ngram_jaccard(
        docs, threshold=0.5, max_bucket=10, with_report=True
    )
    assert rep.count() > 0
    assert _pairs(pairs) == _pairs(
        dedup.dedup_ngram_jaccard(docs, threshold=0.5, max_bucket=10)
    )

    pairs, rep = dedup.dedup_simhash(docs, max_bucket=10, with_report=True)
    assert rep.count() > 0
    assert _pairs(pairs) == _pairs(dedup.dedup_simhash(docs, max_bucket=10))
