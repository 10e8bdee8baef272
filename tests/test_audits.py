"""Invariant tests for the split-audit / smoothing / sample-generation
operators: properties the oracle hash can't express directly (bounds,
disjointness, closed-form counts)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rag_system_vector_db_spark.registry import QUERIES


def test_train_test_split_partitions_each_source(spark, sf_dir):
    rows = QUERIES["train_test_split"](spark, sf_dir).collect()
    per_source: dict[str, float] = {}
    for r in rows:
        per_source[r.source] = per_source.get(r.source, 0.0) + r.source_share
    # shares within each source sum to 1 (disjoint + exhaustive)
    for src, tot in per_source.items():
        assert abs(tot - 1.0) < 1e-5, src
    assert {r.split for r in rows} <= {"train", "valid", "test"}
    # the 90/5/5 target: train dominates every source
    train = {r.source: r.n_docs for r in rows if r.split == "train"}
    other = {}
    for r in rows:
        if r.split != "train":
            other[r.source] = other.get(r.source, 0) + r.n_docs
    for src in train:
        assert train[src] > other.get(src, 0)


def test_temporal_split_no_future_leakage(spark, sf_dir):
    rows = QUERIES["temporal_split"](spark, sf_dir).collect()
    train_max = max(r.max_ts_ns for r in rows if r.split == "train")
    test_min = min(r.min_ts_ns for r in rows if r.split == "test")
    assert train_max < test_min


def test_token_entropy_bounds(spark, sf_dir):
    rows = QUERIES["token_entropy"](spark, sf_dir).collect()
    for r in rows:
        assert -1e-6 <= r.entropy <= math.log(r.n_tokens) + 1e-6
        assert -1e-6 <= r.norm_entropy <= 1.0 + 1e-6
        # all-distinct docs hit the maximum exactly
        if r.n_uniq == r.n_tokens and r.n_tokens > 1:
            assert abs(r.norm_entropy - 1.0) < 1e-5


def test_events_ewma_within_series_range(spark, sf_dir):
    df = QUERIES["events_ewma"](spark, sf_dir)
    bad = df.groupBy("event_type").agg(
        F.min("v_u").alias("lo"), F.max("v_u").alias("hi")
    ).join(df, "event_type").filter(
        (F.col("ewma") < F.col("lo") / 1e6 - 1e-6)
        | (F.col("ewma") > F.col("hi") / 1e6 + 1e-6)
    )
    assert bad.count() == 0  # convex combination stays in range


def test_skipgram_pair_count_closed_form(spark, sf_dir):
    rows = QUERIES["skipgram_pairs"](spark, sf_dir).limit(50).collect()
    for r in rows:
        n = r.n_tokens
        if n >= 4:
            assert r.n_pairs == 4 * n - 6  # ±2 window boundary losses
        assert len(r.neg_text.split(";")) == n


def test_rfm_segments_quintiles_consistent(spark, sf_dir):
    rows = QUERIES["rfm_segments"](spark, sf_dir).collect()
    for r in rows:
        assert r.segment == f"{r.r_q}{r.f_q}{r.m_q}"
        assert 1 <= r.r_q <= 5 and 1 <= r.f_q <= 5 and 1 <= r.m_q <= 5
    # quintiles balanced within ±1 of n/5
    n = len(rows)
    for col in ("r_q", "f_q", "m_q"):
        for q in range(1, 6):
            c = sum(1 for r in rows if getattr(r, col) == q)
            assert abs(c - n / 5) <= 1


def test_soft_dedup_weights_mass_equals_clusters(spark, sf_dir):
    rows = QUERIES["soft_dedup_weights"](spark, sf_dir).collect()
    # Σ 1/|cluster| over members = number of effective documents =
    # number of distinct clusters (incl. singletons)
    total_weight = sum(r.weight for r in rows)
    from collections import Counter

    sizes = Counter(r.cluster_size for r in rows)
    eff = sum(cnt / sz for sz, cnt in sizes.items())
    assert abs(total_weight - eff) < 1e-3


def test_cms_one_sided_guarantee(spark, sf_dir):
    rows = QUERIES["cms_heavy_hitters"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_est >= r.exact  # CMS can only overestimate
        assert r.overestimate == r.cms_est - r.exact
