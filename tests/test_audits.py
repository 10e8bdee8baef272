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


def test_survival_km_invariants(spark, sf_dir):
    """KM curve: survival is non-increasing in t, each step multiplies
    by (at_risk - d)/at_risk, and the at-risk ladder conserves the
    cohort (sum of d + c over all times == initial at-risk)."""
    from rag_system_vector_db_spark.registry import QUERIES

    rows = sorted(
        QUERIES["survival_km"](spark, sf_dir).collect(), key=lambda r: r.t_day
    )
    assert rows, "empty lifetable"
    assert rows[0].n_at_risk == sum(r.n_events + r.n_censored for r in rows)
    s = 1.0
    prev = 1.0 + 1e-12
    for r in rows:
        s *= (r.n_at_risk - r.n_events) / r.n_at_risk
        assert abs(r.survival - round(s, 6)) < 1e-9, (r.t_day, r.survival, s)
        assert r.survival <= prev + 1e-9
        prev = r.survival


def test_holt_forecast_matches_python_recursion(spark, sf_dir):
    """The ordered-fold Holt fit must equal the sequential pure-Python
    recursion on the same monthly revenue series."""
    import duckdb

    from rag_system_vector_db_spark.registry import QUERIES

    con = duckdb.connect()
    ys = [
        r[0]
        for r in con.sql(
            f"""
        SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS y
        FROM read_parquet('{sf_dir}/orders.parquet')
        GROUP BY (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
        ORDER BY (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
        """
        ).fetchall()
    ]
    con.close()
    lvl, tr = ys[0], 0.0
    for y in ys[1:]:
        nl = 0.5 * y + 0.5 * (lvl + tr)
        tr = 0.3 * (nl - lvl) + 0.7 * tr
        lvl = nl
    out = {r.horizon: r for r in QUERIES["holt_forecast"](spark, sf_dir).collect()}
    assert out[1].n_months == len(ys)
    for h in (1, 2, 3):
        assert abs(out[h].forecast - round(lvl + h * tr, 6)) < 1e-9
        assert out[h].level_end == round(lvl, 6)
        assert out[h].trend_end == round(tr, 6)


def test_bootstrap_ci_brackets_point_mean(spark, sf_dir):
    """Poisson bootstrap: the CI must bracket the point estimate and
    the bootstrap SE must be positive and small relative to the mean."""
    from rag_system_vector_db_spark.registry import QUERIES

    r = QUERIES["bootstrap_ci"](spark, sf_dir).first()
    assert r.ci_lo <= r.point_mean <= r.ci_hi
    assert 0 < r.boot_se < r.point_mean


def test_partition_plan_total_conserved(spark, sf_dir):
    """Every candidate partition plan must account for every row, and
    skew ratio is >= 1 by construction."""
    from rag_system_vector_db_spark.registry import QUERIES

    rows = QUERIES["partition_plan_sim"](spark, sf_dir).collect()
    totals = {r.total_rows for r in rows}
    assert len(totals) == 1
    for r in rows:
        assert r.buckets_used <= r.plan_partitions
        assert r.skew_ratio >= 1.0
        assert r.max_bucket_rows <= r.total_rows


def test_chi_square_contrib_sums_to_chi2(spark, sf_dir):
    from rag_system_vector_db_spark.registry import QUERIES

    rows = QUERIES["chi_square_independence"](spark, sf_dir).collect()
    chi2 = {r.chi2 for r in rows}
    assert len(chi2) == 1
    assert abs(sum(r.contribution for r in rows) - chi2.pop()) < 1e-3
    # observed totals equal n via expected: sum(expected) ~ n
    n = sum(r.observed for r in rows)
    assert abs(sum(r.expected for r in rows) - n) < 0.01


def test_brier_decomposition_identity(spark, sf_dir):
    """Murphy identity: brier ~= reliability - resolution + uncertainty
    (within binning/rounding tolerance)."""
    from rag_system_vector_db_spark.registry import QUERIES

    r = QUERIES["brier_decomposition"](spark, sf_dir).first()
    assert r.brier >= 0
    lhs = r.brier
    rhs = r.reliability - r.resolution + r.uncertainty
    # within-bin variance of p makes this approximate; tolerance is
    # the standard decomposition slack for 10 bins
    assert abs(lhs - rhs) < 0.02
    assert 0 <= r.uncertainty <= 0.25


def test_pr_curve_monotone_recall(spark, sf_dir):
    """Recall must be non-increasing as the threshold rises."""
    from rag_system_vector_db_spark.registry import QUERIES

    rows = sorted(
        QUERIES["classifier_pr_curve"](spark, sf_dir).collect(), key=lambda r: r.tau
    )
    recalls = [r.recall for r in rows if r.recall is not None]
    assert all(a >= b - 1e-9 for a, b in zip(recalls, recalls[1:]))
