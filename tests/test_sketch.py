"""Sketch/sampling operators: estimator sanity and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_system_vector_db_spark.operators import sketch
from rag_system_vector_db_spark.sources import load_table


def test_kmv_estimate_within_bound(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    row = sketch.kmv_distinct(ev, "user_id", k=32).first()
    assert row.k == 32
    assert row.ndv_exact == ev.select("user_id").distinct().count()
    # KMV std error ~ 1/sqrt(k-2) ≈ 18% at k=32; allow 3 sigma
    assert row.rel_err < 0.55


def test_kmv_exact_when_ndv_below_k(spark, sf_dir):
    """With fewer distinct keys than k the sketch holds every hash and
    must return the exact count."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    row = sketch.kmv_distinct(ev, "user_id", k=32).first()
    assert row.ndv_est == float(row.ndv_exact)
    assert row.rel_err == 0.0


def test_hash_sample_rate_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    s1 = sketch.hash_sample(docs, "doc_id", 0.2)
    got = s1.count()
    # binomial(n, .2) within 5 sigma
    import math

    sigma = math.sqrt(n * 0.2 * 0.8)
    assert abs(got - 0.2 * n) < 5 * sigma
    # deterministic: same rows every run
    a = {r.doc_id for r in s1.collect()}
    b = {r.doc_id for r in sketch.hash_sample(docs, "doc_id", 0.2).collect()}
    assert a == b
    # nested property: a 10% sample is a subset of the 20% sample
    c = {r.doc_id for r in sketch.hash_sample(docs, "doc_id", 0.1).collect()}
    assert c <= a
