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


def test_stratified_sample_rates_and_strata(spark, sf_dir):
    from rag_system_vector_db_spark.operators.sketch import (
        hash_sample,
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    s = stratified_sample(docs, "lang", "doc_id", {"en": 1.0, "de": 0.0})
    langs = {r.lang for r in s.select("lang").distinct().collect()}
    assert langs == {"en"}  # de sampled at 0, others dropped entirely
    n_en = docs.filter(F.col("lang") == "en").count()
    assert s.count() == n_en  # rate 1.0 keeps every row
    # stratum at rate r matches the plain hash_sample at r on that stratum
    s2 = stratified_sample(docs, "lang", "doc_id", {"fr": 0.2})
    plain = hash_sample(docs.filter(F.col("lang") == "fr"), "doc_id", 0.2)
    assert {r.doc_id for r in s2.collect()} == {r.doc_id for r in plain.collect()}


def test_dedup_cluster_transitivity(spark):
    """Chains must collapse to one cluster keyed by the min id, and
    separate components must stay separate."""
    from rag_system_vector_db_spark.operators.dedup import dedup_cluster

    # chain 1-2-3-4 (transitive, never directly paired 1-4), pair 9-7,
    # and a long path 10..15 to exercise multiple propagation rounds
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 7), (10, 11), (11, 12), (12, 13), (13, 14), (14, 15)],
        "doc_a long, doc_b long",
    )
    got = {r.node: (r.cluster_id, r.is_keeper) for r in dedup_cluster(pairs).collect()}
    assert {n for n, (c, _) in got.items() if c == 1} == {1, 2, 3, 4}
    assert {n for n, (c, _) in got.items() if c == 7} == {7, 9}
    assert {n for n, (c, _) in got.items() if c == 10} == set(range(10, 16))
    keepers = {n for n, (_, k) in got.items() if k}
    assert keepers == {1, 7, 10}


def test_label_centroids_matches_numpy(spark, sf_dir):
    import numpy as np

    from rag_system_vector_db_spark.operators.embedding import label_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(np.array(r.embedding, dtype=np.float64))
    got = label_centroids(emb).collect()
    for r in got:
        mat = np.stack(by_label[r.label])
        assert r.n == len(mat)
        assert abs(r.mean_val - round(float(mat[:, r.pos].mean()), 6)) < 2e-6


def test_hll_oracles_match_in_raw_harmonic_regime(spark, tmp_path):
    """r6 regression (caught by the sf1 parity gate): at every gate sf
    the HLL estimate rides the linear-counting branch, which depends
    only on register PRESENCE — so a broken rho fill in an oracle is
    invisible. This test builds a synthetic events table with enough
    distinct users (4000 >> 2.5m=640) that every scope/window lands in
    the raw harmonic branch, then requires full cross-engine parity
    for both register-merging entries AND agreement with a pure-Python
    HLL ground truth."""
    import hashlib
    import math

    import pandas as pd

    sys_path_dir = str(tmp_path)
    n_users, n_days = 4000, 10
    rows = []
    for u in range(n_users):
        day = u % n_days
        rows.append(
            (
                u,
                pd.Timestamp("2024-01-01") + pd.Timedelta(days=day, minutes=u % 60),
                u,
                ["click", "view", "purchase"][u % 3],
                float(u % 7),
                "{}",
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # micros, not pandas-default nanos: Spark rejects TIMESTAMP(NANOS)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(f"{sys_path_dir}/events.parquet")

    # pure-Python ground truth for the global sketch
    regs: dict[int, int] = {}
    for u in range(n_users):
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        idx, w = h >> 52, h & ((1 << 52) - 1)
        for k in (1, 2, 4, 8, 16, 32):
            w |= w >> k
        regs[idx] = max(regs.get(idx, 0), 53 - bin(w).count("1"))
    scale = 1 << 53
    n_zero = 256 - len(regs)
    e_raw = (
        (0.7213 / (1 + 1.079 / 256))
        * 65536.0
        * float(scale)
        / (sum(1 << (53 - m) for m in regs.values()) + n_zero * scale)
    )
    assert e_raw > 640.0  # the regime this test exists to pin
    expected = round(e_raw, 6) if not (e_raw <= 640.0 and n_zero > 0) else round(
        256.0 * math.log(256.0 / n_zero), 6
    )

    import duckdb

    from oracle import compare

    from rag_system_vector_db_spark.registry import ORACLES, QUERIES

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sys_path_dir}/events.parquet')"
    )
    for name in ("hll_distinct", "hll_merge_rollup", "sliding_window_hll"):
        sdf = QUERIES[name](spark, sys_path_dir)
        compare(sdf, con, ORACLES[name])
    # and the merged/direct/global estimates equal the Python sketch
    got = {
        r.scope: r.ndv_est
        for r in QUERIES["hll_merge_rollup"](spark, sys_path_dir).collect()
    }
    assert got["merged"] == got["direct"] == expected
