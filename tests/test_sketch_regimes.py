"""Regime-crossing regression tests for every estimator family —
the generalized HLL lesson (VERDICT r6 "Next round #5").

The r6 sf1 sweep caught an oracle bug (HLL rho register-fill) that was
invisible at every gate scale because small corpora ride the
linear-counting branch. The same blind spot exists for every estimator
with a correction/branch boundary: the gate only ever exercises ONE
side. Each test here builds two synthetic fixtures that land on
OPPOSITE sides of the family's regime switch, requires full
cross-engine parity (the driver-faithful compare) on BOTH, and asserts
the branch-specific behavior so the fixture can't silently drift into
a single regime:

- KMV (kmv_set_ops): sketch-not-full small-range correction
  (NDV < k -> exact count) vs full-sketch (k-1)/h_k estimator.
- Count-Min (cms_heavy_hitters): collision-free sparse grid
  (overestimate == 0) vs saturated grid (NDV >> width -> one-sided
  overestimates).
- CountSketch (count_sketch_estimate): sparse grid (signed_err == 0)
  vs saturated grid (two-sided nonzero errors).
- Equi-width histogram quantiles (histogram_quantile_sketch):
  degenerate single-bin distribution (width=1, the integer
  interpolation's target==cnt overshoot edge) vs wide spread
  (abs_err bounded by one bin width).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from oracle import compare

from rag_system_vector_db_spark.registry import ORACLES, QUERIES

EV_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _write_events(path, rows) -> None:
    pdf = pd.DataFrame(rows, columns=EV_COLS)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark rejects TIMESTAMP(NANOS)
    pdf.to_parquet(f"{path}/events.parquet")


def _write_documents(path, texts) -> None:
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["synthetic"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(f"{path}/documents.parquet")


def _con(path, table) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM read_parquet('{path}/{table}.parquet')"
    )
    return con


def _ev_row(i, user, etype, value):
    return (
        i,
        pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
        user,
        etype,
        value,
        "{}",
    )


# --- fixtures: one events corpus per side of the regime switches ---


@pytest.fixture(scope="module")
def sparse_events(tmp_path_factory):
    """20 users, constant value per type: KMV sketches not full
    (NDV=20 < k=32), CountSketch/CMS grids collision-free, histogram
    degenerate (mn == mx per type -> width=1, single bin)."""
    p = str(tmp_path_factory.mktemp("sparse_ev"))
    rows = []
    i = 0
    for u in range(20):
        for etype, val in (("click", 1.0), ("view", 2.0), ("purchase", 3.0)):
            rows.append(_ev_row(i, u, etype, val))
            i += 1
    _write_events(p, rows)
    return p


@pytest.fixture(scope="module")
def dense_events(tmp_path_factory):
    """4000 users with a wide deterministic value spread: KMV sketches
    full (NDV >> 32), CountSketch buckets hold ~16 keys each (256
    buckets), histogram spans its full 64 bins."""
    p = str(tmp_path_factory.mktemp("dense_ev"))
    rows = []
    i = 0
    for u in range(4000):
        etype = ["click", "view", "purchase"][u % 3]
        rows.append(_ev_row(i, u, etype, float((u * 37) % 10007) / 7.0))
        i += 1
        if u % 2 == 0:  # half the users act twice -> skewed frequencies
            rows.append(_ev_row(i, u, "click" if u % 3 else "purchase", float(u % 97)))
            i += 1
    _write_events(p, rows)
    return p


# --- KMV small-range correction vs full-sketch estimator ---


def test_kmv_set_ops_small_range_regime(spark, sparse_events):
    con = _con(sparse_events, "events")
    compare(QUERIES["kmv_set_ops"](spark, sparse_events), con, ORACLES["kmv_set_ops"])
    r = QUERIES["kmv_set_ops"](spark, sparse_events).collect()[0]
    # regime pin: sketches not full -> the exact-count branch must fire
    assert r.exact_a < 32 and r.exact_b < 32 and r.exact_union < 32
    assert r.est_a == float(r.exact_a)
    assert r.est_b == float(r.exact_b)
    assert r.est_union == float(r.exact_union)


def test_kmv_set_ops_full_sketch_regime(spark, dense_events):
    con = _con(dense_events, "events")
    compare(QUERIES["kmv_set_ops"](spark, dense_events), con, ORACLES["kmv_set_ops"])
    r = QUERIES["kmv_set_ops"](spark, dense_events).collect()[0]
    # regime pin: every sketch is full -> the (k-1)/h_k estimator fires
    assert r.exact_a > 32 and r.exact_b > 32 and r.exact_union > 32
    assert r.est_a != float(r.exact_a)  # estimator, not a count
    # KMV k=32 stderr ~ 1/sqrt(30) ~= 18%; 60% is a loose determinism-safe band
    for est, exact in ((r.est_a, r.exact_a), (r.est_b, r.exact_b), (r.est_union, r.exact_union)):
        assert abs(est - exact) / exact < 0.6, (est, exact)


# --- Count-Min: collision-free vs saturated (one-sided errors) ---


def test_cms_sparse_grid_regime(spark, tmp_path):
    p = str(tmp_path)
    # 20 distinct terms over a 4x256 grid: no term collides in all 4 rows
    _write_documents(p, [f"tok{i % 20} tok{(i + 1) % 20}" for i in range(200)])
    con = _con(p, "documents")
    compare(QUERIES["cms_heavy_hitters"](spark, p), con, ORACLES["cms_heavy_hitters"])
    rows = QUERIES["cms_heavy_hitters"](spark, p).collect()
    assert rows and all(r.overestimate == 0 for r in rows)


def test_cms_saturated_grid_regime(spark, tmp_path):
    p = str(tmp_path)
    # 5000 distinct terms >> 256 buckets: every row of the grid is
    # saturated, so the top-10 estimates absorb collision mass
    texts = [f"hot{i % 7} uniq{i} uniq{i + 5000} uniq{i + 10000}" for i in range(5000)]
    _write_documents(p, texts)
    con = _con(p, "documents")
    compare(QUERIES["cms_heavy_hitters"](spark, p), con, ORACLES["cms_heavy_hitters"])
    rows = QUERIES["cms_heavy_hitters"](spark, p).collect()
    assert all(r.overestimate >= 0 for r in rows), "CMS must stay one-sided"
    assert any(r.overestimate > 0 for r in rows), "fixture failed to saturate the grid"


# --- CountSketch: sparse (exact) vs saturated (two-sided errors) ---


def test_count_sketch_sparse_regime(spark, sparse_events):
    con = _con(sparse_events, "events")
    compare(
        QUERIES["count_sketch_estimate"](spark, sparse_events),
        con,
        ORACLES["count_sketch_estimate"],
    )
    rows = QUERIES["count_sketch_estimate"](spark, sparse_events).collect()
    assert rows and all(r.signed_err == 0 for r in rows)


def test_count_sketch_saturated_regime(spark, dense_events):
    con = _con(dense_events, "events")
    compare(
        QUERIES["count_sketch_estimate"](spark, dense_events),
        con,
        ORACLES["count_sketch_estimate"],
    )
    rows = QUERIES["count_sketch_estimate"](spark, dense_events).collect()
    assert any(r.signed_err != 0 for r in rows), "fixture failed to saturate the grid"
    # unlike CMS, collision noise is signed: the median-of-4 reads can
    # land on either side of the true count
    assert any(r.signed_err < 0 for r in rows) or any(r.signed_err > 0 for r in rows)


# --- histogram quantiles: single-bin degenerate vs full-span spread ---


def test_histogram_quantile_degenerate_bin_regime(spark, sparse_events):
    con = _con(sparse_events, "events")
    compare(
        QUERIES["histogram_quantile_sketch"](spark, sparse_events),
        con,
        ORACLES["histogram_quantile_sketch"],
    )
    rows = QUERIES["histogram_quantile_sketch"](spark, sparse_events).collect()
    # mn == mx -> width = 1 micro-unit; the integer interpolation's only
    # possible error is the target==cnt overshoot edge (one width)
    assert rows and all(r.abs_err <= 1e-6 for r in rows)
    assert all(r.approx >= r.exact for r in rows)


def test_histogram_quantile_spread_regime(spark, dense_events):
    con = _con(dense_events, "events")
    compare(
        QUERIES["histogram_quantile_sketch"](spark, dense_events),
        con,
        ORACLES["histogram_quantile_sketch"],
    )
    rows = QUERIES["histogram_quantile_sketch"](spark, dense_events).collect()
    # spread regime: values span many bins; approx must stay within one
    # bin width of the exact selection quantile
    spread = 10006.0 / 7.0  # fixture value range
    width = (spread * 1e6) // 64 + 1
    assert rows and all(r.abs_err <= width / 1e6 + 1e-9 for r in rows)
    assert any(r.abs_err > 0 for r in rows), "fixture degenerated to exact"
