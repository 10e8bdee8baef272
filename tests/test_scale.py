"""Plan-asserted scale patterns: bucketed joins must drop their
exchanges; salted joins must spread the key while preserving results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_system_vector_db_spark.plans import scale
from rag_system_vector_db_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # spark.sql.warehouse.dir is a static conf; tables land in the
    # default ./spark-warehouse, dropped (PURGE removes files) below.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    scale.write_bucketed(emb.select("vec_id", "label"), "emb_meta_b", "vec_id", 4)
    scale.write_bucketed(emb.select("vec_id", "embedding"), "emb_vec_b", "vec_id", 4)
    yield "emb_meta_b", "emb_vec_b"
    spark.sql("DROP TABLE IF EXISTS emb_meta_b PURGE")
    spark.sql("DROP TABLE IF EXISTS emb_vec_b PURGE")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = scale.bucketed_join(spark, left, right, "vec_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        # co-located bucketed scans: no shuffle exchange on either side
        assert "Exchange hashpartitioning" not in plan
        # and it's still correct
        n = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        assert joined.count() == n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join off raw parquet needs two exchanges."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = emb.select("vec_id", "label").join(
            emb.select("vec_id", "embedding"), "vec_id"
        )
        assert "Exchange hashpartitioning" in _plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salted_join_equals_plain_join(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = ev.select("event_type").distinct().withColumn(
        "type_tag", F.upper("event_type")
    )
    plain = ev.join(dim, "event_type")
    salted = scale.salted_join(ev, dim, "event_type", salt=4)
    assert salted.count() == plain.count()
    a = {(r.event_id, r.type_tag) for r in salted.collect()}
    b = {(r.event_id, r.type_tag) for r in plain.collect()}
    assert a == b


def test_salted_join_spreads_key(spark, sf_dir):
    """The exchange must partition on (key, salt), not key alone, and
    every salt value must actually occur."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    dim = ev.select("event_type").distinct().withColumn(
        "type_tag", F.upper("event_type")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salted = scale.salted_join(ev, dim, "event_type", salt=4)
        plan = _plan(salted)
        assert "_salt" in plan and "Exchange hashpartitioning" in plan
        fact_salts = (
            ev.withColumn(
                "_salt",
                F.pmod(
                    F.xxhash64(*[F.col(c) for c in ev.columns]), F.lit(4)
                ).cast("int"),
            )
            .select("_salt")
            .distinct()
            .count()
        )
        assert fact_salts == 4
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
