"""VectorCollection: the milvus_db.py ZillizClient surface on parquet."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_system_vector_db_spark.operators.vector_store import (
    VectorCollection,
    list_collections,
)


@pytest.fixture()
def coll(spark, sf_dir, tmp_path):
    c = VectorCollection.create(
        spark, str(tmp_path / "coll"), dimension=64,
        primary_field="vec_id", vector_field="embedding",
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    c.insert(emb)
    return c, emb


def test_stats_and_roundtrip(coll):
    c, emb = coll
    st = c.stats()
    assert st["rowCount"] == emb.count()
    assert st["dimension"] == 64 and st["metricType"] == "cosine"


def test_query_filter_projection_limit(coll):
    c, _ = coll
    out = c.query(filter="label = 3", output_fields=["vec_id", "label"], limit=5)
    rows = out.collect()
    assert len(rows) <= 5
    assert out.columns == ["vec_id", "label"]
    assert all(r.label == 3 for r in rows)


def test_get_by_ids(coll):
    c, _ = coll
    ids = [0, 2, 4]
    got = sorted(r.vec_id for r in c.get_by_ids(ids).collect())
    assert got == ids


def test_upsert_last_write_wins(coll, spark):
    c, emb = coll
    patch = emb.filter(F.col("vec_id") < 3).withColumn("label", F.lit(999))
    c.insert(patch)
    labels = {r.vec_id: r.label for r in c.get_by_ids([0, 1, 2, 3]).collect()}
    assert labels[0] == labels[1] == labels[2] == 999
    assert labels[3] != 999
    assert c.df().groupBy("vec_id").count().filter("count > 1").count() == 0


def test_scan_pagination(coll):
    c, emb = coll
    seen = []
    for batch in c.scan(batch_size=7):
        assert len(batch) <= 7
        seen.extend(r.vec_id for r in batch)
    assert seen == sorted(seen)
    assert len(seen) == emb.count()


def test_list_collections(spark, tmp_path):
    VectorCollection.create(spark, str(tmp_path / "a"), dimension=8)
    VectorCollection.create(spark, str(tmp_path / "b"), dimension=16, metric="dot")
    (tmp_path / "not_a_collection").mkdir()
    got = list_collections(str(tmp_path))
    assert [c["collectionName"] for c in got] == ["a", "b"]
    assert got[0]["dimension"] == 8 and got[1]["metricType"] == "dot"


def test_compact_preserves_resolved_view(coll, spark):
    c, emb = coll
    patch = emb.filter(F.col("vec_id") < 2).withColumn("label", F.lit(777))
    c.insert(patch)
    before = {(r.vec_id, r.label) for r in c.df().select("vec_id", "label").collect()}
    c.compact()
    after = {(r.vec_id, r.label) for r in c.df().select("vec_id", "label").collect()}
    assert before == after


def test_search_matches_bruteforce(coll, spark):
    c, emb = coll
    qv = [float(x) for x in emb.filter("vec_id = 1").first()["embedding"]]
    hits = c.search(qv, limit=3).collect()
    assert hits[0]["vec_id"] == 1  # self is the nearest under cosine
    assert abs(hits[0]["score"] - 1.0) < 1e-9
