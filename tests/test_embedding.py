"""Embedder contract (reference tests/model_test.py analog): fixed dim,
unit norm, determinism, token-overlap similarity structure."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rag_system_vector_db_spark.operators.embedding import (
    DIM,
    embed_documents,
    embed_text_py,
)


def test_driver_side_embedding_properties():
    v1 = embed_text_py("spark join performance")
    v2 = embed_text_py("spark join performance")
    v3 = embed_text_py("completely different words here")
    assert v1.shape == (DIM,)
    assert np.allclose(v1, v2)  # deterministic
    assert abs(float(np.linalg.norm(v1)) - 1.0) < 1e-6  # unit norm
    overlap = float(np.dot(v1, embed_text_py("spark join tuning")))
    disjoint = float(np.dot(v1, v3))
    assert overlap > disjoint  # shared tokens → higher similarity


def test_distributed_matches_driver(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    out = embed_documents(docs).select("doc_id", "text", "embedding").collect()
    for r in out:
        expected = embed_text_py(r.text)
        assert np.allclose(np.array(r.embedding), expected, atol=1e-6)
        assert abs(float(np.linalg.norm(r.embedding)) - 1.0) < 1e-5


def test_empty_text(spark):
    df = spark.createDataFrame([(1, "")], "id long, text string")
    row = embed_documents(df).first()
    assert len(row.embedding) == DIM
    assert all(x == 0.0 for x in row.embedding)  # zero vector, no NaN
