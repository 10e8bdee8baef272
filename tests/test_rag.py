"""End-to-end RAG pipeline (reference tests/test_app.py analog)."""

from __future__ import annotations

from rag_system_vector_db_spark.operators.rag import LLMStub, rag_query


def test_rag_query_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = rag_query(spark, docs, "spark join performance tuning", k=3)
    assert set(res) == {"response", "context", "source_ids", "success"}
    assert res["success"] is True
    assert len(res["context"]) == 3
    assert len(res["source_ids"]) == 3
    assert res["response"]  # stub answer is non-empty
    # deterministic across runs
    res2 = rag_query(spark, docs, "spark join performance tuning", k=3)
    assert res2["source_ids"] == res["source_ids"]


def test_llm_stub_no_context():
    assert LLMStub.generate_response("q", []).startswith("Could not find")
    assert LLMStub.eval_grade(None) == 0.0
    assert LLMStub.eval_grade(1) == 1.0
    assert LLMStub.eval_grade(4) == 0.25
