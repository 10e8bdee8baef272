"""PySpark-native analytics/vector engine with the query and
data-processing capabilities of fredcaixeta/rag_system_vector_db.

Spark-first re-expression of the reference RAG system's surface
(chunking, embedding, vector-store ops, cosine retrieval, eval) plus
the LLM-training-data pipeline operators (dedup, ANN, text analysis,
multimodal) designed for 100 TB scale.
"""

__version__ = "0.1.0"
