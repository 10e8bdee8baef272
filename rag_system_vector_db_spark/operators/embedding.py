"""Deterministic text embedder — the Spark stand-in for the reference's
SentenceTransformer("Snowflake/snowflake-arctic-embed-s") with
``normalize_embeddings=True`` (prepare_data.py:50, app.py:55).

The real model isn't in this container, so the embedder is a
feature-hashing encoder: every token contributes a deterministic
pseudo-random Gaussian vector (seeded from md5(token)); the document
vector is the normalized token-vector sum. Properties preserved from
the reference: fixed dim, unit norm, determinism, and shared-token
similarity structure. Swap ``_token_vec`` for a real model's
``encode`` to go to production — the Spark plumbing is identical.

Execution: Arrow-batched pandas_udf (vectorized, ~10-100× over
row-at-a-time UDFs); embarrassingly parallel per input split at
cluster scale — no shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DIM = 64


def _token_vec(token: str, dim: int = DIM) -> np.ndarray:
    seed = int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:4], "big")
    return np.random.default_rng(seed).standard_normal(dim)


def embed_text_py(text: str, dim: int = DIM) -> np.ndarray:
    """Driver-side single-text embedding (question path, app.py:55)."""
    v = np.zeros(dim)
    for tok in text.split(" "):
        if tok:
            v += _token_vec(tok, dim)
    n = float(np.linalg.norm(v))
    if n > 0:
        v /= n
    return v.astype(np.float32)


# DataType object (not a DDL string) so the decorator doesn't need an
# active SparkSession at import time.
@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_udf(texts: pd.Series) -> pd.Series:
    cache: dict[str, np.ndarray] = {}
    out = []
    for text in texts:
        v = np.zeros(DIM)
        for tok in (text or "").split(" "):
            if not tok:
                continue
            tv = cache.get(tok)
            if tv is None:
                tv = cache[tok] = _token_vec(tok)
            v += tv
        n = float(np.linalg.norm(v))
        if n > 0:
            v /= n
        out.append(v.astype(np.float32))
    return pd.Series(out)


def embed_documents(
    docs: DataFrame, text_col: str = "text", out_col: str = "embedding"
) -> DataFrame:
    """Batch index build: attach a normalized embedding column."""
    return docs.withColumn(out_col, embed_udf(F.col(text_col)))


def label_centroids(
    vectors: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid, one (label, pos, mean_val) row per dimension
    — the class-prototype / cluster-summary aggregation (and the bulk
    step of a k-means round).

    posexplode + groupBy(label, pos) keeps the whole thing a single
    map-side-combinable shuffle of primitive doubles; no vector UDAF,
    no driver collection. Rebuild arrays downstream with
    sort_array(collect_list(struct(pos, mean_val))) if needed.
    """
    ex = vectors.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    return ex.groupBy(label_col, "pos").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("v"), 6).alias("mean_val"),
    )
