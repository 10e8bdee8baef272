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

from ..sources.tables import duck_parquet_path as _duck_path

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


# The documented swap point, made mechanical: any batch encoder
# (list[str] -> (n, dim) float array) becomes the Arrow-batched UDF.
# sentence_transformer_encoder() below wires the reference's real
# model (Snowflake/snowflake-arctic-embed-s, prepare_data.py:50)
# through the SAME plumbing when its wheel is present — the gated
# smoke test in tests/test_embedding.py proves the swap works where
# the wheel exists (same posture as sources/pdf.py's pypdf gate).
# Wheel detection without importing the package: sentence-transformers
# pulls in torch at import time (multi-second startup), which would tax
# every session/bench run that never uses the real encoder.
import importlib.util as _ilu

_HAVE_ST = _ilu.find_spec("sentence_transformers") is not None


def make_embed_udf(encode_batch, dim: int = DIM):
    """Wrap a batch text encoder (list[str] -> (n, dim) array) as an
    Arrow-batched pandas_udf. The encoder is serialized to executors,
    so it must be picklable (SentenceTransformer models are; they load
    lazily per worker on first batch)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _udf(texts: pd.Series) -> pd.Series:
        # Zero-row Arrow batches are legal; real encoders return a 1-D
        # empty array for [] which would fail the shape check below.
        if len(texts) == 0:
            return pd.Series([], dtype=object)
        vecs = np.asarray(encode_batch([t or "" for t in texts]), dtype=np.float32)
        if vecs.ndim != 2 or vecs.shape[1] != dim:
            raise ValueError(f"encoder returned shape {vecs.shape}, want (n, {dim})")
        return pd.Series(list(vecs))

    return _udf


def sentence_transformer_encoder(model_name: str = "Snowflake/snowflake-arctic-embed-s"):
    """Real-model batch encoder (wheel-gated). Returns (encode_batch,
    dim); raises ImportError where sentence-transformers is absent."""
    from sentence_transformers import SentenceTransformer

    model = SentenceTransformer(model_name)
    dim = model.get_sentence_embedding_dimension()

    def encode_batch(texts):
        return model.encode(list(texts), normalize_embeddings=True)

    return encode_batch, dim


def embed_documents(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    encoder=None,
    dim: int = DIM,
) -> DataFrame:
    """Batch index build: attach a normalized embedding column.

    ``encoder=None`` -> the deterministic feature-hashing stand-in;
    pass ``encoder=encode_batch`` (e.g. from
    ``sentence_transformer_encoder()``) to run a real model through
    identical Arrow-batched, shuffle-free plumbing."""
    if encoder is None:
        return docs.withColumn(out_col, embed_udf(F.col(text_col)))
    return docs.withColumn(out_col, make_embed_udf(encoder, dim)(F.col(text_col)))


def pca_fit_sample(
    sf_dir: str,
    n_components: int = 2,
    sample_limit: int = 4096,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[float], list[list[float]]]:
    """Fit a PCA basis on a bounded deterministic sample, driver-side
    in numpy — the same posture as ann.kmeans_fit_sample: dimensionality
    models train on an O(100k) subsample regardless of corpus size, the
    projection then applies to every vector via broadcast literals.
    Reads the first ``sample_limit`` vectors by id straight from
    parquet (KB-to-MB scale, no Spark job), float64 eigh, components
    sign-fixed so each one's largest-|loading| entry is positive —
    fully reproducible, so the basis can be inlined as SQL literals
    into a DuckDB oracle exactly like LSH planes / IVF centroids.
    Returns (mean, components[n_components][dim])."""
    import duckdb

    rel = duckdb.sql(
        f"SELECT {id_col}, {vec_col} FROM read_parquet('{_duck_path(sf_dir, table)}') "
        f"ORDER BY {id_col} LIMIT {sample_limit}"
    )
    x = np.array([list(r[1]) for r in rel.fetchall()], dtype=np.float64)
    mu = x.mean(axis=0)
    xc = x - mu
    _, vecs = np.linalg.eigh(xc.T @ xc)  # ascending eigenvalues
    comps = []
    for i in range(1, n_components + 1):
        v = vecs[:, -i]
        if v[int(np.abs(v).argmax())] < 0:
            v = -v
        comps.append([float(c) for c in v])
    return [float(m) for m in mu], comps


def pca_project(
    vectors: DataFrame,
    mean: list[float],
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto a fitted PCA basis — the 2-D/low-D
    map used for corpus visualization and density-based curation.

    pc_i = dot(vec, comp_i) - dot(mean, comp_i): the mean offset is a
    per-component SCALAR baked in at plan time, so the per-row work is
    one zip_with/aggregate dot product per component (JVM-side HOFs,
    sequential double accumulation — bit-stable vs the DuckDB oracle's
    list_sum). Components ride the plan as literals; no shuffle, no
    Python workers. Returns (id, pc1..pcK) rounded to 6dp."""
    from ..functions import vector as V

    outs = [F.col(id_col)]
    for i, comp in enumerate(components, start=1):
        lit = F.array(*[F.lit(float(c)) for c in comp])
        # scalar offset computed the same sequential way both engines use
        off = 0.0
        for m, c in zip(mean, comp):
            off += m * c
        outs.append(
            F.round(V.dot(F.col(vec_col), lit) - F.lit(off), 6).alias(f"pc{i}")
        )
    return vectors.select(*outs)


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


def quantize_int8_profile(vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 scalar quantization profile — the compression
    step serving stacks apply before PQ is worth it (4 bytes -> 1 byte
    per dim, ~0.4% recall cost at 64-128d). Per dimension: absmax over
    the corpus, scale = absmax/127, code = clamp(floor(v/scale + 0.5)),
    and the reconstruction-error stats that decide whether int8 is
    safe for a given corpus.

    Two narrow shuffles of primitive doubles (absmax agg, then error
    agg), both map-side-combinable; the 64-row scale table broadcasts
    back onto the exploded values. floor(v/scale + 0.5) is used instead
    of round() so the tie behavior is a fixed formula in both engines.
    Returns (pos, absmax, scale, mean_abs_err, max_abs_err)."""
    ex = vectors.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v")
    )
    scales = ex.groupBy("pos").agg(F.max(F.abs(F.col("v"))).alias("absmax"))
    scales = scales.withColumn("scale", F.col("absmax") / 127)
    code = F.greatest(
        F.lit(-127.0),
        F.least(F.lit(127.0), F.floor(F.col("v") / F.col("scale") + 0.5).cast("double")),
    )
    recon = code * F.col("scale")
    err = F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
        F.abs(F.col("v") - recon)
    )
    return (
        ex.join(F.broadcast(scales), "pos")
        .select("pos", "absmax", "scale", err.alias("_err"))
        .groupBy("pos", "absmax", "scale")
        .agg(
            F.round(F.avg("_err"), 6).alias("mean_abs_err"),
            F.round(F.max("_err"), 6).alias("max_abs_err"),
        )
        .select(
            F.col("pos").cast("long"),
            F.round("absmax", 6).alias("absmax"),
            F.round("scale", 6).alias("scale"),
            "mean_abs_err",
            "max_abs_err",
        )
    )

def embedding_drift(
    vectors: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label centroid drift between two corpus halves (id-split) —
    the embedding-space monitoring metric: a re-embedded or
    distribution-shifted batch moves class centroids, and this is the
    alarm that triggers re-indexing / re-training.

    Same single-shuffle posexplode shape as label_centroids, with the
    (label, half, dim) means rounded to 6 BEFORE the distance so the
    downstream arithmetic is deterministic cross-engine; the split
    point (max id) rides as a broadcast scalar. Returns one row per
    label: counts per half, euclidean centroid drift, and the single
    largest per-dimension shift."""
    split = vectors.agg(F.max(id_col).alias("_m"))
    half = F.when(F.col(id_col) * 2 <= F.col("_m"), "a").otherwise("b")
    ex = (
        vectors.crossJoin(F.broadcast(split))
        .select(
            F.col(label_col),
            half.alias("half"),
            F.posexplode(F.col(vec_col)).alias("pos", "v"),
        )
    )
    per = ex.groupBy(label_col, "half", "pos").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("v"), 6).alias("m"),
    )
    a = per.filter(F.col("half") == "a").select(
        label_col, "pos", F.col("n").alias("n_a"), F.col("m").alias("ma")
    )
    b = per.filter(F.col("half") == "b").select(
        label_col, "pos", F.col("n").alias("n_b"), F.col("m").alias("mb")
    )
    j = a.join(b, [label_col, "pos"])
    return j.groupBy(label_col).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.round(F.sqrt(F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")))), 6).alias("drift"),
        F.round(F.max(F.abs(F.col("ma") - F.col("mb"))), 6).alias("max_dim_shift"),
    )
