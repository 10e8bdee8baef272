"""Approximate nearest neighbor — the scale path past brute force.

Two classic index families re-expressed as DataFrame plans:

- Random-hyperplane LSH (cosine): sign-pattern bucket per vector; a
  query only scores vectors in its bucket. Hyperplanes are
  deterministic (seeded hash) so plans — and the DuckDB oracle, which
  receives the same planes as SQL literals — are reproducible.
- IVF (inverted file): Lloyd k-means coarse quantizer (driver holds
  only K×dim centroids — the iterative loop moves KB, not data), then
  probe the nprobe nearest centroid cells per query.

At 100 TB: bucket/cell assignment is a narrow map; candidate scoring
shuffles only matching buckets (AQE skew-join for hot cells); the
centroid table is broadcast everywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V
from ..sources.tables import duck_parquet_path as _duck_path


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (also inlined into oracles)."""
    rng = np.random.default_rng(seed)
    return [[float(x) for x in rng.standard_normal(dim)] for _ in range(n_planes)]


def _mat_lit(vecs: list[list[float]]):
    """A list-of-vectors as ONE nested array literal. Building the same
    thing as F.array(F.lit(x) per element, per vector) costs one py4j
    round-trip per scalar — 512 calls for 8x64 centroids, several
    seconds of pure plan-construction latency per query build. One
    nested F.lit is one call."""
    return F.lit([[float(x) for x in v] for v in vecs])


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Bucket id = bit b set iff dot(v, plane_b) > 0. The planes enter
    as one nested literal and each dot appears exactly once
    (transform), keeping both plan-build time and the interpreted-HOF
    tree size linear in n_planes."""
    dots = F.transform(_mat_lit(planes), lambda p: V.dot(vec_col, p))
    weights = F.lit([1 << b for b in range(len(planes))]).cast("array<long>")
    return F.aggregate(
        F.zip_with(
            dots, weights, lambda d, w: F.when(d > 0, w).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Single-probe LSH search: score only same-bucket candidates.
    Returns (query_id, id, score, rank)."""
    from .knn import topk_per_key_agg

    cb = corpus.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    qb = queries.withColumn("_bucket", lsh_bucket(F.col(query_vec_col), planes))
    scored = (
        cb.join(F.broadcast(qb), "_bucket")
        .select(
            query_id_col,
            id_col,
            V.cosine(F.col(vec_col), F.col(query_vec_col)).alias("score"),
        )
    )
    return topk_per_key_agg(scored, query_id_col, id_col, k)


def ann_lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Multi-probe LSH (Lv VLDB'07): besides its own bucket, each query
    probes every bucket at hamming distance 1 (one flipped plane bit) —
    recall of a (1+n_planes)-probe search for the cost of ONE index,
    instead of maintaining 1+n_planes hash tables.

    Only the (small, broadcast) query side fans out — the corpus keeps
    exactly one bucket per vector, so each (query, candidate) pair can
    match at most one probe row and no dedup pass is needed.
    Returns (query_id, id, score, rank).
    """
    cb = corpus.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    qb = queries.withColumn("_b0", lsh_bucket(F.col(query_vec_col), planes))
    probes = F.array(
        F.col("_b0"),
        *[F.col("_b0").bitwiseXOR(F.lit(1 << b)) for b in range(len(planes))],
    )
    from .knn import topk_per_key_agg

    qp = qb.select(
        query_id_col, query_vec_col, F.explode(probes).alias("_bucket")
    )
    scored = cb.join(F.broadcast(qp), "_bucket").select(
        query_id_col,
        id_col,
        V.cosine(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    return topk_per_key_agg(scored, query_id_col, id_col, k)


def _budget_sweep_tail(
    per_budget: DataFrame,
    queries: DataFrame,
    exact_hits: DataFrame,
    m_lo: int,
    m_hi: int,
    k: int,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """Shared recall/cost reduction for the probe-budget sweeps: ONE
    aggregation over the (budget, query, candidate) relation yields
    both the top-k id array and the candidate count; hits are
    size(array_intersect) against the broadcast per-query exact-id
    arrays — no semi-join, so the expensive candidate subtree and the
    exact-baseline tower each plan exactly ONCE (Spark re-plans every
    reference to a frame; the semi-join + separate count formulation
    ran both towers twice). Recall denominator is k: the exact top-k
    is always full whenever the corpus has >= k vectors (any real
    scale; the oracles' per-query counts equal k too).
    Returns (m, mean_recall, mean_candidates) for m in [m_lo, m_hi]."""
    exact_arr = exact_hits.groupBy(query_id_col).agg(
        F.collect_set(id_col).alias("_exact")
    )
    pair = F.struct((-F.col("score")).alias("_o"), F.col(id_col))
    agged = per_budget.groupBy("m", query_id_col).agg(
        F.count("*").alias("n_cand"),
        F.slice(F.sort_array(F.collect_list(pair)), 1, k).alias("_top"),
    )
    joined = agged.join(F.broadcast(exact_arr), query_id_col).select(
        "m",
        query_id_col,
        "n_cand",
        F.size(
            F.array_intersect(
                F.transform("_top", lambda s: s[id_col]), F.col("_exact")
            )
        ).alias("n_hit"),
    )
    grid = queries.select(query_id_col).distinct().crossJoin(
        F.broadcast(
            per_budget.sparkSession.range(m_lo, m_hi + 1).select(
                F.col("id").cast("int").alias("m")
            )
        )
    )
    return (
        grid.join(joined, ["m", query_id_col], "left")
        .groupBy("m")
        .agg(
            F.avg(F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(float(k))).alias(
                "mean_recall"
            ),
            F.avg(F.coalesce(F.col("n_cand"), F.lit(0))).alias("mean_candidates"),
        )
    )


def probe_sweep(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    exact_hits: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Recall/cost tradeoff sweep: for each probe budget m = 0..n_planes
    (own bucket + first m flipped bits), mean recall@k vs mean scored
    candidates per query — the curve that picks an index's probe
    budget.

    ONE plan, no driver-side loop: every probe row carries the minimum
    budget that includes it (own bucket → 0, flipped bit b → b+1), the
    bucket join runs once, and the budget dimension is exploded as a
    column (each candidate fans out only to the budgets that include
    it). Per-(budget, query) top-k, recall vs the exact hits, and
    candidate counts all aggregate from that single joined relation —
    at scale this is one corpus pass instead of n_planes+1.
    Returns (n_probes, mean_recall, mean_candidates)."""
    n_planes = len(planes)
    cb = corpus.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    qb = queries.withColumn("_b0", lsh_bucket(F.col(query_vec_col), planes))
    probes = F.array(
        F.struct(F.col("_b0").alias("b"), F.lit(0).alias("m_min")),
        *[
            F.struct(
                F.col("_b0").bitwiseXOR(F.lit(1 << b)).alias("b"),
                F.lit(b + 1).alias("m_min"),
            )
            for b in range(n_planes)
        ],
    )
    qp = qb.select(
        query_id_col, query_vec_col, F.explode(probes).alias("_p")
    ).select(
        query_id_col,
        query_vec_col,
        F.col("_p.b").alias("_bucket"),
        F.col("_p.m_min").alias("_m_min"),
    )
    # Each corpus vector has exactly one bucket and a query's probe
    # buckets are distinct, so (query, candidate) pairs are unique and
    # _m_min is well-defined per pair.
    cand = cb.join(F.broadcast(qp), "_bucket").select(
        query_id_col,
        id_col,
        F.col("_m_min"),
        V.cosine(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    per_budget = cand.withColumn(
        "m", F.explode(F.sequence(F.col("_m_min"), F.lit(n_planes)))
    )
    return _budget_sweep_tail(
        per_budget, queries, exact_hits, 0, n_planes, k, id_col, query_id_col
    ).select(
        (F.col("m") + 1).cast("long").alias("n_probes"),
        F.round("mean_recall", 6).alias("mean_recall"),
        F.round("mean_candidates", 6).alias("mean_candidates"),
    )


def recall_at_k(
    ann_hits: DataFrame,
    exact_hits: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k harness: fraction of the exact top-k an ANN search
    recovered, per query. Both inputs are (query_id, id[, ...]) top-k
    result sets. Returns (query_id, n_exact, n_hit, recall)."""
    hits = exact_hits.select(query_id_col, id_col).join(
        ann_hits.select(query_id_col, id_col), [query_id_col, id_col], "left_semi"
    )
    per_q = exact_hits.groupBy(query_id_col).agg(
        F.count("*").cast("long").alias("n_exact")
    )
    got = hits.groupBy(query_id_col).agg(F.count("*").cast("long").alias("n_hit"))
    return (
        per_q.join(got, query_id_col, "left")
        .select(
            query_id_col,
            "n_exact",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.round(F.coalesce("n_hit", F.lit(0)) / F.col("n_exact"), 6).alias("recall"),
        )
    )


# --- IVF ---


def corpus_rows(sf_dir: str, table: str = "embeddings") -> int:
    """Row count straight off parquet metadata (no Spark job) — the
    one corpus statistic the scale-aware sizing helpers below need."""
    import duckdb

    return duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{_duck_path(sf_dir, table)}')"
    ).fetchone()[0]


def kmeans_k_for(
    sf_dir: str,
    rows_per_cell: int = 250,
    k_min: int = 8,
    k_max: int = 4096,
    table: str = "embeddings",
) -> int:
    """Scale-honest cell count for SemDeDup/IVF-style partition-then-
    pair operators: k grows with N so expected cell occupancy (and
    therefore within-cell pair volume) stays LINEAR in N instead of
    quadratic. Fixed k=8 measured superlinear (+1.17 exponent) on the
    sf0.1->sf1 study; k=N/250 measured the remedy (29.5 s vs 61.5 s at
    sf1, pair volume provably linear). At the gate scales
    (N=500..2000) this floors at k_min=8, so gate-scale oracles are
    byte-identical to the fixed-k plan.

    ``k_max`` bounds the OTHER quadratic: centroid assignment costs
    N*k interpreted euclideans, so uncapped k = N/250 makes assignment
    O(N²/250) — linear pair volume bought with a quadratic assignment
    term one scale later — and the driver-side fit sample (16*k rows)
    plus the k*dim centroid literals inlined into plans and lazy-oracle
    SQL would grow unboundedly. k_max=4096 holds assignment cost at
    N*4096 (linear), keeps the fit sample ≤64k rows and the literal
    block ≤~4 MB of SQL, and concedes that beyond N ≈ k_max*250 ≈ 1M
    sampled vectors per fit scope, cell occupancy grows ~N/k_max again
    — within-cell pair volume is then quadratic with a 1/4096
    constant; the 100 TB posture for that regime is sharding the fit
    scope (per-partition SemDeDup), not a bigger flat k."""
    return min(k_max, max(k_min, corpus_rows(sf_dir, table) // rows_per_cell))


def lsh_bits_for(
    sf_dir: str,
    rows_per_bucket: float = 7.8125,
    bits_min: int = 6,
    bits_max: int = 24,
    table: str = "embeddings",
) -> int:
    """Scale-honest LSH plane count: bits = log2(N / target_occupancy)
    keeps expected bucket occupancy (and same-bucket pair volume per
    vector) constant as N grows. The 7.8125 default reproduces the
    historical 6-bit plan at the N=500 gate scale (500/64), giving 8
    bits at sf0.1 (N=2000) and 11 at the derived sf1 (N=20000)."""
    import math

    n = max(1, corpus_rows(sf_dir, table))
    return min(bits_max, max(bits_min, round(math.log2(max(2.0, n / rows_per_bucket)))))


def planes_for(
    sf_dir: str,
    rows_per_bucket: float = 7.8125,
    bits_min: int = 6,
    dim: int = 64,
    seed: int = 42,
    table: str = "embeddings",
) -> list[list[float]]:
    """Corpus-sized hyperplane set: lsh_bits_for picks the plane count,
    hyperplanes draws them. The r7 sf1 study's lesson generalized: every
    pair-GENERATING LSH consumer (bucketed dedup, kNN-graph build,
    hard-negative mining) must size bits to N or same-bucket pair
    volume grows ~N²/2^bits; the floors reproduce the historical fixed
    plans at the N=500 gate scales so gate oracles (and prior driver
    stamps) are unchanged by construction. The first ``bits_min``
    planes of a larger draw equal the fixed draw's planes only when the
    seed and order match — hyperplanes() draws plane-by-plane from one
    rng stream, so growing the count EXTENDS the set without changing
    the shared prefix; bucket ids still differ (more bits), which is
    the point."""
    return hyperplanes(lsh_bits_for(sf_dir, rows_per_bucket, bits_min, table=table), dim, seed=seed)


def kmeans_fit_sample(
    sf_dir: str,
    k: int = 8,
    n_iter: int = 3,
    sample_limit: int = 4096,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train the IVF coarse quantizer on a bounded deterministic sample,
    driver-side in numpy — the standard IVF posture (faiss trains
    quantizers on a ~O(100k) subsample however large the corpus is;
    the index then assigns all vectors against the broadcast
    centroids). Reads the first ``sample_limit`` vectors by id straight
    from parquet (no Spark job — the sample is KB-to-MB scale), so the
    fit is exactly reproducible: fixed visit order + numpy float64
    math. The returned centroids can be inlined as SQL literals into a
    DuckDB oracle the same way LSH planes are.

    Mirrors reference scripts/prepare_data.py:50's bounded in-process
    model fit (embedder there, quantizer here)."""
    import duckdb

    rel = duckdb.sql(
        f"SELECT {id_col}, {vec_col} FROM read_parquet('{_duck_path(sf_dir, table)}') "
        f"ORDER BY {id_col} LIMIT {sample_limit}"
    )
    x = np.array([list(r[1]) for r in rel.fetchall()], dtype=np.float64)
    centroids = x[:k].copy()
    for _ in range(n_iter):
        d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties -> lowest index, like _nearest_centroid
        for c in range(k):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return [[float(v) for v in c] for c in centroids]


def kmeans_fit(
    vectors: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd iterations as DataFrame aggs. Init = first k vectors by id
    (deterministic). Each iteration: broadcast centroids → argmin
    assignment (narrow) → per-cluster mean (one shuffle of dim doubles
    per row, map-side combined). Only centroids ever reach the driver."""
    init = vectors.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [[float(x) for x in r[0]] for r in init]
    dim = len(centroids[0])
    for _ in range(n_iter):
        assigned = with_cell(vectors, vec_col, centroids, out_col="cluster").select(
            F.col(vec_col), "cluster"
        )
        sums = assigned.groupBy("cluster").agg(
            *[F.sum(F.col(vec_col)[d].cast("double")).alias(f"s{d}") for d in range(dim)],
            F.count("*").alias("n"),
        )
        rows = {r["cluster"]: r for r in sums.collect()}
        centroids = [
            [rows[c][f"s{d}"] / rows[c]["n"] for d in range(dim)] if c in rows else centroids[c]
            for c in range(k)
        ]
    return centroids


def _by_dist_then_cell(a, b):
    """array_sort comparator: (distance asc, cell id asc) — the explicit
    cell tie-break makes probe order deterministic on exact-equal
    distances, matching the oracle's ORDER BY d, cid."""
    return (
        F.when(a["d"] < b["d"], -1)
        .when(a["d"] > b["d"], 1)
        .when(a["cell"] < b["cell"], -1)
        .otherwise(1)
    )


def _centroid_dists(vec_col, centroids: list[list[float]]):
    """Array of euclidean distances to each broadcast centroid literal
    — each distance expression appears exactly ONCE. (A nested
    when(d < best, ...)-chain argmin duplicates every distance subtree
    into each later branch; HOFs evaluate interpreted with no common
    subexpression elimination, so that formulation re-ran the 64-dim
    euclideans hundreds of times per row — measured 15x slower at
    sf0.1.)"""
    return F.transform(_mat_lit(centroids), lambda c: V.euclidean(vec_col, c))


def _argmin(darr):
    """Index of the first minimum (ties -> lowest cid, the oracle's
    ORDER BY d, cid). Evaluate on a MATERIALIZED distance column —
    passing the raw _centroid_dists expression here would inline it
    twice."""
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def _probe_structs(query_vec_col, centroids: list[list[float]]):
    """(cell, distance) structs for probe-order sorting — nested
    literal + index-transform, one euclidean subtree per centroid."""
    return F.transform(
        _mat_lit(centroids),
        lambda c, i: F.struct(
            i.alias("cell"), V.euclidean(query_vec_col, c).alias("d")
        ),
    )


def with_cell(df: DataFrame, vec_col, centroids, out_col: str = "_cell") -> DataFrame:
    """Attach the nearest-centroid cell id; the distance array is
    materialized once per row then dropped."""
    return (
        df.withColumn("_cd", _centroid_dists(F.col(vec_col), centroids))
        .withColumn(out_col, _argmin(F.col("_cd")))
        .drop("_cd")
    )


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF probe search: per query, score only the nprobe nearest
    centroid cells. Returns (query_id, id, score, rank)."""
    cell = with_cell(corpus, vec_col, centroids)
    probes = _probe_structs(F.col(query_vec_col), centroids)
    qcells = (
        queries.select(
            query_id_col,
            query_vec_col,
            F.explode(
                F.slice(F.array_sort(probes, _by_dist_then_cell), 1, nprobe)
            ).alias("p"),
        )
        .select(query_id_col, query_vec_col, F.col("p.cell").alias("_cell"))
    )
    from .knn import topk_per_key_agg

    scored = (
        cell.join(F.broadcast(qcells), "_cell")
        .select(
            query_id_col,
            id_col,
            V.cosine(F.col(vec_col), F.col(query_vec_col)).alias("score"),
        )
    )
    return topk_per_key_agg(scored, query_id_col, id_col, k)


def hard_negative_mining(
    vectors: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive hard-negative mining (the training-pair step of
    embedding-model fine-tuning): for each anchor, the most-similar
    vector with a DIFFERENT label among its LSH-bucket candidates —
    highest cosine, ties to the lowest negative id.

    Scale: same posture as every dedup/ANN path here — candidates are
    bucket-bound (equi-self-join on the bucket id, volume scales with
    bucket occupancy, never n²); top-1 per anchor reduces via a single
    map-side-combinable max_by agg, no window over the pair set.
    Anchors whose bucket holds no cross-label vector produce no row
    (they have no hard negative at this probe depth — widen with
    multi-probe buckets if coverage matters more than cost).
    Returns (vec_id, label, neg_id, neg_label, score)."""
    b = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.col(label_col),
        lsh_bucket(F.col(vec_col), planes).alias("_bucket"),
        # norm hoist (see operators/dedup.semdedup): bit-identical
        V.l2_norm(F.col(vec_col)).alias("_nrm"),
    )
    a, c = b.alias("a"), b.alias("n")
    pairs = a.join(
        c,
        (F.col("a._bucket") == F.col("n._bucket"))
        & (F.col(f"a.{label_col}") != F.col(f"n.{label_col}")),
    ).select(
        F.col(f"a.{id_col}").alias(id_col),
        F.col(f"a.{label_col}").alias(label_col),
        F.col(f"n.{id_col}").alias("neg_id"),
        F.col(f"n.{label_col}").alias("neg_label"),
        (
            V.dot(F.col(f"a.{vec_col}"), F.col(f"n.{vec_col}"))
            / (F.col("a._nrm") * F.col("n._nrm"))
        ).alias("score"),
    )
    # max_by on (score, -neg_id): highest cosine wins, exact ties go to
    # the lowest negative id — deterministic, oracle-matched.
    return (
        pairs.groupBy(id_col, label_col)
        .agg(
            F.max_by(
                F.struct("neg_id", "neg_label", "score"),
                F.struct(F.col("score"), (-F.col("neg_id")).alias("_t")),
            ).alias("s")
        )
        .select(
            id_col,
            label_col,
            F.col("s.neg_id"),
            F.col("s.neg_label"),
            F.round("s.score", 6).alias("score"),
        )
    )


def cluster_purity(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Label purity of the IVF cells (the diversity/alignment
    diagnostic next to ivf_cell_stats' occupancy balance): per cell,
    occupancy, distinct labels, the majority label (ties to the lowest
    label id) and its share. Low purity = the quantizer's semantic
    cells cut across labels — retrain or re-label before using cells
    as sampling strata.

    One narrow assignment pass (broadcast centroid literals) + two
    map-side-combinable groupBys ((cell,label) then cell); nothing
    wide ever shuffles. Returns (cell, n, n_labels, top_label,
    top_share)."""
    cell = with_cell(vectors, vec_col, centroids, out_col="cell")
    per_label = cell.groupBy("cell", label_col).agg(F.count("*").alias("c"))
    return (
        per_label.groupBy("cell")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.count("*").cast("long").alias("n_labels"),
            F.max_by(
                F.col(label_col),
                F.struct(F.col("c"), (-F.col(label_col)).alias("_t")),
            ).alias("top_label"),
            F.max(F.struct(F.col("c"), (-F.col(label_col)).alias("_t"))).alias("_m"),
        )
        .select(
            F.col("cell").cast("long"),
            "n",
            "n_labels",
            "top_label",
            F.round(F.col("_m.c") / F.col("n"), 6).alias("top_share"),
        )
    )


def ivf_probe_sweep(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    exact_hits: DataFrame,
    max_nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF nprobe recall/cost sweep — the IVF analog of
    ``probe_sweep``: for each probe budget nprobe = 1..max_nprobe,
    mean recall@k vs mean scored candidates per query. The curve that
    sizes an IVF index's probe budget (faiss's nprobe parameter).

    ONE plan, no driver-side per-budget loop: each query's cells are
    sorted by (centroid distance, cell id) once and the first
    max_nprobe carry their probe rank r (1-based) — the MINIMUM
    nprobe that includes them. The cell join runs once; each candidate
    explodes only to budgets >= its rank. Per-(budget, query) top-k,
    recall vs the exact hits, and candidate counts all aggregate from
    that single joined relation — one corpus pass instead of
    max_nprobe passes.
    Returns (n_probes, mean_recall, mean_candidates)."""
    cell = with_cell(corpus, vec_col, centroids)
    probes = _probe_structs(F.col(query_vec_col), centroids)
    qp = (
        queries.select(
            query_id_col,
            query_vec_col,
            F.posexplode(
                F.slice(F.array_sort(probes, _by_dist_then_cell), 1, max_nprobe)
            ).alias("_r0", "p"),
        )
        .select(
            query_id_col,
            query_vec_col,
            F.col("p.cell").alias("_cell"),
            (F.col("_r0") + 1).alias("_m_min"),
        )
    )
    # A corpus vector has exactly one cell and a query's probed cells
    # are distinct, so (query, candidate) pairs are unique and _m_min
    # (the candidate's probe rank) is well-defined per pair.
    cand = cell.join(F.broadcast(qp), "_cell").select(
        query_id_col,
        id_col,
        F.col("_m_min"),
        V.cosine(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    per_budget = cand.withColumn(
        "m", F.explode(F.sequence(F.col("_m_min"), F.lit(max_nprobe)))
    )
    return _budget_sweep_tail(
        per_budget, queries, exact_hits, 1, max_nprobe, k, id_col, query_id_col
    ).select(
        F.col("m").cast("long").alias("n_probes"),
        F.round("mean_recall", 6).alias("mean_recall"),
        F.round("mean_candidates", 6).alias("mean_candidates"),
    )


# --- PQ (product quantization) ---


def pq_fit_sample(
    sf_dir: str,
    m: int = 4,
    k: int = 16,
    n_iter: int = 3,
    sample_limit: int = 4096,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train per-subspace PQ codebooks (Jégou PAMI'11) on a bounded
    deterministic sample, driver-side in numpy — same posture as
    ``kmeans_fit_sample``: faiss trains PQ on an O(100k) subsample
    however large the corpus is, then encodes everything against the
    broadcast codebooks. dim must divide evenly into ``m`` subspaces;
    each gets an independent ``k``-centroid Lloyd fit (init = first k
    sample subvectors, ties -> lowest code). Returns
    codebooks[m][k][dim/m], inlineable as SQL literals for oracles."""
    import duckdb

    rel = duckdb.sql(
        f"SELECT {id_col}, {vec_col} FROM read_parquet('{_duck_path(sf_dir, table)}') "
        f"ORDER BY {id_col} LIMIT {sample_limit}"
    )
    x = np.array([list(r[1]) for r in rel.fetchall()], dtype=np.float64)
    return _lloyd_books(x, m, k, n_iter)


def _lloyd_books(x, m: int, k: int, n_iter: int) -> list[list[list[float]]]:
    """Per-subspace Lloyd fit over a sample matrix (shared by the raw
    and residual PQ trainers): init = first k sample subvectors,
    ties -> lowest code."""
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    dsub = dim // m
    books: list[list[list[float]]] = []
    for mi in range(m):
        xs = x[:, mi * dsub : (mi + 1) * dsub]
        cents = xs[:k].copy()
        for _ in range(n_iter):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # ties -> lowest code
            for c in range(k):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append([[float(v) for v in c] for c in cents])
    return books


def pq_fit_residual_sample(
    sf_dir: str,
    centroids: list[list[float]],
    m: int = 4,
    k: int = 16,
    n_iter: int = 3,
    sample_limit: int = 4096,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Residual-PQ codebook fit (faiss IndexIVFPQ ``by_residual=True``,
    its default): each sample vector is assigned to its nearest coarse
    centroid (exact argmin, ties -> lowest cid — _argmin's semantics)
    and the codebooks train on the RESIDUALS x − c(x). Residuals
    cluster far tighter around zero than raw vectors, so the same m×k
    code budget quantizes finer — the reason faiss defaults to it.
    Same bounded deterministic sample posture as pq_fit_sample."""
    import duckdb

    rel = duckdb.sql(
        f"SELECT {id_col}, {vec_col} FROM read_parquet('{_duck_path(sf_dir, table)}') "
        f"ORDER BY {id_col} LIMIT {sample_limit}"
    )
    x = np.array([list(r[1]) for r in rel.fetchall()], dtype=np.float64)
    c = np.array(centroids, dtype=np.float64)
    d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # ties -> lowest cid
    return _lloyd_books(x - c[assign], m, k, n_iter)


def _euclid2(a, b):
    """Squared euclidean between two array expressions, sequential
    double accumulation (no sqrt — PQ argmin/ADC sum squared terms;
    the oracle's list_sum matches this order exactly)."""
    d = F.zip_with(
        a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x - y
    )
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v * v)


def _books_lit(codebooks: list[list[list[float]]]):
    """codebooks[m][k][dsub] as ONE nested literal (see _mat_lit)."""
    return F.lit([[[float(x) for x in c] for c in book] for book in codebooks])


def _subvectors(vec_col, m: int, dsub: int):
    """The m subspace slices of a vector, as an array of arrays."""
    v = vec_col.cast("array<double>")
    return F.array(*[F.slice(v, mi * dsub + 1, dsub) for mi in range(m)])


def pq_code_expr(vec_col, codebooks: list[list[list[float]]]):
    """PQ encode: per subspace, the code of the nearest centroid by
    squared euclidean (ties -> lowest code, matching the oracle's
    ORDER BY d, code). One zip_with pairs each subvector with its
    codebook, so every distance subtree evaluates exactly once; the
    argmin runs on the materialized per-subspace distance array.
    Returns an array<int> of m codes.

    Formulation note (measured at sf0.1): HOFs run interpreted, but
    the alternative — expanding the m×k distances into explicit
    element_at/literal arithmetic for whole-stage codegen — built a
    ~2048-term expression tree that ran 6x SLOWER (10.5 s vs 1.7 s
    for ann_pq_adc): the giant tree defeats codegen and re-evaluates
    element accesses the zip_with formulation materializes once. The
    interpreted-but-materialized shape wins."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    dists = F.zip_with(
        _books_lit(codebooks),
        _subvectors(vec_col, m, dsub),
        lambda book, sv: F.transform(book, lambda c: _euclid2(sv, c)),
    )
    return F.transform(
        dists, lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int")
    )


def pq_adc_dist(query_vec_col, codes_col, codebooks: list[list[list[float]]]):
    """Asymmetric distance (ADC): euclidean between the full-precision
    query and a corpus vector's PQ reconstruction — computed straight
    from the codes, Σ_m ||q_m - codebook[m][code_m]||², left-to-right
    over subspaces (the oracle adds its per-subspace terms in the same
    order), sqrt once at the end.

    Reference formulation — the serving paths use pq_adc_luts +
    pq_adc_dist_lut (bit-identical values, ~10x less per-row work);
    this stays as the direct-definition twin the LUT path is
    unit-tested against."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cb = _books_lit(codebooks)
    total = None
    for mi in range(m):
        sv = F.slice(query_vec_col.cast("array<double>"), mi * dsub + 1, dsub)
        cent = F.element_at(F.element_at(cb, mi + 1), codes_col[mi] + 1)
        t = _euclid2(sv, cent)
        total = t if total is None else total + t
    return F.sqrt(total)


def pq_adc_luts(query_vec_col, codebooks: list[list[list[float]]]):
    """Per-QUERY ADC lookup tables — faiss's actual ADC trick (Jégou
    PAMI'11 §V.A): luts[m][k] = ||q_m − codebook[m][k]||², computed
    once per query row (Q × m × k entries, interpreted-HOF cost paid
    on the tiny broadcast side), so the corpus-side distance is m
    array lookups + m−1 adds per row instead of m interpreted
    dsub-dim euclideans. Each entry is the SAME _euclid2 expression
    pq_adc_dist would evaluate per corpus row — identical operands,
    identical order — so LUT-served distances are bit-identical."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qv = query_vec_col.cast("array<double>")

    # one-arg lambda via a closure helper: a two-arg lambda would make
    # F.transform pass the ELEMENT INDEX as the second argument
    def _table(mi: int):
        sv = F.slice(qv, mi * dsub + 1, dsub)
        return F.transform(
            F.lit([[float(x) for x in c] for c in codebooks[mi]]),
            lambda c: _euclid2(sv, c),
        )

    return F.array(*[_table(mi) for mi in range(m)])


def pq_adc_dist_lut(lut_col, codes_col, m: int):
    """ADC from the per-query LUT: sqrt of the left-associative sum of
    the m table entries the corpus row's codes select — the same
    addition order as pq_adc_dist's python loop and the oracle's
    SQL `+` chain."""
    total = None
    for mi in range(m):
        t = F.element_at(F.element_at(lut_col, mi + 1), codes_col[mi] + 1)
        total = t if total is None else total + t
    return F.sqrt(total)


def ann_pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """PQ-compressed exhaustive search (faiss IndexPQ): the corpus is
    encoded to m small codes (m bytes/vector instead of dim×4), every
    query scans ALL codes with ADC — the memory-bound regime where the
    working set shrinks 64× and the scan stays sequential. Combine
    with IVF cell pruning for the IVF-PQ serving shape
    (ann_ivf_rerank_topk shows the shortlist+rerank half).
    Returns (query_id, id, dist, rank), dist ascending."""
    from .knn import topk_per_key_agg

    coded = corpus.select(
        F.col(id_col), pq_code_expr(F.col(vec_col), codebooks).alias("_codes")
    )
    qlut = queries.select(
        query_id_col, pq_adc_luts(F.col(query_vec_col), codebooks).alias("_lut")
    )
    scored = coded.join(F.broadcast(qlut)).select(
        query_id_col,
        id_col,
        pq_adc_dist_lut(F.col("_lut"), F.col("_codes"), len(codebooks)).alias("dist"),
    )
    return topk_per_key_agg(scored, query_id_col, id_col, k, score_col="dist", asc=True)


def pq_reconstruction_error(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Index-quality metric: per-subspace mean squared quantization
    error over the whole corpus (the number PQ papers tune m/k
    against). Encode + per-subspace error in one narrow projection,
    then a single map-side-combinable groupBy(subspace).
    Returns (subspace, n, mse)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    errs = F.zip_with(
        _books_lit(codebooks),
        _subvectors(F.col(vec_col), m, dsub),
        lambda book, sv: F.array_min(F.transform(book, lambda c: _euclid2(sv, c))),
    )
    return (
        corpus.select(F.posexplode(errs).alias("subspace", "e2"))
        .groupBy("subspace")
        .agg(F.count("*").alias("n"), F.round(F.avg("e2"), 6).alias("mse"))
        .select(F.col("subspace").cast("long"), F.col("n").cast("long"), "mse")
    )


def ann_ivf_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    nprobe: int = 2,
    shortlist: int = 10,
    quant_decimals: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF with exact re-ranking (the IVF-PQ serving pattern): the
    probed cells are scored with QUANTIZED vectors (rounded to
    ``quant_decimals`` — standing in for PQ codes, which cost bytes/vec
    instead of dim×4) to build a per-query shortlist; exact cosine then
    re-scores only shortlist×Q rows against the full-precision vectors.

    At scale the first pass reads the small quantized index, and the
    expensive full-precision column is fetched (join by id) for
    shortlist rows only. Returns (query_id, id, score, rank) with exact
    scores.
    """
    # cast-then-round in DOUBLE so the quantized values are exactly
    # reproducible in SQL oracles (round(float32) would round a
    # different binary value than the oracle's DOUBLE[] cast sees)
    quant = F.transform(
        F.col(vec_col).cast("array<double>"), lambda x: F.round(x, quant_decimals)
    )
    cell = with_cell(
        corpus.select(F.col(id_col), quant.alias("_qv"), F.col(vec_col)),
        vec_col,
        centroids,
    ).select(id_col, "_qv", "_cell")
    probes = _probe_structs(F.col(query_vec_col), centroids)
    qcells = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(
            F.slice(F.array_sort(probes, _by_dist_then_cell), 1, nprobe)
        ).alias("p"),
    ).select(query_id_col, query_vec_col, F.col("p.cell").alias("_cell"))
    from .knn import topk_per_key_agg

    approx = cell.join(F.broadcast(qcells), "_cell").select(
        query_id_col,
        id_col,
        V.cosine(F.col("_qv"), F.col(query_vec_col)).alias("_approx"),
    )
    short = topk_per_key_agg(
        approx, query_id_col, id_col, shortlist, score_col="_approx"
    ).select(query_id_col, id_col)
    exact = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .join(F.broadcast(short), id_col)
        .join(
            F.broadcast(queries.select(query_id_col, query_vec_col)), query_id_col
        )
        .select(
            query_id_col,
            id_col,
            V.cosine(F.col(vec_col), F.col(query_vec_col)).alias("score"),
        )
    )
    return topk_per_key_agg(exact, query_id_col, id_col, k)


def ann_ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-PQ composite (faiss IndexIVFPQ, Jégou PAMI'11 §V): the
    corpus is encoded ONCE into (cell, m PQ codes) — the inverted-file
    + compressed-code layout where a vector costs m bytes + a cell id
    instead of dim×4 — and each query ADC-scans only its nprobe nearest
    cells. Encoding raw vectors, not residuals (faiss
    ``by_residual=False``), so the same codebooks serve every cell and
    the oracle replays encode + probe + ADC from the fitted literals.

    At 100 TB this is THE serving shape for vector search: the scan is
    bounded by nprobe/K of the corpus and reads 64×-compressed codes;
    the cell join key is broadcast probe structs, the per-query top-k
    reduces via a map-side-combinable agg (no window over the scored
    relation). Returns (query_id, id, dist, rank), dist ascending."""
    from .knn import topk_per_key_agg

    coded = with_cell(
        corpus.select(F.col(id_col), F.col(vec_col)), vec_col, centroids
    ).select(
        F.col(id_col), pq_code_expr(F.col(vec_col), codebooks).alias("_codes"), "_cell"
    )
    probes = _probe_structs(F.col(query_vec_col), centroids)
    qcells = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(
            F.slice(F.array_sort(probes, _by_dist_then_cell), 1, nprobe)
        ).alias("p"),
    ).select(
        query_id_col,
        pq_adc_luts(F.col(query_vec_col), codebooks).alias("_lut"),
        F.col("p.cell").alias("_cell"),
    )
    scored = coded.join(F.broadcast(qcells), "_cell").select(
        query_id_col,
        id_col,
        pq_adc_dist_lut(F.col("_lut"), F.col("_codes"), len(codebooks)).alias("dist"),
    )
    return topk_per_key_agg(scored, query_id_col, id_col, k, score_col="dist", asc=True)


def ivfpq_index_build(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialized IVF-PQ index (faiss's on-disk IndexIVFPQ layout):
    every vector stored as (id, m PQ codes) in its cell's partition
    directory — the full-precision embedding column is NOT written, so
    the index is ~64× smaller than the corpus and a probe reads only
    compressed codes. The one-off O(corpus) encode job that turns a
    100 TB embedding table into an index whose queries read
    nprobe/K of a 64×-smaller artifact."""
    coded = with_cell(
        corpus.select(F.col(id_col), F.col(vec_col)), vec_col, centroids, out_col="cell"
    ).select(
        F.col(id_col), pq_code_expr(F.col(vec_col), codebooks).alias("codes"), "cell"
    )
    coded.write.partitionBy("cell").mode("overwrite").parquet(index_dir)


def ann_ivfpq_indexed_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ADC probe search over the materialized IVF-PQ index: identical
    result contract to ann_ivfpq_topk, but the corpus side is the
    code-only partitioned layout — the cell join key is the PARTITION
    column, so directory pruning skips non-probed cells before any
    I/O, and what IS read is m bytes of codes per vector, not the
    embedding. The serving half of the build-once/probe-many story
    ann_ivf_indexed tells for full-precision IVF."""
    from .knn import topk_per_key_agg

    idx = spark.read.parquet(index_dir)
    probes = _probe_structs(F.col(query_vec_col), centroids)
    qcells = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(
            F.slice(F.array_sort(probes, _by_dist_then_cell), 1, nprobe)
        ).alias("p"),
    ).select(
        query_id_col,
        pq_adc_luts(F.col(query_vec_col), codebooks).alias("_lut"),
        F.col("p.cell").alias("cell"),
    )
    scored = idx.join(F.broadcast(qcells), "cell").select(
        query_id_col,
        id_col,
        pq_adc_dist_lut(F.col("_lut"), F.col("codes"), len(codebooks)).alias("dist"),
    )
    return topk_per_key_agg(scored, query_id_col, id_col, k, score_col="dist", asc=True)


# --- IVF as a materialized, partition-pruned index layout ---


def ivf_index_build(
    corpus: DataFrame,
    centroids: list[list[float]],
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Batch index build (the north-star workload): assign every vector
    its IVF cell and materialize the corpus as a CELL-PARTITIONED
    parquet layout. Probing then reads only nprobe directories per
    query — partition pruning does the inverted-file lookup, no
    per-row filter ever touches non-probed cells' bytes. At cluster
    scale this is the one-off O(corpus) job that turns a 100 TB
    embedding table into an index whose queries read nprobe/K of it."""
    # keep every payload column (entities carry metadata); cell and the
    # _batch = 0 stamp make the layout the base of the streaming
    # maintenance log (streaming.pipeline.start_ivf_index_maintenance
    # appends micro-batches with increasing ids; reads resolve latest)
    coded = with_cell(corpus, vec_col, centroids, out_col="cell")
    coded.withColumn("_batch", F.lit(0).cast("long")).write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(index_dir)


def ann_ivf_indexed_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Probe search over the materialized index: identical result
    contract to ann_ivf_topk, but the corpus side is the partitioned
    layout and the cell join key is the PARTITION column — Spark's
    dynamic partition pruning turns the broadcast probe set into
    directory-level skips before any I/O."""
    from .knn import topk_per_key_agg

    idx = spark.read.parquet(index_dir)
    probes = _probe_structs(F.col(query_vec_col), centroids)
    qcells = (
        queries.select(
            query_id_col,
            query_vec_col,
            F.explode(
                F.slice(F.array_sort(probes, _by_dist_then_cell), 1, nprobe)
            ).alias("p"),
        )
        .select(query_id_col, query_vec_col, F.col("p.cell").alias("cell"))
    )
    scored = idx.join(F.broadcast(qcells), "cell").select(
        query_id_col,
        id_col,
        V.cosine(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    return topk_per_key_agg(scored, query_id_col, id_col, k)


def matryoshka_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Matryoshka truncation sweep (Kusupati et al. NeurIPS'22): for
    each prefix dimensionality, exact cosine top-k on the TRUNCATED
    vectors, graded as recall@k against the full-dimension top-k —
    the measurement that picks the serving dimensionality/recall
    trade-off (the embedding analog of ann_probe_sweep's probe
    budget).

    ONE plan, ONE corpus scan serves every dim: the (query x dim) set
    is exploded on the broadcast side (|Q|*|dims| rows),
    slice(vec, 1, dim) truncates inside the cosine, and top-k per
    (dim, query) collapses to id-arrays in one agg. The full-dim
    baseline is then a max_by window over that tiny frame — reusing
    the top-k relation twice would replan the whole scoring subtree
    (Spark shares no subtrees), so the grading join is a window, not
    a self-join. The largest ``dims`` entry is the grading baseline.
    Returns (dim, query_id, n_hits, recall)."""
    qd = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(F.array(*[F.lit(d) for d in dims])).alias("dim"),
    )
    scored = corpus.crossJoin(F.broadcast(qd)).select(
        "dim",
        F.col(query_id_col),
        F.col(id_col),
        V.cosine(
            F.expr(f"slice({vec_col}, 1, dim)"),
            F.expr(f"slice({query_vec_col}, 1, dim)"),
        ).alias("score"),
    )
    pair = F.struct((-F.col("score")).alias("_o"), F.col(id_col))
    tops = scored.groupBy("dim", query_id_col).agg(
        F.transform(
            F.slice(F.sort_array(F.collect_list(pair)), 1, k),
            lambda s: s[id_col],
        ).alias("ids")
    )
    w = Window.partitionBy(query_id_col)
    graded = tops.withColumn(
        "_base", F.expr("max_by(ids, dim)").over(w)
    ).withColumn("_hits", F.size(F.array_intersect("ids", "_base")))
    return graded.select(
        F.col("dim").cast("long"),
        query_id_col,
        F.col("_hits").cast("long").alias("n_hits"),
        F.round(F.col("_hits") / float(k), 6).alias("recall"),
    )


def _residual_expr(vec_col, cell_col, centroids: list[list[float]]):
    """x − centroid[cell], elementwise (zip_with; the oracle's
    list_transform(list_zip(...)) computes the identical sequence)."""
    cent = F.element_at(_mat_lit(centroids), cell_col + 1)
    return F.zip_with(vec_col.cast("array<double>"), cent, lambda x, c: x - c)


def ann_ivfpq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding (faiss IndexIVFPQ
    ``by_residual=True``, its default — the completion of ann_ivfpq's
    ``by_residual=False``): vectors encode the residual x − c(x)
    against codebooks trained on residuals, so the code budget spends
    itself on the within-cell spread instead of the cell layout.

    The serving cost faiss pays for it appears here too: the ADC
    lookup tables become per-(query, PROBED CELL) — the query residual
    q − c changes with the cell — instead of per-query. That work
    lands on the exploded broadcast side (nprobe small LUT builds per
    query); the corpus side stays m lookups + m−1 adds per code row.
    Same probe choice, join shape and top-k agg as ann_ivfpq_topk.
    Returns (query_id, id, dist, rank), dist ascending."""
    from .knn import topk_per_key_agg

    coded = with_cell(
        corpus.select(F.col(id_col), F.col(vec_col)), vec_col, centroids
    ).select(
        F.col(id_col),
        pq_code_expr(
            _residual_expr(F.col(vec_col), F.col("_cell"), centroids), codebooks
        ).alias("_codes"),
        "_cell",
    )
    probes = _probe_structs(F.col(query_vec_col), centroids)
    qcells = queries.select(
        query_id_col,
        query_vec_col,
        F.explode(
            F.slice(F.array_sort(probes, _by_dist_then_cell), 1, nprobe)
        ).alias("p"),
    ).select(
        query_id_col,
        pq_adc_luts(
            _residual_expr(F.col(query_vec_col), F.col("p.cell"), centroids),
            codebooks,
        ).alias("_lut"),
        F.col("p.cell").alias("_cell"),
    )
    scored = coded.join(F.broadcast(qcells), "_cell").select(
        query_id_col,
        id_col,
        pq_adc_dist_lut(F.col("_lut"), F.col("_codes"), len(codebooks)).alias("dist"),
    )
    return topk_per_key_agg(scored, query_id_col, id_col, k, score_col="dist", asc=True)


# --- binary (sign-bit) index: faiss IndexBinaryFlat ----------------------


def sign_bit_words(vec_col, dim: int = 64, word_bits: int = 32) -> list:
    """Binarize a vector to sign-bit machine words (faiss
    IndexBinaryFlat's layout; ITQ/sign-hash binarization): bit i of
    word w is set iff vec[w·32 + i] > 0. Two 32-bit words cover 64
    dims without touching the sign bit of a long. The per-bit weights
    enter as ONE literal array (no shiftleft-by-column), so the fold
    is exact integer arithmetic — bit-identical across engines."""
    words = []
    for w in range(0, dim, word_bits):
        n = min(word_bits, dim - w)
        weights = F.lit([1 << b for b in range(n)]).cast("array<long>")
        sliced = F.slice(vec_col.cast("array<double>"), w + 1, n)
        words.append(
            F.aggregate(
                F.zip_with(
                    sliced,
                    weights,
                    lambda x, wt: F.when(x > 0, wt).otherwise(F.lit(0).cast("long")),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
        )
    return words


def binary_hamming_topk(
    vectors: DataFrame,
    query_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hamming top-k over sign-binarized vectors (faiss
    IndexBinaryFlat): 64 dims compress to 8 BYTES per vector (32×
    smaller than float32), distance is two xor+popcount ops — the
    cheapest usable ANN when vectors are roughly isotropic (random
    hyperplane LSH with the axis-aligned planes).

    Plan: binarization is a narrow codegen map; the query's two words
    ride a 1-row broadcast; top-k via sort-limit. Every value is an
    exact integer, so the oracle hash-checks bit-for-bit. At 100 TB
    the words column is the thing you'd MATERIALIZE (8 B/vector) and
    scan instead of the embeddings — the same build-once posture as
    ann_ivf_indexed."""
    lo, hi = sign_bit_words(F.col(vec_col))
    words = vectors.select(
        F.col(id_col), lo.alias("_lo"), hi.alias("_hi")
    )
    q = (
        words.filter(F.col(id_col) == query_id)
        .select(F.col("_lo").alias("_qlo"), F.col("_hi").alias("_qhi"))
    )
    scored = (
        words.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            (
                F.bit_count(F.col("_lo").bitwiseXOR(F.col("_qlo")))
                + F.bit_count(F.col("_hi").bitwiseXOR(F.col("_qhi")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    top = scored.orderBy("hamming", id_col).limit(k)
    w = Window.orderBy("hamming", id_col)
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"), id_col, "hamming"
    )


# --- uniform int8 scalar quantizer: faiss QT_8bit_uniform ----------------


def sq8_topk(
    vectors: DataFrame,
    query_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized L2 top-k (faiss IndexScalarQuantizer,
    QT_8bit_uniform): every component quantizes to an int in
    [-127, 127] under ONE global scale (corpus absmax / 127), and the
    symmetric distance Σ(Δcode)² is computed entirely in exact longs —
    4× smaller vectors, integer-only distance kernel, and the oracle
    hash-checks every distance bit-for-bit.

    Plan: absmax is a 1-row broadcast scalar (one map-side-combinable
    agg of per-vector maxes); encode is a narrow transform; the query
    code rides a second 1-row broadcast; top-k via sort-limit.
    approx_l2 = √dist · scale rescales to float space at the very end
    (one sqrt + one multiply per emitted row). The per-dimension-scale
    variant (QT_8bit) is quantize_int8_profile's scheme — this op
    keeps the uniform scale so the distance stays integer."""
    absmax = vectors.agg(
        F.max(
            F.array_max(
                F.transform(F.col(vec_col).cast("array<double>"), F.abs)
            )
        ).alias("_absmax")
    )
    code = lambda vec: F.transform(  # noqa: E731
        vec.cast("array<double>"),
        lambda x: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.floor(x / (F.col("_absmax") / 127) + F.lit(0.5)),
            ),
        ),
    )
    coded = vectors.crossJoin(F.broadcast(absmax)).select(
        F.col(id_col), code(F.col(vec_col)).alias("_codes"), "_absmax"
    )
    q = coded.filter(F.col(id_col) == query_id).select(
        F.col("_codes").alias("_qcodes")
    )
    dist = F.aggregate(
        F.zip_with(F.col("_codes"), F.col("_qcodes"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        coded.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(id_col, dist.alias("code_dist"), "_absmax")
    )
    top = scored.orderBy("code_dist", id_col).limit(k)
    w = Window.orderBy("code_dist", id_col)
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        id_col,
        "code_dist",
        F.round(F.sqrt(F.col("code_dist")) * (F.col("_absmax") / 127), 6).alias(
            "approx_l2"
        ),
    )


def ann_ivf_sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF + uniform int8 scalar quantizer (faiss
    IndexIVFScalarQuantizer with QT_8bit_uniform): the inverted file
    bounds WHICH vectors a query scans (nprobe cells), the scalar
    quantizer bounds WHAT each comparison costs (4× smaller codes,
    integer-only Σ(Δcode)² kernel) — the two compressions compose
    orthogonally, which is the reason the faiss factory string
    'IVF...,SQ8' exists. Symmetric code-space distance keeps every
    compared value an exact long, so the full composite path — cell
    assignment, probe choice, encode, distance, ranking — hash-checks
    bit-for-bit against the oracle's replay of the same centroid and
    scale literals.

    Plan posture: one global absmax broadcast, cell assignment +
    encode in a single narrow map over the corpus, probe fan-out on
    the broadcast query side, candidate join on the cell key, per-query
    top-k as a keyed agg. At 100 TB the (cell, id, codes) frame is the
    materialized index (ann_ivfpq_indexed's layout with SQ codes)."""
    absmax = corpus.agg(
        F.max(
            F.array_max(F.transform(F.col(vec_col).cast("array<double>"), F.abs))
        ).alias("_absmax")
    )
    code = lambda vec: F.transform(  # noqa: E731
        vec.cast("array<double>"),
        lambda x: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.floor(x / (F.col("_absmax") / 127) + F.lit(0.5)),
            ),
        ),
    )
    coded = (
        with_cell(corpus, vec_col, centroids)
        .crossJoin(F.broadcast(absmax))
        .select(F.col(id_col), F.col("_cell"), code(F.col(vec_col)).alias("_codes"))
    )
    probes = _probe_structs(F.col(query_vec_col), centroids)
    qcells = (
        queries.crossJoin(F.broadcast(absmax))
        .select(
            query_id_col,
            code(F.col(query_vec_col)).alias("_qcodes"),
            F.explode(
                F.slice(F.array_sort(probes, _by_dist_then_cell), 1, nprobe)
            ).alias("p"),
        )
        .select(query_id_col, "_qcodes", F.col("p.cell").alias("_cell"))
    )
    from .knn import topk_per_key_agg

    dist = F.aggregate(
        F.zip_with(F.col("_codes"), F.col("_qcodes"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = coded.join(F.broadcast(qcells), "_cell").select(
        query_id_col, id_col, dist.alias("code_dist")
    )
    return topk_per_key_agg(
        scored, query_id_col, id_col, k, score_col="code_dist", asc=True
    )


def quantization_recall(
    vectors: DataFrame,
    n_queries: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the two compressed indexes (uniform-int8 SQ and
    sign-bit binary) against exact float L2 — the quantization-loss
    measurement that decides how much refinement (rerank) a compressed
    first stage needs. Per (query, method): |compressed top-k ∩ exact
    top-k| / k.

    One corpus pass per representation (float, int8 codes, sign
    words), each with the broadcast query side and a keyed per-query
    top-k agg; the intersections are k-row joins. Exact integer
    kernels for both compressed towers, so the only float ranking is
    the exact-L2 reference itself."""
    from .knn import topk_per_key_agg

    qs = vectors.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    corpus = vectors.select(id_col, vec_col)

    exact = (
        corpus.crossJoin(F.broadcast(qs))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            V.euclidean(F.col(vec_col), F.col("_qv")).alias("dist"),
        )
    )
    exact_top = topk_per_key_agg(exact, "query_id", id_col, k, "dist", asc=True)

    absmax = vectors.agg(
        F.max(
            F.array_max(F.transform(F.col(vec_col).cast("array<double>"), F.abs))
        ).alias("_absmax")
    )
    code = lambda vec: F.transform(  # noqa: E731
        vec.cast("array<double>"),
        lambda x: F.greatest(
            F.lit(-127).cast("long"),
            F.least(
                F.lit(127).cast("long"),
                F.floor(x / (F.col("_absmax") / 127) + F.lit(0.5)),
            ),
        ),
    )
    coded = corpus.crossJoin(F.broadcast(absmax)).select(
        F.col(id_col), code(F.col(vec_col)).alias("_codes")
    )
    qcoded = qs.crossJoin(F.broadcast(absmax)).select(
        "query_id", code(F.col("_qv")).alias("_qcodes")
    )
    sq_dist = F.aggregate(
        F.zip_with(F.col("_codes"), F.col("_qcodes"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    sq = (
        coded.crossJoin(F.broadcast(qcoded))
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, sq_dist.cast("double").alias("dist"))
    )
    sq_top = topk_per_key_agg(sq, "query_id", id_col, k, "dist", asc=True)

    lo, hi = sign_bit_words(F.col(vec_col))
    words = corpus.select(F.col(id_col), lo.alias("_lo"), hi.alias("_hi"))
    qlo, qhi = sign_bit_words(F.col("_qv"))
    qwords = qs.select("query_id", qlo.alias("_qlo"), qhi.alias("_qhi"))
    ham = (
        words.crossJoin(F.broadcast(qwords))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            (
                F.bit_count(F.col("_lo").bitwiseXOR(F.col("_qlo")))
                + F.bit_count(F.col("_hi").bitwiseXOR(F.col("_qhi")))
            )
            .cast("double")
            .alias("dist"),
        )
    )
    ham_top = topk_per_key_agg(ham, "query_id", id_col, k, "dist", asc=True)

    marked = exact_top.select("query_id", F.col(id_col), F.lit(1).alias("_hit"))

    def _recall(top: DataFrame, method: str) -> DataFrame:
        # LEFT join (not semi) so a query with ZERO hits still emits
        # its recall=0 row — the failure case is the one the harness
        # exists to surface.
        joined = top.join(marked, ["query_id", id_col], "left")
        return (
            joined.groupBy("query_id")
            .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("_n"))
            .select(
                "query_id",
                F.lit(method).alias("method"),
                F.round(F.col("_n") / k, 6).alias("recall"),
            )
        )

    return _recall(sq_top, "sq8").unionAll(_recall(ham_top, "binary"))
