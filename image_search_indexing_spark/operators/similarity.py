"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — queries × corpus with the dot
product as a JVM-side higher-order ``zip_with``/``aggregate`` expression
(no Python in the hot path); broadcast the (small) query side so the big
corpus never shuffles. Scale path: LSH bucketing by random-hyperplane
signs (deterministic seed), so each query only scans its bucket —
the IVF-style variant a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import xxhash64


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, neighbor_id, rank).

    The query side is broadcast (it is the small side by construction);
    ranking ties break by neighbor id for determinism. Vectors are cast
    to double before arithmetic so results are engine-portable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 7) -> Column:
    """Deterministic random-hyperplane LSH signature (bigint bucket id).

    Plane coefficients come from xxhash64(seed, plane, coord) mapped to
    ±1 — reproducible on any engine, no stored model. Sign of the dot
    product per plane contributes one bit.
    """
    planes = [
        [1.0 if xxhash64(f"{seed}:{p}:{i}") % 2 == 0 else -1.0 for i in range(dim)]
        for p in range(n_planes)
    ]
    sig = F.lit(0).cast("long")
    for p, coeffs in enumerate(planes):
        arr = F.array(*[F.lit(c) for c in coeffs])
        s = dot(vec, arr)
        sig = sig.bitwiseOR(F.when(s >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0)))
    return sig


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_centroids: int = 16,
    iters: int = 5,
    sample_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic IVF coarse quantizer: numpy k-means on a bounded,
    id-ordered sample (the standard IVF practice — train on a sample,
    assign at scale). Init = the sample's first n_centroids vectors;
    fixed iteration count; no RNG — identical centroids on every run and
    partition count. Returns a (n_centroids, dim) float64 ndarray.
    """
    import numpy as np

    sample = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("id")
        .limit(sample_cap)
        .collect()
    )
    x = np.array([r["v"] for r in sample], dtype=np.float64)
    cents = x[:n_centroids].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def _nearest_centroid_ids(vec: Column, cents, nprobe: int) -> Column:
    """array<int> of the nprobe nearest centroid ids (ties → lower id)."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(vec, F.array(*[F.lit(float(c)) for c in cents[i]]),
                               lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("dist"),
                F.lit(i).alias("cid"),
            )
            for i in range(len(cents))
        ]
    )
    ranked = F.array_sort(scored)  # by (dist, cid)
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cid"])


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-style approximate top-k: (query_id, neighbor_id, rank).

    The corpus shuffles ONCE by its nearest centroid (the inverted lists);
    each query probes only its ``nprobe`` nearest lists, so the scan
    fraction is nprobe/n_centroids of the corpus — the 100 TB path when
    hyperplane LSH recall is insufficient. With ``nprobe == n_centroids``
    this degenerates to exact brute force (the property the unit test
    pins against ``cosine_topk``).

    ``broadcast_queries=False`` switches the probe join to a shuffle join
    partitioned by centroid id — use it when the query set itself is
    table-sized (≫ broadcast threshold); both sides then co-partition on
    ``cid`` and no executor holds the full query set.
    """
    cents = train_ivf_centroids(corpus, dim, n_centroids, id_col=id_col, vec_col=vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    ).withColumn("cid", _nearest_centroid_ids(F.col("cv"), cents, 1)[0])
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("cid", F.explode(_nearest_centroid_ids(F.col("qv"), cents, nprobe)))
    qside = F.broadcast(q) if broadcast_queries else q
    scored = c.join(qside, "cid").withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def near_dup_pairs(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.35,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed (no cross join).

    Pairs form only INSIDE a hyperplane-signature bucket (a.id < b.id), so
    the comparison count is sum of squared bucket sizes, not n² — the shape
    that survives a 10^9-vector corpus (recall trades off with n_planes).
    Output is (id_a, id_b) without the raw similarity so downstream
    equality checks are float-free; re-derive scores with ``cosine`` if
    needed.
    """
    sig = hyperplane_signature(F.col("v"), dim, n_planes)
    v = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("bucket", sig)
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.where(cosine(F.col("va"), F.col("vb")) >= threshold)
        .select("id_a", "id_b")
    )


def ann_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    One equi-join on the signature instead of a cross join — the scan of
    the corpus partitions by bucket; recall trades off with n_planes.
    ``broadcast_queries=False`` makes it a shuffle join co-partitioned on
    the signature for table-sized query sets (query ≫ broadcast threshold).
    """
    sig = lambda col: hyperplane_signature(col, dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", sig(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", sig(F.col("cv")))
    qside = F.broadcast(q) if broadcast_queries else q
    scored = c.join(qside, "bucket").withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("sim", 6).alias("sim"))
    )
