"""IVF (inverted-file) approximate nearest-neighbor search — the coarse-
quantizer scale path alongside LSH (operators/similarity.py).

Two pieces:

1. ``kmeans`` — Lloyd's iterations in pure DataFrame ops (the 'iterative
   algorithm' category the oracle contract exempts): assignment is a
   broadcast cross-join argmin over k centroids; the centroid update is a
   posexplode + per-dimension mean. Centroids live on the driver between
   iterations (k*dim floats — tiny), the data never leaves executors.
2. ``ivf_topk`` — corpus rows are bucketed by nearest centroid (the
   inverted lists); a query probes its ``n_probe`` nearest centroids and
   re-ranks only those lists with exact cosine. At 100 TB the inverted
   lists are a partitioned table clustered by centroid id; probe cost is
   (n_probe / k) of the corpus instead of all of it.

Deterministic: centroids seed from fixed corpus rows (ids sorted), no RNG
at runtime.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.partitioning import (
    ensure_min_parallelism,
)
from autonomous_orchestrator_ai_spark.operators.similarity import (
    _as_double_array,
    cosine,
    dot,
)


def _centroid_lits(centroids: np.ndarray):
    # one ArrayType Literal per centroid (not dim scalar literals) — small
    # expression tree, fast whole-stage-codegen JIT
    return [F.lit([float(x) for x in c]) for c in centroids]


def _nearest_centroid(vec, centroid_cols) -> F.Column:
    """argmin over squared L2 distance, expressed as argmax of
    (2*dot - ||c||^2) — one dot per centroid, no per-pair norm of vec."""
    best_id = F.lit(0)
    best_score = None
    for cid, c in enumerate(centroid_cols):
        c_norm2 = F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
        score = 2 * dot(vec, c) - c_norm2
        if best_score is None:
            best_score = score
        else:
            better = score > best_score
            best_id = F.when(better, F.lit(cid)).otherwise(best_id)
            best_score = F.when(better, score).otherwise(best_score)
    return best_id


def kmeans(
    df: DataFrame,
    k: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Lloyd's k-means; returns (k, dim) centroid matrix. Seeds = k rows
    evenly spaced in id order (deterministic, and spread across the data —
    taking the k smallest ids would often seed inside one cluster)."""
    data = ensure_min_parallelism(df).select(
        F.col(id_col), _as_double_array(vec_col).alias("__v")
    )
    n = data.count()
    w = Window.orderBy(id_col)
    stride = max(1, n // k)
    seeds = (
        data.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") - 1) % stride == 0)
        .orderBy("__rn")
        .limit(k)
        .collect()
    )
    centroids = np.array([row["__v"] for row in seeds], dtype=np.float64)
    if len(centroids) < k:  # tiny inputs: pad with repeats
        centroids = np.vstack([centroids] * ((k // len(centroids)) + 1))[:k]

    for _ in range(iterations):
        assigned = data.withColumn(
            "__c", _nearest_centroid(F.col("__v"), _centroid_lits(centroids))
        )
        flat = assigned.select("__c", F.posexplode("__v").alias("__i", "__x"))
        means = (
            flat.groupBy("__c", "__i")
            .agg(F.avg("__x").alias("m"))
            .collect()
        )
        new_centroids = centroids.copy()
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["__c"], {})[r["__i"]] = r["m"]
        for cid, dims in by_cluster.items():
            for i, m in dims.items():
                new_centroids[cid][i] = m
        if np.allclose(new_centroids, centroids, atol=1e-9):
            break
        centroids = new_centroids
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: probe the query's ``n_probe`` nearest inverted
    lists, exact-cosine re-rank inside them. Same output shape as
    cosine_topk: (query_id, neighbor_id, cosine_sim, rank)."""
    cols = _centroid_lits(centroids)
    c = ensure_min_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"), _as_double_array(vec_col).alias("__cv")
    ).withColumn("bucket", _nearest_centroid(F.col("__cv"), cols))

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double_array(vec_col).alias("__qv")
    )
    # rank all centroids per query, keep n_probe nearest (driver-free: the
    # per-centroid scores are expressions; n_probe selection via array sort)
    scored = q.select(
        "query_id",
        "__qv",
        F.array(
            *[
                F.struct(
                    (2 * dot(F.col("__qv"), c_) -
                     F.aggregate(c_, F.lit(0.0), lambda a, x: a + x * x)).alias("score"),
                    F.lit(cid).alias("cid"),
                )
                for cid, c_ in enumerate(cols)
            ]
        ).alias("__cands"),
    )
    probed = scored.withColumn(
        "bucket",
        F.explode(
            F.slice(
                F.reverse(F.array_sort("__cands")), 1, n_probe
            ).cast("array<struct<score:double,cid:int>>")
        ),
    ).select("query_id", "__qv", F.col("bucket.cid").alias("bucket"))

    pairs = c.join(F.broadcast(probed), "bucket")
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    ranked = pairs.select(
        "query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("__sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc("neighbor_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("__sim", 6).alias("cosine_sim"), "rank")
    )
