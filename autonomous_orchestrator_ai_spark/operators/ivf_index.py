"""Persisted IVF index — the inverted-file analog of ``ann_index``'s LSH
layout (reference parity: none — the reference has no vector stack; this
is part of the training-data-pipeline surface).

``build_ivf_index`` freezes a coarse quantizer (k-means centroids, trained
on a bounded sample — operators.ivf.kmeans_sample) INTO the index metadata
and materializes the corpus partitioned by nearest-centroid bucket:
PARTITIONED BY (bucket). ``query_ivf_index`` loads the centroids back from
the meta (single source of truth — a probe can never use a different
quantizer than the build), computes each query's n_probe nearest lists
driver-side, and reads ONLY those bucket partitions (partition pruning),
exact-cosine re-ranking inside. ``append_to_ivf_index`` assigns new
vectors with the FROZEN centroids — the standard IVF maintenance contract
(the quantizer never retrains on append; rebuild when drift accumulates)
— writing under ``__batch=batch_id`` partitions for replay-idempotent
streaming appends, exactly like the LSH index.

At 100 TB: a probe touches n_probe/n_lists of the index; append cost is
one assignment pass over the batch; the quantizer rides in a few KB of
JSON metadata.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.ann_index import (
    _write_manifest,
    read_bucket_manifest,
    read_index_meta,
    write_index_meta,
)
from autonomous_orchestrator_ai_spark.operators.ivf import _nearest_centroid_udf
from autonomous_orchestrator_ai_spark.operators.partitioning import (
    ensure_min_parallelism,
)
from autonomous_orchestrator_ai_spark.operators.similarity import (
    _as_double_array,
    cosine,
)

_META_DIR = "_ivf_index_meta"

#: Bucket manifest: one row per live (bucket, __batch) partition with its
#: row count — same metastore-catalog stand-in the LSH index gained in r6
#: (operators/ann_index.py _MANIFEST_DIR), ported here in r7 (the r6
#: docstring argued IVF's partition count was bounded by n_lists, a model
#: constant — true at build, but streaming appends multiply it by the
#: batch count, so a long-lived index's directory tree grows without
#: bound and cold-probe discovery grows with it; the LSH measurement was
#: ~30-35 s discovery vs ~0.4 s pruned read at 12.5k dirs). Cold probes
#: resolve the probed lists' paths from this small table; warm servers
#: pass ``index_df`` from ``load_ivf_index`` as before.
_MANIFEST_DIR = "_ivf_index_manifest"


def _manifest_counts(entries: DataFrame) -> DataFrame:
    return entries.groupBy("bucket", "__batch").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def read_ivf_manifest(spark: SparkSession, path: str) -> DataFrame | None:
    """The IVF index's bucket manifest: (bucket, n_rows, __batch), one row
    per live data partition; None for a pre-manifest index (probes then
    fall back to directory discovery)."""
    return read_bucket_manifest(spark, path, _MANIFEST_DIR)


def _entries(
    vectors: DataFrame,
    centroids: np.ndarray,
    batch_id: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared assignment projection for build and append — one source of
    truth for the layout."""
    return (
        ensure_min_parallelism(vectors)
        .select(
            F.col(id_col).alias("neighbor_id"),
            _as_double_array(vec_col).alias("vec"),
        )
        .withColumn("bucket", _nearest_centroid_udf(centroids)(F.col("vec")))
        .withColumn("__batch", F.lit(batch_id).cast("bigint"))
    )


def _write(entries: DataFrame, path: str, dynamic: bool) -> None:
    writer = entries.repartition("bucket").write.mode("overwrite")
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy("bucket", "__batch").parquet(path)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the inverted-file index at ``path`` and persist the
    coarse quantizer in its metadata. Build owns ``__batch=-1`` (appends
    start at 0, so an append can never dynamic-overwrite build
    partitions)."""
    c = np.ascontiguousarray(centroids, dtype=np.float64)
    entries = _entries(corpus, c, -1, id_col, vec_col)
    spark = corpus.sparkSession
    _write(entries, path, dynamic=False)
    _write_manifest(
        spark, path, _manifest_counts(entries), dynamic=False,
        manifest_dir=_MANIFEST_DIR,
    )
    write_index_meta(
        spark,
        path,
        {
            "n_lists": int(c.shape[0]),
            "dim": int(c.shape[1]),
            "centroids": json.dumps(c.tolist()),
            # for typed empty results when a probe hits no live partition
            "neighbor_id_type": corpus.schema[id_col].dataType.simpleString(),
        },
        meta_dir=_META_DIR,
    )


def load_ivf_centroids(spark: SparkSession, path: str) -> np.ndarray:
    """The frozen quantizer, from the index's own metadata."""
    meta = read_index_meta(spark, path, meta_dir=_META_DIR)
    if meta is None:
        raise ValueError(f"no IVF index metadata at {path}/{_META_DIR}")
    c = np.array(json.loads(meta["centroids"]), dtype=np.float64)
    if c.shape != (int(meta["n_lists"]), int(meta["dim"])):
        raise ValueError(
            f"IVF meta inconsistent at {path}: centroids shape {c.shape} "
            f"!= (n_lists={meta['n_lists']}, dim={meta['dim']})"
        )
    return c


def load_ivf_index(spark: SparkSession, path: str) -> DataFrame:
    """One-time full-discovery handle for a ``build_ivf_index`` table, for
    SERVING: pass it to ``query_ivf_index(index_df=...)`` so repeated
    probes share one resolved file listing (same contract as
    ``ann_index.load_lsh_index``). After ``append_to_ivf_index``, reload —
    a cached handle's listing will not see new ``__batch`` directories."""
    return spark.read.parquet(path)


def query_ivf_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """Probe the persisted index: per query, its ``n_probe`` nearest
    centroids' partitions are read via a bucket IN-list on the partition
    column (pruned scan — same contract as ``query_lsh_index``), then
    exact-cosine re-rank. Queries are a serving batch: vectors collect to
    the driver for the (tiny) centroid dot products.

    ``index_df``: a handle from ``load_ivf_index`` — long-lived servers
    pass this so repeated probes share one resolved file listing.
    Omitted, a COLD probe resolves the probed lists' paths from the
    bucket manifest written at build/append time and reads ONLY those
    directories — no index-tree discovery (r7; pre-manifest indexes fall
    back to a full listing, which grows with the append count)."""
    centroids = load_ivf_centroids(spark, path)
    qrows = queries.select(
        F.col(id_col).alias("query_id"), _as_double_array(vec_col).alias("__qv")
    ).collect()

    def _empty_topk() -> DataFrame:
        qid_type = queries.schema[id_col].dataType.simpleString()
        stored = read_index_meta(spark, path, meta_dir=_META_DIR) or {}
        nid_type = stored.get("neighbor_id_type") or (
            load_ivf_index(spark, path).schema["neighbor_id"].dataType
        ).simpleString()
        return spark.createDataFrame(
            [],
            f"query_id {qid_type}, neighbor_id {nid_type}, "
            "cosine_sim double, rank bigint",
        )

    if not qrows:
        return _empty_topk()
    qm = np.array([r["__qv"] for r in qrows], dtype=np.float64)
    # SAME scoring as operators.ivf._probe_udf (squared-L2 argmin as
    # argmax of 2xc - |c|^2, stable ties) — a different probe metric here
    # would silently diverge from the inline operator
    c_norm2 = (centroids * centroids).sum(axis=1)
    scores = 2.0 * (qm @ centroids.T) - c_norm2
    probes = np.argsort(-scores, axis=1, kind="stable")[:, :n_probe]
    probe_pairs = [
        (r["query_id"], [int(b) for b in probes[i]])
        for i, r in enumerate(qrows)
    ]
    buckets = sorted({b for _, bs in probe_pairs for b in bs})
    q = spark.createDataFrame(
        [(qid, r["__qv"], b) for (qid, bs), r in zip(probe_pairs, qrows)
         for b in bs],
        f"query_id {queries.schema[id_col].dataType.simpleString()}, "
        "__qv array<double>, bucket int",
    )
    index = index_df
    if index is None:
        manifest = read_ivf_manifest(spark, path)
        if manifest is not None:
            # COLD-PROBE FAST PATH: resolve the probed lists' paths from
            # the manifest (one small parquet read) and read ONLY those
            # directories. basePath keeps (bucket, __batch) as partition
            # columns of the sub-scan.
            live = sorted(
                r["bucket"]
                for r in manifest.select("bucket").distinct().collect()
                if r["bucket"] in set(buckets)
            )
            if not live:  # every probed list is empty in this index
                return _empty_topk()
            index = spark.read.option("basePath", path).parquet(
                *[f"{path}/bucket={b}" for b in live]
            )
        else:  # pre-manifest index: full directory discovery
            index = load_ivf_index(spark, path)
    pairs = index.filter(F.col("bucket").isin(buckets)).join(
        F.broadcast(q), "bucket"
    )
    if exclude_self:
        pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qv"), F.col("vec")).alias("__sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("__sim", 6).alias("cosine_sim"),
            "rank",
        )
    )


def append_to_ivf_index(
    new_vectors: DataFrame,
    path: str,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Assign a batch of NEW vectors with the index's FROZEN centroids and
    dynamic-overwrite exactly this batch's (bucket, batch) partitions —
    replaying a batch (at-least-once foreachBatch) rewrites the same
    partitions to the same content. No retraining on append, by design.

    Manifest-first write order, same rationale as ``append_to_lsh_index``
    (r7): the two writes are not atomic, and cold probes resolve paths
    solely from the manifest — dying between them must leave a
    listed-but-missing path that fails LOUDLY and heals on replay, never
    an on-disk bucket the manifest silently omits."""
    if batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0 (got {batch_id}); negative ids are "
            "reserved for the base build"
        )
    spark = new_vectors.sparkSession
    centroids = load_ivf_centroids(spark, path)
    entries = _entries(new_vectors, centroids, batch_id, id_col, vec_col)
    _write_manifest(
        spark, path, _manifest_counts(entries), dynamic=True,
        manifest_dir=_MANIFEST_DIR,
    )
    _write(entries, path, dynamic=True)
