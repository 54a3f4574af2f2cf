"""Input-parallelism guard for CPU-bound per-row operators.

A parquet file is split at row-group granularity; a table written as a
single row group (the driver's testdata, any small-file ingest) scans as
ONE task, so every downstream per-row expression — regex tokenization,
shingle md5s, HOF folds over embedding arrays — runs on one core until
the first exchange. ``ensure_min_parallelism`` inserts one cheap
repartition (the inputs are small by definition when this triggers) so
the expensive map work uses the whole cluster.

At real scale this is a no-op: a 100 TB table scans as tens of thousands
of splits, which already exceeds ``defaultParallelism``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan currently yields fewer
    partitions than ``target`` (default: the cluster's default
    parallelism). Batch-only; streaming frames pass through untouched."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
