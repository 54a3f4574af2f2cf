"""Hypertable-style continuous aggregate (rollup table + fresh tail).

The TimescaleDB pattern re-expressed for Spark storage: a materialized
time-bucketed aggregate table covers history; queries union it with an
on-the-fly aggregation of the not-yet-rolled-up tail, so full-history
dashboards never rescan raw history. At 100 TB the rollup is partitioned by
bucket date (partition pruning serves time-range queries) and refresh is
incremental: only buckets newer than the high-water mark are recomputed.

Aggregates stored are the ALGEBRAIC partials (count, sum, min, max) so any
query-time re-aggregation (avg = sum/count, regrouping hourly->daily) stays
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def rollup_aggs() -> list:
    """Algebraic partials (lazy: Columns need an active session)."""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]


def _bucketed(events: DataFrame, bucket: str) -> DataFrame:
    return events.groupBy(
        F.window("ts", bucket).alias("win"), "event_type"
    ).agg(*rollup_aggs()).select(
        F.col("win.start").alias("bucket_start"),
        F.to_date("win.start").alias("bucket_date"),
        "event_type",
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
    )


def refresh_rollup(
    events: DataFrame, rollup_path: str, bucket: str = "1 hour"
) -> None:
    """Full rebuild (bootstrap). Incremental refresh = same write with
    events filtered to buckets past the high-water mark and
    partitionOverwriteMode=dynamic replacing only touched date partitions."""
    _bucketed(events, bucket).write.mode("overwrite").partitionBy(
        "bucket_date"
    ).parquet(rollup_path)


def refresh_rollup_incremental(
    spark: SparkSession, events_tail: DataFrame, rollup_path: str, bucket: str = "1 hour"
) -> None:
    """Recompute only the date partitions the tail touches (dynamic
    partition overwrite — history partitions untouched). Uses the
    per-write option, which overrides the session conf, so concurrent
    plain overwrites on the same SparkSession keep static semantics."""
    (
        _bucketed(events_tail, bucket)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket_date")
        .parquet(rollup_path)
    )


def rollup_with_tail(
    spark: SparkSession,
    rollup_path: str,
    tail_events: DataFrame,
    bucket: str = "1 hour",
) -> DataFrame:
    """Serve the continuous aggregate: stored rollup UNION fresh tail,
    re-aggregated so a bucket split across both sides merges exactly."""
    stored = spark.read.parquet(rollup_path).drop("bucket_date")
    fresh = _bucketed(tail_events, bucket).drop("bucket_date")
    return (
        stored.unionByName(fresh)
        .groupBy("bucket_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
