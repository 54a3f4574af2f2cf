"""Time-bucket gap-filling with last-observation-carried-forward (LOCF) —
the Timescale-style ``time_bucket_gapfill`` every monitoring/feature
pipeline needs when a sparse event stream must become a dense, regular
series (reference surfaces buckets only where data exists; see
ingest_transform.py:198-210's window aggregation, which leaves gaps).

Plan shape, scale-first:
- the per-(key, bucket) aggregation partial-aggregates map-side and
  shuffles once on the grouping key;
- the bucket range is ONE broadcast row (global min/max), so the dense
  grid is built by exploding a ``sequence`` per distinct key — no shuffle,
  and grid size is #keys x #buckets regardless of input row count;
- the grid join re-shuffles on (key, bucket) — at 100 TB the key
  cardinality carries the parallelism; keep the bucket range bounded by a
  time predicate or the grid itself becomes the data;
- LOCF is a single running ``last(ignorenulls)`` window per key — one
  sort per key partition, no self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["time_bucket", "time_bucket_gapfill"]


def time_bucket(ts: Column | str, width_seconds: int) -> Column:
    """Epoch-aligned tumbling bucket start (timestamp) for ``ts``."""
    ts = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / width_seconds).cast("bigint")
        * width_seconds
    )


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    keys: list[str],
    value_agg: Column,
    value_name: str = "value",
) -> DataFrame:
    """Aggregate ``value_agg`` per (keys, bucket), densify every key to the
    GLOBAL [min, max] bucket range, and carry the last observed value
    forward into the gaps.

    Returns ``keys + [bucket, <value_name>, <value_name>_filled,
    gap_filled]`` where ``<value_name>`` is NULL on synthesized rows,
    ``_filled`` is the LOCF value (NULL before a key's first observation),
    and ``gap_filled`` marks synthesized rows.
    """
    bucketed = (
        df.groupBy(*keys, time_bucket(ts_col, width_seconds).alias("bucket"))
        .agg(value_agg.alias(value_name))
    )
    bounds = bucketed.agg(
        F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1")
    )
    step = F.expr(f"INTERVAL {int(width_seconds)} SECONDS")
    grid = (
        bucketed.select(*keys)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            *keys,
            F.explode(
                F.sequence(F.col("__b0"), F.col("__b1"), step)
            ).alias("bucket"),
        )
    )
    filled = grid.join(bucketed, [*keys, "bucket"], "left")
    order = Window.partitionBy(*keys).orderBy("bucket")
    return filled.select(
        *keys,
        "bucket",
        value_name,
        F.last(value_name, ignorenulls=True)
        .over(order)
        .alias(f"{value_name}_filled"),
        F.col(value_name).isNull().alias("gap_filled"),
    )
