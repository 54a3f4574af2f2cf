"""Range join, continuous aggregate, and sketch tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.rangejoin import range_join
from autonomous_orchestrator_ai_spark.operators.rollup import (
    refresh_rollup,
    refresh_rollup_incremental,
    rollup_with_tail,
)
from autonomous_orchestrator_ai_spark.operators.sketch import (
    approx_distinct,
    bloom_filter_semi_join,
    count_min_sketch,
)


def test_range_join_matches_inequality_join(spark):
    """Bucketized range join == naive inequality join, including ranges that
    span multiple buckets and boundary-exact points."""
    points = spark.createDataFrame(
        [(i, f"2024-01-01 {h:02d}:{m:02d}:00") for i, (h, m) in
         enumerate([(0, 0), (0, 30), (1, 0), (2, 15), (5, 59), (23, 59)])],
        ["pid", "ts_str"],
    ).select("pid", F.to_timestamp("ts_str").alias("ts"))
    ranges = spark.createDataFrame(
        [
            (100, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),   # [0,1h)
            (101, "2024-01-01 00:30:00", "2024-01-01 03:00:00"),   # spans 3 buckets
            (102, "2024-01-01 06:00:00", "2024-01-01 07:00:00"),   # empty
        ],
        ["rid", "s", "e"],
    ).select("rid", F.to_timestamp("s").alias("start"), F.to_timestamp("e").alias("end"))

    got = {
        (r["pid"], r["rid"])
        for r in range_join(points, ranges, "ts", "start", "end", bucket_seconds=3600).collect()
    }
    naive = {
        (r["pid"], r["rid"])
        for r in points.crossJoin(ranges)
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .collect()
    }
    assert got == naive
    assert (0, 100) in got and (2, 101) in got
    assert (2, 100) not in got        # 01:00 excluded from [0,1h)


def test_rollup_with_tail_equals_direct(spark, tmp_path):
    from autonomous_orchestrator_ai_spark.plans.registry import table

    ev = table(spark, "/root/testdata/sf0.001", "events")

    cutoff = "2024-01-20 00:00:00"
    history = ev.filter(F.col("ts") < cutoff)
    tail = ev.filter(F.col("ts") >= cutoff)

    rollup_path = str(tmp_path / "rollup")
    refresh_rollup(history, rollup_path, bucket="1 hour")

    served = rollup_with_tail(spark, rollup_path, tail, bucket="1 hour")
    direct = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events", "sum_value")
    )
    s = {(r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
         for r in served.collect()}
    d = {(r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
         for r in direct.collect()}
    assert s == d

    # incremental refresh folds the tail's partitions in; serving with an
    # empty tail then matches direct
    refresh_rollup_incremental(spark, tail, rollup_path, bucket="1 hour")
    empty_tail = tail.filter(F.lit(False))
    s2 = {(r["bucket_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
          for r in rollup_with_tail(spark, rollup_path, empty_tail).collect()}
    assert s2 == d


def test_approx_distinct_error_bound(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    exact = ev.select("l_orderkey").distinct().count()
    approx = approx_distinct(ev, "l_orderkey", rsd=0.05)
    assert abs(approx - exact) / exact < 0.15


def test_count_min_sketch_builds(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    sketch = count_min_sketch(ev, "l_returnflag")
    assert isinstance(sketch, bytes) and len(sketch) > 0


def test_bloom_filter_semi_join(spark):
    probe = spark.range(0, 10000).select(F.col("id").alias("k"))
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    filtered = bloom_filter_semi_join(probe, build, "k", expected_items=1000)
    n = filtered.count()
    # all 100 true members pass; false-positive rate stays small
    assert 100 <= n < 100 + 10000 * 0.05
    true_members = filtered.filter(F.col("k") < 100).count()
    assert true_members == 100
