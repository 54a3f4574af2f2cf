"""Skew-handling + bucketing tests: semantics AND plan shape (the scale
claims are asserted against the physical plan, not just believed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.skew import (
    bucketed_join,
    salted_aggregate,
    salted_join,
    with_salt,
    write_bucketed,
)


@pytest.fixture()
def skewed_df(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(900).select(
        F.lit("HOT").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(100).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k"), F.lit(1.0).alias("v")
    )
    return hot.unionByName(tail)


def test_salt_distribution(skewed_df):
    salted = with_salt(skewed_df, "k", 8)
    per_salt = salted.filter("k = 'HOT'").groupBy("__salt").count().collect()
    assert len(per_salt) == 8                    # hot key actually spreads
    assert max(r["count"] for r in per_salt) < 900 * 0.5


def test_salted_aggregate_matches_plain(skewed_df):
    plain = {
        r["k"]: (r["n"], round(r["t"], 6))
        for r in skewed_df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("t"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], round(r["t"], 6))
        for r in salted_aggregate(
            skewed_df,
            "k",
            {"cnt": F.count(F.lit(1)), "sum_v": F.sum("v")},
            {"n": F.sum("cnt"), "t": F.sum("sum_v")},
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, skewed_df):
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"key_{i}", f"dim_{i}") for i in range(100)],
        ["k", "label"],
    )
    plain = skewed_df.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(skewed_df, dim, "k").groupBy("k", "label").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        left = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
        right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
        write_bucketed(left, "bkt_left", "k", n_buckets=4, sort_by="k")
        write_bucketed(right, "bkt_right", "k", n_buckets=4, sort_by="k")

        joined = bucketed_join(spark, "bkt_left", "bkt_right", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan            # co-located: shuffle-free
        assert joined.count() == 1000

        # control: the same join on plain (unbucketed) tables DOES shuffle
        left.write.mode("overwrite").saveAsTable("plain_left")
        right.write.mode("overwrite").saveAsTable("plain_right")
        control = spark.table("plain_left").join(spark.table("plain_right"), "k")
        control_plan = control._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in control_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        for t in ["bkt_left", "bkt_right", "plain_left", "plain_right"]:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
