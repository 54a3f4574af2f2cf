"""KMV sketch unit tests (operators/kmv.py).

The registered queries are oracle-exact vs DuckDB (plans/kmv_queries.py);
these tests pin the operator-level laws on hand-built sets where the
right answer is known analytically: exactness below k, the estimator
form at k, and Jaccard exactness when the sketch covers the union.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.kmv import (
    kmv_distinct_estimate,
    kmv_jaccard_pairs,
    kmv_sketch,
)


def _sets_df(spark, sets: dict[str, list[str]]):
    rows = [(g, v) for g, vals in sets.items() for v in vals]
    return spark.createDataFrame(rows, "g string, v string")


def test_sketch_bounded_and_exact_below_k(spark):
    df = _sets_df(spark, {"a": [f"x{i}" for i in range(40)] * 3,
                          "b": [f"y{i}" for i in range(5)]})
    sk = kmv_sketch(df, "v", ["g"], k=16)
    per_group = {r["g"]: r["n"] for r in
                 sk.groupBy("g").agg(F.count("*").alias("n")).collect()}
    # full group capped at k; small group keeps its whole (deduped) set
    assert per_group == {"a": 16, "b": 5}

    est = {r["g"]: r["est_distinct"] for r in
           kmv_distinct_estimate(sk, ["g"], 16).collect()}
    assert est["b"] == 5.0  # below k: the sketch IS the set -> exact


def test_estimate_tracks_true_cardinality(spark):
    n = 5000
    df = _sets_df(spark, {"a": [f"v{i}" for i in range(n)]})
    sk = kmv_sketch(df, "v", ["g"], k=256)
    est = kmv_distinct_estimate(sk, ["g"], 256).collect()[0]["est_distinct"]
    # 3-sigma band at k=256: ~18.8% relative
    assert abs(est / n - 1.0) < 0.2


def test_jaccard_exact_when_k_covers_union(spark):
    shared = [f"s{i}" for i in range(30)]
    only_a = [f"a{i}" for i in range(10)]
    only_b = [f"b{i}" for i in range(20)]
    df = _sets_df(spark, {"a": shared + only_a, "b": shared + only_b})
    sk = kmv_sketch(df, "v", ["g"], k=128)  # union = 60 < k -> lossless
    row = kmv_jaccard_pairs(sk, "g", 128).collect()[0]
    assert (row["g_a"], row["g_b"]) == ("a", "b")
    assert row["k_prime"] == 60 and row["n_both"] == 30
    assert row["jaccard_est"] == 0.5  # exactly 30/60


def test_jaccard_extremes(spark):
    same = [f"s{i}" for i in range(25)]
    df = _sets_df(spark, {"a": same, "b": list(same),
                          "c": [f"c{i}" for i in range(25)]})
    got = {(r["g_a"], r["g_b"]): r["jaccard_est"]
           for r in kmv_jaccard_pairs(kmv_sketch(df, "v", ["g"], k=64),
                                      "g", 64).collect()}
    assert got[("a", "b")] == 1.0  # identical sets
    assert got[("a", "c")] == 0.0 and got[("b", "c")] == 0.0  # disjoint


def test_nulls_dropped(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y")], "g string, v string"
    )
    sk = kmv_sketch(df, "v", ["g"], k=8)
    assert sk.count() == 2
