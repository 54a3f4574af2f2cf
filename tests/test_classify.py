"""Hashed-feature linear classifier (operators/classify.py): the frozen
expression form and the weight-table join form must be the same model."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.classify import (
    frozen_weight_table,
    hashed_linear_score,
    score_with_weight_table,
    token_bucket,
)

NB = 4096  # small feature space keeps frozen_weight_table cheap in tests


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=0, text="alpha beta gamma delta"),
            Row(doc_id=1, text="  Alpha   BETA gamma delta "),  # normalizes to doc 0
            Row(doc_id=2, text="zeta eta theta iota kappa"),
            Row(doc_id=3, text="alpha alpha alpha alpha"),
            Row(doc_id=4, text=None),
        ]
    )


def test_expression_and_table_paths_agree(spark):
    docs = _docs(spark).where(F.col("text").isNotNull())
    expr = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", hashed_linear_score("text", n_buckets=NB).alias("s")
        ).collect()
    }
    table = {
        r["doc_id"]: r["score"]
        for r in score_with_weight_table(
            docs, frozen_weight_table(spark, NB), n_buckets=NB
        ).collect()
    }
    assert set(expr) == set(table)
    for d in expr:
        assert abs(expr[d] - table[d]) < 1e-12, d


def test_normalization_makes_scores_text_canonical(spark):
    scores = {
        r["doc_id"]: r["s"]
        for r in _docs(spark)
        .where(F.col("doc_id").isin(0, 1))
        .select("doc_id", hashed_linear_score("text", n_buckets=NB).alias("s"))
        .collect()
    }
    assert scores[0] == scores[1]


def test_null_text_scores_sigmoid_of_bias(spark):
    import math

    row = (
        _docs(spark)
        .where(F.col("doc_id") == 4)
        .select(hashed_linear_score("text", n_buckets=NB, bias=0.7).alias("s"))
        .collect()[0]
    )
    assert abs(row["s"] - 1.0 / (1.0 + math.exp(-0.7))) < 1e-12


def test_scores_are_probabilities_and_salt_changes_the_model(spark):
    docs = _docs(spark).where(F.col("text").isNotNull())
    both = docs.select(
        hashed_linear_score("text", salt="w1", n_buckets=NB).alias("a"),
        hashed_linear_score("text", salt="other", n_buckets=NB).alias("b"),
    ).collect()
    assert all(0.0 < r["a"] < 1.0 and 0.0 < r["b"] < 1.0 for r in both)
    assert any(r["a"] != r["b"] for r in both)


def test_bucketing_is_stable_and_in_range(spark):
    rows = (
        spark.createDataFrame([Row(t="alpha"), Row(t="beta"), Row(t="alpha")])
        .select(token_bucket(F.col("t"), NB).alias("b"))
        .collect()
    )
    assert all(0 <= r["b"] < NB for r in rows)
    assert rows[0]["b"] == rows[2]["b"]


def test_expression_form_plan_has_no_exchange(spark):
    docs = _docs(spark).where(F.col("text").isNotNull())
    plan = (
        docs.select(hashed_linear_score("text", n_buckets=NB).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
