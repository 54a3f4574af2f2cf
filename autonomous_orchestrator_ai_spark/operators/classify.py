"""Hashed-feature linear quality classifier (the fastText/CCNet slot).

Production LLM-data pipelines gate documents with a cheap linear
classifier over hashed bag-of-words features (fastText supervised, the
CCNet / GPT-3 "quality filter"): tokenize, hash each token into one of
``n_buckets`` feature buckets, average the bucket weights, squash with a
sigmoid, threshold. This module implements that scoring shape Spark-first,
in two interchangeable forms:

* :func:`hashed_linear_score` — the whole model as ONE column expression:
  tokens -> md5 bucket -> in-expression weight -> ``F.aggregate`` mean ->
  sigmoid. Zero shuffle, zero UDF, zero join: scoring 100 TB is a pure
  map over the scan, the best possible plan for this operator. Weights
  are derived from ``md5(salt # bucket)`` — a *frozen pseudo-random
  model*, the same derandomization trick as the frozen LSH hyperplanes
  (operators/similarity.py), which is what lets a DuckDB oracle replay
  the classifier bit-for-bit.

* :func:`score_with_weight_table` — the trained-model path: weights live
  in a (bucket, weight) DataFrame (loaded from wherever training wrote
  them), broadcast-joined against exploded tokens. The weight table is
  bounded by ``n_buckets`` (a model constant, never corpus-scaled), so
  the broadcast hint is safe by construction.

Both paths produce identical scores when the table holds the frozen
weights — pinned by a test — so the oracle-checked expression form
certifies the join-plan form too.

Reference parity note: the reference repo has no ML-based scoring; this
extends the beyond-reference curation surface (operators/curation.py,
functions/text.py quality_score is the heuristic sibling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.functions.text import normalized_text

__all__ = [
    "token_bucket",
    "bucket_weight",
    "hashed_linear_score",
    "frozen_weight_table",
    "score_with_weight_table",
]

#: default feature-space size; 2^18 is fastText's default hash-bucket count.
N_BUCKETS = 1 << 18

#: weight grain: weights are integer/1000 in [-1, 1] — both engines derive
#: the identical IEEE double from the same integer (one exact division),
#: so scores agree to the last ulp before any rounding.
_WEIGHT_STEPS = 2001


def token_bucket(tok: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Feature bucket of a token: first 32 bits of md5, mod n_buckets.
    md5 (not xxhash64) keeps the bucketing engine-portable for oracles."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")
        % F.lit(n_buckets)
    )


def bucket_weight(bucket: Column, salt: str = "w1") -> Column:
    """Frozen pseudo-weight of a feature bucket, uniform on the +/-1 grid.

    Derived from md5 of the salted bucket id — a deterministic function,
    not state: every executor, every engine, every run agrees without
    shipping a table. Swapping in trained weights = switching to
    :func:`score_with_weight_table`; the scoring algebra is identical.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "#"), bucket.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return ((h % _WEIGHT_STEPS) - (_WEIGHT_STEPS - 1) / 2).cast("double") / (
        (_WEIGHT_STEPS - 1) / 2
    )


def hashed_linear_score(
    text: Column | str,
    salt: str = "w1",
    n_buckets: int = N_BUCKETS,
    bias: float = 0.0,
) -> Column:
    """Classifier probability as a single column expression.

    logit = bias + mean over tokens of weight(bucket(token));
    score = sigmoid(logit). ``F.aggregate`` folds over the token array
    row-locally — the whole classifier runs inside whole-stage codegen
    with no exchange. NULL text scores sigmoid(bias); empty text
    tokenizes (like everywhere in this engine) to a single '' token.
    """
    toks = F.split(normalized_text(text), " ")
    n = F.size(toks)
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + bucket_weight(token_bucket(t, n_buckets), salt),
    )
    logit = F.lit(float(bias)) + F.when(n > 0, total / n).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


def frozen_weight_table(
    spark: SparkSession, n_buckets: int = N_BUCKETS, salt: str = "w1"
) -> DataFrame:
    """The frozen model materialized as (bucket, weight) — what a trained
    fastText model would be loaded as. Generated distributed via range()
    (no driver-side list of n_buckets rows)."""
    b = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    return b.select("bucket", bucket_weight(F.col("bucket"), salt).alias("weight"))


def score_with_weight_table(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    bias: float = 0.0,
) -> DataFrame:
    """Trained-model scoring path: (doc_id, score).

    Explode tokens -> bucket -> broadcast join the bounded weight table ->
    per-doc mean -> sigmoid. Tokens missing from the table contribute
    weight 0 (an untrained bucket), matching fastText's zero-initialized
    rows. The groupBy shuffles (doc_id, partial sums) only — token text
    never leaves the map side.
    """
    toks = docs.select(
        id_col, F.explode(F.split(normalized_text(text_col), " ")).alias("tok")
    ).select(id_col, token_bucket(F.col("tok"), n_buckets).alias("bucket"))
    joined = toks.join(F.broadcast(weights), "bucket", "left").select(
        id_col, F.coalesce(F.col("weight"), F.lit(0.0)).alias("w")
    )
    logit = F.lit(float(bias)) + F.sum("w") / F.count(F.lit(1))
    return joined.groupBy(id_col).agg(
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("score")
    )
