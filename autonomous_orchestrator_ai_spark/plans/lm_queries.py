"""Bigram-LM perplexity queries (operators/lm.py) with exact DuckDB
oracles replaying the model construction and scoring step by step.

The CCNet-style quality gate: train an n-gram LM on the corpus, score
every document's perplexity under it, drop the high-perplexity tail.
Unlike unigram_logprob_by_source (order-blind token rarity), these see
token ORDER — a doc of common tokens in an improbable sequence scores
high perplexity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.lm import bigram_perplexity
from autonomous_orchestrator_ai_spark.operators.partitioning import (
    ensure_min_parallelism,
)
from autonomous_orchestrator_ai_spark.plans.registry import register, table

#: Oracle prelude: bigram occurrences + add-one bigram model + per-doc
#: mean negative log-likelihood (mirrors operators/lm.py step for step;
#: DuckDB range(1, n) is 1..n-1, matching Spark's sequence(1, n-1)).
_PER_DOC_CTE = """
    toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
      FROM documents),
    elig AS (
      SELECT doc_id, t, len(t) AS n FROM toks
      WHERE len(t) >= 2 AND t[1] <> ''),
    occ AS (
      SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      FROM (SELECT doc_id, unnest(range(1, n)) AS i, t FROM elig) s(doc_id, i, t)),
    c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM occ GROUP BY w1, w2),
    c1 AS (SELECT w1, SUM(c2) AS c1 FROM c2 GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT tk) AS v_size
          FROM (SELECT w1 AS tk FROM c2 UNION SELECT w2 FROM c2)),
    per_doc AS (
      SELECT occ.doc_id, COUNT(*) AS n_bigrams,
             AVG(-ln((c2.c2 + 1.0) / (c1.c1 + v.v_size))) AS mean_nll
      FROM occ JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
      GROUP BY occ.doc_id)
""".strip()


@register(
    "bigram_perplexity_by_source",
    oracle=f"""
    WITH {_PER_DOC_CTE}
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(exp(p.mean_nll)), 4) AS avg_ppl,
           ROUND(MIN(exp(p.mean_nll)), 4) AS best_ppl,
           ROUND(MAX(exp(p.mean_nll)), 4) AS worst_ppl
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.source ORDER BY d.source
    """,
)
def bigram_perplexity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM perplexity rolled up by source: which training-mix slices
    read like the corpus and which are full of improbable sequences. One
    bigram-model shuffle + two model joins + two aggregations."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    per_doc = bigram_perplexity(docs)
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("perplexity"), 4).alias("avg_ppl"),
            F.round(F.min("perplexity"), 4).alias("best_ppl"),
            F.round(F.max("perplexity"), 4).alias("worst_ppl"),
        )
        .orderBy("source")
    )


@register(
    "high_perplexity_docs",
    oracle=f"""
    WITH {_PER_DOC_CTE}
    SELECT p.doc_id, d.source,
           CAST(p.n_bigrams AS BIGINT) AS n_bigrams,
           ROUND(exp(p.mean_nll), 4) AS perplexity
    FROM per_doc p JOIN documents d USING (doc_id)
    ORDER BY ROUND(exp(p.mean_nll), 4) DESC, p.doc_id
    LIMIT 20
    """,
)
def high_perplexity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet tail-cut list: the 20 most improbable documents under the
    corpus bigram LM (deterministic doc_id tie-break). At 100 TB this is
    the same plan with a threshold filter instead of the LIMIT —
    TakeOrderedAndProject never materializes more than 20 rows here."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    per_doc = bigram_perplexity(docs)
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "n_bigrams",
            F.round("perplexity", 4).alias("perplexity"),
        )
        .orderBy(F.desc("perplexity"), F.asc("doc_id"))
        .limit(20)
    )
