"""Entity-resolution / fuzzy-matching queries with DuckDB-oracle replicas.

The synthetic catalog has no real typos, so — exactly like
``pii_redaction_audit`` injects PII deterministically — the dirty feed is
synthesized in-query: every 5th part's name has one character deleted at a
key-derived position inside its second word. The corruption is pure
``substr`` arithmetic, so the oracle replays it bit-for-bit, and it never
touches the first token, so single-pass first-token blocking is lossless
here (the docstring of ``operators.fuzzy`` covers the multi-pass fix for
corruptions that hit the blocking key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.fuzzy import (
    blocked_levenshtein_join,
    first_token,
)
from autonomous_orchestrator_ai_spark.plans.registry import register, table

#: DuckDB replica of the key-derived single-character deletion.
_DIRTY_SQL = """
  SELECT p_partkey,
         substr(p_name, 1, pos - 1) || substr(p_name, pos + 1) AS dirty_name
  FROM (
    SELECT p_partkey, p_name,
           length(split_part(p_name, ' ', 1)) + 2 + (p_partkey % 3) AS pos
    FROM part WHERE p_partkey % 5 = 0
  )
""".strip()


@register(
    "part_fuzzy_reconcile",
    oracle=f"""
    WITH clean AS (SELECT DISTINCT p_name AS clean_name FROM part),
    dirty AS ({_DIRTY_SQL}),
    matched AS (
      SELECT c.clean_name, d.dirty_name
      FROM dirty d
      JOIN clean c
        ON split_part(d.dirty_name, ' ', 1) = split_part(c.clean_name, ' ', 1)
       AND abs(length(d.dirty_name) - length(c.clean_name)) <= 1
       AND levenshtein(d.dirty_name, c.clean_name) <= 1
    )
    SELECT clean_name,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           CAST(COUNT(DISTINCT dirty_name) AS BIGINT) AS n_variants
    FROM matched GROUP BY clean_name ORDER BY clean_name
    """,
)
def part_fuzzy_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution via blocked edit-distance join
    (operators.fuzzy.blocked_levenshtein_join): a dirty feed of typo'd part
    names reconciled against the clean name dictionary.

    The dictionary (distinct names) is tiny at every scale factor, so it is
    BROADCAST — the dirty side, which is the side that grows with the
    corpus, never shuffles. Candidates are blocked on the first token and
    length-prefiltered (both lossless for this corruption), then scored
    with early-exit ``levenshtein(a, b, 1)``.
    """
    part = table(spark, sf_dir, "part")
    name = F.col("p_name")
    pos = F.length(first_token("p_name")) + F.lit(2) + (F.col("p_partkey") % 3)
    dirty = part.filter(F.col("p_partkey") % 5 == 0).select(
        "p_partkey",
        F.concat(
            name.substr(F.lit(1), pos - 1),
            name.substr(pos + 1, F.length(name)),
        ).alias("dirty_name"),
    )
    clean = part.select(name.alias("clean_name")).distinct()
    matched = blocked_levenshtein_join(
        dirty,
        clean,
        "dirty_name",
        "clean_name",
        first_token("dirty_name"),
        first_token("clean_name"),
        max_dist=1,
    )
    return (
        matched.groupBy("clean_name")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.countDistinct("dirty_name").alias("n_variants"),
        )
        .orderBy("clean_name")
    )
