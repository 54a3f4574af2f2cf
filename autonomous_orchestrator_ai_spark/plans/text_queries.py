"""Text-analysis queries over ``documents`` (north-star operators) with
DuckDB oracles that recompute every formula exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import functools
import operator

from autonomous_orchestrator_ai_spark.functions.text import (
    EN_STOPWORDS,
    LANG_PROFILES,
    bpe_ish_token_count,
    fingerprint,
    gopher_rules,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)
from autonomous_orchestrator_ai_spark.operators.partitioning import (
    ensure_min_parallelism,
)
from autonomous_orchestrator_ai_spark.plans.registry import register, table

# DuckDB mirrors of functions/text.py ---------------------------------------

_TOKS = "string_split_regex(trim(text), '\\s+')"
_TOKS_LOWER = "string_split_regex(lower(trim(text)), '\\s+')"
_TOKEN_COUNT = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKS}) END"
_PUNCT = (
    "CASE WHEN len(text) = 0 THEN 0.0 "
    "ELSE len(regexp_replace(text, '[\\sA-Za-z0-9]', '', 'g')) * 1.0 / len(text) END"
)
_SW_LIST = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"
_SW_RATIO = (
    f"CASE WHEN {_TOKEN_COUNT} = 0 THEN 0.0 "
    f"ELSE len(list_filter({_TOKS_LOWER}, t -> t IN {_SW_LIST})) * 1.0 / len({_TOKS_LOWER}) END"
)
_QUALITY = (
    f"0.4 * least(CAST({_TOKEN_COUNT} AS DOUBLE), 200.0) / 200.0"
    f" + 0.3 * least({_SW_RATIO}, 0.5) / 0.5"
    f" + 0.3 * (1.0 - least({_PUNCT}, 0.5) / 0.5)"
)
_BPE_COUNT = "len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]'))"
_NORM = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


@register(
    "text_stats_per_doc",
    oracle=f"""
    SELECT doc_id,
           CAST({_TOKEN_COUNT} AS BIGINT) AS n_tokens,
           CAST({_BPE_COUNT} AS BIGINT) AS n_bpe_tokens,
           ROUND({_PUNCT}, 6) AS punct_ratio,
           ROUND({_SW_RATIO}, 6) AS stopword_ratio,
           ROUND({_QUALITY}, 6) AS quality
    FROM documents
    """,
)
def text_stats_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts + quality heuristics — all per-row
    expressions, one codegen stage over the scan."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_tokens"),
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(stopword_ratio("text"), 6).alias("stopword_ratio"),
        F.round(quality_score("text"), 6).alias("quality"),
    )


@register(
    "token_stats_by_source",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM({_TOKEN_COUNT}) AS BIGINT) AS total_tokens,
           ROUND(AVG({_QUALITY}), 6) AS avg_quality,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM documents GROUP BY source
    """,
)
def token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profiling grouped by source — the 'how big is each slice of my
    training mix' query."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
        F.round(F.avg(quality_score("text")), 6).alias("avg_quality"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def _lang_score_sql(lang: str) -> str:
    words = "(" + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang]) + ")"
    return f"len(list_filter({_TOKS_LOWER}, t -> t IN {words}))"


_ORDERED_LANGS = ["en", "de", "fr", "es"]
_BEST = "greatest(" + ", ".join(f"s_{l}" for l in _ORDERED_LANGS) + ")"
_LANG_CASE = (
    "CASE WHEN len(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 THEN 'zh' "
    f"WHEN {_BEST} <= 0 THEN 'und' "
    + " ".join(f"WHEN s_{l} = {_BEST} THEN '{l}'" for l in _ORDERED_LANGS)
    + " ELSE 'und' END"
)


@register(
    "lang_id_distribution",
    oracle=f"""
    WITH scored AS (
      SELECT text,
             {", ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in _ORDERED_LANGS)}
      FROM documents)
    SELECT {_LANG_CASE} AS predicted_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM scored GROUP BY 1
    """,
)
def lang_id_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language-ID (functions.text.lang_id) distribution.
    The synthetic corpus is English-ish regardless of its lang label, so this
    measures the operator, not the label."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    return docs.groupBy(lang_id("text").alias("predicted_lang")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


@register(
    "lang_confusion_report",
    oracle=f"""
    WITH scored AS (
      SELECT lang AS labeled_lang, text,
             {", ".join(f"{_lang_score_sql(l)} AS s_{l}" for l in _ORDERED_LANGS)}
      FROM documents),
    cells AS (
      SELECT labeled_lang, {_LANG_CASE} AS predicted_lang,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM scored GROUP BY 1, 2)
    SELECT labeled_lang, predicted_lang, n_docs,
           ROUND(n_docs * 1.0 /
                 SUM(n_docs) OVER (PARTITION BY labeled_lang), 6) AS frac_of_label
    FROM cells
    """,
)
def lang_confusion_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled-vs-predicted language confusion matrix with per-label row
    fractions — the mislabel detector a multilingual curation pipeline runs
    before trusting upstream lang tags. One grouped count (corpus-scaled)
    then a window over the bounded confusion cells (labels x predictions)."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    cells = (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            lang_id("text").alias("predicted_lang"),
        )
        .groupBy("labeled_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy("labeled_lang")
    return cells.select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias(
            "frac_of_label"
        ),
    )


_MWL = (
    f"CASE WHEN {_TOKEN_COUNT} = 0 THEN 0.0 "
    f"ELSE list_sum(list_transform({_TOKS}, t -> len(t))) * 1.0 / len({_TOKS}) END"
)
_ALPHA_FRAC = (
    f"CASE WHEN {_TOKEN_COUNT} = 0 THEN 0.0 "
    f"ELSE len(list_filter({_TOKS_LOWER}, t -> regexp_matches(t, '[a-z]')))"
    f" * 1.0 / len({_TOKS_LOWER}) END"
)
_SW_HITS = f"len(list_filter(list_distinct({_TOKS_LOWER}), t -> t IN {_SW_LIST}))"
_DISTINCT_RATIO = (
    f"CASE WHEN {_TOKEN_COUNT} = 0 THEN 1.0 "
    f"ELSE len(list_distinct({_TOKS_LOWER})) * 1.0 / len({_TOKS_LOWER}) END"
)


@register(
    "gopher_quality_by_source",
    oracle=f"""
    WITH flags AS (
      SELECT source,
             {_TOKEN_COUNT} BETWEEN 50 AND 100000 AS r_word_count,
             {_MWL} >= 3.0 AND {_MWL} <= 10.0 AS r_mean_word_len,
             {_PUNCT} <= 0.1 AS r_symbol_ratio,
             {_ALPHA_FRAC} >= 0.8 AS r_alpha_words,
             {_SW_HITS} >= 2 AS r_stopwords,
             {_DISTINCT_RATIO} >= 0.2 AS r_repetition
      FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN r_word_count AND r_mean_word_len AND r_symbol_ratio
                          AND r_alpha_words AND r_stopwords AND r_repetition
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN r_word_count THEN 0 ELSE 1 END) AS BIGINT) AS fail_word_count,
           CAST(SUM(CASE WHEN r_mean_word_len THEN 0 ELSE 1 END) AS BIGINT) AS fail_mean_word_len,
           CAST(SUM(CASE WHEN r_symbol_ratio THEN 0 ELSE 1 END) AS BIGINT) AS fail_symbol_ratio,
           CAST(SUM(CASE WHEN r_alpha_words THEN 0 ELSE 1 END) AS BIGINT) AS fail_alpha_words,
           CAST(SUM(CASE WHEN r_stopwords THEN 0 ELSE 1 END) AS BIGINT) AS fail_stopwords,
           CAST(SUM(CASE WHEN r_repetition THEN 0 ELSE 1 END) AS BIGINT) AS fail_repetition
    FROM flags GROUP BY source
    """,
)
def gopher_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality gate summary per source (functions.text.
    gopher_rules; Rae et al. 2021 App. A). Every rule is a per-row codegen
    expression and every output column is an exact integer count, so the
    oracle comparison has zero float tolerance. This is the corpus-health
    dashboard a training-data pipeline runs before mixing."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    rules = gopher_rules("text")
    all_pass = functools.reduce(operator.and_, rules.values())
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(all_pass.cast("long")).alias("n_pass"),
    ] + [F.sum((~c).cast("long")).alias(f"fail_{k}") for k, c in rules.items()]
    return docs.groupBy("source").agg(*aggs)


@register(
    "doc_fingerprints",
    oracle=f"""
    SELECT doc_id, md5({_NORM}) AS fp, lang
    FROM documents WHERE doc_id < 100
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints (md5 of normalized text) for the first 100 docs
    — the portable-hash primitive every dedup operator builds on."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    return docs.filter(F.col("doc_id") < 100).select(
        "doc_id", fingerprint("text").alias("fp"), "lang"
    )
