"""Corpus-curation queries over ``documents`` (operators/curation.py) with
exact DuckDB-oracle replicas.

Every sampling decision is md5-threshold based (see operators/curation.py),
so the oracle reproduces the exact subset — these are value-hash-checked,
not just statistically plausible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.functions.text import (
    fingerprint,
    quality_score,
    token_count,
)
from autonomous_orchestrator_ai_spark.operators.curation import (
    contamination_report,
    dedup_batch_against_index,
    deterministic_sample,
    hex_threshold,
    ngram_doc_frequency,
    quality_quantile_filter,
    repetition_stats,
    stratified_sample,
    token_budget_pack,
    top_k_tokens,
)
from autonomous_orchestrator_ai_spark.operators.partitioning import (
    ensure_min_parallelism,
)
from autonomous_orchestrator_ai_spark.plans.dedup_queries import SHINGLES_SQL
from autonomous_orchestrator_ai_spark.plans.registry import register, table
from autonomous_orchestrator_ai_spark.plans.text_queries import (
    _NORM,
    _QUALITY,
    _TOKEN_COUNT,
)

# DuckDB mirror of operators.curation.sample_hash / sample_predicate
_DRAW_SQL = "substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 4)"

_SAMPLE_FRACTION = 0.3
_SAMPLE_THR = hex_threshold(_SAMPLE_FRACTION)


@register(
    "sampled_corpus_profile",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM({_TOKEN_COUNT}) AS BIGINT) AS total_tokens
    FROM documents
    WHERE {_DRAW_SQL.format(salt="s1")} < '{_SAMPLE_THR}'
    GROUP BY source
    """,
)
def sampled_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 30% corpus sample, profiled by source
    (operators.curation.deterministic_sample). The sampling predicate is a
    map-side md5 threshold — it pushes to the scan stage and shuffles
    nothing; the same (salt, key) pairs select the identical subset on any
    engine, which is exactly what the oracle verifies."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    sampled = deterministic_sample(docs, _SAMPLE_FRACTION, "doc_id", salt="s1")
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).alias("total_tokens"),
    )


# 20 sources src0..src19; fraction cycles 0.1/0.2/0.3/0.4/0.5 — an explicit
# per-stratum mix spec, as a data table on both sides.
_STRATA_FRACTIONS = {f"src{i}": ((i % 5) + 1) / 10 for i in range(20)}
_STRATA_CASE = (
    "CASE source "
    + " ".join(
        f"WHEN '{s}' THEN '{hex_threshold(f)}'" for s, f in _STRATA_FRACTIONS.items()
    )
    + " END"
)


@register(
    "stratified_sample_counts",
    oracle=f"""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sampled
    FROM documents
    WHERE {_DRAW_SQL.format(salt="s2")} < {_STRATA_CASE}
    GROUP BY source
    """,
)
def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stratified sampling (operators.curation.stratified_sample):
    rates 10%-50% cycling across the 20 sources, thresholds broadcast-joined
    as data. The deterministic twin of ``sampleBy`` — stable under
    repartitioning, reproducible cross-engine."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    sampled = stratified_sample(
        docs, _STRATA_FRACTIONS, strata_col="source", key_col="doc_id", salt="s2"
    )
    return sampled.groupBy("source").agg(F.count(F.lit(1)).alias("n_sampled"))


_BUDGET = 3000


@register(
    "token_budget_mix",
    oracle=f"""
    WITH toks AS (
      SELECT source, doc_id, CAST({_TOKEN_COUNT} AS BIGINT) AS n_tokens,
             md5('mix:' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents),
    ranked AS (
      SELECT source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS running
      FROM toks)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
    FROM ranked WHERE running <= {_BUDGET}
    GROUP BY source
    """,
)
def token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing (operators.curation.token_budget_pack): take docs per
    source in hash-of-id order until each source contributes ~3000 tokens.
    One shuffle (window partition on source); the cut is a running sum, so
    per-source state is O(1)."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    packed = token_budget_pack(
        docs, _BUDGET, text_col="text", id_col="doc_id", strata_col="source"
    )
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").alias("tokens_kept"),
    )


@register(
    "top_tokens",
    oracle="""
    WITH t AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents WHERE trim(text) <> '')
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM t WHERE token <> ''
    GROUP BY token ORDER BY n DESC, token LIMIT 25
    """,
)
def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-25 (operators.curation.top_k_tokens) — the
    wordcount-at-scale shape: map-side partial agg collapses the exploded
    tokens, TakeOrderedAndProject avoids a global sort."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    return top_k_tokens(docs, 25, "text")


@register(
    "doc_repetition_stats",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t,
             string_split_regex(lower(trim(text)), '\\s+') AS lt,
             trim(text) = '' AS empty
      FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS g
      FROM toks),
    gc AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY doc_id, g),
    pd AS (SELECT doc_id, MAX(c) AS top, SUM(c) AS total FROM gc GROUP BY doc_id)
    SELECT k.doc_id,
           ROUND(CASE WHEN k.empty THEN 1.0
                      ELSE len(list_distinct(k.lt)) * 1.0 / len(k.lt) END, 6)
             AS distinct_token_ratio,
           ROUND(COALESCE(pd.top * 1.0 / pd.total, 0.0), 6) AS top_bigram_frac
    FROM toks k LEFT JOIN pd ON k.doc_id = pd.doc_id
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition quality signals per document
    (operators.curation.repetition_stats): distinct-token ratio (per-row
    expression) and top-bigram fraction (explode -> two keyed aggregations,
    linear in corpus size — NOT the per-row O(len^2) HOF shape, which
    degrades on long documents)."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    return repetition_stats(docs, "text", "doc_id")


@register(
    "benchmark_contamination",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {SHINGLES_SQL} AS sh FROM documents),
    bench AS (SELECT DISTINCT unnest(sh) AS s FROM docs WHERE doc_id % 17 = 0),
    train AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM docs
              WHERE doc_id % 17 <> 0)
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
    FROM train t JOIN bench b ON t.s = b.s
    GROUP BY t.doc_id
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination report (operators.curation.contamination_report):
    training docs (94% of the corpus) sharing any 3-gram shingle with the
    held-out 'benchmark' slice (doc_id % 17 == 0). The benchmark shingle
    set is broadcast — the corpus is scanned once and never self-joined."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    return contamination_report(train, bench, "text", "doc_id", shingle_k=3)


_KEEP_FRAC = 0.25


@register(
    "quality_filtered_by_source",
    oracle=f"""
    WITH scored AS (
      SELECT source, doc_id, ROUND({_QUALITY}, 6) AS q FROM documents),
    ranked AS (
      SELECT source, q,
             percent_rank() OVER (PARTITION BY source
                                  ORDER BY q DESC, doc_id) AS pr
      FROM scored)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           ROUND(AVG(q), 6) AS avg_quality,
           ROUND(MIN(q), 6) AS min_quality
    FROM ranked WHERE pr <= {_KEEP_FRAC}
    GROUP BY source
    """,
)
def quality_filtered_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile quality gate
    (operators.curation.quality_quantile_filter): keep the top 25% of docs
    by quality score within each source. Ranking is on the 6dp-rounded
    score (exact ties broken by doc_id) so the kept set is engine-exact;
    the percent_rank boundary itself is integer arithmetic."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    scored = docs.withColumn("q", F.round(quality_score("text"), 6))
    kept = quality_quantile_filter(scored, _KEEP_FRAC, "q", strata_col="source")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.avg("q"), 6).alias("avg_quality"),
        F.round(F.min("q"), 6).alias("min_quality"),
    )


_BOILER_MIN_DOCS = 2


@register(
    "boilerplate_ngrams",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {SHINGLES_SQL} AS sh FROM documents),
    grams AS (SELECT doc_id, unnest(sh) AS shingle FROM docs),
    freq AS (SELECT shingle, CAST(COUNT(*) AS BIGINT) AS doc_freq
             FROM grams GROUP BY shingle)
    SELECT shingle, doc_freq FROM freq
    WHERE doc_freq >= {_BOILER_MIN_DOCS}
    ORDER BY doc_freq DESC, shingle LIMIT 20
    """,
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate discovery (operators.curation.ngram_doc_frequency): the
    20 word-3-grams shared by the most documents. Per-doc-distinct shingles
    make the exploded pairs unique without a distinct(), so the profile is
    one partial-aggregated count; the top-20 is TakeOrderedAndProject."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    freq = ngram_doc_frequency(
        docs, "text", "doc_id", k=3, min_docs=_BOILER_MIN_DOCS
    )
    return freq.orderBy(F.desc("doc_freq"), F.asc("shingle")).limit(20)


@register(
    "incremental_dedup_counts",
    oracle=f"""
    WITH fps AS (SELECT doc_id, source, md5({_NORM}) AS fp FROM documents),
    idx AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0),
    batch AS (SELECT * FROM fps WHERE doc_id % 2 = 1),
    fresh AS (SELECT b.* FROM batch b LEFT JOIN idx ON b.fp = idx.fp
              WHERE idx.fp IS NULL),
    kept AS (SELECT * FROM fresh
             QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept FROM kept GROUP BY source
    """,
)
def incremental_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-ingestion dedup
    (operators.curation.dedup_batch_against_index): even doc_ids play the
    already-ingested corpus (its fingerprint index), odd doc_ids the
    incoming batch. Batch rows whose content fingerprint is already indexed
    are dropped (anti-join), in-batch dups keep the smallest id, and the
    survivors are profiled by source."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    index = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .select(fingerprint("text").alias("fp"))
        .distinct()
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    kept = dedup_batch_against_index(batch, index, "text", "doc_id", "fp")
    return kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))


@register(
    "pii_redaction_audit",
    oracle=r"""
    WITH aug AS (
      SELECT source, text ||
        CASE WHEN doc_id % 7 = 0
             THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
             ELSE '' END ||
        CASE WHEN doc_id % 11 = 0
             THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1'
             ELSE '' END ||
        CASE WHEN doc_id % 13 = 0
             THEN ' call +1 415 555 01' || CAST(doc_id % 89 + 10 AS VARCHAR)
             ELSE '' END AS t
      FROM documents),
    hits AS (
      SELECT source, t,
        len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS emails,
        regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', ' ', 'g') AS t1
      FROM aug),
    hits2 AS (
      SELECT source, t, emails,
        len(regexp_extract_all(t1, '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS ips,
        regexp_replace(t1, '\b(?:\d{1,3}\.){3}\d{1,3}\b', ' ', 'g') AS t2
      FROM hits),
    hits3 AS (
      SELECT source, t, emails, ips,
        len(regexp_extract_all(t2, '\+?\d[\d().\-\s]{6,}\d')) AS phones
      FROM hits2),
    red AS (
      SELECT source, emails, ips, phones,
        len(t) - len(
          regexp_replace(
            regexp_replace(
              regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
              '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
            '\+?\d[\d().\-\s]{6,}\d', '<PHONE>', 'g')) AS delta
      FROM hits3)
    SELECT source,
           CAST(SUM(emails) AS BIGINT) AS n_emails,
           CAST(SUM(ips) AS BIGINT) AS n_ips,
           CAST(SUM(phones) AS BIGINT) AS n_phones,
           CAST(SUM(delta) AS BIGINT) AS chars_delta
    FROM red GROUP BY source
    """,
)
def pii_redaction_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit (operators.curation.redact_pii / pii_hit_counts):
    per-source counts of detected emails / IPv4s / phone-like runs plus the
    net character delta after typed-tag redaction. The corpus is synthetic
    and PII-free, so deterministic PII is injected (doc_id-keyed) before
    auditing — the regex chain under test is the production one. All
    regexp_* built-ins: single scan, codegen, zero Python."""
    from autonomous_orchestrator_ai_spark.operators.curation import (
        pii_hit_counts,
        redact_pii,
    )

    docs = table(spark, sf_dir, "documents")
    aug = docs.select(
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" call +1 415 555 01"),
                    (F.col("doc_id") % 89 + 10).cast("string"),
                ),
            ).otherwise(""),
        ).alias("t"),
    )
    audited = aug.select(
        "source",
        pii_hit_counts("t").alias("hits"),
        (F.length("t") - F.length(redact_pii("t"))).alias("delta"),
    )
    return audited.groupBy("source").agg(
        F.sum("hits.emails").alias("n_emails"),
        F.sum("hits.ips").alias("n_ips"),
        F.sum("hits.phones").alias("n_phones"),
        F.sum("delta").alias("chars_delta"),
    )


@register(
    "doc_chunk_stats",
    oracle="""
    WITH chunks AS (
      SELECT source,
             substring(text, unnest(generate_series(0, len(text) - 1, 300)) + 1, 400) AS chunk_text
      FROM documents WHERE len(text) > 0)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT md5(chunk_text)) AS BIGINT) AS n_distinct_chunks,
           CAST(SUM(len(chunk_text)) AS BIGINT) AS chunk_chars,
           CAST(MAX(len(chunk_text)) AS BIGINT) AS max_chunk_len
    FROM chunks GROUP BY source
    """,
)
def doc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking profile (operators.chunking.chunk_text —
    400-char windows, 300 stride, 100 overlap): per-source chunk counts,
    md5-distinct chunks, and char volume. The explode multiplies rows by
    ceil(len/stride) uniformly; everything stays in whole-stage codegen."""
    from autonomous_orchestrator_ai_spark.operators.chunking import chunk_text

    docs = table(spark, sf_dir, "documents")
    chunks = chunk_text(docs, "text", size=400, stride=300, keep_cols=["source"])
    return chunks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count_distinct(F.md5("chunk_text")).alias("n_distinct_chunks"),
        F.sum(F.length("chunk_text")).alias("chunk_chars"),
        F.max(F.length("chunk_text")).alias("max_chunk_len"),
    )


@register(
    "weighted_sample_docs",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ln((CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 0.5)
                / 4503599627370496.0) / n_chars AS wkey
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, source, n_chars
    FROM keyed ORDER BY wkey DESC, doc_id LIMIT 50
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus sample of 50 docs without replacement
    (operators.curation.weighted_sample — Efraimidis–Spirakis exponential
    keys over the deterministic md5 draw). TakeOrderedAndProject plan:
    per-partition top-k, no full sort, no shuffle of the corpus; the same
    arithmetic recomputed in DuckDB selects the identical rows."""
    from autonomous_orchestrator_ai_spark.operators.curation import (
        weighted_sample,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return weighted_sample(
        docs, k=50, weight=F.col("n_chars"), id_col="doc_id", salt="wsamp"
    )


@register(
    "sequence_packing_stats",
    oracle=lambda sf_dir: _packing_oracle(),
)
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy in-order packing of each source's docs into 2048-token
    training windows (operators.curation.pack_sequences), with
    TOKENIZER-TRUE lengths: each doc's n_tokens is its exact BPE token
    count (operators.bpe.bpe_doc_token_counts — in-vocab words contribute
    their subword counts, OOV words one UNK), not the whitespace word
    proxy, so the fill stats are what the data loader will actually see.
    The cumsum is per-source, so the sort parallelizes across sources —
    the scale-safe form of sequence packing (a GLOBAL cumsum would
    serialize on one partition)."""
    from autonomous_orchestrator_ai_spark.operators.bpe import (
        bpe_doc_token_counts,
        bpe_train,
    )
    from autonomous_orchestrator_ai_spark.operators.curation import (
        pack_sequences,
    )

    raw = table(spark, sf_dir, "documents")
    merges = bpe_train(raw, "text", 8)
    docs = raw.select("source", "doc_id").join(
        bpe_doc_token_counts(raw, merges).select("doc_id", "n_tokens"),
        "doc_id",
    )
    packed = pack_sequences(docs, "n_tokens", 2048, "source", "doc_id")
    seqs = packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
    )
    return seqs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("seq_tokens").alias("total_tokens"),
        F.max("seq_tokens").alias("max_seq_tokens"),
        F.round(F.sum("n_docs") / F.count(F.lit(1)), 4).alias("avg_docs_per_seq"),
    )


def _packing_oracle() -> str:
    """Deferred import: bpe_queries imports curation machinery transitively;
    building the encode CTE chain lazily avoids a module import cycle."""
    from autonomous_orchestrator_ai_spark.plans.bpe_queries import (
        _DOC_COUNTS,
        _DOC_WORDS,
        _encode_ctes,
    )

    return f"""
    WITH {_encode_ctes()},
    {_DOC_WORDS},
    {_DOC_COUNTS},
    toks AS (
      SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
      FROM dcounts),
    packed AS (
      SELECT source, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seq_start_offset
      FROM toks),
    seqs AS (
      SELECT source, CAST(FLOOR(seq_start_offset / 2048.0) AS BIGINT) AS seq_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
      FROM packed GROUP BY 1, 2)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_seqs,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(seq_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(seq_tokens) AS BIGINT) AS max_seq_tokens,
           ROUND(SUM(n_docs) * 1.0 / COUNT(*), 4) AS avg_docs_per_seq
    FROM seqs GROUP BY source
    """


# ---------------------------------------------------------------------------
# Filter funnel / caps / shards / mixture plan
# ---------------------------------------------------------------------------

_FUNNEL_FF = f"""CASE
      WHEN NOT COALESCE(n_chars >= 150, FALSE) THEN 'min_chars'
      WHEN NOT COALESCE(lang = 'en', FALSE) THEN 'lang_en'
      WHEN NOT COALESCE({_TOKEN_COUNT} >= 30, FALSE) THEN 'min_tokens'
      WHEN NOT COALESCE(n_chars * 1.0 / ({_TOKEN_COUNT}) BETWEEN 3 AND 15,
                        FALSE)
        THEN 'mean_word_len'
      END"""


@register(
    "filter_funnel_report",
    oracle=f"""
    WITH flagged AS (SELECT {_FUNNEL_FF} AS ff FROM documents),
    a AS (SELECT COUNT(*) AS total,
          SUM(CASE WHEN ff = 'min_chars' THEN 1 ELSE 0 END) AS d0,
          SUM(CASE WHEN ff = 'lang_en' THEN 1 ELSE 0 END) AS d1,
          SUM(CASE WHEN ff = 'min_tokens' THEN 1 ELSE 0 END) AS d2,
          SUM(CASE WHEN ff = 'mean_word_len' THEN 1 ELSE 0 END) AS d3
          FROM flagged)
    SELECT CAST(stage AS BIGINT) AS stage, rule,
           CAST(n_in AS BIGINT) AS n_in,
           CAST(n_dropped AS BIGINT) AS n_dropped,
           CAST(n_in - n_dropped AS BIGINT) AS n_out,
           ROUND(n_dropped * 1.0 / GREATEST(n_in, 1), 6) AS drop_rate
    FROM (
      SELECT 0 AS stage, 'min_chars' AS rule, total AS n_in, d0 AS n_dropped FROM a
      UNION ALL SELECT 1, 'lang_en', total - d0, d1 FROM a
      UNION ALL SELECT 2, 'min_tokens', total - d0 - d1, d2 FROM a
      UNION ALL SELECT 3, 'mean_word_len', total - d0 - d1 - d2, d3 FROM a
    )
    """,
)
def filter_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style quality-rule cascade (operators.curation.
    filter_funnel): per-stage in/dropped/out counts and drop rates, with
    first-failing-rule attribution. ONE scan + one single-row aggregate
    (conditional sums, all map-side partials) no matter how many rules —
    the per-stage rows are arithmetic, not re-filters."""
    from autonomous_orchestrator_ai_spark.operators.curation import filter_funnel

    docs = table(spark, sf_dir, "documents")
    tc = token_count("text")
    rules = [
        ("min_chars", F.col("n_chars") >= 150),
        ("lang_en", F.col("lang") == "en"),
        ("min_tokens", tc >= 30),
        ("mean_word_len", (F.col("n_chars") / tc).between(3, 15)),
    ]
    return filter_funnel(docs, rules)


@register(
    "domain_cap_sample",
    oracle=f"""
    WITH ranked AS (
      SELECT source, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               -- FULL md5, matching cap_per_group's sample_hash order: the
               -- 4-hex prefix would tie-break differently on collisions
               ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN rn <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rn <= 7 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM ranked GROUP BY source
    """,
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency cap (operators.curation.cap_per_group): at
    most 7 docs per source, chosen by deterministic md5 draw. kept_chars
    pins the EXACT surviving subset, not just its size. The row_number
    window partitions by source, so hot domains sort in parallel and are
    precisely the ones cut."""
    from autonomous_orchestrator_ai_spark.operators.curation import cap_per_group

    docs = table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    kept = cap_per_group(docs, "source", "doc_id", cap=7, salt="cap").groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    return totals.join(kept, "source").select(
        "source", "n_total", "n_kept", "kept_chars"
    )


@register(
    "training_shard_manifest",
    oracle=f"""
    SELECT CAST(CAST(('0x' || {_DRAW_SQL.format(salt="shard")}) AS BIGINT) % 16
             AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM({_TOKEN_COUNT}) AS BIGINT) AS shard_tokens,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents GROUP BY 1
    """,
)
def training_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest (operators.curation.shard_assignment):
    16-way deterministic md5 sharding with per-shard doc/token counts —
    the writer-side plan for `.repartition(n, shard).write`. Shard ids
    are stable under corpus growth (pure function of doc_id), so
    incremental ingest only rewrites the shards it touches."""
    from autonomous_orchestrator_ai_spark.operators.curation import (
        shard_assignment,
    )

    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("shard_id", shard_assignment("doc_id", 16, salt="shard"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count("text")).alias("shard_tokens"),
            F.count_distinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


_MIX_WEIGHTS = {f"src{i}": (2.0 if i % 4 == 0 else 1.0) for i in range(20)}
_MIX_TARGET = 500_000
_MIX_W_SQL = " ".join(
    f"WHEN '{s}' THEN {w / sum(_MIX_WEIGHTS.values())!r}"
    for s, w in _MIX_WEIGHTS.items()
)


@register(
    "mixture_epoch_plan",
    oracle=f"""
    WITH avail AS (
      SELECT source, SUM({_TOKEN_COUNT}) AS available_tokens
      FROM documents GROUP BY source),
    w AS (SELECT source, available_tokens,
          CASE source {_MIX_W_SQL} ELSE 0.0 END AS wt FROM avail)
    SELECT source,
           CAST(available_tokens AS BIGINT) AS available_tokens,
           CAST(ROUND(wt, 6) AS DOUBLE) AS weight,
           CAST(ROUND(wt * {_MIX_TARGET}, 2) AS DOUBLE) AS allocated_tokens,
           CAST(ROUND(wt * {_MIX_TARGET} / GREATEST(available_tokens, 1), 4)
             AS DOUBLE) AS epochs,
           wt * {_MIX_TARGET} > available_tokens AS oversampled
    FROM w
    """,
)
def mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix plan (operators.curation.mixture_epoch_plan): given
    per-source available tokens, target weights, and a 500k-token budget,
    each source's allocation and epoch count (>1 epoch = repeated data,
    the data-constrained-scaling flag). Weights join in as a broadcast
    table — data, not a giant CASE in the plan."""
    from autonomous_orchestrator_ai_spark.operators.curation import (
        mixture_epoch_plan as plan,
    )

    docs = table(spark, sf_dir, "documents")
    avail = docs.groupBy("source").agg(
        F.sum(token_count("text")).alias("available_tokens")
    )
    return plan(avail, _MIX_WEIGHTS, _MIX_TARGET)


@register(
    "binary_payload_profile",
    oracle="""
    WITH b AS (SELECT source, encode(text) AS payload FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_payloads,
           CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(payload)) AS BIGINT) AS max_bytes,
           CAST(COUNT(DISTINCT md5(hex(payload))) AS BIGINT)
             AS n_distinct_digests,
           MIN(md5(hex(payload))) AS min_digest
    FROM b GROUP BY source
    """,
)
def binary_payload_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing, oracle-checked: documents.text
    re-encoded as a BINARY payload column (the same shape image/audio
    bytes arrive in — operators/multimodal.py), profiled per source with
    byte lengths and content digests computed ON THE BYTES (md5 over the
    hex rendering — engine-portable). At 100 TB this is the 'how big is
    each modality slice and how much is exactly-duplicated' scan: one
    pass, all map-side partials, no UDFs."""
    docs = table(spark, sf_dir, "documents")
    b = docs.select("source", F.encode("text", "UTF-8").alias("payload"))
    return b.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.octet_length("payload")).alias("max_bytes"),
        F.count_distinct(F.md5(F.hex("payload"))).alias("n_distinct_digests"),
        F.min(F.md5(F.hex("payload"))).alias("min_digest"),
    )


@register(
    "curriculum_order_manifest",
    oracle=f"""
    WITH q AS (
      SELECT source, doc_id, ROUND({_QUALITY}, 6) AS quality FROM documents),
    strat AS (
      SELECT source, doc_id, quality,
             NTILE(10) OVER (PARTITION BY source
                             ORDER BY quality DESC, doc_id) AS decile
      FROM q),
    pos AS (
      SELECT source, doc_id, quality, decile,
             (ROW_NUMBER() OVER (PARTITION BY source, decile
                                 ORDER BY quality DESC, doc_id) - 1) * 10
               + decile AS position
      FROM strat)
    SELECT position, source, doc_id, CAST(decile AS BIGINT) AS decile, quality
    FROM pos
    ORDER BY position, source, doc_id
    LIMIT 50
    """,
)
def curriculum_order_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified curriculum ordering: docs are deciled by quality
    WITHIN each source (partitioned NTILE — the sort parallelizes across
    sources, never a global sort), then given an arithmetic interleave
    position ((rank-1)*10 + decile) that round-robins the quality bands so
    every training window sees the full quality spectrum. The manifest's
    total order is materialized only for the returned top-k
    (TakeOrderedAndProject); at scale the position column is written
    per-shard and shards are read in position order. Decile assignment
    orders by ROUNDED quality (6dp) with doc_id tie-break, so the
    stratification is engine-exact."""
    docs = ensure_min_parallelism(table(spark, sf_dir, "documents"))
    q = docs.select(
        "source",
        "doc_id",
        F.round(quality_score("text"), 6).alias("quality"),
    )
    w_src = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    strat = q.withColumn("decile", F.ntile(10).over(w_src))
    w_band = Window.partitionBy("source", "decile").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    pos = strat.withColumn(
        "position",
        (F.row_number().over(w_band) - 1) * 10 + F.col("decile"),
    )
    return (
        pos.select(
            "position",
            "source",
            "doc_id",
            F.col("decile").cast("long").alias("decile"),
            "quality",
        )
        .orderBy("position", "source", "doc_id")
        .limit(50)
    )


@register(
    "shard_balance_report",
    oracle=f"""
    WITH sh AS (
      SELECT CAST(CAST(('0x' || {{draw}}) AS BIGINT) % 64 AS BIGINT)
               AS shard_id
      FROM documents),
    per AS (
      SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
    tot AS (SELECT SUM(n) AS nd, COUNT(*) AS ns FROM per)
    SELECT CAST(tot.ns AS BIGINT) AS n_shards,
           CAST(tot.nd AS BIGINT) AS n_docs,
           MIN(per.n) AS min_shard,
           MAX(per.n) AS max_shard,
           ROUND(MAX(per.n) * 1.0 / (tot.nd * 1.0 / tot.ns), 4)
             AS max_over_mean,
           ROUND(SUM((per.n - tot.nd * 1.0 / 64)
                     * (per.n - tot.nd * 1.0 / 64))
                 / (tot.nd * 1.0 / 64), 4) AS chi2_vs_uniform
    FROM per CROSS JOIN tot GROUP BY tot.ns, tot.nd
    """.replace("{draw}", "substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 4)"),
)
def shard_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-skew audit for the deterministic md5 sharding
    (operators.curation.shard_assignment at 64 shards): min/max shard
    population, max/mean imbalance ratio, and the chi-square statistic
    against uniform — the pre-flight a training run does before trusting
    'hash sharding is balanced' at the next 100x (a skewed shard is a
    straggler executor for every epoch). Exact integer counts; the two
    reported ratios are single final divisions. One tiny 64-row
    aggregate after the count shuffle."""
    from autonomous_orchestrator_ai_spark.operators.curation import (
        shard_assignment,
    )

    docs = table(spark, sf_dir, "documents")
    per = (
        docs.withColumn(
            "shard_id", shard_assignment("doc_id", 64, salt="shard")
        )
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = per.agg(
        F.sum("n").alias("nd"), F.count(F.lit(1)).alias("ns")
    )
    mean64 = F.col("nd") / 64.0
    return (
        per.crossJoin(F.broadcast(tot))
        .groupBy("ns", "nd")
        .agg(
            F.min("n").alias("min_shard"),
            F.max("n").alias("max_shard"),
            F.round(
                F.max("n") / (F.col("nd") / F.col("ns")), 4
            ).alias("max_over_mean"),
            F.round(
                F.sum((F.col("n") - mean64) * (F.col("n") - mean64))
                / mean64,
                4,
            ).alias("chi2_vs_uniform"),
        )
        .select(
            F.col("ns").cast("bigint").alias("n_shards"),
            F.col("nd").cast("bigint").alias("n_docs"),
            "min_shard",
            "max_shard",
            "max_over_mean",
            "chi2_vs_uniform",
        )
    )
