"""Exact duplicate-SPAN deduplication (substring-level, Lee et al. 2022).

"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
ACL 2022) removes *substrings* that repeat across a corpus, not just
whole near-duplicate documents: two docs can each be unique overall yet
share a long boilerplate passage that an LLM would memorize. The paper
builds a single suffix array over the concatenated corpus — an inherently
single-machine construction. This module re-expresses the same semantics
Spark-first:

1. every document emits one row per word-``k``-gram *occurrence*
   ``(doc_id, pos, gram_hash)`` — a pure posexplode, no UDF;
2. a gram duplicated across >= ``min_docs`` distinct documents is found
   with one groupBy on the 16-byte md5 (never the gram text — shuffle
   bytes stay fixed-width no matter how long the grams are);
3. per document, the positions of duplicated grams are merged into
   *maximal spans* with the classic island window (running max of
   interval ends) — the window is partitioned by ``doc_id`` so its state
   is bounded by document length, never corpus size;
4. removal keeps one canonical copy per gram (the minimum ``doc_id``
   containing it — deterministic, engine-portable) and drops the covered
   token positions everywhere else, reconstructing the cleaned text
   order-exactly.

Scale shape: explode(positions) is linear in corpus tokens; the only
shuffles are a groupBy on fixed-width hashes, a hash join occurrences ×
duplicated-grams (both corpus-scale sides — no broadcast hints), and
per-doc windows/groupBys bounded by document length. No all-pairs step
exists anywhere, so the plan survives a 100x scale-up; at 100 TB the
gram table is just a bigger shuffle, exactly what Spark is for.

Everything is md5-based and positionally deterministic, so the DuckDB
oracles in plans/span_queries.py replay each step bit-for-bit in SQL.

Caching contract (r8): the one-shuffle-two-consumers ``persist()`` sites
in this module (kgram occurrences, covered positions) exist so a second
consumer inside the same plan reuses them. The TOP-LEVEL operators
(``duplicate_span_doc_stats``, ``remove_duplicate_spans``,
``remove_boilerplate``) default to ``release=True``: they eagerly
materialize their (stats/delta-scale) result, then unpersist the
corpus-scale caches before returning — a default-configured call leaves
nothing corpus-scale pinned, only the result's own blocks, which the
caller owns (``.unpersist()`` when done). ``release=False`` restores the
r7 behavior (caches live until ``session.release_session_storage(spark)``
— use it when chaining several span operators over the same corpus).
The mid-level builders (``duplicate_spans``, ``covered_positions``,
``boilerplate_covered_positions``) stay lazy and hand their cache
handles back via ``_caches`` for callers composing their own release.

Reference parity note: the reference repo (AbdulSohail018/
Autonomous-Orchestrator-Ai) has no substring dedup — this is part of the
beyond-reference LLM-training-data surface, alongside operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.functions.text import _once, normalized_text

__all__ = [
    "kgram_occurrences",
    "duplicated_grams",
    "duplicate_spans",
    "duplicate_span_doc_stats",
    "covered_positions",
    "remove_duplicate_spans",
    "boilerplate_covered_positions",
    "remove_boilerplate",
]


def _norm_tokens(text: Column | str) -> Column:
    """Tokens of the *normalized* text (lower/trim/collapse) — the same
    canonical form every other dedup operator fingerprints, so span dedup
    and document dedup agree on what "the same text" means."""
    return F.split(normalized_text(text), " ")


def kgram_occurrences(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per word-k-gram occurrence: (doc_id, pos, gram_hash).

    ``pos`` is the 0-based token index where the gram starts; ``gram_hash``
    is the 16-byte md5 of the space-joined gram (binary, not hex — halves
    the shuffle width of every downstream groupBy/join). Documents shorter
    than ``k`` tokens emit nothing: they cannot contain a duplicated span
    of length k and are provably never modified by removal.
    """
    # Hoist the token array via _once: captured raw in the lambda, the
    # whole normalize+split pipeline would re-run PER GRAM (O(n^2) regex
    # work per doc — measured 30s -> ~2s for the sf1 occurrence explode).
    def grams_of(ts: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.size(ts) - (k - 1)),
            lambda i: F.unhex(F.md5(F.array_join(F.slice(ts, i, k), " "))),
        )

    return (
        docs.where(F.size(_norm_tokens(text_col)) >= k)
        .select(
            id_col,
            F.posexplode(_once(_norm_tokens(text_col), grams_of)).alias(
                "pos", "gram_hash"
            ),
        )
    )


def duplicated_grams(
    occ: DataFrame, id_col: str = "doc_id", min_docs: int = 2
) -> DataFrame:
    """Grams appearing in >= min_docs distinct docs: (gram_hash, n_docs,
    n_occurrences, keeper_doc). ``keeper_doc`` (the minimum doc id holding
    the gram) is the one canonical copy removal preserves — min() is
    deterministic and engine-portable where "first seen" is not.

    One partial-aggregating groupBy on the 16-byte hash; at corpus scale
    this is the dominant (and only unavoidable) shuffle of the pipeline.
    """
    return (
        occ.groupBy("gram_hash")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min(id_col).alias("keeper_doc"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def _merge_islands(marked: DataFrame, k: int, id_col: str) -> DataFrame:
    """Merge marked gram-start positions into maximal [start, end) token
    spans per doc — the island trick: a new span starts where ``pos``
    clears the running max of previous interval ends. Window state is
    per-document (bounded by doc length), so no skew risk at corpus scale.
    """
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (prev_end.isNull() | (F.col("pos") > prev_end)).cast("int")
    return (
        marked.select(id_col, "pos", new_island.alias("ni"))
        .withColumn("island", F.sum("ni").over(w))
        .groupBy(id_col, "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .drop("island")
    )


def _release_through(result: DataFrame, caches: list[DataFrame]) -> DataFrame:
    """Materialize-then-unpersist (r8, VERDICT r7 item 9): persist and
    eagerly compute ``result``, then release the upstream caches it was
    built through. After this returns, the only pinned blocks are the
    RESULT's own (stats- or delta-scale — never the corpus-scale
    occurrence table), and the caller owns them (``result.unpersist()``
    when done, or session.release_session_storage as before)."""
    result = result.persist()
    result.count()
    for c in caches:
        c.unpersist()
    return result


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    _caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Maximal duplicated spans per doc: (doc_id, span_start, span_end).

    Every occurrence of a cross-doc duplicated gram is marked (keeper or
    not — a span IS duplicated in the keeper too; removal, not detection,
    is where the keeper survives), then merged into maximal spans.
    """
    # One shuffle serves both consumers: the groupBy inside
    # duplicated_grams and the marking join both cluster on gram_hash, so
    # a persisted hash-partitioned occurrence table computes the gram
    # explode once and satisfies both distributions (same pattern as the
    # dedup.py inverted-index caches; see the module caching contract
    # there — callers release via session.release_session_storage, or get
    # the handle back via ``_caches`` for materialize-then-unpersist).
    occ = kgram_occurrences(docs, k, id_col, text_col).repartition(
        "gram_hash"
    ).persist()
    if _caches is not None:
        _caches.append(occ)
    dup = duplicated_grams(occ, id_col, min_docs)
    marked = occ.join(dup.select("gram_hash"), "gram_hash")
    return _merge_islands(marked, k, id_col)


def duplicate_span_doc_stats(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    release: bool = True,
) -> DataFrame:
    """Per-doc duplication profile: (doc_id, n_spans, dup_tokens).

    dup_tokens is the union length of the maximal spans — the count of
    token positions inside any duplicated passage.

    ``release=True`` (default) eagerly materializes the per-doc stats and
    unpersists the corpus-scale occurrence cache before returning, so a
    stats call leaves nothing corpus-scale pinned (the r7 footgun: every
    call in a long session stacked another occurrence table in executor
    storage). Pass ``release=False`` to keep the cache for a follow-up
    span operator over the same corpus."""
    # Same marks as duplicate_spans, but the island merge runs on each
    # doc's sorted start array via _island_bounds instead of the window +
    # double groupBy of the span-listing form (r9): one exchange carries
    # the occurrence starts, the maximal-span count and union length are
    # then map-side arithmetic. Results are identical — n_spans is the
    # island count, dup_tokens the summed island lengths.
    caches: list[DataFrame] = []
    occ = kgram_occurrences(docs, k, id_col, text_col).repartition(
        "gram_hash"
    ).persist()
    caches.append(occ)
    dup = duplicated_grams(occ, id_col, min_docs)
    marked = occ.join(dup.select("gram_hash"), "gram_hash")
    starts = F.col("__starts")
    island_starts, island_ends = _island_bounds(starts, k)
    stats = (
        marked.groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list(F.col("pos").cast("long"))).alias(
                "__starts"
            )
        )
        .select(
            id_col,
            F.size(island_starts).cast("bigint").alias("n_spans"),
            F.aggregate(
                F.zip_with(island_ends, island_starts, lambda e, s: e - s),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dup_tokens"),
        )
    )
    return _release_through(stats, caches) if release else stats


def covered_positions(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    _caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Token positions slated for removal: (doc_id, pos), distinct.

    Only *non-keeper* occurrences cover positions — the minimum doc id
    containing each duplicated gram keeps its copy, so exactly one
    canonical occurrence of every duplicated passage survives the corpus
    (the Lee et al. contract). The explode is a bounded fan-out of k rows
    per occurrence; distinct() collapses overlap.
    """
    # same one-shuffle-two-consumers persist as duplicate_spans
    occ = kgram_occurrences(docs, k, id_col, text_col).repartition(
        "gram_hash"
    ).persist()
    if _caches is not None:
        _caches.append(occ)
    dup = duplicated_grams(occ, id_col, min_docs)
    removable = occ.join(dup.select("gram_hash", "keeper_doc"), "gram_hash").where(
        F.col(id_col) != F.col("keeper_doc")
    )
    return removable.select(
        id_col,
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + (k - 1))
        ).alias("pos"),
    ).distinct()


def remove_duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    release: bool = True,
) -> DataFrame:
    """Cleaned corpus for the *modified* docs: (doc_id, tokens_before,
    tokens_after, clean_text).

    clean_text is the normalized text with covered positions dropped and
    the remainder re-joined in original order (sort_array over
    (pos, token) structs — exact, no window needed). Docs that lose every
    token come back with clean_text = '' rather than vanishing: a
    downstream filter on tokens_after is a *policy* decision this operator
    does not make. Unmodified docs are not returned — at 100 TB the whole
    point is that the output of the removal step is a small delta, joined
    back to the corpus by the caller (left join + coalesce), not a
    rewritten copy of every row.
    """
    # The removal marks are the NON-KEEPER occurrence starts; the whole
    # covered-position union, kept-token selection and text rebuild then
    # happen map-side in _removal_stats (r9 — the old path exploded k
    # rows per occurrence, distinct-shuffled them, and re-exploded every
    # affected doc's tokens for an anti-join + collect_list regroup).
    # release=True (default) eagerly materializes the delta and
    # unpersists the corpus-scale occurrence cache — after return, only
    # the (delta-scale) result's own blocks are pinned, owned by the
    # caller (r8, VERDICT r7 item 9).
    caches: list[DataFrame] = []
    occ = kgram_occurrences(docs, k, id_col, text_col).repartition(
        "gram_hash"
    ).persist()
    caches.append(occ)
    dup = duplicated_grams(occ, id_col, min_docs)
    removable = occ.join(
        dup.select("gram_hash", "keeper_doc"), "gram_hash"
    ).where(F.col(id_col) != F.col("keeper_doc"))
    out = _removal_stats(
        docs, removable.select(id_col, "pos"), k, id_col, text_col
    )
    return _release_through(out, caches) if release else out


def _island_bounds(starts: Column, k: int) -> tuple[Column, Column]:
    """(island_starts, island_ends) array expressions over a SORTED array
    of k-gram start positions: the maximal merged [start, end) spans of
    the intervals [s, s+k). Because every interval has the same length k,
    the classic running-max island test collapses to a neighbor test on
    the sorted starts — s opens a new island iff s > prev + k (equality
    means the intervals touch and merge seamlessly). Pure array HOFs:
    O(starts) per doc, no shuffle, no window."""
    m = F.size(starts)
    prevs = F.concat(
        F.array(F.lit(None).cast("long")), F.slice(starts, 1, m - 1)
    )
    nexts = F.concat(
        F.slice(starts, 2, m - 1), F.array(F.lit(None).cast("long"))
    )
    island_starts = F.array_compact(
        F.zip_with(
            starts,
            prevs,
            lambda s, p: F.when(p.isNull() | (s > p + k), s),
        )
    )
    island_ends = F.array_compact(
        F.zip_with(
            starts,
            nexts,
            lambda s, nx: F.when(nx.isNull() | (nx > s + k), s + k),
        )
    )
    return island_starts, island_ends


def _removal_stats(
    docs: DataFrame, start_marks: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """Shared byte-exact reconstruction: given (id, pos) rows marking the
    START of every k-gram occurrence to drop, return one row per AFFECTED
    doc with (tokens_before, tokens_after, clean_text).

    Shape (r9, guide §2.3/§2.4): ONE groupBy collects each affected doc's
    sorted start positions — the only shuffle, and it moves gram STARTS
    (one row per occurrence), never the k-exploded covered positions and
    never the corpus's exploded tokens. The covered-position union, the
    kept-token selection and the byte-exact text reconstruction all
    happen map-side on the docs⋈starts join via array HOFs: merged
    islands -> complement gaps -> slice the token array per gap ->
    flatten -> join. The old shape exploded k rows per occurrence,
    distinct-shuffled them, re-exploded every affected doc's tokens,
    anti-joined, and re-assembled with a collect_list groupBy — four
    corpus/delta-scale exchanges this plan simply does not have.
    """
    per_doc = start_marks.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.col("pos").cast("long"))).alias(
            "__starts"
        )
    )
    island_starts, island_ends = _island_bounds(F.col("__starts"), k)
    # the same UNFILTERED token array kgram_occurrences indexed: pos
    # values are offsets into it (affected docs have >= k real tokens, so
    # normalized_text's whitespace collapse guarantees no empty entries)
    toks = _norm_tokens(text_col)
    n = F.size(toks)
    # complement of the islands inside [0, n): gap g spans
    # [gap_starts[g], gap_ends[g]) and slice() tolerates empty gaps
    gap_starts = F.concat(F.array(F.lit(0).cast("long")), F.col("__ie"))
    gap_ends = F.concat(F.col("__is"), F.array(F.col("__n")))
    kept = F.flatten(
        F.zip_with(
            gap_starts,
            gap_ends,
            lambda gs, ge: F.slice(toks, (gs + 1).cast("int"), (ge - gs).cast("int")),
        )
    )
    removed = F.aggregate(
        F.zip_with(F.col("__ie"), F.col("__is"), lambda e, s: e - s),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        docs.select(id_col, text_col)
        .join(per_doc, id_col)
        .withColumn("__is", island_starts)
        .withColumn("__ie", island_ends)
        .withColumn("__n", n.cast("long"))
        .select(
            id_col,
            F.col("__n").cast("bigint").alias("tokens_before"),
            (F.col("__n") - removed).cast("bigint").alias("tokens_after"),
            F.array_join(kept, " ").alias("clean_text"),
        )
    )


def boilerplate_covered_positions(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 4,
    _caches: list[DataFrame] | None = None,
) -> DataFrame:
    """Token positions inside any k-gram shared by >= min_df documents:
    (id, pos), distinct — NO keeper. Boilerplate (headers, footers,
    license blurbs, nav text) is noise in every copy, unlike a duplicated
    passage whose one canonical copy is content, so removal drops ALL
    occurrences (CCNet's line-hash rule, expressed over word k-grams).

    Same shuffle shape as covered_positions: one groupBy on 16-byte
    hashes + one hash join + a k-row bounded explode. min_df is the
    policy knob: df >= min_df across the corpus marks a gram boilerplate.
    """
    occ = kgram_occurrences(docs, k, id_col, text_col).repartition(
        "gram_hash"
    ).persist()
    if _caches is not None:
        _caches.append(occ)
    boiler = duplicated_grams(occ, id_col, min_docs=min_df)
    marked = occ.join(boiler.select("gram_hash"), "gram_hash")
    return marked.select(
        id_col,
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias(
            "pos"
        ),
    ).distinct()


def remove_boilerplate(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 4,
    release: bool = True,
) -> DataFrame:
    """Boilerplate removal, composed from the discovery profile
    (plans/curation_queries.py boilerplate_ngrams finds the grams) and the
    span-removal machinery: one row per MODIFIED doc with (tokens_before,
    tokens_after, clean_text), the cleaned text reconstructed
    byte-exactly in original token order.

    Differs from remove_duplicate_spans in exactly one policy bit: every
    occurrence is removed (no keeper_doc survives), because boilerplate
    has no canonical copy worth training on. Output is the affected-docs
    delta, not a rewritten corpus — the caller left-joins it back.
    """
    # Boilerplate removal has no keeper: every occurrence of a marked
    # gram is a removal start. Marks go to _removal_stats directly; the
    # covered-position union is computed map-side there (r9).
    caches: list[DataFrame] = []
    occ = kgram_occurrences(docs, k, id_col, text_col).repartition(
        "gram_hash"
    ).persist()
    caches.append(occ)
    boiler = duplicated_grams(occ, id_col, min_docs=min_df)
    marked = occ.join(boiler.select("gram_hash"), "gram_hash")
    out = _removal_stats(
        docs, marked.select(id_col, "pos"), k, id_col, text_col
    )
    return _release_through(out, caches) if release else out
