"""KMV (K-Minimum-Values) distinct sketch — the mergeable cardinality
sketch that, unlike HLL, also answers SET-EXPRESSION questions
(intersection size, Jaccard) between sketches (Beyer et al., "On synopses
for distinct-value estimation under multiset operations", SIGMOD 2007).

Why this exists next to operators/sketch.py's HLL: HLL unions losslessly
but cannot intersect; KMV keeps the k smallest hash values of a set, and
the k-min of a UNION of sketches is computable from the per-set sketches,
so ``|A∩B|/|A∪B|`` (Jaccard) falls out of one bounded merge. At corpus
scale that's the cheap way to ask "how much vocabulary do two sources
share?" or "how many users overlap between event types?" without a
distinct-distinct join over the raw data.

Spark-first shape (every step stays in Catalyst):
- hash: ``md5(salt:value)`` 13-hex-char prefix → 52-bit integer — the
  same portable draw curation.py uses, so DuckDB reproduces every hash
  bit-for-bit and the sketches here are ORACLE-EXACT, not rows-only;
- build: dedup ``(group, hash)`` with a map-side-combined groupBy (the
  partial aggregate shrinks each partition to its distinct hashes before
  the shuffle), then one windowed rank keeps the k smallest per group.
  Shuffle volume is bounded by distinct count, never row count; sketch
  size is exactly ``k`` rows per group regardless of corpus size;
- estimate: ``(k-1)/h_k`` with hashes normalized to (0,1) — exact count
  when the group has < k distinct values (the sketch IS the set);
- Jaccard: per group-pair, the k smallest of the two sketches' hash
  union, counting how many sit in both — ``ρ = |∩ k-min(A∪B)| / k'``,
  ``k' = min(k, |union|)``. All arithmetic over ≤ 2k rows per pair.

Determinism contract: md5 is engine-stable and the 52-bit prefix is exact
in a double, so estimates match DuckDB to the last bit (rounded 4 dp in
registered queries only to absorb double formatting).

Beyond-reference surface: the reference (AbdulSohail018/
Autonomous-Orchestrator-Ai) has no sketch machinery; this backs
SURVEY.md's training-data toolkit (cross-source vocabulary overlap,
audience-overlap profiling) at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: 13 hex chars = 52 bits: the largest md5 prefix exactly representable in
#: a double (and in DuckDB's BIGINT cast of '0x…'), shared with
#: operators/curation.py's draw idiom.
_HEX_CHARS = 13
_SPACE = float(16**_HEX_CHARS)


def kmv_hash(value: Column | str, salt: str = "kmv") -> Column:
    """Uniform deterministic draw in (0,1): md5(salt:value) 52-bit prefix
    over the hash space. DuckDB mirror:
    ``(CAST(('0x' || substr(md5('<salt>:' || CAST(v AS VARCHAR)), 1, 13))
    AS BIGINT) + 0.5) / 16.0^13``."""
    v = F.col(value) if isinstance(value, str) else value
    h = F.md5(F.concat(F.lit(f"{salt}:"), v.cast("string")))
    raw = F.conv(F.substring(h, 1, _HEX_CHARS), 16, 10).cast("double")
    return (raw + F.lit(0.5)) / F.lit(_SPACE)


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    k: int = 256,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketch: (group_cols..., h, rn) with rn = 1..≤k over
    ascending hash. NULL values are dropped (distinct-count semantics).

    The groupBy dedup before the window is the scale move: partial
    aggregation collapses each input partition to its distinct hashes
    map-side, so the one shuffle carries distinct values, and the per-group
    sort under the window ranks those — bounded by distinct count, with
    the sketch itself ≤ k rows per group forever."""
    v = F.col(value_col)
    hashed = (
        df.where(v.isNotNull())
        .select(*group_cols, kmv_hash(v, salt).alias("h"))
        .groupBy(*group_cols, "h")
        .agg(F.count(F.lit(1)).alias("_dup"))
        .drop("_dup")
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )


def kmv_distinct_estimate(
    sketch: DataFrame, group_cols: Sequence[str], k: int
) -> DataFrame:
    """(group_cols..., est_distinct): ``(k-1)/h_k`` when the sketch is
    full, else the exact distinct count (< k values seen means the sketch
    holds the whole hashed set). One bounded aggregate over ≤k rows/group."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("h_k"),
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise((F.lit(float(k - 1))) / F.col("h_k"))
    return agg.select(*group_cols, F.round(est, 4).alias("est_distinct"))


def kmv_jaccard_pairs(
    sketch: DataFrame, group_col: str, k: int
) -> DataFrame:
    """Pairwise Jaccard estimates between all groups in one sketch frame:
    (g_a, g_b, k_prime, n_both, jaccard_est) for g_a < g_b.

    Shape: the distinct-group dim is tiny (it IS the group list), so the
    pair frame broadcasts; each pair pulls its two ≤k-row sketches through
    two equi-joins (never an OR-join → never a nested-loop), unions them,
    ranks the hash union, and counts membership-in-both among the k'
    smallest. Work per pair is O(k log k) on ≤2k rows — independent of
    corpus size, the entire point of sketching the sources first."""
    sk = sketch.select(F.col(group_col).alias("g"), "h")
    gdim = sk.select("g").distinct()
    pairs = (
        F.broadcast(gdim.select(F.col("g").alias("g_a")))
        .crossJoin(F.broadcast(gdim.select(F.col("g").alias("g_b"))))
        .where(F.col("g_a") < F.col("g_b"))
    )
    side_a = pairs.join(sk, F.col("g_a") == F.col("g")).select(
        "g_a", "g_b", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    side_b = pairs.join(sk, F.col("g_b") == F.col("g")).select(
        "g_a", "g_b", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    union_h = (
        side_a.unionByName(side_b)
        .groupBy("g_a", "g_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("g_a", "g_b").orderBy("h")
    kmin = union_h.withColumn("urn", F.row_number().over(w)).where(
        F.col("urn") <= k
    )
    return kmin.groupBy("g_a", "g_b").agg(
        F.count(F.lit(1)).alias("k_prime"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("bigint")).alias("n_both"),
    ).select(
        "g_a",
        "g_b",
        "k_prime",
        "n_both",
        F.round(F.col("n_both") / F.col("k_prime"), 4).alias("jaccard_est"),
    )
