"""As-of join — a custom operator Spark lacks natively (SURVEY.md guide
'Common OLAP patterns').

Implemented as a composition of existing DataFrame ops (union + running
``last(..., ignorenulls=True)`` window), NOT a pandas fallback: for each left
row, find the most recent right row with ``right_ts <= left_ts`` sharing the
join key.

Scale: one shuffle on the key (both sides union first, so left and right
co-partition by construction) + one within-partition sort — the same cost
profile as ``pd.merge_asof`` per group via applyInPandas, but JVM-side,
spill-safe, and skew-handled by AQE. For repeated as-of joins against the
same key, pre-bucketing both tables on the key removes the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each ``left`` row, attach the latest ``right`` row (by
    ``right_ts``) with ``right_ts <= left_ts`` and equal key(s) ``on``.

    ``right_cols`` selects which right columns to carry (default: all except
    key/ts). Carried columns are renamed ``<col><suffix>``; the matched right
    timestamp arrives as ``<right_ts><suffix>``. Left rows with no match keep
    NULLs (left-outer as-of semantics, matching ``pd.merge_asof`` /
    DuckDB ``ASOF JOIN`` defaults).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    carried = [right_ts] + right_cols

    # Tag and union: right rows sort before left rows at equal timestamps so
    # an exact-tie right row IS visible to the left row (inclusive <=).
    # Carried right columns travel as ONE struct — filling them independently
    # could mix values from different right rows when a right column is
    # genuinely NULL.
    rhs = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in carried]).alias("__right_row"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__left_row"),
    )
    lhs = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rhs.schema["__right_row"].dataType).alias("__right_row"),
        F.struct(*left.columns).alias("__left_row"),
    )
    unioned = lhs.unionByName(rhs)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__side",
        "__left_row",
        F.last(F.col("__right_row"), ignorenulls=True).over(w).alias("__match"),
    ).filter(F.col("__side") == 1)

    out_cols = [F.col(f"__left_row.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in carried]
    return filled.select(*out_cols)
