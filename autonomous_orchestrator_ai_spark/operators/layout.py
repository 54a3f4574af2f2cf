"""Data-layout operators: Z-order (Morton-curve) multi-dimensional
clustering for scan pruning.

A 100 TB table is only as fast as what you can SKIP. Partitioning prunes
on the partition column; sorting prunes parquet row groups on the sort
column — but only one. Z-ordering interleaves the bits of several columns
into one sort key so that files/row groups stay "cubes" in N-dimensional
space: their min/max footer statistics are narrow on EVERY participating
column, and a predicate on any subset of them skips most files. (Same
design as Delta Lake's OPTIMIZE ZORDER BY; here it's pure DataFrame ops —
scale each column to a fixed-width integer, interleave bits with built-in
shift/mask expressions, range-repartition + sort on the key.)

Everything is expression-level (whole-stage codegen): the only extra cost
over a plain sorted write is one scalar min/max aggregation for the bounds
and the interleave arithmetic per row. The bounds collect is two values
per column — at scale, read them from table statistics instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["column_bounds", "zorder_key", "write_zordered", "file_stat_spans"]


def column_bounds(df: DataFrame, cols: list[str]) -> list[tuple[float, float]]:
    """(min, max) per column, one aggregation job. The only driver-side
    data movement in the operator (2 scalars per column)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
    row = df.agg(*aggs).first()
    return [(float(row[f"__mn_{c}"]), float(row[f"__mx_{c}"])) for c in cols]


def zorder_key(
    cols: list[Column | str],
    bounds: list[tuple[float, float]],
    bits: int = 12,
) -> Column:
    """Morton key: each column is min-max scaled to ``bits`` bits (floor,
    clamped to [0, 2^bits-1]), then bit ``b`` of column ``i`` lands at key
    position ``b*n_cols + i``. Pure bigint shift/mask arithmetic — stays in
    codegen, and is engine-portable (the DuckDB oracle recomputes it
    bit-for-bit). ``bits * len(cols)`` must stay < 63."""
    n = len(cols)
    if bits * n >= 63:
        raise ValueError("zorder_key: bits * n_cols must fit in a signed 64-bit key")
    max_cell = (1 << bits) - 1
    scaled: list[Column] = []
    for c, (mn, mx) in zip(cols, bounds):
        c = F.col(c) if isinstance(c, str) else c
        if mx == mn:
            scaled.append(F.lit(0).cast("bigint"))
            continue
        s = F.floor(
            (c.cast("double") - F.lit(mn)) * F.lit(max_cell) / F.lit(mx - mn)
        ).cast("bigint")
        scaled.append(F.least(F.greatest(s, F.lit(0)), F.lit(max_cell)))
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``:
    range-repartition on the key (contiguous curve segments per file, one
    shuffle) + sort within partitions (row-group-level locality inside each
    file). The key column is dropped before the write — the layout, not the
    schema, carries the information; every file's footer min/max on each of
    ``cols`` is then a tight box that predicate pushdown prunes against."""
    bounds = column_bounds(df, cols)
    z = zorder_key(list(cols), bounds, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def file_stat_spans(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max footer statistics for ``cols`` (via pyarrow) — the
    observability half of the operator: what a scan's pruning actually sees.
    Returns one dict per data file: {file, <col>_min, <col>_max, ...}."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        schema_names = [meta.row_group(0).column(i).path_in_schema
                        for i in range(meta.num_columns)]
        rec: dict = {"file": os.path.basename(f)}
        for c in cols:
            idx = schema_names.index(c)
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                mins.append(st.min)
                maxs.append(st.max)
            if mins:
                rec[f"{c}_min"] = min(mins)
                rec[f"{c}_max"] = max(maxs)
        out.append(rec)
    return out
