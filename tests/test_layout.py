"""Z-order layout operator tests (operators/layout.py): key arithmetic,
and the actual pruning benefit measured from parquet footer statistics."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.layout import (
    column_bounds,
    file_stat_spans,
    write_zordered,
    zorder_key,
)


def test_zorder_key_interleaves_bits(spark):
    # bounds (0,3) with 2 bits: scaled value == raw value; col0 bits land at
    # even positions, col1 at odd
    df = spark.createDataFrame(
        [Row(x=x, y=y) for x in range(4) for y in range(4)]
    )
    rows = df.select(
        "x", "y", zorder_key(["x", "y"], [(0, 3), (0, 3)], bits=2).alias("z")
    ).collect()
    expect = {
        (0, 0): 0,
        (1, 0): 1,
        (0, 1): 2,
        (1, 1): 3,
        (2, 3): 0b1110,
        (3, 3): 0b1111,
    }
    got = {(r.x, r.y): r.z for r in rows}
    for k, v in expect.items():
        assert got[k] == v, (k, got[k], v)
    # the key is a bijection on the 4x4 grid
    assert sorted(got.values()) == list(range(16))


def test_column_bounds_and_degenerate_dim(spark):
    df = spark.createDataFrame([Row(a=i, c=7) for i in range(10)])
    assert column_bounds(df, ["a", "c"]) == [(0.0, 9.0), (7.0, 7.0)]
    # constant column contributes 0 bits, key still works
    z = df.select(zorder_key(["a", "c"], [(0, 9), (7, 7)], bits=4).alias("z"))
    assert z.distinct().count() == 10


def test_zorder_write_bounds_both_dims(spark, tmp_path):
    """The point of the layout: after a Z-ordered write, every file's
    footer min/max box is narrow on BOTH columns, so predicates on either
    prune files. A single-column sort leaves the other column's span at
    ~100% per file — nothing prunes."""
    n = 20_000
    df = (
        spark.range(n)
        .select(
            (F.hash(F.col("id")) % 1000 + 1000).alias("a"),
            (F.hash(F.col("id"), F.lit(1)) % 1000 + 1000).alias("b"),
        )
    )
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "sorted_a")
    write_zordered(df, zpath, ["a", "b"], bits=10, num_files=8)
    (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.parquet(spath)
    )

    def avg_span(path, col):
        stats = [s for s in file_stat_spans(path, [col]) if f"{col}_min" in s]
        assert stats
        spans = [(s[f"{col}_max"] - s[f"{col}_min"]) / 2000.0 for s in stats]
        return sum(spans) / len(spans)

    # z-order: both dims bounded well below full range
    assert avg_span(zpath, "a") < 0.7
    assert avg_span(zpath, "b") < 0.7
    # single-column sort: a is tight but b is unbounded per file
    assert avg_span(spath, "a") < 0.3
    assert avg_span(spath, "b") > 0.9

    # pruning a predicate box on b alone: count files a scan must read
    def overlapping(path, col, lo, hi):
        return sum(
            1
            for s in file_stat_spans(path, [col])
            if f"{col}_min" in s and not (s[f"{col}_max"] < lo or s[f"{col}_min"] > hi)
        )

    assert overlapping(zpath, "b", 1000, 1200) < overlapping(spath, "b", 1000, 1200)

    # layout changes bytes on disk, never the relation
    back = spark.read.parquet(zpath)
    assert back.count() == n
    assert back.agg(F.sum("a"), F.sum("b")).first() == df.agg(
        F.sum("a"), F.sum("b")
    ).first()
