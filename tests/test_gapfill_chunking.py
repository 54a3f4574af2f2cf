"""Unit tests for operators.gapfill (time_bucket_gapfill / LOCF) and
operators.chunking (fixed-window text chunking)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.chunking import chunk_text
from autonomous_orchestrator_ai_spark.operators.gapfill import (
    time_bucket,
    time_bucket_gapfill,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


class TestGapfill:
    def test_fills_gaps_with_locf(self, spark):
        # key 'a' observed in buckets 0 and 3 (of 0..3); 1-2 are gaps.
        df = spark.createDataFrame(
            [
                Row(k="a", ts=_ts(0), v=10.0),
                Row(k="a", ts=_ts(5), v=20.0),  # same bucket as minute 0
                Row(k="a", ts=_ts(35), v=40.0),
                Row(k="b", ts=_ts(20), v=7.0),
            ]
        )
        out = time_bucket_gapfill(
            df, "ts", 600, ["k"], F.avg("v"), value_name="v"
        ).orderBy("k", "bucket")
        rows = out.collect()
        a = [r for r in rows if r.k == "a"]
        assert len(a) == 4  # global range covers buckets 0..3
        assert a[0].v == 15.0 and not a[0].gap_filled
        assert a[1].v is None and a[1].gap_filled and a[1].v_filled == 15.0
        assert a[2].v is None and a[2].v_filled == 15.0
        assert a[3].v == 40.0 and a[3].v_filled == 40.0
        b = [r for r in rows if r.k == "b"]
        # 'b' densified to the same global range; leading gap has no LOCF.
        assert len(b) == 4
        assert b[0].gap_filled and b[0].v_filled is None
        assert b[2].v == 7.0 and b[3].v_filled == 7.0

    def test_bucket_alignment(self, spark):
        df = spark.createDataFrame([Row(ts=dt.datetime(2024, 1, 1, 10, 59))])
        row = df.select(time_bucket("ts", 3600).alias("b")).first()
        assert row.b == dt.datetime(2024, 1, 1, 10, 0)


class TestChunkText:
    def test_overlapping_windows(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="abcdefghij")])
        out = chunk_text(df, "text", size=4, stride=3).orderBy("chunk_idx")
        rows = out.collect()
        assert [r.chunk_text for r in rows] == ["abcd", "defg", "ghij", "j"]
        assert [r.chunk_start for r in rows] == [0, 3, 6, 9]
        assert rows[0].doc_id == 1

    def test_short_and_empty_docs(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, text="ab"), Row(doc_id=2, text=""), Row(doc_id=3, text=None)]
        )
        rows = chunk_text(df, "text", size=4, stride=3).collect()
        assert len(rows) == 1 and rows[0].chunk_text == "ab"

    def test_rejects_bad_params(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="abc")])
        with pytest.raises(ValueError):
            chunk_text(df, "text", size=0, stride=3)


class TestSemanticDedup:
    def test_drops_higher_id_near_dups(self, spark):
        from autonomous_orchestrator_ai_spark.operators.semdedup import (
            semantic_dedup,
            semantic_dedup_pairs,
        )

        df = spark.createDataFrame(
            [
                Row(vec_id=1, embedding=[1.0, 0.0], label=0),
                Row(vec_id=2, embedding=[0.9, 0.1], label=0),
                Row(vec_id=3, embedding=[0.0, 1.0], label=0),
                Row(vec_id=4, embedding=[1.0, 0.0], label=1),  # other block
            ]
        )
        pairs = semantic_dedup_pairs(df, "label", 0.9).collect()
        assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
        kept = {r.vec_id for r in semantic_dedup(df, "label", 0.9).collect()}
        assert kept == {1, 3, 4}

    def test_blocking_prevents_cross_block_drops(self, spark):
        from autonomous_orchestrator_ai_spark.operators.semdedup import (
            semantic_dedup,
        )

        df = spark.createDataFrame(
            [
                Row(vec_id=1, embedding=[1.0, 0.0], label=0),
                Row(vec_id=2, embedding=[1.0, 0.0], label=1),
            ]
        )
        assert semantic_dedup(df, "label", 0.9).count() == 2


class TestNumericHistogram:
    def test_equi_width_bins(self, spark):
        from autonomous_orchestrator_ai_spark.operators.profiling import (
            numeric_histogram,
        )

        df = spark.createDataFrame([Row(v=float(i)) for i in range(10)])
        rows = {r.bin: r for r in numeric_histogram(df, "v", 5).collect()}
        assert len(rows) == 5
        # max value clamps into the last bin
        assert all(rows[b].n_rows == 2 for b in range(5))
        assert rows[0].bin_lo == 0.0 and rows[4].bin_hi == 9.0

    def test_degenerate_single_value(self, spark):
        from autonomous_orchestrator_ai_spark.operators.profiling import (
            numeric_histogram,
        )

        df = spark.createDataFrame([Row(v=3.0), Row(v=3.0)])
        rows = numeric_histogram(df, "v", 4).collect()
        assert len(rows) == 1 and rows[0].bin == 0 and rows[0].n_rows == 2
