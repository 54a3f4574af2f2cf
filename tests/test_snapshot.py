"""Unit tests for operators.snapshot (CDC diff + SCD2 intervals)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from autonomous_orchestrator_ai_spark.operators.snapshot import (
    scd2_intervals,
    snapshot_diff,
)


class TestSnapshotDiff:
    def test_labels_added_removed_changed(self, spark):
        old = spark.createDataFrame(
            [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
        )
        new = spark.createDataFrame(
            [Row(k=2, v="b"), Row(k=3, v="X"), Row(k=4, v="d")]
        )
        out = {r.k: r.change for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
        assert out == {1: "removed", 3: "changed", 4: "added"}

    def test_null_vs_empty_string_differ(self, spark):
        old = spark.createDataFrame([Row(k=1, v=None)], "k int, v string")
        new = spark.createDataFrame([Row(k=1, v="")], "k int, v string")
        rows = snapshot_diff(old, new, ["k"], ["v"]).collect()
        assert len(rows) == 1 and rows[0].change == "changed"


class TestScd2:
    def test_collapses_runs_and_marks_current(self, spark):
        t = lambda m: dt.datetime(2024, 1, 1, 0, m)
        df = spark.createDataFrame(
            [
                Row(k=1, ts=t(0), i=1, plan="free"),
                Row(k=1, ts=t(10), i=2, plan="free"),   # same run
                Row(k=1, ts=t(20), i=3, plan="pro"),
                Row(k=1, ts=t(30), i=4, plan="free"),   # back again = new interval
                Row(k=2, ts=t(5), i=5, plan="pro"),
            ]
        )
        rows = sorted(
            scd2_intervals(df, ["k"], "ts", ["plan"], tie_cols=["i"]).collect(),
            key=lambda r: (r.k, r.valid_from),
        )
        k1 = [r for r in rows if r.k == 1]
        assert [(r.plan, r.is_current) for r in k1] == [
            ("free", False),
            ("pro", False),
            ("free", True),
        ]
        assert k1[0].valid_to == t(20) and k1[1].valid_to == t(30)
        k2 = [r for r in rows if r.k == 2]
        assert len(k2) == 1 and k2[0].is_current
