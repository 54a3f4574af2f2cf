"""Custom stateful streaming operator test (applyInPandasWithState)."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import functions as F

from autonomous_orchestrator_ai_spark.operators.transform import parse_kafka_messages
from autonomous_orchestrator_ai_spark.schemas import customer_events_schema
from autonomous_orchestrator_ai_spark.sources.readers import jsonl_as_kafka_envelope
from autonomous_orchestrator_ai_spark.streaming.pipeline import streaming_enrich
from autonomous_orchestrator_ai_spark.streaming.state import streaming_session_stats


def _ms(iso: str) -> int:
    return int(datetime.fromisoformat(iso).replace(tzinfo=timezone.utc).timestamp() * 1000)


def test_stateful_sessionization(spark, tmp_path):
    """Two users, events spanning a >30min gap: per-key GroupState counts
    sessions across the stream."""
    base = dict(name="X", email="x@x.com", signup_ts=_ms("2023-01-01T00:00:00"),
                country="US", plan="free", version=1)
    events = [
        dict(base, id="u1", event_ts=_ms("2024-01-15T00:00:00")),
        dict(base, id="u1", event_ts=_ms("2024-01-15T00:10:00")),  # same session
        dict(base, id="u1", event_ts=_ms("2024-01-15T01:00:00")),  # gap > 30min -> new
        dict(base, id="u2", event_ts=_ms("2024-01-15T00:05:00")),
    ]
    d = tmp_path / "in"
    d.mkdir()
    (d / "e.jsonl").write_text("\n".join(json.dumps(e) for e in events) + "\n")

    envelope = jsonl_as_kafka_envelope(spark, str(d), streaming=True)
    parsed = parse_kafka_messages(envelope, customer_events_schema(1))
    enriched = streaming_enrich(
        parsed, processing_time=F.to_timestamp(F.lit("2024-01-15 02:00:00"))
    )
    stats = streaming_session_stats(enriched, gap_seconds=1800.0)

    query = (
        stats.writeStream.outputMode("update")
        .format("memory")
        .queryName("session_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    rows = {r["user_key"]: r for r in spark.sql("SELECT * FROM session_stats").collect()}
    assert rows["u1"]["n_sessions"] == 2 and rows["u1"]["n_events"] == 3
    assert rows["u2"]["n_sessions"] == 1 and rows["u2"]["n_events"] == 1


def test_windowed_agg_on_rocksdb_state_store(spark, tmp_path):
    """The bounded-state scale path (SURVEY.md §7.4): the same windowed
    aggregation runs on the RocksDB state-store provider — state spills
    to local disk instead of living on the JVM heap, which is what keeps
    stateful streaming viable when key cardinality outgrows memory."""
    import json as _json

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        d = tmp_path / "in"
        d.mkdir()
        rows = [
            {"user": "a", "ts": "2024-01-15T10:05:00"},
            {"user": "a", "ts": "2024-01-15T10:20:00"},
            {"user": "b", "ts": "2024-01-15T11:40:00"},
        ]
        (d / "r.jsonl").write_text("\n".join(_json.dumps(r) for r in rows))
        stream = (
            spark.readStream.schema("user string, ts string")
            .json(str(d))
            .select("user", F.to_timestamp("ts").alias("ts"))
            .withWatermark("ts", "10 minutes")
        )
        counts = stream.groupBy(
            F.window("ts", "1 hour").alias("win"), "user"
        ).agg(F.count(F.lit(1)).alias("n"))
        q = (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocksdb_counts")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r.user, r.win.start.hour): r.n
            for r in spark.sql("SELECT * FROM rocksdb_counts").collect()
        }
        assert got == {("a", 10): 2, ("b", 11): 1}
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_transform_with_state_value_stats(spark, tmp_path):
    """Spark 4 StatefulProcessor API (transformWithStateInPandas): per-key
    state persists across two separate micro-batches (two availableNow
    runs over a grow-in-place source share one checkpoint).

    The API's driver worker speaks protobuf to the JVM state server. This
    container has no protobuf wheel, but conftest bridges in the runtime
    bundled with the on-disk google-cloud-sdk (testing/pbcompat — r7, the
    one pytest skip of rounds 4-6 retired); the importorskip remains for
    environments where neither the wheel nor the SDK runtime exists.
    """
    import json as _json

    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState workers need protobuf (no wheel and no "
        "SDK-bundled runtime on disk — see testing/pbcompat)",
    )

    from autonomous_orchestrator_ai_spark.streaming.state import (
        streaming_value_stats,
    )

    # transformWithState is RocksDB-only (the HDFS-backed provider does not
    # implement the multi-column-family state it needs)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    d = tmp_path / "in"
    d.mkdir()
    (d / "b1.jsonl").write_text(
        "\n".join(
            _json.dumps(r)
            for r in [
                {"user_id": "u1", "value": 10.0},
                {"user_id": "u1", "value": 5.0},
                {"user_id": "u2", "value": 7.0},
            ]
        )
    )

    def run_once():
        stream = (
            spark.readStream.schema("user_id string, value double")
            .json(str(d))
        )
        stats = streaming_value_stats(stream, ttl_ms=None)
        # foreachBatch, not the memory sink: memory-sink queries refuse
        # checkpoint RECOVERY, and recovery across two availableNow runs
        # is exactly what this test exercises
        collected: dict = {}

        def sink(batch_df, _epoch):
            for r in batch_df.collect():
                collected[r["user_key"]] = r

        q = (
            stats.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return collected

    try:
        rows = run_once()
        assert rows["u1"]["n_events"] == 2
        assert rows["u1"]["total_value"] == 15.0
        assert rows["u1"]["max_value"] == 10.0
        assert rows["u2"]["n_events"] == 1

        # second batch: state for u1 carries over (12 -> count 3, max 12)
        (d / "b2.jsonl").write_text(
            _json.dumps({"user_id": "u1", "value": 12.0})
        )
        rows = run_once()
        assert rows["u1"]["n_events"] == 3
        assert rows["u1"]["total_value"] == 27.0
        assert rows["u1"]["max_value"] == 12.0
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_transform_with_state_plan_constructs(spark, tmp_path):
    """Plan construction + analysis for the StatefulProcessor operator
    needs no protobuf (that's only the execution-time driver worker), so
    the operator's schema contract is asserted even in this container."""
    from autonomous_orchestrator_ai_spark.streaming.state import (
        streaming_value_stats,
    )

    stream = spark.readStream.schema("user_id string, value double").json(
        str(tmp_path)
    )
    out = streaming_value_stats(stream, ttl_ms=3_600_000)
    assert out.isStreaming
    assert [f.name for f in out.schema] == [
        "user_key",
        "n_events",
        "total_value",
        "max_value",
    ]
