"""Python Data Source event generator (sources/eventgen_source.py):
envelope parity with the Kafka shape, executor-side determinism, offset
replay contract, and end-to-end streaming into the parse pipeline."""

import json
import tempfile
import time

from autonomous_orchestrator_ai_spark.operators.transform import (
    parse_kafka_messages,
)
from autonomous_orchestrator_ai_spark.sources.eventgen_source import (
    ENVELOPE_DDL,
    _EventGenStreamReader,
    register_eventgen,
)


def _load(spark, **opts):
    register_eventgen(spark)
    r = spark.read.format("eventgen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_envelope_shape_and_determinism(spark):
    df = _load(spark, rows_per_partition=40, num_partitions=3)
    assert df.schema.simpleString() == (
        "struct<key:binary,value:binary,topic:string,partition:int,"
        "offset:bigint,timestamp:timestamp,timestampType:int>"
    )
    rows = df.collect()
    assert len(rows) == 120
    assert sorted({r.partition for r in rows}) == [0, 1, 2]
    # offsets globally unique and contiguous per the shard layout
    assert sorted(r.offset for r in rows) == list(range(120))
    # same options -> byte-identical rows (retry / speculative-task safety)
    again = _load(spark, rows_per_partition=40, num_partitions=3).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # a different seed changes the data
    other = _load(
        spark, rows_per_partition=40, num_partitions=3, seed=7
    ).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))


def test_batch_values_are_reference_shaped_events(spark):
    rows = _load(spark, rows_per_partition=30, num_partitions=1).collect()
    events = [json.loads(bytes(r.value)) for r in rows]
    for e in events:
        assert e["id"].startswith("cust_")
        assert e["version"] in (1, 2, 3)
        assert isinstance(e["event_ts"], int)
    # drift knob: every-Nth event carries the v2/v3 drift fields
    drifted = _load(
        spark, rows_per_partition=30, num_partitions=1, drift_frequency=5
    ).collect()
    versions = {json.loads(bytes(r.value))["version"] for r in drifted}
    assert versions - {1}, "drift_frequency=5 over 30 events must drift"


def test_batch_feeds_parse_pipeline_unchanged(spark):
    df = _load(spark, rows_per_partition=25, num_partitions=2)
    parsed = parse_kafka_messages(df)
    got = parsed.collect()
    assert len(got) == 50
    for c in ("kafka_key", "kafka_offset", "id", "event_ts", "version"):
        assert c in parsed.columns


def test_stream_reader_offset_replay_contract():
    """readBetweenOffsets(start, end) — the checkpoint-recovery path —
    must regenerate exactly the rows read() emitted for that range."""
    rdr = _EventGenStreamReader({"rows_per_batch": "17", "seed": "42"})
    start = rdr.initialOffset()
    rows1, mid = rdr.read(start)
    rows2, end = rdr.read(mid)
    assert len(rows1) == len(rows2) == 17
    assert rdr.readBetweenOffsets(start, mid) == rows1
    assert rdr.readBetweenOffsets(mid, end) == rows2
    # offsets are contiguous across batches and never overlap
    offs = [r[4] for r in rows1 + rows2]
    assert offs == list(range(34))


def test_streaming_end_to_end_memory_sink(spark):
    register_eventgen(spark)
    stream = (
        spark.readStream.format("eventgen")
        .option("rows_per_batch", 20)
        .load()
    )
    assert stream.isStreaming
    q = (
        parse_kafka_messages(stream)
        .writeStream.format("memory")
        .queryName("evg_test")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        n = 0
        while time.time() < deadline and n < 20:
            n = spark.sql("select count(*) c from evg_test").collect()[0].c
            time.sleep(1)
    finally:
        q.stop()
    assert n >= 20
