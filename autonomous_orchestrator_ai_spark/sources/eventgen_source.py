"""A first-class pluggable EVENT SOURCE via the PySpark 4 Python Data
Source API (pyspark.sql.datasource): ``spark.read.format("eventgen")`` /
``spark.readStream.format("eventgen")`` produce the seeded customer-event
stream in the EXACT Kafka envelope shape (binary key/value + topic /
partition / offset / timestamp / timestampType), so the whole ingest
pipeline — parse_kafka_messages, DQ flags, quarantine, windowed aggs —
runs against it unchanged and swaps to ``format("kafka")`` in production
with no other edits. This upgrades the reference's producer-script role
(produce_events.py — a process that feeds a broker) into an engine-native
source: no broker, no files, no driver-side materialization.

Scale design: the batch reader emits one InputPartition per generator
shard — rows are generated ON THE EXECUTORS (a 1B-row backfill is 1000
partitions × 1M rows each, never driver memory); everything is
deterministic given (seed, partition, rows_per_partition), so retries and
speculative tasks reproduce byte-identical splits. The streaming reader
derives each microbatch from its OFFSET RANGE alone (seed + row counter),
so checkpoint replay after failure regenerates exactly the rows the lost
batch contained — the same replay contract a Kafka offset range gives.

The anomaly knobs mirror the reference producer's G1-G4
(testing/generator.py cites produce_events.py line-by-line): late_rate,
missing_rate, drift_frequency, n_customers, seed — all exposed as reader
options; ``now_ms`` pins "now" (the repo-wide injectable-now rule) so
runs are reproducible end to end.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

#: Kafka envelope — identical to readers.jsonl_as_kafka_envelope and to
#: what format("kafka") yields, so downstream plans are source-agnostic
ENVELOPE_DDL = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)

#: fixed injectable default for "now" (2026-01-01T00:00:00Z) — a moving
#: default would make two reads of the same options differ
DEFAULT_NOW_MS = 1_767_225_600_000


def _opts(options) -> dict:
    return {
        "seed": int(options.get("seed", 42)),
        "rows_per_partition": int(options.get("rows_per_partition", 1000)),
        "num_partitions": int(options.get("num_partitions", 4)),
        "rows_per_batch": int(options.get("rows_per_batch", 100)),
        "topic": options.get("topic", "customer-events"),
        "n_customers": int(options.get("n_customers", 1000)),
        "late_rate": float(options.get("late_rate", 0.05)),
        "missing_rate": float(options.get("missing_rate", 0.02)),
        "drift_frequency": int(options.get("drift_frequency", 100)),
        "now_ms": int(options.get("now_ms", DEFAULT_NOW_MS)),
    }


def _gen_rows(o: dict, shard_seed: int, n: int, base_offset: int, part: int):
    """n envelope tuples from a generator seeded by ``shard_seed`` —
    executor-side, deterministic, independent of every other shard."""
    from autonomous_orchestrator_ai_spark.testing.generator import (
        EventGenerator,
    )

    now = datetime.fromtimestamp(o["now_ms"] / 1000.0, tz=timezone.utc)
    gen = EventGenerator(
        seed=shard_seed,
        n_customers=o["n_customers"],
        late_rate=o["late_rate"],
        missing_rate=o["missing_rate"],
        drift_frequency=o["drift_frequency"],
        now=now,
    )
    for i, event in enumerate(gen.events(n)):
        value = json.dumps(event).encode("utf-8")
        ts = datetime.fromtimestamp(
            event["event_ts"] / 1000.0, tz=timezone.utc
        )
        yield (
            event["id"].encode("utf-8"),
            value,
            o["topic"],
            part,
            base_offset + i,
            ts,
            0,
        )


class _EventGenPartition(InputPartition):
    def __init__(self, index: int):
        self.index = index


class _EventGenBatchReader(DataSourceReader):
    def __init__(self, options):
        self.o = _opts(options)

    def partitions(self):
        return [
            _EventGenPartition(i) for i in range(self.o["num_partitions"])
        ]

    def read(self, partition: _EventGenPartition) -> Iterator[tuple]:
        o = self.o
        n = o["rows_per_partition"]
        # per-shard seed: shard i is the same rows no matter how many
        # shards run, where they run, or whether a retry re-runs them
        yield from _gen_rows(
            o, o["seed"] + 7919 * partition.index, n,
            partition.index * n, partition.index,
        )


class _EventGenStreamReader(SimpleDataSourceStreamReader):
    """Offset = total rows emitted so far. read(start) emits the NEXT
    rows_per_batch rows; readBetweenOffsets(start, end) — the
    checkpoint-replay path — regenerates exactly rows [start, end) from
    the seed, the same determinism-under-replay a Kafka offset range
    provides."""

    def __init__(self, options):
        self.o = _opts(options)

    def initialOffset(self) -> dict:
        return {"counter": 0}

    def _rows(self, start: int, end: int):
        o = self.o
        # one generator shard per microbatch span: seed derives from the
        # START offset, so any reader asking for [start, end) gets the
        # same rows (partition id 0 — a single logical stream)
        yield from _gen_rows(
            o, o["seed"] + 7919 * start, end - start, start, 0
        )

    def read(self, start: dict):
        s = start["counter"]
        e = s + self.o["rows_per_batch"]
        return list(self._rows(s, e)), {"counter": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self._rows(start["counter"], end["counter"]))


class EventGenDataSource(DataSource):
    """``format("eventgen")`` — see module docstring. Options: seed,
    num_partitions, rows_per_partition (batch), rows_per_batch
    (streaming), topic, n_customers, late_rate, missing_rate,
    drift_frequency, now_ms."""

    @classmethod
    def name(cls) -> str:
        return "eventgen"

    def schema(self) -> str:
        # a DDL string, not StructType.fromDDL: schema() runs in the data
        # source worker where no SparkContext exists to parse DDL
        return ENVELOPE_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _EventGenBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _EventGenStreamReader(self.options)


def register_eventgen(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("eventgen")`` works in this session."""
    spark.dataSource.register(EventGenDataSource)
