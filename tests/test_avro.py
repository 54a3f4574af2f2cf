"""S2 wire format under test (VERDICT r2 item 6): the vendored pure-Python
Avro binary codec + the mapInPandas decode of a Kafka value column into
the customer-events shape (reference kafka/schemas/customer_events.avsc)."""

import io
import json
from datetime import datetime, timezone

import pytest

from autonomous_orchestrator_ai_spark.schemas import CUSTOMER_EVENTS_SCHEMA
from autonomous_orchestrator_ai_spark.sources.avro_codec import (
    CUSTOMER_EVENTS_AVSC,
    _decode_long,
    _encode_long,
    decode,
    encode,
    parse_schema,
)
from autonomous_orchestrator_ai_spark.sources.readers import (
    KAFKA_ENVELOPE_SCHEMA,
    decode_avro_values,
)

SCHEMA = parse_schema(CUSTOMER_EVENTS_AVSC)

EVENT_V1 = {
    "id": "c-001",
    "name": "Ada Lovelace",
    "email": "ada@example.invalid",
    "signup_ts": 1700000000000,
    "country": "GB",
    "plan": "premium",
    "event_ts": 1700000360000,
    "version": 1,
    "marketing_opt_in": None,
    "customer_segment": None,
}
EVENT_V3 = {
    **EVENT_V1,
    "id": "c-002",
    "plan": "free",
    "version": 3,
    "marketing_opt_in": True,
    "customer_segment": "smb",
}


class TestCodec:
    def test_zigzag_varint_known_values(self):
        # the Avro spec's canonical examples: 0->00, -1->01, 1->02, ...
        assert _encode_long(0) == b"\x00"
        assert _encode_long(-1) == b"\x01"
        assert _encode_long(1) == b"\x02"
        assert _encode_long(-2) == b"\x03"
        assert _encode_long(64) == b"\x80\x01"
        for n in (0, 1, -1, 63, -64, 2**31, -(2**31), 2**62, -(2**62)):
            assert _decode_long(io.BytesIO(_encode_long(n))) == n

    def test_string_encoding_is_length_prefixed_utf8(self):
        assert encode("string", "foo") == b"\x06foo"  # len 3 -> zigzag 6

    def test_enum_is_symbol_index(self):
        plan_schema = next(
            f["type"] for f in SCHEMA["fields"] if f["name"] == "plan"
        )
        assert encode(plan_schema, "free") == b"\x00"
        assert encode(plan_schema, "premium") == b"\x04"  # index 2 zigzagged
        assert decode(plan_schema, b"\x04") == "premium"

    def test_union_null_branch(self):
        u = ["null", "boolean"]
        assert encode(u, None) == b"\x00"
        assert encode(u, True) == b"\x02\x01"
        assert decode(u, b"\x00") is None
        assert decode(u, b"\x02\x01") is True

    def test_record_roundtrip(self):
        for ev in (EVENT_V1, EVENT_V3):
            assert decode(SCHEMA, encode(SCHEMA, ev)) == ev

    def test_array_and_map_roundtrip(self):
        arr = {"type": "array", "items": "long"}
        assert decode(arr, encode(arr, [1, -2, 3])) == [1, -2, 3]
        assert decode(arr, encode(arr, [])) == []
        mp = {"type": "map", "values": "double"}
        assert decode(mp, encode(mp, {"a": 1.5, "b": -2.0})) == {
            "a": 1.5,
            "b": -2.0,
        }

    def test_truncated_input_raises(self):
        with pytest.raises(EOFError):
            decode(SCHEMA, encode(SCHEMA, EVENT_V1)[:5])


class TestSparkDecode:
    def _envelope(self, spark, events):
        rows = [
            (
                ev["id"].encode(),
                encode(SCHEMA, ev),
                "customer-events",
                0,
                i,
                datetime(2026, 8, 13, tzinfo=timezone.utc),
                0,
            )
            for i, ev in enumerate(events)
        ]
        return spark.createDataFrame(rows, KAFKA_ENVELOPE_SCHEMA)

    def test_decode_matches_customer_events_schema(self, spark):
        df = self._envelope(spark, [EVENT_V1, EVENT_V3])
        out = decode_avro_values(df, CUSTOMER_EVENTS_AVSC)
        # every CUSTOMER_EVENTS_SCHEMA field arrives with its declared type
        out_types = dict(out.dtypes)
        for f in CUSTOMER_EVENTS_SCHEMA.fields:
            assert out_types[f.name] == f.dataType.simpleString(), f.name
        rows = {r.id: r for r in out.collect()}
        r1, r3 = rows["c-001"], rows["c-002"]
        assert r1.email == "ada@example.invalid"
        assert r1.signup_ts == 1700000000000 and r1.plan == "premium"
        assert r1.marketing_opt_in is None and r1.customer_segment is None
        assert r3.version == 3 and r3.marketing_opt_in is True
        assert r3.customer_segment == "smb"
        # kafka envelope columns survive alongside the payload
        assert r1.kafka_key == "c-001" and r1.kafka_partition == 0

    def test_decoded_stream_feeds_the_transform_layer(self, spark):
        """The decoded frame is drop-in for the JSON route: the standard
        millis->timestamp conversion applies unchanged."""
        from pyspark.sql import functions as F

        from autonomous_orchestrator_ai_spark.functions.temporal import (
            millis_to_timestamp,
        )

        out = decode_avro_values(
            self._envelope(spark, [EVENT_V1]), CUSTOMER_EVENTS_AVSC
        )
        ts = out.select(
            millis_to_timestamp(F.col("event_ts")).alias("event_time")
        ).collect()[0]
        assert ts.event_time == datetime(2023, 11, 14, 22, 19, 20)
