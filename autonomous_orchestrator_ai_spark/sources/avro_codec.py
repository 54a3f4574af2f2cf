"""Pure-Python Avro binary codec — the no-jar fallback for S2's real wire
format (reference kafka/schemas/customer_events.avsc; the reference ships
spark-avro in airflow/include/config.yml:12 but itself parses the topic as
JSON, ingest_transform.py:117-118).

Implements the subset of the public Apache Avro 1.x binary spec the event
schema needs — record, string, bytes, int/long (zigzag varint), boolean,
null, float, double, enum, union, array, map — as both decoder and encoder
(the encoder exists so tests can round-trip real wire bytes without any
external producer). Production Spark clusters should prefer
``readers.parse_avro_value`` (JVM spark-avro, codegen); this codec backs
``readers.decode_avro_values``, an Arrow-batched ``mapInPandas`` fallback
whose per-record Python cost is explicitly the price of jar-lessness.

Schema resolution/evolution (reader-vs-writer schema matching) is NOT
implemented — records must be read with the schema they were written with;
drifted fields arrive via the union-with-null defaults exactly as the
reference's v2/v3 producer emits them.
"""

from __future__ import annotations

import io
import json
import struct


# ---------------------------------------------------------------------------
# primitive wire encoding (Avro spec: zigzag varint longs, length-prefixed
# bytes, little-endian IEEE floats)
# ---------------------------------------------------------------------------


def _encode_long(n: int) -> bytes:
    # zigzag then base-128 varint, LSB first
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _decode_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


# ---------------------------------------------------------------------------
# schema-driven encode/decode
# ---------------------------------------------------------------------------


def _type_of(schema):
    """Normalize a schema node to its type tag."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def encode(schema, value, out: bytearray | None = None) -> bytes:
    """Encode ``value`` per ``schema`` (parsed JSON) to Avro binary."""
    if out is None:
        out = bytearray()
    t = _type_of(schema)
    if t == "null":
        pass
    elif t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        out += _encode_long(int(value))
    elif t == "float":
        out += struct.pack("<f", float(value))
    elif t == "double":
        out += struct.pack("<d", float(value))
    elif t == "bytes":
        out += _encode_long(len(value)) + bytes(value)
    elif t == "string":
        raw = value.encode("utf-8")
        out += _encode_long(len(raw)) + raw
    elif t == "enum":
        out += _encode_long(schema["symbols"].index(value))
    elif t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        idx = _union_branch(branches, value)
        out += _encode_long(idx)
        encode(branches[idx], value, out)
    elif t == "record":
        for f in schema["fields"]:
            encode(f["type"], value[f["name"]], out)
    elif t == "array":
        if value:
            out += _encode_long(len(value))
            for item in value:
                encode(schema["items"], item, out)
        out += _encode_long(0)
    elif t == "map":
        if value:
            out += _encode_long(len(value))
            for k, v in value.items():
                encode("string", k, out)
                encode(schema["values"], v, out)
        out += _encode_long(0)
    else:
        raise NotImplementedError(f"avro type {t!r}")
    return bytes(out)


def _union_branch(branches, value) -> int:
    for i, b in enumerate(branches):
        bt = _type_of(b)
        if value is None and bt == "null":
            return i
        if value is not None and bt != "null":
            return i
    raise ValueError(f"no union branch for {value!r} in {branches!r}")


def decode(schema, data: bytes | io.BytesIO):
    """Decode Avro binary ``data`` per ``schema`` (parsed JSON)."""
    buf = data if isinstance(data, io.BytesIO) else io.BytesIO(data)
    t = _type_of(schema)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1)[0] != 0
    if t in ("int", "long"):
        return _decode_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return buf.read(_decode_long(buf))
    if t == "string":
        return buf.read(_decode_long(buf)).decode("utf-8")
    if t == "enum":
        return schema["symbols"][_decode_long(buf)]
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        return decode(branches[_decode_long(buf)], buf)
    if t == "record":
        return {f["name"]: decode(f["type"], buf) for f in schema["fields"]}
    if t == "array":
        return list(_decode_blocks(schema["items"], buf))
    if t == "map":
        out = {}
        while True:
            n = _decode_long(buf)
            if n == 0:
                return out
            if n < 0:  # negative count: block byte-size follows (skippable)
                n = -n
                _decode_long(buf)
            for _ in range(n):
                k = decode("string", buf)
                out[k] = decode(schema["values"], buf)
    raise NotImplementedError(f"avro type {t!r}")


def _decode_blocks(item_schema, buf):
    while True:
        n = _decode_long(buf)
        if n == 0:
            return
        if n < 0:
            n = -n
            _decode_long(buf)
        for _ in range(n):
            yield decode(item_schema, buf)


def parse_schema(avro_schema_json: str) -> dict:
    return json.loads(avro_schema_json)


#: the reference's customer-event wire schema
#: (kafka/schemas/customer_events.avsc), restated: string id/name/email/
#: country, timestamp-millis longs, an enum plan, int version with default,
#: and the two union-with-null drift fields from v2/v3.
CUSTOMER_EVENTS_AVSC = json.dumps(
    {
        "type": "record",
        "name": "CustomerEvent",
        "fields": [
            {"name": "id", "type": "string"},
            {"name": "name", "type": "string"},
            {"name": "email", "type": "string"},
            {
                "name": "signup_ts",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
            {"name": "country", "type": "string"},
            {
                "name": "plan",
                "type": {
                    "type": "enum",
                    "name": "SubscriptionPlan",
                    "symbols": ["free", "basic", "premium", "enterprise"],
                },
            },
            {
                "name": "event_ts",
                "type": {"type": "long", "logicalType": "timestamp-millis"},
            },
            {"name": "version", "type": "int", "default": 1},
            {
                "name": "marketing_opt_in",
                "type": ["null", "boolean"],
                "default": None,
            },
            {
                "name": "customer_segment",
                "type": ["null", "string"],
                "default": None,
            },
        ],
    }
)
