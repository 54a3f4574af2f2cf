"""Pure-Python Avro binary codec — the no-jar fallback for S2's real wire
format (reference kafka/schemas/customer_events.avsc; the reference ships
spark-avro in airflow/include/config.yml:12 but itself parses the topic as
JSON, ingest_transform.py:117-118).

Implements the public Apache Avro 1.x binary spec's core types — record,
string, bytes, fixed, int/long (zigzag varint), boolean, null, float,
double, enum, arbitrary unions (not just ["null", T] — branch choice is
type-directed on encode, branch-index-driven on decode), array, map,
nested to any depth — as both decoder and encoder
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
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise ValueError(
                f"fixed {schema.get('name')} wants {schema['size']} bytes, "
                f"got {len(value)}"
            )
        out += bytes(value)
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


def _matches(schema, value) -> bool:
    """Does a Python value structurally fit an Avro schema node? Drives
    multi-branch union encoding; for ambiguous dict values (record vs map
    branches in one union) branch ORDER decides — put the more specific
    branch first, as the Avro spec's own resolution does."""
    t = _type_of(schema)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t == "double":
        return isinstance(value, float)
    if t == "float":
        # only values that survive a float32 round-trip match the 32-bit
        # branch — in a [float, double] union, 16777217.0 must take the
        # double branch or the encode loses precision (hypothesis-found)
        if not isinstance(value, float):
            return False
        if value != value:  # NaN round-trips by definition
            return True
        try:
            return struct.unpack("<f", struct.pack("<f", value))[0] == value
        except OverflowError:  # beyond float32 range
            return False
    if t == "bytes":
        return isinstance(value, (bytes, bytearray))
    if t == "fixed":
        return isinstance(value, (bytes, bytearray)) and len(value) == schema["size"]
    if t == "string":
        return isinstance(value, str)
    if t == "enum":
        return isinstance(value, str) and value in schema["symbols"]
    if t == "record":
        return isinstance(value, dict) and set(value) == {
            f["name"] for f in schema["fields"]
        }
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    return False


def _union_branch(branches, value) -> int:
    """Type-directed branch choice for arbitrary unions (not just
    ["null", T]): first exact structural match in branch order, then the
    numeric promotions the spec allows (int -> float/double, bytes <->
    string is NOT one)."""
    for i, b in enumerate(branches):
        if _matches(b, value):
            return i
    if isinstance(value, int) and not isinstance(value, bool):
        # promote int -> double first (exact for |v| < 2^53), then float
        for want in ("double", "float"):
            for i, b in enumerate(branches):
                if _type_of(b) == want:
                    return i
    raise ValueError(f"no union branch for {value!r} in {branches!r}")


def _is_simple_union(branches) -> bool:
    """Unions that collapse to ONE Spark-side type (so decode need not
    mark which branch was taken): at most one non-null branch, or numeric
    branches that merge ([int,long] -> long, [float,double] -> double —
    spark-avro's public mapping)."""
    non_null = [b for b in branches if _type_of(b) != "null"]
    if len(non_null) <= 1:
        return True
    tags = {_type_of(b) for b in non_null}
    return tags <= {"int", "long"} or tags <= {"float", "double"}


def decode(schema, data: bytes | io.BytesIO, mark_unions: bool = False):
    """Decode Avro binary ``data`` per ``schema`` (parsed JSON).

    ``mark_unions=True`` wraps values of NON-simple unions (more than one
    Spark-side branch type, see ``_is_simple_union``) as
    ``(branch_index, value)`` so a schema-driven consumer (e.g.
    ``readers.decode_avro_values``'s member-struct mapping) knows which
    branch the writer took — re-inferring it from the Python value alone
    is ambiguous (e.g. string vs enum branches both decode to ``str``).
    Simple unions stay unwrapped either way.
    """
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
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        idx = _decode_long(buf)
        val = decode(branches[idx], buf, mark_unions)
        # the null branch is never marked — None is unambiguous
        if mark_unions and val is not None and not _is_simple_union(branches):
            return (idx, val)
        return val
    if t == "record":
        return {
            f["name"]: decode(f["type"], buf, mark_unions)
            for f in schema["fields"]
        }
    if t == "array":
        return list(_decode_blocks(schema["items"], buf, mark_unions))
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
                out[k] = decode(schema["values"], buf, mark_unions)
    raise NotImplementedError(f"avro type {t!r}")


def _decode_blocks(item_schema, buf, mark_unions: bool = False):
    while True:
        n = _decode_long(buf)
        if n == 0:
            return
        if n < 0:
            n = -n
            _decode_long(buf)
        for _ in range(n):
            yield decode(item_schema, buf, mark_unions)


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
