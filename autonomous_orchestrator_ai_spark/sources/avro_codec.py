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

Schema resolution/evolution (reader-vs-writer schema matching) is
implemented in ``decode_resolved`` per the public spec's resolution rules:
field match by name, writer-only fields skipped, reader defaults applied,
primitive promotions, enum defaults, union re-branching. Aliases are the
one spec feature not supported (no-match raises).
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


# ---------------------------------------------------------------------------
# schema resolution (reader vs writer schema — Avro spec "Schema Resolution")
# ---------------------------------------------------------------------------

#: (writer, reader) primitive promotions the spec allows
_PROMOTIONS = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"), ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}


def _simple_name(schema) -> str:
    return schema.get("name", "").rsplit(".", 1)[-1]


def _compatible(w, r) -> bool:
    """Can data written with ``w`` be read as ``r`` (spec match rules:
    same type, allowed promotion, or — for named types — same unqualified
    name; fixed also requires equal size)? Aliases are not supported."""
    tw, tr = _type_of(w), _type_of(r)
    if tr == "union":
        branches = r if isinstance(r, list) else r["type"]
        return any(_compatible(w, b) for b in branches)
    if tw == "union":
        branches = w if isinstance(w, list) else w["type"]
        return all(_compatible(b, r) for b in branches)
    if tw == tr:
        if tw == "fixed":
            return w["size"] == r["size"] and _simple_name(w) == _simple_name(r)
        if tw in ("record", "enum"):
            return _simple_name(w) == _simple_name(r)
        return True
    return (tw, tr) in _PROMOTIONS


def _promote(value, tr: str):
    if tr in ("float", "double"):
        return float(value)
    if tr == "long":
        return int(value)
    if tr == "bytes" and isinstance(value, str):
        return value.encode("utf-8")
    if tr == "string" and isinstance(value, (bytes, bytearray)):
        return bytes(value).decode("utf-8")
    return value


def default_value(schema, default, mark_unions: bool = False):
    """A reader field's JSON default -> runtime value per the spec:
    ``bytes``/``fixed`` defaults are strings of codepoints 0-255; a union
    field's default corresponds to the FIRST branch."""
    t = _type_of(schema)
    if t == "union":
        branches = schema if isinstance(schema, list) else schema["type"]
        val = default_value(branches[0], default)
        if mark_unions and val is not None and not _is_simple_union(branches):
            return (0, val)
        return val
    if t in ("bytes", "fixed") and isinstance(default, str):
        return default.encode("latin-1")
    if t in ("float", "double") and isinstance(default, (int, float)):
        return float(default)
    if t == "record":
        return {
            f["name"]: default_value(
                f["type"], default.get(f["name"], f.get("default"))
            )
            for f in schema["fields"]
        }
    if t == "array":
        return [default_value(schema["items"], v) for v in default]
    if t == "map":
        return {k: default_value(schema["values"], v) for k, v in default.items()}
    return default


def decode_resolved(
    writer_schema,
    reader_schema,
    data: bytes | io.BytesIO,
    mark_unions: bool = False,
):
    """Decode bytes written with ``writer_schema`` into the shape of
    ``reader_schema`` — the spec's schema-resolution walk, which is what
    makes the reference's v2/v3 producer evolution readable by old and
    new consumers alike: writer-only fields are skipped, reader-only
    fields take their defaults (error if none), fields match by name not
    position, primitives promote (int->long/float/double, long->float/
    double, float->double, string<->bytes), enum symbols fall back to the
    reader's ``default``, and union branches resolve writer-branch ->
    first compatible reader branch. With ``mark_unions=True``, non-simple
    READER unions wrap as (reader_branch_index, value) — the same
    contract as ``decode`` — so ``readers._avro_to_spark_value`` shapes
    resolved values with the reader schema. Aliases are not supported
    (raise via no-match)."""
    buf = data if isinstance(data, io.BytesIO) else io.BytesIO(data)
    return _resolve_decode(writer_schema, reader_schema, buf, mark_unions)


def _resolve_decode(w, r, buf: io.BytesIO, mark: bool):
    tw = _type_of(w)
    if tw == "union":
        branches = w if isinstance(w, list) else w["type"]
        return _resolve_decode(branches[_decode_long(buf)], r, buf, mark)
    tr = _type_of(r)
    if tr == "union":
        rbranches = r if isinstance(r, list) else r["type"]
        # like the Apache resolver's best-branch rule: an exact-type
        # branch wins over a promotable one ("" must resolve to a string
        # branch, not promote to an earlier bytes branch)
        pick = next(
            (
                i
                for i, rb in enumerate(rbranches)
                if _type_of(rb) == tw and _compatible(w, rb)
            ),
            None,
        )
        if pick is None:
            pick = next(
                (i for i, rb in enumerate(rbranches) if _compatible(w, rb)),
                None,
            )
        if pick is None:
            raise ValueError(
                f"writer schema {w!r} matches no reader union branch {rbranches!r}"
            )
        val = _resolve_decode(w, rbranches[pick], buf, mark)
        if mark and val is not None and not _is_simple_union(rbranches):
            return (pick, val)
        return val
    if not _compatible(w, r):
        raise ValueError(f"incompatible schemas: writer {w!r} vs reader {r!r}")
    if tw != tr:  # primitive promotion
        return _promote(decode(w, buf), tr)
    if tw == "enum":
        sym = w["symbols"][_decode_long(buf)]
        if sym in r["symbols"]:
            return sym
        if "default" in r:
            return r["default"]
        raise ValueError(
            f"enum symbol {sym!r} absent from reader symbols {r['symbols']!r}"
        )
    if tw == "record":
        rfields = {f["name"]: f for f in r["fields"]}
        out = {}
        for f in w["fields"]:
            if f["name"] in rfields:
                out[f["name"]] = _resolve_decode(
                    f["type"], rfields[f["name"]]["type"], buf, mark
                )
            else:
                decode(f["type"], buf)  # writer-only field: skip wire bytes
        for f in r["fields"]:
            if f["name"] not in out:
                if "default" in f:
                    out[f["name"]] = default_value(f["type"], f["default"], mark)
                else:
                    raise ValueError(
                        f"reader field {f['name']!r} not written and has no default"
                    )
        return out
    if tw == "array":
        out_l = []
        while True:
            n = _decode_long(buf)
            if n == 0:
                return out_l
            if n < 0:
                n = -n
                _decode_long(buf)
            for _ in range(n):
                out_l.append(_resolve_decode(w["items"], r["items"], buf, mark))
    if tw == "map":
        out_m = {}
        while True:
            n = _decode_long(buf)
            if n == 0:
                return out_m
            if n < 0:
                n = -n
                _decode_long(buf)
            for _ in range(n):
                k = decode("string", buf)
                out_m[k] = _resolve_decode(w["values"], r["values"], buf, mark)
    # identical primitive / fixed — plain decode
    return decode(w, buf, mark)


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
