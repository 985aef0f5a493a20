"""Minimal pure-Python Avro BINARY codec + Avro→Spark schema mapping.

Why this exists: the reference's CDC path ships Debezium envelopes as
Confluent-framed Avro (`mysql-debezium/register-mysql-avro.json:20-24`
AvroConverter + Schema Registry). Spark's JVM `from_avro` lives in the
external spark-avro package; when that jar is absent (as in this
sandbox) we still want REAL Avro-byte decoding — so this module
implements the Avro 1.11 binary encoding spec for the subset Debezium
envelopes use (records, unions, named-type refs, primitives, arrays,
maps, enums) and `sources.cdc.decode_avro_stream` runs it inside an
Arrow-batched `mapInPandas` (never row-at-a-time Python UDFs).

Encoding rules implemented (Avro spec "Binary encoding"):
- int/long: zigzag varint
- string/bytes: varint length + utf8/raw bytes
- float/double: 4/8-byte IEEE little-endian
- boolean: 1 byte; null: zero bytes
- record: fields in declared order
- union: varint branch index + value
- enum: varint symbol index
- array/map: blocked — varint count, items, 0 terminator

The Confluent wire format (magic 0x00 + 4-byte big-endian schema id +
Avro body) is handled by `strip_confluent_header`.
"""

from __future__ import annotations

import json
import struct
from typing import Any

from pyspark.sql import types as T

# ---------------------------------------------------------------- varints


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: bytearray, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7


# ---------------------------------------------------------------- schemas


class AvroSchema:
    """Parsed Avro schema with a named-type registry (so `"Value"`
    references inside unions resolve, as Debezium envelopes use)."""

    def __init__(self, schema_json: str | dict):
        self.named: dict[str, Any] = {}
        raw = (
            json.loads(schema_json) if isinstance(schema_json, str) else schema_json
        )
        self.root = self._index(raw)

    def _index(self, s: Any) -> Any:
        if isinstance(s, dict):
            t = s.get("type")
            if t in ("record", "enum", "fixed"):
                name = s["name"]
                ns = s.get("namespace")
                self.named[name] = s
                if ns:
                    self.named[f"{ns}.{name}"] = s
                if t == "record":
                    for f in s["fields"]:
                        f["type"] = self._index(f["type"])
                return s
            if t == "array":
                s["items"] = self._index(s["items"])
                return s
            if t == "map":
                s["values"] = self._index(s["values"])
                return s
            return s
        if isinstance(s, list):
            return [self._index(x) for x in s]
        return s

    def resolve(self, s: Any) -> Any:
        if isinstance(s, str) and s in self.named:
            return self.named[s]
        if isinstance(s, dict) and isinstance(s.get("type"), str) \
                and s["type"] in self.named:
            return self.named[s["type"]]
        return s


def _type_name(s: Any) -> str:
    if isinstance(s, str):
        return s
    if isinstance(s, list):
        return "union"
    return s["type"]


# ---------------------------------------------------------------- encode


class Tagged:
    """Explicit union-branch selection for encode: wraps a value with
    the NAME of the union branch it must take (r11 — needed for
    unions of several record types, e.g. HoodieMetadataColumnStats'
    minValue union of IntWrapper/LongWrapper/..., where the value
    alone cannot disambiguate int-width branches)."""

    __slots__ = ("branch", "value")

    def __init__(self, branch: str, value: Any):
        self.branch = branch
        self.value = value


def encode(value: Any, schema: AvroSchema, s: Any = None) -> bytes:
    out = bytearray()
    _enc(out, value, schema, schema.root if s is None else s)
    return bytes(out)


def _enc(out: bytearray, v: Any, sc: AvroSchema, s: Any) -> None:
    s = sc.resolve(s)
    if isinstance(s, list):  # union: pick first matching branch
        if isinstance(v, Tagged):
            for idx, branch in enumerate(s):
                rb = sc.resolve(branch)
                if isinstance(rb, dict) and rb.get("name") == v.branch:
                    _write_long(out, idx)
                    _enc(out, v.value, sc, branch)
                    return
            raise ValueError(
                f"no union branch named {v.branch!r} in {s}"
            )
        for idx, branch in enumerate(s):
            if _matches(v, sc, sc.resolve(branch)):
                _write_long(out, idx)
                _enc(out, v, sc, branch)
                return
        raise ValueError(f"no union branch for {v!r} in {s}")
    t = _type_name(s)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        _write_long(out, int(v))
    elif t == "float":
        out.extend(struct.pack("<f", float(v)))
    elif t == "double":
        out.extend(struct.pack("<d", float(v)))
    elif t == "string":
        raw = str(v).encode("utf-8")
        _write_long(out, len(raw))
        out.extend(raw)
    elif t == "bytes":
        _write_long(out, len(v))
        out.extend(v)
    elif t == "enum":
        _write_long(out, s["symbols"].index(v))
    elif t == "record":
        for f in s["fields"]:
            _enc(out, v.get(f["name"]), sc, f["type"])
    elif t == "array":
        if v:
            _write_long(out, len(v))
            for item in v:
                _enc(out, item, sc, s["items"])
        _write_long(out, 0)
    elif t == "map":
        if v:
            _write_long(out, len(v))
            for k, item in v.items():
                _enc(out, k, sc, "string")
                _enc(out, item, sc, s["values"])
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type: {t}")


def _matches(v: Any, sc: AvroSchema, s: Any) -> bool:
    if isinstance(s, list):  # nested union (record-field structural match)
        return any(_matches(v, sc, sc.resolve(b)) for b in s)
    t = _type_name(s)
    if t == "null":
        return v is None
    if v is None:
        return False
    if t == "record":
        # structural match (r11): with several record branches in one
        # union, "any dict" would always take the first branch — check
        # each field's value against its schema instead
        if not isinstance(v, dict):
            return False
        return all(
            _matches(v.get(f["name"]), sc, sc.resolve(f["type"]))
            or isinstance(v.get(f["name"]), Tagged)
            for f in s["fields"]
        )
    if t in ("int", "long"):
        return isinstance(v, int) and not isinstance(v, bool)
    if t in ("float", "double"):
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t in ("string", "enum"):
        return isinstance(v, str)
    if t == "boolean":
        return isinstance(v, bool)
    if t == "bytes":
        return isinstance(v, (bytes, bytearray))
    if t == "array":
        return isinstance(v, list)
    if t == "map":
        return isinstance(v, dict)
    return False


# ---------------------------------------------------------------- decode


def decode(buf: bytes, schema: AvroSchema, s: Any = None) -> Any:
    v, _ = _dec(buf, 0, schema, schema.root if s is None else s)
    return v


def _dec(buf: bytes, pos: int, sc: AvroSchema, s: Any) -> tuple[Any, int]:
    s = sc.resolve(s)
    if isinstance(s, list):
        idx, pos = _read_long(buf, pos)
        return _dec(buf, pos, sc, s[idx])
    t = _type_name(s)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        n, pos = _read_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == "bytes":
        n, pos = _read_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if t == "enum":
        idx, pos = _read_long(buf, pos)
        return s["symbols"][idx], pos
    if t == "record":
        rec = {}
        for f in s["fields"]:
            rec[f["name"]], pos = _dec(buf, pos, sc, f["type"])
        return rec, pos
    if t == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                item, pos = _dec(buf, pos, sc, s["items"])
                out.append(item)
    if t == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                _, pos = _read_long(buf, pos)
                n = -n
            for _ in range(n):
                k, pos = _dec(buf, pos, sc, "string")
                out[k], pos = _dec(buf, pos, sc, s["values"])
    raise ValueError(f"unsupported avro type: {t}")


# ------------------------------------------------------- confluent frame


def confluent_frame(body: bytes, schema_id: int = 1) -> bytes:
    """Wrap an Avro body in the Confluent wire format the reference's
    Schema Registry converters produce."""
    return b"\x00" + struct.pack(">I", schema_id) + body


def strip_confluent_header(raw: bytes) -> bytes:
    if len(raw) >= 5 and raw[0] == 0:
        return raw[5:]
    return raw


# ------------------------------------------------- avro -> spark schema


def avro_to_spark_type(s: Any, sc: AvroSchema | None = None) -> T.DataType:
    """Avro schema → Spark DataType (SURVEY §1.2 mapping table)."""
    if sc is None and isinstance(s, (str, dict)) and not isinstance(s, T.DataType):
        sc = AvroSchema(s) if not isinstance(s, AvroSchema) else s
        return avro_to_spark_type(sc.root, sc)
    s = sc.resolve(s)
    if isinstance(s, list):
        branches = [b for b in s if _type_name(sc.resolve(b)) != "null"]
        if len(branches) != 1:
            raise ValueError(f"only [null, T] unions map to Spark: {s}")
        return avro_to_spark_type(branches[0], sc)
    t = _type_name(s)
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "bytes": T.BinaryType(),
        "enum": T.StringType(),
    }
    if t in prim:
        return prim[t]
    if t == "record":
        return T.StructType(
            [
                T.StructField(
                    f["name"], avro_to_spark_type(f["type"], sc), nullable=True
                )
                for f in s["fields"]
            ]
        )
    if t == "array":
        return T.ArrayType(avro_to_spark_type(s["items"], sc))
    if t == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(s["values"], sc))
    raise ValueError(f"unsupported avro type: {t}")


# ------------------------------------------------- object container files

_OCF_MAGIC = b"Obj\x01"
_OCF_META_SCHEMA = '{"type": "map", "values": "bytes"}'


def write_ocf(
    records: list, schema_json: str | dict, extra_meta: dict | None = None
) -> bytes:
    """Serialize records as an Avro Object Container File (spec
    "Object Container Files": magic, file-metadata map incl.
    avro.schema, 16-byte sync marker, blocked records). Null codec.
    Needed because Iceberg's manifest-list / manifest files ARE Avro
    OCF — the table-format side of the engine reuses the same codec
    the CDC path pinned against the published encoding spec."""
    import os as _os

    if isinstance(schema_json, dict):
        schema_json = json.dumps(schema_json)
    schema = AvroSchema(schema_json)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": b"null"}
    for k, v in (extra_meta or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    sync = _os.urandom(16)
    out = bytearray()
    out += _OCF_MAGIC
    meta_schema = AvroSchema(_OCF_META_SCHEMA)
    _enc(out, meta, meta_schema, meta_schema.root)
    out += sync
    if records:
        body = bytearray()
        for rec in records:
            body += encode(rec, schema)
        _write_long(out, len(records))
        _write_long(out, len(body))
        out += body
        out += sync
    return bytes(out)


def read_ocf(buf: bytes) -> tuple[dict, list]:
    """Parse an Avro OCF → (file-metadata dict[str, bytes], records).
    Supports the null codec (what write_ocf emits)."""
    if buf[:4] != _OCF_MAGIC:
        raise ValueError("not an Avro object container file")
    meta_schema = AvroSchema(_OCF_META_SCHEMA)
    meta, pos = _dec(buf, 4, meta_schema, meta_schema.root)
    codec = (meta.get("avro.codec") or b"null").decode()
    if codec != "null":
        raise ValueError(f"unsupported OCF codec {codec!r}")
    schema = AvroSchema(meta["avro.schema"].decode())
    sync = buf[pos : pos + 16]
    pos += 16
    records: list = []
    while pos < len(buf):
        count, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        end = pos + size
        for _ in range(count):
            rec, pos = _dec(buf, pos, schema, schema.root)
            records.append(rec)
        if pos != end:
            raise ValueError("OCF block size mismatch")
        if buf[pos : pos + 16] != sync:
            raise ValueError("OCF sync marker mismatch")
        pos += 16
    return meta, records
