"""Debezium CDC from REAL protobuf bytes (reference S2 variant,
`mysql-debezium/register-mysql-protobuf.json`): envelopes are encoded
with the pure-Python wire-format codec, decoded through
`decode_protobuf_stream`'s Arrow-batched fallback (no spark-protobuf
jar, no protoc), flattened, and applied to a table.

Wire-format correctness is pinned against the protobuf encoding spec's
published examples (e.g. field 1 = varint 150 → `08 96 01`), so the
encoder and decoder cannot be wrong in the same self-consistent way.
"""

from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.sources.cdc import (
    apply_cdc_batch,
    decode_protobuf_stream,
)
from onehouse_demos_spark.sources.protobuf_codec import (
    decode,
    encode,
    spec_to_spark_type,
)

_ROW_SPEC = {
    "name": "Value",
    "fields": [
        {"no": 1, "name": "id", "type": "int64"},
        {"no": 2, "name": "first_name", "type": "string"},
        {"no": 3, "name": "last_name", "type": "string"},
        {"no": 4, "name": "email", "type": "string"},
    ],
}
ENVELOPE_SPEC = {
    "name": "Envelope",
    "fields": [
        {"no": 1, "name": "before", "type": "message", "spec": _ROW_SPEC},
        {"no": 2, "name": "after", "type": "message", "spec": _ROW_SPEC},
        {"no": 3, "name": "op", "type": "string"},
        {"no": 4, "name": "ts_ms", "type": "int64"},
    ],
}


def _row(i, fn, ln, em):
    return {"id": i, "first_name": fn, "last_name": ln, "email": em}


# The register-mysql walkthrough: 3 snapshot reads, 1 insert,
# 2 updates, 1 delete.
_EVENTS = [
    {"before": None, "after": _row(1001, "Sally", "Thomas", "sally.thomas@acme.com"), "op": "r", "ts_ms": 1},
    {"before": None, "after": _row(1002, "George", "Bailey", "gbailey@foobar.com"), "op": "r", "ts_ms": 2},
    {"before": None, "after": _row(1003, "Edward", "Walker", "ed@walker.com"), "op": "r", "ts_ms": 3},
    {"before": None, "after": _row(1004, "Anne", "Kretchmar", "annek@noanswer.org"), "op": "c", "ts_ms": 4},
    {"before": _row(1001, "Sally", "Thomas", "sally.thomas@acme.com"),
     "after": _row(1001, "Sally", "Thomas", "sally.t@acme.com"), "op": "u", "ts_ms": 5},
    {"before": _row(1004, "Anne", "Kretchmar", "annek@noanswer.org"),
     "after": _row(1004, "Anne Marie", "Kretchmar", "annek@noanswer.org"), "op": "u", "ts_ms": 6},
    {"before": _row(1003, "Edward", "Walker", "ed@walker.com"), "after": None, "op": "d", "ts_ms": 7},
]


def test_wire_format_matches_published_spec_examples():
    """Golden bytes from the public protobuf encoding documentation —
    pins the codec to the spec, not to itself."""
    # varint field 1 = 150 → 08 96 01
    spec = {"name": "T", "fields": [{"no": 1, "name": "a", "type": "int64"}]}
    assert encode({"a": 150}, spec) == bytes([0x08, 0x96, 0x01])
    assert decode(bytes([0x08, 0x96, 0x01]), spec) == {"a": 150}
    # string field 2 = "testing" → 12 07 74 65 73 74 69 6e 67
    sspec = {"name": "T", "fields": [{"no": 2, "name": "b", "type": "string"}]}
    golden = bytes([0x12, 0x07]) + b"testing"
    assert encode({"b": "testing"}, sspec) == golden
    assert decode(golden, sspec) == {"b": "testing"}
    # nested message field 3 containing varint field 1 = 150
    nspec = {
        "name": "O",
        "fields": [{"no": 3, "name": "c", "type": "message", "spec": spec}],
    }
    golden_nested = bytes([0x1A, 0x03, 0x08, 0x96, 0x01])
    assert encode({"c": {"a": 150}}, nspec) == golden_nested
    assert decode(golden_nested, nspec) == {"c": {"a": 150}}
    # negative int64 is a 10-byte varint
    assert decode(encode({"a": -2}, spec), spec) == {"a": -2}
    # zigzag sint64: -1 → 01
    zspec = {"name": "T", "fields": [{"no": 1, "name": "a", "type": "sint64"}]}
    assert encode({"a": -1}, zspec) == bytes([0x08, 0x01])


def test_unknown_fields_are_skipped():
    """Forward compatibility: a reader with an old spec must skip new
    producer fields by wire type."""
    wide = {
        "name": "T",
        "fields": [
            {"no": 1, "name": "a", "type": "int64"},
            {"no": 9, "name": "extra_s", "type": "string"},
            {"no": 10, "name": "extra_d", "type": "double"},
        ],
    }
    narrow = {"name": "T", "fields": [{"no": 1, "name": "a", "type": "int64"}]}
    body = encode({"a": 7, "extra_s": "xx", "extra_d": 1.5}, wide)
    assert decode(body, narrow) == {"a": 7}


def test_envelope_roundtrip_and_defaults():
    for env in _EVENTS:
        got = decode(encode(env, ENVELOPE_SPEC), ENVELOPE_SPEC)
        assert got == env
    # absent message field → None; absent scalar → proto3 default
    sparse = decode(
        encode({"op": "t"}, ENVELOPE_SPEC), ENVELOPE_SPEC
    )
    assert sparse["before"] is None and sparse["after"] is None
    assert sparse["ts_ms"] == 0 and sparse["op"] == "t"


def test_spec_to_spark_schema():
    st = spec_to_spark_type(ENVELOPE_SPEC)
    assert [f.name for f in st.fields] == ["before", "after", "op", "ts_ms"]
    assert st["after"].dataType.fieldNames() == [
        "id", "first_name", "last_name", "email",
    ]
    assert st["ts_ms"].dataType.simpleString() == "bigint"


def _frames(spark):
    return spark.createDataFrame(
        [(bytearray(encode(e, ENVELOPE_SPEC)),) for e in _EVENTS],
        "value binary",
    )


def test_decode_protobuf_stream_fallback(spark):
    env = decode_protobuf_stream(
        _frames(spark), "Envelope", message_spec=ENVELOPE_SPEC
    )
    rows = env.orderBy("ts_ms").collect()
    assert [r.op for r in rows] == ["r", "r", "r", "c", "u", "u", "d"]
    d = rows[-1]
    assert d.after is None and d.before.id == 1003


def test_cdc_protobuf_end_to_end_upsert(spark, tmp_base):
    t = LakehouseTable.create(
        spark,
        tmp_base + "/customers_pb",
        TableConfig(name="customers_pb", record_key=["id"]),
    )
    env = decode_protobuf_stream(
        _frames(spark), "Envelope", message_spec=ENVELOPE_SPEC
    )
    apply_cdc_batch(t, env)
    got = {
        r.id: (r.first_name, r.email)
        for r in t.snapshot().select("id", "first_name", "email").collect()
    }
    assert got == {
        1001: ("Sally", "sally.t@acme.com"),
        1002: ("George", "gbailey@foobar.com"),
        1004: ("Anne Marie", "annek@noanswer.org"),
    }


def test_quarantine_poison_frames(spark):
    """A malformed message must not fail the stream: quarantined rows
    carry _decode_error + NULL payload; clean rows decode normally."""
    from onehouse_demos_spark.sources.cdc import DECODE_ERROR

    good = [encode(e, ENVELOPE_SPEC) for e in _EVENTS[:3]]
    truncated = good[0][:-3]            # chopped mid-field
    bad_wire = bytes([0x07])            # wire type 7 does not exist
    frames = good + [truncated, bad_wire]
    df = spark.createDataFrame(
        [(bytearray(b),) for b in frames], "value binary"
    )
    out = decode_protobuf_stream(
        df, "Envelope", message_spec=ENVELOPE_SPEC, on_error="quarantine"
    ).collect()
    assert len(out) == 5
    bad = [r for r in out if r[DECODE_ERROR] is not None]
    ok = [r for r in out if r[DECODE_ERROR] is None]
    assert len(bad) == 2 and len(ok) == 3
    assert sorted(r.op for r in ok) == ["r", "r", "r"]
    assert all(r.after is None and r.before is None for r in bad)


def test_wire2_on_scalar_field_is_quarantined_not_poisoning(spark):
    """A non-repeated varint field delivered length-delimited (wire 2)
    is a wire/spec mismatch. It must raise in decode() — and under
    quarantine mode isolate to that record — never assign a Python
    list to a scalar field (which would blow up the whole Arrow batch
    later, defeating per-record quarantine). r2 ADVICE item."""
    import pytest

    from onehouse_demos_spark.sources.cdc import DECODE_ERROR

    # field 4 (ts_ms, int64 scalar) encoded as length-delimited:
    # tag = (4<<3)|2 = 0x22, len 2, packed varints [1, 2]
    mismatched = bytes([0x22, 0x02, 0x01, 0x02])
    with pytest.raises(ValueError, match="non-repeated scalar"):
        decode(mismatched, ENVELOPE_SPEC)
    good = encode(_EVENTS[0], ENVELOPE_SPEC)
    df = spark.createDataFrame(
        [(bytearray(good),), (bytearray(mismatched),)], "value binary"
    )
    out = decode_protobuf_stream(
        df, "Envelope", message_spec=ENVELOPE_SPEC, on_error="quarantine"
    ).collect()
    assert len(out) == 2
    bad = [r for r in out if r[DECODE_ERROR] is not None]
    assert len(bad) == 1 and "non-repeated scalar" in bad[0][DECODE_ERROR]


def test_quarantine_with_descriptor_file_only_is_a_clear_error(spark):
    """descriptor_file + quarantine without message_spec must raise the
    specific 'quarantine requires message_spec' error, not the generic
    'need a descriptor_file or a message_spec'. r2 ADVICE item."""
    import pytest

    df = spark.createDataFrame([(bytearray(b"x"),)], "value binary")
    with pytest.raises(ValueError, match="quarantine mode requires message_spec"):
        decode_protobuf_stream(
            df, "Envelope", descriptor_file="/nonexistent.desc",
            on_error="quarantine",
        )
