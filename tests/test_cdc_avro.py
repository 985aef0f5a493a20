"""Debezium CDC from REAL Avro bytes (reference S2/EP3,
`mysql-debezium/register-mysql-avro.json`): a recorded fixture of
Confluent-framed Avro envelopes is decoded (pure-Python binary codec
inside Arrow-batched mapInPandas when the spark-avro jar is absent),
flattened, and applied to a table — no synthetic-struct shortcut.
"""

import base64
import json
import os

from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.sources.avro_codec import (
    AvroSchema,
    avro_to_spark_type,
    confluent_frame,
    decode,
    encode,
    strip_confluent_header,
)
from onehouse_demos_spark.sources.cdc import apply_cdc_batch, decode_avro_stream

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _schema_json():
    with open(f"{FIX}/debezium_customers_schema.json") as fh:
        return fh.read()


def _raw_frames(spark):
    with open(f"{FIX}/debezium_customers_avro.b64") as fh:
        frames = [base64.b64decode(line.strip()) for line in fh if line.strip()]
    return spark.createDataFrame(
        [(bytearray(b),) for b in frames], "value binary"
    )


def test_avro_codec_roundtrip():
    """Encoder and decoder agree for the full envelope type surface
    (records, [null,T] unions, named-type refs, primitives)."""
    sch = AvroSchema(_schema_json())
    env = {
        "before": None,
        "after": {"id": 7, "first_name": "A", "last_name": "B", "email": "a@b"},
        "op": "c",
        "ts_ms": 123456789,
    }
    assert decode(encode(env, sch), sch) == env
    framed = confluent_frame(encode(env, sch), schema_id=42)
    assert strip_confluent_header(framed) == encode(env, sch)


def test_avro_to_spark_schema_mapping():
    st = avro_to_spark_type(_schema_json())
    assert [f.name for f in st.fields] == ["before", "after", "op", "ts_ms"]
    assert st["after"].dataType.fieldNames() == [
        "id", "first_name", "last_name", "email",
    ]
    assert st["ts_ms"].dataType.simpleString() == "bigint"


def test_decode_avro_stream_from_recorded_bytes(spark):
    env = decode_avro_stream(
        _raw_frames(spark), _schema_json(), confluent_framed=True
    )
    rows = env.orderBy("ts_ms").collect()
    assert len(rows) == 7
    assert [r.op for r in rows] == ["r", "r", "r", "c", "u", "u", "d"]
    # delete event carries only the before image
    d = rows[-1]
    assert d.after is None and d.before.id == 1003
    first = rows[0]
    assert first.after.email == "sally.thomas@acme.com"


def test_cdc_avro_end_to_end_upsert(spark, tmp_base):
    """decode → flatten → upsert/delete, matching the register-mysql
    walkthrough semantics: final table state reflects snapshot reads,
    the insert, both updates, and the delete."""
    t = LakehouseTable.create(
        spark,
        tmp_base + "/customers",
        # no payload ordering column: the per-batch collapse picks the
        # newest change per key by ts_ms; across batches latest commit wins
        TableConfig(name="customers", record_key=["id"]),
    )
    env = decode_avro_stream(
        _raw_frames(spark), _schema_json(), confluent_framed=True
    )
    apply_cdc_batch(t, env)
    got = {
        r.id: (r.first_name, r.email)
        for r in t.snapshot().select("id", "first_name", "email").collect()
    }
    assert got == {
        1001: ("Sally", "sally.t@acme.com"),          # updated email wins
        1002: ("George", "gbailey@foobar.com"),
        1004: ("Anne Marie", "annek@noanswer.org"),    # updated name wins
    }  # 1003 deleted
    dups = (
        t.snapshot(keep_meta=True)
        .groupBy("_oh_record_key").count().filter("count > 1").count()
    )
    assert dups == 0


def test_fixture_is_schema_registry_framed():
    """Every fixture line carries the Confluent wire header the
    reference's AvroConverter produces (magic 0x00 + schema id)."""
    with open(f"{FIX}/debezium_customers_avro.b64") as fh:
        frames = [base64.b64decode(x.strip()) for x in fh if x.strip()]
    assert frames and all(b[0] == 0 for b in frames)
    assert all(int.from_bytes(b[1:5], "big") == 7 for b in frames)
    # and the payload decodes against the registered schema
    sch = AvroSchema(json.loads(_schema_json()))
    ops = [decode(strip_confluent_header(b), sch)["op"] for b in frames]
    assert ops == ["r", "r", "r", "c", "u", "u", "d"]


def test_quarantine_poison_avro_frames(spark):
    """Corrupt Avro bytes are dead-lettered, not fatal."""
    from onehouse_demos_spark.sources.cdc import DECODE_ERROR

    with open(f"{FIX}/debezium_customers_avro.b64") as fh:
        frames = [base64.b64decode(x.strip()) for x in fh if x.strip()]
    poison = frames[0][:7]  # header survives, body truncated mid-record
    df = spark.createDataFrame(
        [(bytearray(b),) for b in frames + [poison]], "value binary"
    )
    out = decode_avro_stream(
        df, _schema_json(), confluent_framed=True, on_error="quarantine"
    ).collect()
    assert len(out) == len(frames) + 1
    bad = [r for r in out if r[DECODE_ERROR] is not None]
    ok = [r for r in out if r[DECODE_ERROR] is None]
    assert len(bad) == 1 and len(ok) == len(frames)
    assert [r.op for r in sorted(ok, key=lambda r: r.ts_ms)] == [
        "r", "r", "r", "c", "u", "u", "d",
    ]
