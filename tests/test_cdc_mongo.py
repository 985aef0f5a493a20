"""MongoDB Debezium CDC end-to-end (reference EP3 third source:
`mongodb-debezium/register-mongodb.json` registers MongoDbConnector
over the `inventory` db; topics carry extended-JSON after-images).

Envelope fixtures follow the public Debezium MongoDB tutorial shape:
`after` is an extended-JSON STRING (`$numberLong`/`$oid`/`$date`
wrappers), partial updates carry `updateDescription.updatedFields`
(+`removedFields`) with a NULL `after`, and delete events identify the
document only via the message key. decode → flatten → stateful patch
fold → table upsert/delete, all asserted against the final snapshot.
"""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.sources.cdc import (
    MONGO_ENVELOPE_DDL,
    apply_mongo_cdc_batch,
    flatten_debezium_mongo,
    normalize_mongo_extjson,
)

DOC_SCHEMA = T.StructType([
    T.StructField("_id", T.LongType()),
    T.StructField("first_name", T.StringType()),
    T.StructField("last_name", T.StringType()),
    T.StructField("email", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def _doc(i, fn, ln, em, score=None):
    d = {
        "_id": {"$numberLong": str(i)},
        "first_name": fn,
        "last_name": ln,
        "email": em,
    }
    if score is not None:
        d["score"] = {"$numberDouble": str(score)}
    return json.dumps(d)


def _env(op, ts, after=None, upd=None, removed=None, key_id=None):
    """(after, updateDescription, op, ts_ms, key) row."""
    ud = None
    if upd is not None or removed is not None:
        ud = (json.dumps(upd) if upd is not None else None, removed)
    key = json.dumps({"id": key_id}) if key_id is not None else None
    return (after, ud, op, ts, key)


def _mk_env_df(spark, rows):
    return spark.createDataFrame(rows, MONGO_ENVELOPE_DDL)


def test_extjson_normalization(spark):
    df = spark.createDataFrame(
        [(
            '{"_id": {"$numberLong": "1004"}, "first_name": "Anne", '
            '"when": {"$date": {"$numberLong": "1700000000000"}}, '
            '"oid": {"$oid": "657f1a2b3c4d5e6f7a8b9c0d"}, '
            '"score": {"$numberDouble": "9.5"}}',
        )],
        "s string",
    )
    out = df.select(normalize_mongo_extjson(F.col("s")).alias("n")).first().n
    parsed = json.loads(out)
    assert parsed["_id"] == 1004
    assert parsed["when"] == 1700000000000
    assert parsed["oid"] == "657f1a2b3c4d5e6f7a8b9c0d"
    assert parsed["score"] == 9.5


def test_extjson_scientific_notation_doubles(spark):
    """Canonical extended JSON serializes small/large magnitudes in E
    notation with signed exponents — they must unwrap, not silently
    null out (r3 review finding)."""
    df = spark.createDataFrame(
        [(
            '{"tiny": {"$numberDouble": "1.5E-6"}, '
            '"huge": {"$numberDouble": "-2.25E+10"}, '
            '"dec": {"$numberDecimal": "3.14e-2"}}',
        )],
        "s string",
    )
    out = df.select(normalize_mongo_extjson(F.col("s")).alias("n")).first().n
    parsed = json.loads(out)
    assert parsed["tiny"] == 1.5e-6
    assert parsed["huge"] == -2.25e10
    assert parsed["dec"] == 3.14e-2


def test_flatten_classifies_full_partial_delete(spark):
    rows = [
        _env("r", 1, after=_doc(1001, "Sally", "Thomas", "st@x.io")),
        _env("u", 2, upd={"email": "new@x.io"}, removed=["score"],
             key_id='{"$numberLong": "1001"}'),
        _env("d", 3, key_id='{"$numberLong": "1002"}'),
    ]
    flat = flatten_debezium_mongo(_mk_env_df(spark, rows), DOC_SCHEMA)
    full = [r for r in flat.collect() if r._cdc_doc is not None]
    assert len(full) == 1 and full[0]._cdc_id == 1001
    partial = [r for r in flat.collect() if r._cdc_upd_keys is not None]
    assert len(partial) == 1
    assert partial[0]._cdc_id == 1001
    assert partial[0]._cdc_upd_keys == ["email"]
    assert partial[0]._cdc_rm_keys == ["score"]
    dels = [r for r in flat.collect() if r._cdc_is_deleted]
    assert len(dels) == 1 and dels[0]._cdc_id == 1002


def test_mongo_cdc_end_to_end(spark, tmp_base):
    """Debezium-tutorial walkthrough: snapshot reads, insert, partial
    update (set + unset), full-image update, delete — final table
    state must reflect ordered patch semantics."""
    t = LakehouseTable.create(
        spark,
        tmp_base + "/mongo_customers",
        TableConfig(name="mongo_customers", record_key=["_id"]),
    )
    batch1 = [
        _env("r", 1, after=_doc(1001, "Sally", "Thomas", "sally@acme.com",
                                score=7.0)),
        _env("r", 1, after=_doc(1002, "George", "Bailey", "gb@foo.com")),
        _env("r", 1, after=_doc(1003, "Edward", "Walker", "ed@walker.com")),
    ]
    apply_mongo_cdc_batch(t, _mk_env_df(spark, batch1), DOC_SCHEMA)
    assert t.snapshot().count() == 3

    batch2 = [
        # insert a new doc
        _env("c", 10, after=_doc(1004, "Anne", "Kretchmar", "annek@no.org")),
        # partial update: set email, unset score (needs prior state
        # from the TABLE)
        _env("u", 11, upd={"email": "sally.thomas@acme.com"},
             removed=["score"], key_id='{"$numberLong": "1001"}'),
        # full-image update (capture.mode full document)
        _env("u", 12, after=_doc(1003, "Ed", "Walker", "ed@walker.com")),
        # delete — id only on the message key
        _env("d", 13, key_id='{"$numberLong": "1002"}'),
    ]
    apply_mongo_cdc_batch(t, _mk_env_df(spark, batch2), DOC_SCHEMA)
    snap = {r._id: r for r in t.snapshot().collect()}
    assert set(snap) == {1001, 1003, 1004}
    assert snap[1001].email == "sally.thomas@acme.com"
    assert snap[1001].first_name == "Sally"      # untouched field carried
    assert snap[1001].score is None              # removedFields nulled
    assert snap[1003].first_name == "Ed"
    assert snap[1004].last_name == "Kretchmar"


def test_mongo_patch_on_same_batch_insert_and_reinsert_after_delete(
    spark, tmp_base
):
    """The per-key fold must apply IN ts ORDER within one batch:
    insert → patch → delete → re-insert all for the same key."""
    t = LakehouseTable.create(
        spark,
        tmp_base + "/mongo_fold",
        TableConfig(name="mongo_fold", record_key=["_id"]),
    )
    batch = [
        _env("c", 1, after=_doc(7, "A", "B", "a@b")),
        _env("u", 2, upd={"email": "patched@b"},
             key_id='{"$numberLong": "7"}'),
        _env("d", 3, key_id='{"$numberLong": "7"}'),
        _env("c", 4, after=_doc(7, "A2", "B2", "again@b")),
        # and a key that ends deleted
        _env("c", 1, after=_doc(8, "X", "Y", "x@y")),
        _env("d", 2, key_id='{"$numberLong": "8"}'),
    ]
    apply_mongo_cdc_batch(t, _mk_env_df(spark, batch), DOC_SCHEMA)
    rows = {r._id: r for r in t.snapshot().collect()}
    assert set(rows) == {7}
    assert rows[7].first_name == "A2" and rows[7].email == "again@b"


def test_mongo_cdc_streaming_end_to_end(spark, tmp_base):
    """EP3 for MongoDB as a STREAM: envelope JSON lines dropped as
    files → Structured Streaming file source → Streamer(mode=
    'cdc_mongo') foreachBatch fold → table commits. Mirrors the
    relational CDC stream test but with extended-JSON after-images and
    a patch event that needs prior state."""
    import json as _json
    import os

    from onehouse_demos_spark.streaming.ingest import (
        Streamer,
        file_json_stream,
    )
    from onehouse_demos_spark.sources.cdc import MONGO_ENVELOPE_DDL

    t = LakehouseTable.create(
        spark,
        tmp_base + "/mongo_stream",
        TableConfig(name="mongo_stream", record_key=["_id"]),
    )
    drop_dir = tmp_base + "/mongo_drops"
    os.makedirs(drop_dir, exist_ok=True)

    def envelope_line(op, ts, after=None, upd=None, removed=None, key_id=None):
        ud = None
        if upd is not None or removed is not None:
            ud = {
                "updatedFields": _json.dumps(upd) if upd is not None else None,
                "removedFields": removed,
            }
        return _json.dumps({
            "after": after,
            "updateDescription": ud,
            "op": op,
            "ts_ms": ts,
            "key": _json.dumps({"id": key_id}) if key_id else None,
        })

    batch = [
        envelope_line("r", 1, after=_doc(1001, "Sally", "Thomas", "s@a.io")),
        envelope_line("c", 2, after=_doc(1002, "George", "Bailey", "g@f.io")),
        envelope_line("u", 3, upd={"email": "sally2@a.io"},
                      key_id='{"$numberLong": "1001"}'),
        envelope_line("d", 4, key_id='{"$numberLong": "1002"}'),
    ]
    with open(f"{drop_dir}/b1.json", "w") as fh:
        fh.write("\n".join(batch))
    stream = file_json_stream(spark, drop_dir, MONGO_ENVELOPE_DDL)
    st = Streamer(t, mode="cdc_mongo", doc_schema=DOC_SCHEMA)
    q = st.start(stream, tmp_base + "/mongo_ckpt", trigger_once=True)
    q.awaitTermination(120)
    rows = {r._id: r for r in t.snapshot().collect()}
    assert set(rows) == {1001}
    assert rows[1001].email == "sally2@a.io"
    assert rows[1001].first_name == "Sally"
