"""MongoDB Debezium CDC through the STREAMER (reference EP3
`mongodb-debezium/register-mongodb.json` + the HoodieStreamer
continuous-ingest loop): file-streamed extended-JSON envelopes land in
a LakehouseTable via foreachBatch `apply_mongo_cdc_batch`, with
patches and key-only deletes arriving across checkpointed restarts —
the same exactly-once-per-micro-batch contract the relational CDC
stream test pins."""

import json
import os

from pyspark.sql import types as T

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.sources.cdc import MONGO_ENVELOPE_DDL
from onehouse_demos_spark.streaming.ingest import Streamer, file_json_stream

DOC_SCHEMA = T.StructType([
    T.StructField("_id", T.LongType()),
    T.StructField("first_name", T.StringType()),
    T.StructField("email", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def _doc(i, fn, em, score=None):
    d = {"_id": {"$numberLong": str(i)}, "first_name": fn, "email": em}
    if score is not None:
        d["score"] = {"$numberDouble": str(score)}
    return json.dumps(d)


def _env(op, ts, after=None, upd=None, removed=None, key_id=None):
    e = {"after": after, "op": op, "ts_ms": ts}
    if upd is not None or removed is not None:
        e["updateDescription"] = {
            "updatedFields": json.dumps(upd) if upd is not None else None,
            "removedFields": removed,
        }
    if key_id is not None:
        e["key"] = json.dumps({"id": key_id})
    return e


def _write(dirpath, name, envs):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for e in envs:
            f.write(json.dumps(e) + "\n")


def _drain(spark, table, src, ckpt):
    stream = file_json_stream(spark, src, MONGO_ENVELOPE_DDL)
    q = Streamer(table, mode="cdc_mongo", doc_schema=DOC_SCHEMA).start(
        stream, ckpt, trigger_once=True
    )
    q.awaitTermination()


def test_mongo_stream_lands_patches_and_deletes_across_restarts(
    spark, tmp_base
):
    src = tmp_base + "/mongo_incoming"
    ckpt = tmp_base + "/mongo_ckpt"
    t = LakehouseTable.create(
        spark,
        tmp_base + "/mongo_stream_t",
        TableConfig(name="mongo_stream_t", record_key=["_id"]),
    )
    _write(src, "b1.json", [
        _env("r", 1, after=_doc(1001, "Sally", "sally@acme.com", 7.0)),
        _env("r", 1, after=_doc(1002, "George", "gb@foo.com")),
    ])
    _drain(spark, t, src, ckpt)
    snap = {r._id: (r.first_name, r.email, r.score)
            for r in t.snapshot().collect()}
    assert snap == {
        1001: ("Sally", "sally@acme.com", 7.0),
        1002: ("George", "gb@foo.com", None),
    }
    commits = len(t.timeline.instants())

    # restart with NO new input: offset log skips everything
    _drain(spark, t, src, ckpt)
    assert len(t.timeline.instants()) == commits

    # restart #2: a partial patch (null after), a key-only delete, and
    # a fresh insert arrive in one micro-batch
    _write(src, "b2.json", [
        _env("u", 2, upd={"email": "patched@acme.com"},
             key_id='{"$numberLong": "1001"}'),
        _env("d", 3, key_id='{"$numberLong": "1002"}'),
        _env("c", 4, after=_doc(1003, "Edward", "ed@walker.com", 1.5)),
    ])
    _drain(spark, t, src, ckpt)
    snap = {r._id: (r.first_name, r.email, r.score)
            for r in t.snapshot().collect()}
    assert snap == {
        # patch folded over the TABLE's prior state: name+score carried
        1001: ("Sally", "patched@acme.com", 7.0),
        1003: ("Edward", "ed@walker.com", 1.5),
    }

    # restart #3: removedFields unsets a column on the folded doc
    _write(src, "b3.json", [
        _env("u", 5, upd={}, removed=["score"],
             key_id='{"$numberLong": "1001"}'),
    ])
    _drain(spark, t, src, ckpt)
    snap = {r._id: (r.first_name, r.email, r.score)
            for r in t.snapshot().collect()}
    assert snap[1001] == ("Sally", "patched@acme.com", None)
