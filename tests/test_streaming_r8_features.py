"""r8 feature composition with streaming ingest: the bucket layout
holds across foreachBatch micro-batch upserts (point reads stay
bucket-pruned during continuous ingest), and pre-commit validators
gate each micro-batch commit — a poisoned batch fails the streaming
query, leaves the table untouched, and ingestion resumes cleanly
after the bad file is removed.
"""

from __future__ import annotations

import json
import os

import pytest

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.streaming.ingest import Streamer, file_json_stream

SCHEMA = "key string, ts string, symbol string, close double, date string"


def _write(dirpath, name, records):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, name), "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def _rec(key, ts, close):
    return {"key": key, "ts": ts, "symbol": key.split("_")[0],
            "close": close, "date": "2018/08/31"}


def test_stream_into_bucketed_table_keeps_layout(spark, tmp_base):
    src = tmp_base + "/in"
    _write(src, "b1.json", [_rec(f"T_{i}", "10:00", float(i)) for i in range(40)])
    _write(src, "b2.json", [_rec("T_5", "10:30", 99.0), _rec("T_41", "10:30", 41.0)])
    t = LakehouseTable.create(
        spark,
        tmp_base + "/t",
        TableConfig(
            name="bticks",
            record_key=["key"],
            precombine="ts",
            bucket_index_buckets=8,
        ),
    )
    q = Streamer(t, mode="upsert").start(
        file_json_stream(spark, src, SCHEMA),
        tmp_base + "/ckpt",
        trigger_once=True,
    )
    q.awaitTermination(120)
    files = t.manifest.live_files()
    assert files and all(f.bucket is not None for f in files)
    snap = {r.key: r.close for r in t.snapshot().collect()}
    assert snap["T_5"] == 99.0 and snap["T_41"] == 41.0 and len(snap) == 41
    # point read after continuous ingest: still a bucket-routed prune
    out = t.snapshot_for_keys(spark.createDataFrame([("T_5",)], "key string"))
    probe = t.last_key_read_probe
    assert probe["mode"] == "bucket"
    assert probe["files_read"] < probe["files_live"]
    assert {r.close for r in out.filter("key = 'T_5'").collect()} == {99.0}


def test_validator_gates_each_micro_batch(spark, tmp_base):
    src = tmp_base + "/in"
    _write(src, "b1.json", [_rec("A_1", "10:00", 10.0), _rec("B_1", "10:00", 20.0)])
    t = LakehouseTable.create(
        spark,
        tmp_base + "/t",
        TableConfig(
            name="vticks",
            record_key=["key"],
            precombine="ts",
            pre_commit_validators=[
                {
                    "type": "single_result",
                    "query": "select count(*) from <TABLE> where close < 0",
                    "expected": 0,
                }
            ],
        ),
    )
    stream = file_json_stream(spark, src, SCHEMA)
    q = Streamer(t, mode="upsert").start(
        stream, tmp_base + "/ckpt", trigger_once=True
    )
    q.awaitTermination(120)
    assert t.snapshot().count() == 2
    # a poisoned micro-batch: the validator aborts the commit and the
    # streaming query surfaces the failure
    _write(src, "b2.json", [_rec("C_1", "10:30", -5.0)])
    q2 = Streamer(t, mode="upsert").start(
        file_json_stream(spark, src, SCHEMA),
        tmp_base + "/ckpt",
        trigger_once=True,
    )
    with pytest.raises(Exception, match="single_result|PreCommit"):
        q2.awaitTermination(120)
        if q2.exception() is not None:
            raise q2.exception()
    assert t.snapshot().count() == 2  # nothing published
    # remove the bad file; the checkpoint has NOT advanced past the
    # failed batch, so a restart reprocesses only clean data
    os.remove(os.path.join(src, "b2.json"))
    _write(src, "b3.json", [_rec("D_1", "11:00", 5.0)])
    q3 = Streamer(t, mode="upsert").start(
        file_json_stream(spark, src, SCHEMA),
        tmp_base + "/ckpt",
        trigger_once=True,
    )
    q3.awaitTermination(120)
    snap = {r.key for r in t.snapshot().collect()}
    assert "D_1" in snap and "C_1" not in snap
