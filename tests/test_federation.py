"""External-engine federation over OUR written tables (reference EP2:
Spark writes, Trino/Presto reads the same storage — `hudi-spark-minio-
trino/README.md:312-380`; DuckDB plays the external engine here).

The catalog-sync current-view directory is plain hive-partitioned
parquet, so ANY parquet engine must read it and agree with the Spark
snapshot — including after an upsert rewrote files and a delete
dropped rows. This closes the loop the oracle gate leaves open (it
federates the INPUT testdata, not tables this engine wrote).
"""

import duckdb
from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.tables.catalog import sync_table


def _mk_table(spark, base, table_type="cow"):
    t = LakehouseTable.create(
        spark,
        f"{base}/ticks_{table_type}",
        TableConfig(
            name=f"ticks_{table_type}",
            record_key=["key"],
            precombine="ver",
            partition_by=["sym"],
            table_type=table_type,
        ),
    )
    rows = [(f"k{i}", 1, "GOOG" if i % 2 else "MSFT", 100.0 + i)
            for i in range(20)]
    t.insert(spark.createDataFrame(rows, "key string, ver int, sym string, px double"))
    t.upsert(spark.createDataFrame(
        [("k1", 2, "GOOG", 999.0), ("k2", 2, "MSFT", 888.0)],
        "key string, ver int, sym string, px double"))
    t.delete(spark.createDataFrame([("k3",)], "key string"))
    return t


def _duck_read(path):
    con = duckdb.connect()
    return con.execute(
        "SELECT key, ver, sym, px FROM read_parquet("
        f"'{path}/**/*.parquet', hive_partitioning=true) ORDER BY key"
    ).fetchall()


def test_duckdb_reads_cow_current_view(spark, tmp_base):
    t = _mk_table(spark, tmp_base, "cow")
    sync_table(spark, t)
    duck = _duck_read(f"{t.base_path}/_catalog/snapshot")
    spk = sorted(
        tuple(r) for r in
        t.snapshot().select("key", "ver", "sym", "px").collect()
    )
    assert duck == spk
    assert len(duck) == 19  # 20 inserted, 1 deleted
    got = {k: (v, px) for k, v, s, px in duck}
    assert got["k1"] == (2, 999.0) and got["k2"] == (2, 888.0)


def test_duckdb_reads_mor_ro_and_rt(spark, tmp_base):
    t = _mk_table(spark, tmp_base, "mor")
    sync_table(spark, t)
    # _rt (merged snapshot materialization) == Spark snapshot
    duck_rt = _duck_read(f"{t.base_path}/_catalog/rt")
    spk = sorted(
        tuple(r) for r in
        t.snapshot().select("key", "ver", "sym", "px").collect()
    )
    assert duck_rt == spk
    # _ro (base files only) == Spark read_optimized: pre-merge state
    duck_ro = _duck_read(f"{t.base_path}/_catalog/ro")
    spk_ro = sorted(
        tuple(r) for r in
        t.read_optimized().select("key", "ver", "sym", "px").collect()
    )
    assert duck_ro == spk_ro
    # the golden MOR divergence is visible to the external engine too
    ro_k1 = [r for r in duck_ro if r[0] == "k1"][0]
    rt_k1 = [r for r in duck_rt if r[0] == "k1"][0]
    assert ro_k1[1] == 1 and rt_k1[1] == 2


def test_resync_after_new_commit_refreshes_external_view(spark, tmp_base):
    t = _mk_table(spark, tmp_base, "cow")
    sync_table(spark, t)
    t.upsert(spark.createDataFrame(
        [("k5", 3, "GOOG", 777.0)], "key string, ver int, sym string, px double"))
    sync_table(spark, t)
    duck = _duck_read(f"{t.base_path}/_catalog/snapshot")
    got = {k: (v, px) for k, v, s, px in duck}
    assert got["k5"] == (3, 777.0)


def test_ep1_stream_to_external_engine(spark, tmp_base):
    """EP1 end-to-end composition: file-drop JSON stream → Streamer
    upsert into a MOR table → compaction → catalog sync → DuckDB reads
    the _rt/_ro current views (the reference's Kafka→Hudi→Trino path,
    with the file source standing in for the jar-gated broker)."""
    import json
    import os

    from onehouse_demos_spark.streaming.ingest import Streamer, file_json_stream
    from onehouse_demos_spark.tables.maintenance import run_compaction

    src = tmp_base + "/incoming"
    os.makedirs(src, exist_ok=True)
    with open(src + "/b1.json", "w") as fh:
        for i in range(10):
            fh.write(json.dumps({
                "key": f"k{i}", "ts": f"2018-08-31 10:{i:02d}:00",
                "symbol": "GOOG" if i % 2 else "MSFT",
                "close": 100.0 + i, "date": "2018/08/31",
            }) + "\n")
    with open(src + "/b2.json", "w") as fh:
        fh.write(json.dumps({
            "key": "k0", "ts": "2018-08-31 11:00:00", "symbol": "MSFT",
            "close": 999.0, "date": "2018/08/31",
        }) + "\n")
    t = LakehouseTable.create(
        spark,
        tmp_base + "/ticks",
        TableConfig(name="ticks_stream", record_key=["key"],
                    precombine="ts", partition_by=["date"],
                    table_type="mor"),
    )
    schema = "key string, ts string, symbol string, close double, date string"
    q = Streamer(t, mode="upsert").start(
        file_json_stream(spark, src, schema),
        tmp_base + "/ckpt",
        trigger_once=True,
    )
    q.awaitTermination(120)
    run_compaction(t)
    sync_table(spark, t)
    con = duckdb.connect()
    rt = dict(con.execute(
        f"SELECT key, close FROM read_parquet('{t.base_path}/_catalog/rt/**/*.parquet', hive_partitioning=true)"
    ).fetchall())
    assert len(rt) == 10 and rt["k0"] == 999.0
    # post-compaction the read-optimized view converges with _rt
    ro = dict(con.execute(
        f"SELECT key, close FROM read_parquet('{t.base_path}/_catalog/ro/**/*.parquet', hive_partitioning=true)"
    ).fetchall())
    assert ro == rt
