"""Persistent catalog sync (SURVEY §2 S9): tables registered in a
derby-backed Hive `spark_catalog` survive a session restart, MOR
registers the `_ro`/`_rt` pair, and new partitions are discovered on
re-sync — mirroring the reference's `run_sync_tool.sh --sync-mode hms`
walkthrough (`hudi-spark-minio-trino/README.md:312-344`).

Runs in a SUBPROCESS: the sync needs `enableHiveSupport()` at session
construction, and `getOrCreate()` would silently reuse the pytest
session's non-Hive catalog.
"""

import subprocess
import sys

_SCRIPT = r"""
import os, sys, tempfile
base = tempfile.mkdtemp()
wh, ms = base + "/wh", base + "/metastore_db"

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.tables.catalog import hive_session_builder, sync_table

def build_session():
    return (
        hive_session_builder(wh, ms, master="local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

spark = build_session()
spark.sparkContext.setLogLevel("ERROR")

# --- COW partitioned table ------------------------------------------------
t = LakehouseTable.create(
    spark, base + "/ticks",
    TableConfig(name="stock_ticks", record_key=["key"], precombine="ts",
                partition_by=["dt"]),
)
t.insert(spark.createDataFrame(
    [("k1", "2018/08/31", 1, 10.0), ("k2", "2018/08/31", 1, 20.0)],
    "key string, dt string, ts int, close double"))
info = sync_table(spark, t, db="lakehouse")
assert info["tables"] == ["lakehouse.stock_ticks"], info

got = {r.key: r.close for r in
       spark.table("lakehouse.stock_ticks").select("key", "close").collect()}
assert got == {"k1": 10.0, "k2": 20.0}, got

# upsert + NEW partition, then re-sync: MSCK discovers the partition
t.upsert(spark.createDataFrame(
    [("k1", "2018/08/31", 2, 11.0), ("k3", "2018/09/01", 1, 30.0)],
    "key string, dt string, ts int, close double"))
sync_table(spark, t, db="lakehouse")
got = {r.key: r.close for r in
       spark.table("lakehouse.stock_ticks").select("key", "close").collect()}
assert got == {"k1": 11.0, "k2": 20.0, "k3": 30.0}, got
parts = [r[0] for r in spark.sql(
    "SHOW PARTITIONS lakehouse.stock_ticks").collect()]
assert len(parts) == 2, parts
# multi-level partition values stay one catalog partition (slash-encoded)
assert any("2018%2F09%2F01" in p or "2018/09/01" in p for p in parts), parts

# --- MOR table: _ro / _rt pair -------------------------------------------
m = LakehouseTable.create(
    spark, base + "/ticks_mor",
    TableConfig(name="stock_ticks_mor", record_key=["key"], precombine="ts",
                partition_by=["dt"], table_type="mor"))
m.insert(spark.createDataFrame(
    [("k1", "2018/08/31", 1, 10.0)], "key string, dt string, ts int, close double"))
m.upsert(spark.createDataFrame(
    [("k1", "2018/08/31", 2, 99.0)], "key string, dt string, ts int, close double"))
info = sync_table(spark, m, db="lakehouse")
assert set(info["tables"]) == {"lakehouse.stock_ticks_mor_ro",
                               "lakehouse.stock_ticks_mor_rt"}, info
ro = {r.key: r.close for r in
      spark.table("lakehouse.stock_ticks_mor_ro").select("key", "close").collect()}
rt = {r.key: r.close for r in
      spark.table("lakehouse.stock_ticks_mor_rt").select("key", "close").collect()}
# the reference's walkthrough divergence: _ro stale, _rt fresh
assert ro == {"k1": 10.0}, ro
assert rt == {"k1": 99.0}, rt

# --- delete_partition: stale catalog partitions must be dropped -----------
t.delete_partition(["2018/09/01"])
sync_table(spark, t, db="lakehouse")
got = {r.key: r.close for r in
       spark.table("lakehouse.stock_ticks").select("key", "close").collect()}
assert got == {"k1": 11.0, "k2": 20.0}, got
parts = [r[0] for r in spark.sql(
    "SHOW PARTITIONS lakehouse.stock_ticks").collect()]
assert len(parts) == 1, parts

# --- schema evolution: re-sync reconciles the registered schema -----------
t.upsert(spark.createDataFrame(
    [("k4", "2018/08/31", 3, 44.0, "NASDAQ")],
    "key string, dt string, ts int, close double, exchange string"))
sync_table(spark, t, db="lakehouse")
cols = [f.name for f in spark.table("lakehouse.stock_ticks").schema.fields]
assert "exchange" in cols, cols
got = {r.key: r.exchange for r in
       spark.table("lakehouse.stock_ticks").select("key", "exchange").collect()}
assert got == {"k1": None, "k2": None, "k4": "NASDAQ"}, got

spark.stop()

# --- fresh session, same metastore: catalog objects persist ---------------
spark2 = build_session()
spark2.sparkContext.setLogLevel("ERROR")
got = {r.key: r.close for r in
       spark2.table("lakehouse.stock_ticks").select("key", "close").collect()}
assert got == {"k1": 11.0, "k2": 20.0, "k4": 44.0}, got
tables = {r.tableName for r in spark2.sql("SHOW TABLES IN lakehouse").collect()}
assert {"stock_ticks", "stock_ticks_mor_ro", "stock_ticks_mor_rt"} <= tables, tables
spark2.stop()
print("CATALOG_SYNC_OK")
"""


def test_catalog_sync_persists_across_sessions():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "CATALOG_SYNC_OK" in proc.stdout
