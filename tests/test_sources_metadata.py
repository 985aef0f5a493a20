"""Incremental table-as-source chaining, metadata reports, interop."""

from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.sources.incremental import IncrementalTableSource
from onehouse_demos_spark.sql import Engine
from onehouse_demos_spark.tables.interop import (
    available_formats,
    export_parquet_view,
    export_snapshot,
)
from onehouse_demos_spark.tables.maintenance import run_compaction
from onehouse_demos_spark.tables.metadata import table_report, warehouse_report

SCHEMA = "id int, v int"


def make_table(spark, base, name, **kw):
    return LakehouseTable.create(
        spark, f"{base}/{name}", TableConfig(name=name, record_key=["id"], **kw)
    )


def test_incremental_chain_bronze_to_silver(spark, tmp_base):
    bronze = make_table(spark, tmp_base, "bronze")
    silver = make_table(spark, tmp_base, "silver")
    src = IncrementalTableSource(bronze, tmp_base + "/ckpt.json")

    def apply(df):
        silver.upsert(df.withColumn("v", F.col("v") * 10))

    bronze.upsert(spark.createDataFrame([(1, 1), (2, 2)], SCHEMA))
    assert src.process_available(apply) == 1
    bronze.upsert(spark.createDataFrame([(2, 22), (3, 3)], SCHEMA))
    assert src.process_available(apply) == 1
    # caught up → no-op
    assert src.process_available(apply) == 0
    assert {r.id: r.v for r in silver.snapshot().collect()} == {
        1: 10,
        2: 220,
        3: 30,
    }
    # compaction on bronze must not re-deliver records
    run_compaction(bronze)
    assert src.process_available(apply) == 0


def test_incremental_source_latest_on_missing_ckpt(spark, tmp_base):
    bronze = make_table(spark, tmp_base, "b2")
    bronze.upsert(spark.createDataFrame([(1, 1)], SCHEMA))
    src = IncrementalTableSource(
        bronze, tmp_base + "/ckpt2.json", read_latest_on_missing_ckpt=True
    )
    df, end = src.pull()
    assert df is None  # history skipped
    bronze.upsert(spark.createDataFrame([(2, 2)], SCHEMA))
    df, end = src.pull()
    assert [r.id for r in df.collect()] == [2]


def test_table_and_warehouse_report(spark, tmp_base):
    eng = Engine(spark, tmp_base + "/wh")
    eng.sql(
        "CREATE TABLE r (id INT, part STRING) USING lakehouse "
        "PARTITIONED BY (part) TBLPROPERTIES (primaryKey=id, type=mor)"
    )
    eng.sql("INSERT INTO r VALUES (1, 'a'), (2, 'b')")
    eng.table("r").upsert(spark.createDataFrame([(1, "a")], "id int, part string"))
    rep = table_report(eng.table("r"))
    assert rep["table_type"] == "mor"
    assert rep["num_log_files"] >= 1
    assert rep["pending_compaction_partitions"] == ["a"]
    assert set(rep["partitions_detail"]) == {"a", "b"}
    wrep = warehouse_report(eng, tmp_base + "/report.json")
    assert wrep["num_tables"] == 1 and "r" in wrep["tables"]
    import json, os

    assert os.path.exists(tmp_base + "/report.json")
    assert json.load(open(tmp_base + "/report.json"))["num_tables"] == 1


def test_interop_parquet_floor_and_gates(spark, tmp_base):
    t = make_table(spark, tmp_base, "x")
    t.upsert(spark.createDataFrame([(1, 1), (2, 2)], SCHEMA))
    caps = available_formats(spark)
    assert caps["parquet"] is True
    n = export_parquet_view(t, tmp_base + "/export")
    assert n == 2
    # delta/iceberg jars absent in this runtime → clean gate, not a crash
    if not caps.get("delta"):
        import pytest

        with pytest.raises(RuntimeError, match="unavailable"):
            export_snapshot(t, tmp_base + "/delta_export", fmt="delta")
