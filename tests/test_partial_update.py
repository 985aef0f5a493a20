"""partial_update merge payload (Hudi PartialUpdateAvroPayload
analog): per column, the newest NON-NULL value wins; incoming NULLs
never erase existing data. Covered on COW (rewrite-time fold), MOR
(read-time fold over log files), within-batch dedupe, and the SQL
TBLPROPERTIES surface."""

import pytest
from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig

SCHEMA = "id int, ver int, a string, b string"


def make_table(spark, base, **kw):
    cfg = TableConfig(
        name="pu",
        record_key=["id"],
        precombine="ver",
        payload="partial_update",
        **kw,
    )
    return LakehouseTable.create(spark, base + "/pu", cfg)


def state(t):
    return {
        (r.id, r.ver, r.a, r.b)
        for r in t.snapshot().select("id", "ver", "a", "b").collect()
    }


def test_cow_nulls_do_not_erase(spark, tmp_base):
    t = make_table(spark, tmp_base)
    t.insert(spark.createDataFrame(
        [(1, 1, "a1", "b1"), (2, 1, "a2", "b2")], SCHEMA))
    # update only column a for id=1 (b NULL must keep b1);
    # only column b for id=2; and a brand-new id=3 with a NULL column
    t.upsert(spark.createDataFrame(
        [(1, 2, "a1x", None), (2, 2, None, "b2x"), (3, 1, "a3", None)],
        SCHEMA,
    ))
    assert state(t) == {
        (1, 2, "a1x", "b1"),
        (2, 2, "a2", "b2x"),
        (3, 1, "a3", None),
    }


def test_within_batch_partial_dedupe(spark, tmp_base):
    """Two partial rows for one key in ONE batch merge column-wise by
    precombine order before hitting storage."""
    t = make_table(spark, tmp_base)
    t.insert(spark.createDataFrame([(1, 1, "a1", "b1")], SCHEMA))
    t.upsert(spark.createDataFrame(
        [(1, 2, "a_v2", None), (1, 3, None, "b_v3")], SCHEMA))
    assert state(t) == {(1, 3, "a_v2", "b_v3")}


def test_mor_read_time_partial_fold(spark, tmp_base):
    t = make_table(spark, tmp_base, table_type="mor")
    t.insert(spark.createDataFrame([(1, 1, "a1", "b1")], SCHEMA))
    t.upsert(spark.createDataFrame([(1, 2, "a1x", None)], SCHEMA))
    t.upsert(spark.createDataFrame([(1, 3, None, "b1x")], SCHEMA))
    # snapshot (_rt) folds base + both log files column-wise
    assert state(t) == {(1, 3, "a1x", "b1x")}
    # read-optimized still serves the base image
    ro = {(r.id, r.a, r.b)
          for r in t.read_optimized().select("id", "a", "b").collect()}
    assert ro == {(1, "a1", "b1")}
    from onehouse_demos_spark.tables.maintenance import run_compaction

    run_compaction(t)
    assert state(t) == {(1, 3, "a1x", "b1x")}
    ro2 = {(r.id, r.a, r.b)
           for r in t.read_optimized().select("id", "a", "b").collect()}
    assert ro2 == {(1, "a1x", "b1x")}  # compaction materialized the fold


def test_delete_then_reinsert_resurrects(spark, tmp_base):
    t = make_table(spark, tmp_base)
    t.insert(spark.createDataFrame([(1, 1, "a1", "b1")], SCHEMA))
    t.delete(spark.createDataFrame([(1,)], "id int"))
    assert state(t) == set()
    t.upsert(spark.createDataFrame([(1, 2, "a2", None)], SCHEMA))
    # COW delete physically removed the row, so b restarts from NULL
    assert state(t) == {(1, 2, "a2", None)}


def test_overwrite_payload_unchanged(spark, tmp_base):
    """Control: the default payload still replaces whole rows (NULLs
    DO erase)."""
    cfg = TableConfig(name="ow", record_key=["id"], precombine="ver")
    t = LakehouseTable.create(spark, tmp_base + "/ow", cfg)
    t.insert(spark.createDataFrame([(1, 1, "a1", "b1")], SCHEMA))
    t.upsert(spark.createDataFrame([(1, 2, "a1x", None)], SCHEMA))
    assert state(t) == {(1, 2, "a1x", None)}


def test_sql_payload_property(spark, tmp_base):
    from onehouse_demos_spark.sql import Engine

    eng = Engine(spark, f"{tmp_base}/wh_pu")
    eng.sql(
        "CREATE TABLE t_pu (id INT, ver INT, a STRING, b STRING) "
        "USING lakehouse TBLPROPERTIES (primaryKey=id, preCombineField=ver, "
        "payload=partial_update)"
    )
    t = eng.table("t_pu")
    assert t.config.payload == "partial_update"
    spark.createDataFrame([(1, 1, "a1", "b1")], SCHEMA) \
        .createOrReplaceTempView("pu_rows")
    eng.sql("INSERT INTO t_pu SELECT * FROM pu_rows")
    # MERGE (the SQL upsert path) with a NULL-carrying source: the
    # partial payload keeps the stored `a`. (Plain INSERT INTO is an
    # append — duplicate keys stay visible, reference insert parity.)
    t.upsert(spark.createDataFrame([(1, 2, None, "b1x")], SCHEMA))
    got = {(r.id, r.ver, r.a, r.b)
           for r in eng.sql("SELECT id, ver, a, b FROM t_pu").collect()}
    assert got == {(1, 2, "a1", "b1x")}
    props = {r.key: r.value for r in eng.sql(
        "CALL show_table_properties(table => 't_pu')").collect()}
    assert props["payload"] == "partial_update"
