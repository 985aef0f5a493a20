"""Partition TTL (r8): Hudi `hoodie.partition.ttl.*` analog — expire
partitions whose last DATA modification is older than the retention
horizon, via one ordinary delete_partition replacecommit. Maintenance
replacecommits (clustering) never refresh a partition's TTL.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.sql.engine import Engine
from onehouse_demos_spark.tables.maintenance import (
    run_clustering,
    run_partition_ttl,
)

_SCHEMA = "id int, part string, v string, ver int"


def _mk(spark, tmp_base):
    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/t",
        TableConfig(
            name="tt",
            record_key=["id"],
            precombine="ver",
            partition_by=["part"],
        ),
    )
    # p_old written first, p_new refreshed by a later commit
    t.insert(
        spark.createDataFrame(
            [(1, "p_old", "a", 1), (2, "p_new", "b", 1)], _SCHEMA
        )
    )
    t.upsert(spark.createDataFrame([(3, "p_new", "c", 1)], _SCHEMA))
    return t


def test_retain_commits_expires_stale_partition(spark, tmp_base):
    t = _mk(spark, tmp_base)
    expired = run_partition_ttl(t, retain_commits=1)
    assert expired == ["p_old"]
    parts = {r.part for r in t.snapshot().collect()}
    assert parts == {"p_new"}
    # the drop is an ordinary M9 replacecommit: time travel still
    # resolves the pre-TTL snapshot
    pre = t.timeline.instants()[-2].instant
    assert {r.part for r in t.snapshot(as_of=pre).collect()} == {
        "p_old",
        "p_new",
    }
    # idempotent: nothing further to expire
    assert run_partition_ttl(t, retain_commits=1) == []


def test_retain_days_uses_instant_clock(spark, tmp_base):
    t = _mk(spark, tmp_base)
    # a "now" far in the future expires everything stale by days
    future = int(time.time() * 1000) + 10 * 86_400_000
    expired = run_partition_ttl(t, retain_days=5.0, now_ms=future)
    assert expired == ["p_new", "p_old"]
    assert t.snapshot().count() == 0
    # a "now" within the window expires nothing
    t2 = _mk(spark, f"{tmp_base}/b")
    assert run_partition_ttl(t2, retain_days=5.0) == []


def test_clustering_does_not_refresh_ttl(spark, tmp_base):
    t = _mk(spark, tmp_base)
    run_clustering(t, sort_columns=["id"])  # replacecommit over p_old too
    expired = run_partition_ttl(t, retain_commits=1)
    assert expired == ["p_old"]


def test_validation_and_sql_call(spark, tmp_base):
    t = _mk(spark, tmp_base)
    with pytest.raises(ValueError, match="exactly one"):
        run_partition_ttl(t)
    with pytest.raises(ValueError, match="exactly one"):
        run_partition_ttl(t, retain_days=1.0, retain_commits=1)

    eng = Engine(spark, f"{tmp_base}/wh")
    eng.sql(
        "CREATE TABLE tt (id INT, part STRING, v STRING, ver INT) "
        "USING lakehouse PARTITIONED BY (part) "
        "TBLPROPERTIES (primaryKey='id', preCombineField='ver')"
    )
    eng.sql("INSERT INTO tt VALUES (1, 'p_old', 'a', 1), (2, 'p_new', 'b', 1)")
    eng.sql("INSERT INTO tt VALUES (3, 'p_new', 'c', 1)")
    rows = eng.sql(
        "CALL run_partition_ttl(table => 'tt', retain_commits => 1)"
    ).collect()
    assert [r.expired_partition for r in rows] == ["p_old"]
    assert {
        r.part for r in eng.sql("SELECT part FROM tt").collect()
    } == {"p_new"}
