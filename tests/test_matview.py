"""Partition-incremental materialized aggregate: refresh work is
∝ touched partitions, results always equal a full recompute, and
compaction/clustering replace-commits trigger no recompute."""

from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.tables.maintenance import run_clustering
from onehouse_demos_spark.tables.matview import MaterializedAggregate


def _agg(df):
    return df.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2).alias("rev"),
    )


def _expect(table):
    return sorted(
        tuple(r) for r in _agg(table.snapshot()).collect()
    )


def _got(mv):
    return sorted(tuple(r) for r in mv.read().collect())


def test_matview_incremental_refresh(spark, tmp_base):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    ).withColumn("ver", F.lit(1))
    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/orders_mv",
        TableConfig(
            name="orders_mv",
            record_key=["o_orderkey"],
            precombine="ver",
            partition_by=["o_orderstatus"],
        ),
    )
    t.insert(orders)
    mv = MaterializedAggregate(t, f"{tmp_base}/mv", _agg)

    r1 = mv.refresh()
    assert r1["mode"] == "full"
    assert _got(mv) == _expect(t)

    # no new commits → noop
    assert mv.refresh()["mode"] == "noop"

    # upsert touching ONLY partition 'O' → exactly one partition recomputed
    ups = (
        orders.filter((F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 5 == 0))
        .withColumn("o_totalprice", F.col("o_totalprice") + 500.0)
        .withColumn("ver", F.lit(2))
    )
    t.upsert(ups)
    r2 = mv.refresh()
    assert r2["mode"] == "incremental"
    assert r2["partitions_recomputed"] == 1
    assert _got(mv) == _expect(t)

    # delete across partitions → all touched partitions recomputed, still exact
    t.delete(orders.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey"))
    r3 = mv.refresh()
    assert r3["mode"] == "incremental"
    assert _got(mv) == _expect(t)

    # drop a whole partition → its groups disappear from the matview
    t.delete_partition(["F"])
    r4 = mv.refresh()
    assert r4["mode"] == "incremental"
    got = _got(mv)
    assert got == _expect(t)
    assert all(row[0] != "F" for row in got)

    # clustering replace-commit: no logical change → refresh is a noop
    run_clustering(t, sort_columns=["o_orderkey"], target_file_rows=500)
    r5 = mv.refresh()
    assert r5["mode"] == "noop" and r5["partitions_recomputed"] == 0
    assert _got(mv) == _expect(t)
