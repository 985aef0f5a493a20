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


def test_matview_null_partition_rows_survive_incremental(spark, tmp_base):
    """NULL-partition groups must survive incremental refresh: the
    splice key is coalesced on both the keep- and recompute-side so
    null-partition rows are recomputed and retained symmetrically."""
    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/np",
        TableConfig(
            name="np", record_key=["id"], precombine="ver", partition_by=["p"]
        ),
    )

    def agg(df):
        return df.groupBy("p").agg(F.sum("v").alias("s"))

    rows = [(1, "a", 10, 1), (2, None, 20, 1), (3, None, 30, 1)]
    t.insert(spark.createDataFrame(rows, "id int, p string, v int, ver int"))
    mv = MaterializedAggregate(t, f"{tmp_base}/np_mv", agg)
    mv.refresh()
    got = {r.p: r.s for r in mv.read().collect()}
    assert got == {"a": 10, None: 50}

    # touch ONLY the real partition — null groups must not vanish
    t.upsert(spark.createDataFrame([(1, "a", 11, 2)],
                                   "id int, p string, v int, ver int"))
    r = mv.refresh()
    assert r["mode"] == "incremental"
    got = {r_.p: r_.s for r_ in mv.read().collect()}
    assert got == {"a": 11, None: 50}

    # touch ONLY the null partition — it must be recomputed, not doubled
    t.upsert(spark.createDataFrame([(2, None, 25, 2)],
                                   "id int, p string, v int, ver int"))
    r = mv.refresh()
    assert r["mode"] == "incremental"
    got = {r_.p: r_.s for r_ in mv.read().collect()}
    assert got == {"a": 11, None: 55}


def test_matview_on_mor_table_across_compaction(spark, tmp_base):
    """A materialized aggregate over a MOR table: log-merged rows feed
    the refresh, compaction's replace-commit is a no-op, and the
    materialization always equals a full recompute of the merged view."""
    from onehouse_demos_spark.tables.maintenance import run_compaction

    orders = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    ).withColumn("ver", F.lit(1))
    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/orders_mor_mv",
        TableConfig(
            name="orders_mor_mv",
            record_key=["o_orderkey"],
            precombine="ver",
            partition_by=["o_orderstatus"],
            table_type="mor",
        ),
    )
    t.insert(orders)
    mv = MaterializedAggregate(t, f"{tmp_base}/mor_mv", _agg)
    assert mv.refresh()["mode"] == "full"
    assert _got(mv) == _expect(t)
    # MOR upsert (log append) on one partition → incremental refresh
    ups = (
        orders.filter(
            (F.col("o_orderstatus") == "O") & (F.col("o_orderkey") % 7 == 0)
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + 5.0)
        .withColumn("ver", F.lit(2))
    )
    t.upsert(ups)
    r = mv.refresh()
    assert r["mode"] == "incremental"
    assert _got(mv) == _expect(t)
    # compaction rewrites files without changing rows → refresh no-op
    run_compaction(t)
    assert mv.refresh()["mode"] == "noop"
    assert _got(mv) == _expect(t)
