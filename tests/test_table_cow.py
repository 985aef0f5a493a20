"""COW table semantics, replaying the reference's golden stock-ticks
walkthrough shape (FIXTURES.md F1: upsert flips max(ts) 10:29→10:59)."""

import pytest
from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig

SCHEMA = "key string, ts string, symbol string, close double, date string"

BATCH1 = [
    ("GOOG_1", "2018-08-31 10:29:00", "GOOG", 100.0, "2018/08/31"),
    ("MSFT_1", "2018-08-31 10:29:00", "MSFT", 200.0, "2018/08/31"),
    ("GOOG_2", "2018-08-30 09:00:00", "GOOG", 95.0, "2018/08/30"),
]
BATCH2 = [("GOOG_1", "2018-08-31 10:59:00", "GOOG", 105.0, "2018/08/31")]


@pytest.fixture()
def table(spark, tmp_base):
    cfg = TableConfig(
        name="stock",
        record_key=["key"],
        precombine="ts",
        partition_by=["date"],
        table_type="cow",
    )
    return LakehouseTable.create(spark, tmp_base + "/stock", cfg)


def goog_max(table):
    return (
        table.snapshot()
        .filter(F.col("symbol") == "GOOG")
        .agg(F.max("ts").alias("m"))
        .collect()[0]
        .m
    )


def test_golden_upsert_flip(spark, table):
    table.insert(spark.createDataFrame(BATCH1, SCHEMA))
    q_before = table.snapshot()  # planned against the pre-upsert manifest
    assert goog_max(table) == "2018-08-31 10:29:00"
    table.upsert(spark.createDataFrame(BATCH2, SCHEMA))
    assert goog_max(table) == "2018-08-31 10:59:00"
    assert table.snapshot().count() == 3  # upsert did not duplicate
    # snapshot isolation: a frame planned before the upsert still reads
    # the old file versions (they exist until clean)
    assert {
        r.ts for r in q_before.filter(F.col("key") == "GOOG_1").collect()
    } == {"2018-08-31 10:29:00"}


def test_incremental_returns_only_changed(spark, table):
    i1 = table.insert(spark.createDataFrame(BATCH1, SCHEMA))
    table.upsert(spark.createDataFrame(BATCH2, SCHEMA))
    inc = table.incremental(begin=i1.instant).collect()
    assert [(r.key, r.ts) for r in inc] == [("GOOG_1", "2018-08-31 10:59:00")]


def test_time_travel(spark, table):
    i1 = table.insert(spark.createDataFrame(BATCH1, SCHEMA))
    table.upsert(spark.createDataFrame(BATCH2, SCHEMA))
    old = table.snapshot(as_of=i1.instant)
    assert {r.ts for r in old.filter(F.col("key") == "GOOG_1").collect()} == {
        "2018-08-31 10:29:00"
    }


def test_delete_and_dup_invariant(spark, table):
    table.insert(spark.createDataFrame(BATCH1, SCHEMA))
    table.delete(spark.createDataFrame([("MSFT_1",)], "key string"))
    snap = table.snapshot(keep_meta=True)
    assert snap.count() == 2
    dups = snap.groupBy("_oh_record_key").count().filter("count > 1")
    assert dups.count() == 0


def test_delete_partition(spark, table):
    table.insert(spark.createDataFrame(BATCH1, SCHEMA))
    table.delete_partition(["2018/08/30"])
    assert {r.key for r in table.snapshot().collect()} == {"GOOG_1", "MSFT_1"}


def test_insert_overwrite_partition_only(spark, table):
    table.insert(spark.createDataFrame(BATCH1, SCHEMA))
    table.insert_overwrite(
        spark.createDataFrame(
            [("NEW_1", "2018-08-31 11:00:00", "NEW", 1.0, "2018/08/31")], SCHEMA
        )
    )
    keys = {r.key for r in table.snapshot().collect()}
    assert keys == {"NEW_1", "GOOG_2"}  # 08/30 partition untouched


def test_soft_delete_column(spark, tmp_base):
    cfg = TableConfig(
        name="soft",
        record_key=["key"],
        precombine="ts",
        soft_delete_col="_hoodie_is_deleted",
    )
    t = LakehouseTable.create(spark, tmp_base + "/soft", cfg)
    t.insert(
        spark.createDataFrame(
            [("a", "1", False), ("b", "1", False)],
            "key string, ts string, _hoodie_is_deleted boolean",
        )
    )
    t.upsert(
        spark.createDataFrame(
            [("b", "2", True)], "key string, ts string, _hoodie_is_deleted boolean"
        )
    )
    assert {r.key for r in t.snapshot().collect()} == {"a"}


def test_bulk_insert_sorted_ranges(spark, tmp_base):
    cfg = TableConfig(name="bulk", record_key=["id"])
    t = LakehouseTable.create(spark, tmp_base + "/bulk", cfg)
    df = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 100).alias("v")
    )
    t.bulk_insert(df, num_files=8)
    files = t.manifest.live_files()
    assert len(files) == 8
    # key ranges must be non-overlapping (sorted layout)
    ranges = sorted((f.key_min, f.key_max) for f in files)
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
    assert t.snapshot().count() == 10000


def test_orphan_clean_removes_uncommitted_files(spark, tmp_base):
    """A writer that dies between data write and commit publish leaves
    orphan parquet; run_orphan_clean removes it (after the grace
    window) without touching committed data."""
    import os

    from onehouse_demos_spark.tables.maintenance import run_orphan_clean

    t = LakehouseTable.create(
        spark, tmp_base + "/orph",
        TableConfig(name="orph", record_key=["id"], precombine="v"),
    )
    t.insert(spark.createDataFrame([(1, 1)], "id int, v int"))
    # simulate a crashed write: data landed, commit never published
    orphan_dir = os.path.join(t.base_path, "data", "99999999999999999999_dead")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-orphan.parquet")
    spark.createDataFrame([(9, 9)], "id int, v int").toPandas().to_parquet(orphan)
    os.utime(orphan, (0, 0))  # age it past the grace window

    assert t.snapshot().count() == 1  # invisible to readers either way
    removed = run_orphan_clean(t, min_age_s=60)
    assert removed and not os.path.exists(orphan)
    assert t.snapshot().count() == 1
    # fresh files survive the grace window
    fresh = os.path.join(orphan_dir, "part-fresh.parquet")
    spark.createDataFrame([(8, 8)], "id int, v int").toPandas().to_parquet(fresh)
    assert run_orphan_clean(t, min_age_s=3600) == []
    assert os.path.exists(fresh)


def test_reopen_table_from_disk(spark, tmp_base):
    """Cross-process persistence: a table reopened by path alone
    (config from the commit log) serves the same data and views."""
    path = tmp_base + "/reopen"
    t = LakehouseTable.create(
        spark,
        path,
        TableConfig(name="reopen", record_key=["id"], precombine="v",
                    partition_by=["p"], table_type="mor",
                    index_scope="global"),
    )
    t.insert(spark.createDataFrame([(1, "a", 1), (2, "b", 1)], "id int, p string, v int"))
    t.upsert(spark.createDataFrame([(1, "a", 2)], "id int, p string, v int"))

    t2 = LakehouseTable.load(spark, path)
    assert t2.config.record_key == ["id"]
    assert t2.config.table_type == "mor"
    assert t2.config.index_scope == "global"
    assert {r.id: r.v for r in t2.snapshot().collect()} == {1: 2, 2: 1}
    inc = t2.incremental(begin=t2.timeline.instants()[0].instant)
    assert {r.id for r in inc.collect()} == {1}


def test_snapshot_filtered_skips_files(spark, tmp_base):
    """Manifest column-stats data skipping: a range predicate on a
    clustered column scans only the files whose stats intersect it,
    with results identical to the unpruned filter."""
    t = LakehouseTable.create(
        spark, tmp_base + "/skip",
        TableConfig(name="skip", record_key=["id"], precombine="v"),
    )
    from onehouse_demos_spark.tables.maintenance import run_clustering

    df = spark.range(10_000).selectExpr("id", "1 AS v", "id AS metric")
    t.bulk_insert(df, num_files=8)
    # cluster by the filter column → disjoint per-file metric ranges
    # (the clustering ↔ data-skipping synergy)
    run_clustering(t, sort_columns=["metric"], target_file_rows=1250)
    total_files = len(t.manifest.live_files())
    assert total_files >= 8

    pruned = t.snapshot_filtered([("metric", ">=", 9000)])
    expected = t.snapshot().filter("metric >= 9000")
    assert sorted(r.id for r in pruned.collect()) == sorted(
        r.id for r in expected.collect()
    )
    assert len(pruned.inputFiles()) < total_files
    # equality predicate prunes to a single file
    one = t.snapshot_filtered([("metric", "=", 4242)])
    assert [r.id for r in one.collect()] == [4242]
    assert len(one.inputFiles()) == 1


def test_snapshot_filtered_merge_fallback(spark, tmp_base):
    """With live MOR logs, skipping must NOT change merge outcomes —
    the filtered read falls back to the full merge path."""
    t = LakehouseTable.create(
        spark, tmp_base + "/skipmor",
        TableConfig(name="skipmor", record_key=["id"], precombine="v",
                    table_type="mor"),
    )
    t.insert(spark.createDataFrame([(1, 1, 100), (2, 1, 200)], "id int, v int, metric int"))
    # log row moves id=2's metric OUT of the filter range
    t.upsert(spark.createDataFrame([(2, 2, 50)], "id int, v int, metric int"))
    rows = t.snapshot_filtered([("metric", ">=", 150)]).collect()
    assert rows == []  # id=2's latest version (50) fails the filter


def test_upsert_null_partition_value_no_duplicate(spark, tmp_base):
    """Regression: a NULL partition value must route through
    __HIVE_DEFAULT_PARTITION__ on BOTH the write and probe side —
    concat_ws skips nulls, so an un-normalized expr yields "" on the
    probe, misses the file in pruning, and the upsert leaves the old
    row behind (duplicate key)."""
    from onehouse_demos_spark import LakehouseTable, TableConfig

    t = LakehouseTable.create(
        spark,
        tmp_base + "/nullpart",
        TableConfig(name="nullpart", record_key=["id"], precombine="ver",
                    partition_by=["p"]),
    )
    t.insert(spark.createDataFrame(
        [(1, "a", 10, 1), (2, None, 20, 1)], "id int, p string, v int, ver int"))
    t.upsert(spark.createDataFrame(
        [(2, None, 25, 2)], "id int, p string, v int, ver int"))
    raw = t.snapshot(keep_meta=True)
    assert raw.count() == 2
    assert raw.groupBy("_oh_record_key").count().filter("count > 1").count() == 0
    assert {r.id: r.v for r in t.snapshot().collect()} == {1: 10, 2: 25}
    # delete by bare key in the null partition also hits the right file
    t.delete(spark.createDataFrame([(2, None)], "id int, p string"))
    assert {r.id for r in t.snapshot().collect()} == {1}


def test_stats_harvest_executor_path(spark, tmp_base):
    """A commit writing more than DRIVER_HARVEST_MAX_FILES parquet
    files harvests footers via a Spark job (executor-side) and must
    produce the same manifest stats as the driver fast-path."""
    from onehouse_demos_spark import LakehouseTable, TableConfig
    from pyspark.sql import functions as F

    t = LakehouseTable.create(
        spark, tmp_base + "/many",
        TableConfig(name="many", record_key=["id"], precombine="v"),
    )
    df = spark.range(5000).select(
        F.col("id").cast("int"), F.lit(1).alias("v")
    ).repartition(24)
    inst = t.insert(df)
    assert len(inst.adds) == 24
    assert sum(f.rows for f in inst.adds) == 5000
    # key-range stats present per file (what pruning depends on)
    assert all(f.key_min is not None and f.key_max is not None
               for f in inst.adds if f.rows > 0)
    assert t.snapshot().count() == 5000


def test_write_path_persist_released(spark, tmp_base):
    """r14: _write_files persists the merge result across the
    repartitionByRange sampling + write jobs (one compute instead of
    two); the persist must be RELEASED once the commit's files are on
    disk — a leaked cache would accumulate table-sized blocks across
    commits. The session is shared across the whole test run and other
    suites legitimately hold long-lived persists (e.g. operator
    signature frames), so assert on NEW cache entries relative to a
    pre-write snapshot, not on the global count."""
    from pyspark.sql import functions as F

    from onehouse_demos_spark import LakehouseTable, TableConfig

    def persistent_ids() -> set[int]:
        jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
        return {
            it.next()._1()
            for it in [jmap.iterator()]
            for _ in range(jmap.size())
        }

    before = persistent_ids()
    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/t",
        TableConfig(name="persist_t", record_key=["id"], precombine="ver"),
    )
    df = spark.range(0, 1000).select(
        F.col("id"), F.lit(1).alias("ver"), F.col("id").alias("v")
    )
    t.insert(df)
    t.upsert(df.withColumn("ver", F.lit(2)).withColumn("v", F.col("v") + 1))
    t.delete(spark.range(0, 10).select("id"))
    leaked = persistent_ids() - before
    assert not leaked, (
        f"write-path persist leaked across commits: RDD ids {leaked}"
    )
    assert t.snapshot().count() == 990
