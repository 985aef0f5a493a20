"""MOR semantics: _ro/_rt divergence and compaction convergence
(reference README.md:756-776, 1196-1216)."""

import pytest
from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.tables.maintenance import (
    run_archival,
    run_clean,
    run_clustering,
    run_compaction,
    schedule_compaction,
)

SCHEMA = "key string, ts string, symbol string, close double, date string"
BATCH1 = [
    ("GOOG_1", "2018-08-31 10:29:00", "GOOG", 100.0, "2018/08/31"),
    ("MSFT_1", "2018-08-31 10:29:00", "MSFT", 200.0, "2018/08/31"),
    ("GOOG_2", "2018-08-30 09:00:00", "GOOG", 95.0, "2018/08/30"),
]
BATCH2 = [("GOOG_1", "2018-08-31 10:59:00", "GOOG", 105.0, "2018/08/31")]


@pytest.fixture()
def mor(spark, tmp_base):
    cfg = TableConfig(
        name="stock_mor",
        record_key=["key"],
        precombine="ts",
        partition_by=["date"],
        table_type="mor",
    )
    t = LakehouseTable.create(spark, tmp_base + "/mor", cfg)
    t.insert(spark.createDataFrame(BATCH1, SCHEMA))
    t.upsert(spark.createDataFrame(BATCH2, SCHEMA))
    return t


def goog_max_ts(df):
    return df.filter(F.col("symbol") == "GOOG").agg(F.max("ts").alias("m")).collect()[0].m


def test_ro_rt_divergence(mor):
    assert goog_max_ts(mor.read_optimized()) == "2018-08-31 10:29:00"
    assert goog_max_ts(mor.snapshot()) == "2018-08-31 10:59:00"


def test_compaction_converges_and_is_incremental_invisible(spark, mor):
    n_commits_before = len(mor.timeline.instants())
    plan = schedule_compaction(mor)
    assert plan.partitions == ["2018/08/31"]  # only partition with logs
    run_compaction(mor, plan)
    assert goog_max_ts(mor.read_optimized()) == "2018-08-31 10:59:00"
    assert mor.snapshot().count() == 3
    # incremental consumers see only the two record commits
    inc = mor.incremental(begin=None, keep_meta=True)
    commits = {r["_oh_commit_time"] for r in inc.select("_oh_commit_time").collect()}
    record_commits = {
        i.instant for i in mor.timeline.instants() if i.action in ("commit", "deltacommit")
    }
    assert commits <= record_commits
    assert len(mor.timeline.instants()) == n_commits_before + 1


def test_mor_delete_tombstone(spark, mor):
    mor.delete(
        spark.createDataFrame([("MSFT_1", "2018/08/31")], "key string, date string")
    )
    assert {r.key for r in mor.snapshot().collect()} == {"GOOG_1", "GOOG_2"}
    # _ro still shows it (base untouched) until compaction
    assert {r.key for r in mor.read_optimized().collect()} == {
        "GOOG_1",
        "MSFT_1",
        "GOOG_2",
    }
    run_compaction(mor)
    assert {r.key for r in mor.read_optimized().collect()} == {"GOOG_1", "GOOG_2"}


def test_reinsert_after_delete_resurrects(spark, mor):
    mor.delete(
        spark.createDataFrame([("GOOG_1", "2018/08/31")], "key string, date string")
    )
    assert {r.key for r in mor.snapshot().collect()} == {"MSFT_1", "GOOG_2"}
    mor.upsert(
        spark.createDataFrame(
            [("GOOG_1", "2018-08-31 12:00:00", "GOOG", 110.0, "2018/08/31")], SCHEMA
        )
    )
    snap = {r.key: r.ts for r in mor.snapshot().collect()}
    assert snap["GOOG_1"] == "2018-08-31 12:00:00"


def test_clustering_preserves_data(spark, mor):
    run_compaction(mor)
    before = sorted((r.key, r.ts) for r in mor.snapshot().collect())
    run_clustering(mor, sort_columns=["key"], target_file_rows=2)
    after = sorted((r.key, r.ts) for r in mor.snapshot().collect())
    assert before == after


def test_clean_removes_replaced_files(spark, mor):
    run_compaction(mor)
    deleted = run_clean(mor, keep_last_commits=1)
    assert deleted  # replaced base+log files physically removed
    assert mor.snapshot().count() == 3


def test_archival_keeps_manifest_correct(spark, mor):
    run_compaction(mor)
    moved = run_archival(mor, keep_last=1)
    assert moved >= 2
    assert mor.snapshot().count() == 3


def test_conf_steered_incremental_across_compaction(spark, mor):
    """Reference Q14 + O19: `consume.mode=INCREMENTAL` with
    `max.commits` counting the compaction replace-commit in the chain
    while contributing no records (README.md:966-984, 1224-1227)."""
    begin = mor.timeline.instants()[0].instant  # after batch 1
    run_compaction(mor)
    pfx = f"onehouse.{mor.config.name}.consume."
    spark.conf.set(pfx + "mode", "INCREMENTAL")
    spark.conf.set(pfx + "start.timestamp", begin)
    # max.commits=2 covers the upsert deltacommit AND the compaction
    # replace-commit; result must be exactly the one upserted row.
    spark.conf.set(pfx + "max.commits", "2")
    try:
        rows = mor.read().collect()
        assert [(r.key, r.ts) for r in rows] == [
            ("GOOG_1", "2018-08-31 10:59:00")
        ]
        # default mode (no conf) = snapshot
        spark.conf.unset(pfx + "mode")
        assert mor.read().count() == 3
        # read-optimized steering
        spark.conf.set(pfx + "mode", "READ_OPTIMIZED")
        assert mor.read().count() == 3  # post-compaction: converged
    finally:
        for k in ("mode", "start.timestamp", "max.commits"):
            try:
                spark.conf.unset(pfx + k)
            except Exception:
                pass


def test_zorder_clustering_prunes_on_trailing_column(spark, tmp_base):
    """Linear sort by (A, B) gives every file the full range of B →
    zero file skipping on B-predicates. Z-order interleaves A and B so
    min/max stats prune on BOTH columns; results stay identical."""
    from onehouse_demos_spark.tables.manifest import Manifest
    from onehouse_demos_spark.tables.table import LakehouseTable, TableConfig

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).withColumn("ver", F.lit(1))

    def build(name, strategy):
        t = LakehouseTable.create(
            spark,
            f"{tmp_base}/{name}",
            TableConfig(name=name, record_key=["o_orderkey"], precombine="ver"),
        )
        t.insert(orders)
        run_clustering(
            t,
            sort_columns=["o_totalprice", "o_custkey"],
            target_file_rows=100,
            strategy=strategy,
        )
        return t

    lin = build("z_lin", "linear")
    zor = build("z_zor", "zorder")
    mid = orders.agg(F.expr("percentile_approx(o_custkey, 0.5)")).collect()[0][0]
    filters = [("o_custkey", "<", float(mid))]

    def pruned_fraction(t):
        files = t.manifest.live_files(include_logs=False)
        kept = Manifest.prune_by_col_stats(files, filters)
        return len(files), len(kept)

    n_lin, kept_lin = pruned_fraction(lin)
    n_zor, kept_zor = pruned_fraction(zor)
    assert n_lin > 4 and n_zor > 4  # enough files for skipping to matter
    # z-order must skip files on the trailing column; linear cannot.
    assert kept_zor < n_zor, (n_zor, kept_zor)
    assert (kept_zor / n_zor) < (kept_lin / n_lin)
    # correctness: filtered snapshot identical across strategies
    a = sorted(r.o_orderkey for r in lin.snapshot_filtered(filters).collect())
    b = sorted(r.o_orderkey for r in zor.snapshot_filtered(filters).collect())
    assert a == b and len(a) > 0
