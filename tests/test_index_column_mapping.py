"""Record/secondary/expression indexes under column mapping (VERDICT
r7 #4): `ALTER TABLE RENAME COLUMN` freezes physical names, and index
entries are facts about PHYSICAL file contents — so a renamed indexed
column must keep its index (dir keyed by physical name, config
re-keyed to the new logical name), the record key must refuse renames
(it is a protected column), and the expression index must degrade to
the stats fallback without ever returning a wrong row.
"""

import pytest
from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.tables.table import SchemaEvolutionError

SCHEMA = "key string, ts string, symbol string, close double"
ROWS = [
    ("K1", "t1", "GOOG", 100.0),
    ("K2", "t1", "MSFT", 200.0),
    ("K3", "t1", "GOOG", 300.0),
    ("K4", "t1", "AAPL", 400.0),
]


def _table(spark, base, **kw):
    cfg = TableConfig(
        name="cm",
        record_key=["key"],
        precombine="ts",
        table_type="cow",
        record_index=True,
        record_index_buckets=8,
        **kw,
    )
    return LakehouseTable.create(spark, base + "/cm", cfg)


def test_record_key_rename_refused(spark, tmp_base):
    """The record key is a protected column: renaming it would detach
    every index entry and the key-extraction expression — the clean
    documented behavior is a refusal, not a silent gap."""
    t = _table(spark, tmp_base)
    t.insert(spark.createDataFrame(ROWS, SCHEMA))
    with pytest.raises(SchemaEvolutionError, match="cannot be renamed"):
        t.rename_column("key", "key2")
    # index still exact after the refused DDL
    t.upsert(spark.createDataFrame([("K1", "t2", "GOOG", 111.0)], SCHEMA))
    got = {(r.key, r.close) for r in t.snapshot().collect()}
    assert ("K1", 111.0) in got and ("K1", 100.0) not in got


def test_secondary_index_survives_rename(spark, tmp_base):
    """Rename an indexed column: entries stay valid (physical name
    frozen), pruning works under the NEW logical name immediately,
    maintenance continues across later commits, and a reload from
    persisted config reattaches the same index."""
    t = _table(spark, tmp_base, secondary_indexes=["symbol"])
    t.insert(spark.createDataFrame(ROWS, SCHEMA))
    t.rename_column("symbol", "ticker")
    assert list(t.secondary_indexes) == ["ticker"]
    # prune under the new name — same persisted entries answer
    got = {
        r.key for r in t.snapshot_filtered([("ticker", "=", "GOOG")]).collect()
    }
    assert got == {"K1", "K3"}
    # maintenance after the rename reads the PHYSICAL column from new
    # files: a post-rename upsert stays covered and exact
    t.upsert(
        spark.createDataFrame(
            [("K5", "t2", "GOOG", 500.0)], "key string, ts string, "
            "ticker string, close double"
        )
    )
    got = {
        r.key for r in t.snapshot_filtered([("ticker", "=", "GOOG")]).collect()
    }
    assert got == {"K1", "K3", "K5"}
    # coverage never gapped: the index (not a scan fallback) answered
    p2i = t._path_instants()
    files = t.manifest.live_files(include_logs=False)
    idx = t.secondary_indexes["ticker"]
    assert idx.covered_instants() >= set(p2i.values())
    hits = idx.files_for_value(spark, "GOOG", files, p2i)
    assert hits is not None and hits
    # reload from persisted config: same dir (physical-keyed), exact
    t2 = LakehouseTable.load(spark, t.base_path)
    assert list(t2.secondary_indexes) == ["ticker"]
    assert t2.secondary_indexes["ticker"].dir == idx.dir
    got = {
        r.key
        for r in t2.snapshot_filtered([("ticker", "=", "MSFT")]).collect()
    }
    assert got == {"K2"}


def test_double_rename_keeps_one_index_dir(spark, tmp_base):
    """a -> b -> c: the physical name is still 'a'; both renames land
    on the same persisted index."""
    t = _table(spark, tmp_base, secondary_indexes=["symbol"])
    t.insert(spark.createDataFrame(ROWS, SCHEMA))
    d0 = t.secondary_indexes["symbol"].dir
    t.rename_column("symbol", "sym_b")
    t.rename_column("sym_b", "sym_c")
    assert t.secondary_indexes["sym_c"].dir == d0
    got = {
        r.key for r in t.snapshot_filtered([("sym_c", "=", "AAPL")]).collect()
    }
    assert got == {"K4"}


def test_create_index_after_rename_uses_physical_column(spark, tmp_base):
    """CREATE INDEX on an already-renamed column: the backfill must
    read the PHYSICAL column from old files (the logical name does
    not exist in any parquet footer)."""
    t = _table(spark, tmp_base)
    t.insert(spark.createDataFrame(ROWS, SCHEMA))
    t.rename_column("symbol", "ticker")
    t.create_secondary_index("ticker")
    got = {
        r.key for r in t.snapshot_filtered([("ticker", "=", "GOOG")]).collect()
    }
    assert got == {"K1", "K3"}
    p2i = t._path_instants()
    idx = t.secondary_indexes["ticker"]
    assert idx.covered_instants() >= set(p2i.values())


def test_expression_index_survives_unrelated_rename(spark, tmp_base):
    """r9 (VERDICT r8 ask #8): renaming a column the expression does
    NOT reference keeps maintenance live — the leaf writer aliases
    physical file columns back to logical names, post-rename commits
    stay covered, and the probe still prunes through the index."""
    t = _table(spark, tmp_base)
    t.insert(spark.createDataFrame(ROWS, SCHEMA))
    t.create_expression_index("upper(symbol)")
    got = {
        r.key
        for r in t.snapshot_filtered([("upper(symbol)", "=", "GOOG")]).collect()
    }
    assert got == {"K1", "K3"}
    t.rename_column("close", "px")  # unrelated column; mapping active
    t.upsert(
        spark.createDataFrame(
            [("K5", "t2", "GOOG", 500.0)],
            "key string, ts string, symbol string, px double",
        )
    )
    idx = t.expression_indexes["upper(symbol)"]
    p2i = t._path_instants()
    assert idx.covered_instants() >= set(p2i.values())  # NO gap
    got = {
        r.key
        for r in t.snapshot_filtered([("upper(symbol)", "=", "GOOG")]).collect()
    }
    assert got == {"K1", "K3", "K5"}  # index-pruned read, new row seen


def test_expression_index_survives_referenced_rename_roundtrip(
    spark, tmp_base
):
    """Renaming the column the expression references AND BACK: while
    broken, maintenance pauses (coverage gap → fallback, never a lie);
    once the name resolves again, maintenance resumes."""
    t = _table(spark, tmp_base)
    t.insert(spark.createDataFrame(ROWS, SCHEMA))
    t.create_expression_index("upper(symbol)")
    t.rename_column("symbol", "ticker")  # breaks the stored expression
    t.upsert(
        spark.createDataFrame(
            [("K5", "t2", "GOOG", 500.0)],
            "key string, ts string, ticker string, close double",
        )
    )
    idx = t.expression_indexes["upper(symbol)"]
    p2i = t._path_instants()
    assert not (idx.covered_instants() >= set(p2i.values()))  # gap open
    # the analogous predicate on the NEW name still answers exactly
    # (row-level filter; the stale index text can't serve it)
    got = {
        r.key
        for r in t.snapshot_filtered([("upper(ticker)", "=", "GOOG")]).collect()
    }
    assert got == {"K1", "K3", "K5"}


def test_create_index_validation_failure_leaves_config_clean(spark, tmp_base):
    """ADVICE r7: a typo'd CREATE INDEX must fail the statement and
    leave NO persisted index entry behind — later commits must not
    inherit a maintenance read of a missing column."""
    t = _table(spark, tmp_base)
    t.insert(spark.createDataFrame(ROWS, SCHEMA))
    with pytest.raises(ValueError, match="no such column"):
        t.create_secondary_index("symbl")  # typo
    with pytest.raises(Exception):
        t.create_expression_index("upper(nonexistent_col)")
    assert t.config.secondary_indexes == []
    assert t.config.expression_indexes == []
    t2 = LakehouseTable.load(spark, t.base_path)
    assert t2.config.secondary_indexes == []
    assert t2.config.expression_indexes == []
    # writes keep working (the poisoned-config failure mode)
    t.upsert(spark.createDataFrame([("K1", "t2", "GOOG", 111.0)], SCHEMA))
    assert {r.close for r in t.snapshot().filter(F.col("key") == "K1").collect()} == {111.0}
