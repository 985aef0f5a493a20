"""Savepoint + restore table services (reference: hudi-cli savepoint /
restore): pin a commit against cleaning, roll the table back to it,
and refuse restores whose files are provably gone."""

import os

import pytest

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.tables.maintenance import (
    RestoreError,
    create_savepoint,
    run_clean,
    run_restore,
)


def _mk(spark, tmp_base):
    t = LakehouseTable.create(
        spark,
        tmp_base + "/t",
        TableConfig(name="t", record_key=["id"], precombine="ver"),
    )
    ddl = "id int, ver int, v string"
    i1 = t.insert(spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], ddl))
    i2 = t.upsert(spark.createDataFrame([(1, 2, "a2")], ddl))
    i3 = t.upsert(spark.createDataFrame([(2, 2, "b2"), (3, 1, "c")], ddl))
    return t, i1.instant, i2.instant, i3.instant


def test_restore_rolls_back_state_and_files(spark, tmp_base):
    t, i1, i2, i3 = _mk(spark, tmp_base)
    assert {r.v for r in t.snapshot().collect()} == {"a2", "b2", "c"}
    added_by_i3 = [
        f.path for i in t.timeline.instants() if i.instant == i3 for f in i.adds
    ]
    res = run_restore(t, i2)
    assert res["restored_to"] == i2 and i3 in res["removed_instants"]
    assert {r.v for r in t.snapshot().collect()} == {"a2", "b"}
    assert t.timeline.latest_instant() == i2
    for rel in added_by_i3:
        assert not os.path.exists(os.path.join(t.base_path, rel))
    # the table keeps working after restore
    t.upsert(spark.createDataFrame([(9, 1, "z")], "id int, ver int, v string"))
    assert {r.v for r in t.snapshot().collect()} == {"a2", "b", "z"}


def test_restore_refuses_unknown_and_cleaned_targets(spark, tmp_base):
    t, i1, i2, i3 = _mk(spark, tmp_base)
    with pytest.raises(RestoreError):
        run_restore(t, "00000000000000000000")
    # aggressive clean removes the files i1's snapshot needs
    for n in range(4, 9):
        t.upsert(spark.createDataFrame(
            [(1, n, f"a{n}")], "id int, ver int, v string"))
    run_clean(t, keep_last_commits=2)
    with pytest.raises(RestoreError):
        run_restore(t, i1)


def test_savepoint_pins_files_against_clean(spark, tmp_base):
    t, i1, i2, i3 = _mk(spark, tmp_base)
    create_savepoint(t, i1)
    for n in range(4, 12):
        t.upsert(spark.createDataFrame(
            [(1, n, f"a{n}")], "id int, ver int, v string"))
    run_clean(t, keep_last_commits=2)
    # the savepointed snapshot still reads in full
    assert {r.v for r in t.snapshot(as_of=i1).collect()} == {"a", "b"}
    # and restore to the savepoint works even after the clean
    run_restore(t, i1)
    assert {r.v for r in t.snapshot().collect()} == {"a", "b"}


def test_savepoint_restore_sql(spark, tmp_base):
    from onehouse_demos_spark.sql import Engine

    eng = Engine(spark, tmp_base + "/wh")
    eng.sql(
        "CREATE TABLE sp (id INT, ver INT, v STRING) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id, preCombineField=ver)"
    )
    eng.sql("INSERT INTO sp VALUES (1, 1, 'x')")
    saved = eng.sql("SAVEPOINT TABLE sp").collect()[0].savepointed_instant
    eng.sql("INSERT INTO sp VALUES (2, 1, 'y')")
    assert eng.sql("SELECT * FROM sp").count() == 2
    res = eng.sql(f"RESTORE TABLE sp TO '{saved}'").collect()[0]
    assert res.restored_to == saved and res.removed_instants >= 1
    assert [r.v for r in eng.sql("SELECT * FROM sp").collect()] == ["x"]


def test_changes_feed_classifies_insert_update_delete(spark, tmp_base):
    """CDC read view: (begin, end] window surfaces inserts, real
    updates (precombine moved), and deletes with the key witness;
    untouched keys stay out of the feed."""
    t = LakehouseTable.create(
        spark,
        tmp_base + "/chg",
        TableConfig(name="chg", record_key=["id"], precombine="ver"),
    )
    ddl = "id int, ver int, v string"
    i1 = t.insert(spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")], ddl))
    t.upsert(spark.createDataFrame([(2, 2, "b2"), (4, 1, "d")], ddl))
    t.delete(spark.createDataFrame([(3,)], "id int"))
    feed = t.changes(begin=i1.instant).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r._change_type, []).append(r)
    assert {r.id for r in by_type["insert"]} == {4}
    assert {r.id for r in by_type["update"]} == {2}
    assert by_type["update"][0].v == "b2"
    deletes = by_type["delete"]
    assert len(deletes) == 1 and deletes[0].id is None
    assert deletes[0]._oh_record_key == "3"
    # key 1 never changed → absent from the feed
    assert all(r.id != 1 for r in feed)
    # begin=None → everything is an insert (bootstrap semantics)
    boot = t.changes(begin=None)
    assert boot.filter("_change_type <> 'insert'").count() == 0
    assert boot.count() == 3


def test_changes_feed_surfaces_precombine_stable_updates(spark, tmp_base):
    """Upsert contract is latest-commit-wins regardless of precombine,
    so an update that changes payload columns while keeping the
    precombine value constant MUST appear in the change feed (r2
    ADVICE: the old precombine-only comparison silently dropped it).
    Untouched carried rows must still stay out (they keep their
    original commit stamp through COW rewrites)."""
    t = LakehouseTable.create(
        spark,
        tmp_base + "/chg2",
        TableConfig(name="chg2", record_key=["id"], precombine="ver"),
    )
    ddl = "id int, ver int, v string"
    i1 = t.insert(spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")], ddl))
    # payload changes, precombine stays at 1 — latest commit wins
    t.upsert(spark.createDataFrame([(2, 1, "b-NEW")], ddl))
    feed = t.changes(begin=i1.instant).collect()
    assert {(r._change_type, r.id) for r in feed} == {("update", 2)}
    assert feed[0].v == "b-NEW"
    # feed from the post-update instant onward is empty (no-op window)
    assert t.changes(begin=t.timeline.latest_instant()).count() == 0


def test_file_sizing_packs_small_files(spark, tmp_base):
    """Many tiny commits leave a small-file tail; run_file_sizing packs
    them in ONE replace-commit, preserves every row, stays invisible to
    incremental readers, and leaves right-sized files alone."""
    from onehouse_demos_spark.tables.maintenance import run_file_sizing

    t = LakehouseTable.create(
        spark,
        tmp_base + "/fs",
        TableConfig(name="fs", record_key=["id"], precombine="ver",
                    target_file_rows=1000),
    )
    ddl = "id int, ver int, v string"
    for b in range(6):  # 6 commits × 10 rows → 6 tiny files
        t.insert(spark.createDataFrame(
            [(b * 10 + i, 1, f"v{b}") for i in range(10)], ddl))
    last_data = t.timeline.latest_instant()
    n_before = len(t.manifest.live_files(include_logs=False))
    assert n_before >= 6
    inst = run_file_sizing(t)
    assert inst is not None and inst.operation == "file_sizing"
    n_after = len(t.manifest.live_files(include_logs=False))
    assert n_after < n_before
    assert t.snapshot().count() == 60
    assert {r.id for r in t.snapshot().collect()} == set(range(60))
    # replace-commit is invisible to incremental readers
    assert t.incremental(begin=last_data).count() == 0
    # idempotent: a second pass finds nothing left to pack
    assert run_file_sizing(t) is None
