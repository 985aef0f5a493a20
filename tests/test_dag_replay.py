"""Workload-DAG replay harness — the reference's test strategy
(SURVEY §5: Hudi integ-test-suite DAGs of typed nodes with
self-validation: `ValidateDatasetNode` compares full table contents
against accumulated input; dup-key invariant
`deltastreamer-hive-sync-presto.yaml:66-67`).

A seeded random sequence of insert / upsert / delete / delete_partition
/ compact / cluster nodes runs against a LakehouseTable while a plain
python dict maintains the expected state. After EVERY node: full
content equality + no-duplicate-keys invariant. Runs for both COW and
MOR tables (the reference's scenario matrix axis, §5.4).
"""

import random

import pytest
from pyspark.sql import functions as F

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.tables.maintenance import (
    create_savepoint,
    run_clean,
    run_clustering,
    run_compaction,
    run_file_sizing,
    run_restore,
)

SCHEMA = "rk string, ver int, payload string, part string"
PARTS = ["p0", "p1", "p2"]


def gen_rows(rng, n, keyspace, ver):
    """Partition derives from the key (reference DAG datagen keeps a
    record's partition stable): with a partition-scoped index — same as
    Hudi's default — a key that MOVED partitions would leave its stale
    row in the old partition, which a dict oracle can't model."""
    rows = []
    for _ in range(n):
        k = rng.randrange(keyspace)
        rows.append(
            (f"k{k}", ver, f"v{rng.randrange(1_000_000)}", f"p{k % 3}")
        )
    return rows


def dedupe_batch(rows):
    """Per-batch precombine: highest ver wins; later row wins ties
    (mirrors _dedupe_incoming)."""
    out = {}
    for rk, ver, payload, part in rows:
        if rk not in out or ver >= out[rk][1]:
            out[rk] = (rk, ver, payload, part)
    return list(out.values())


def table_state(table):
    return {
        r.rk: (r.rk, r.ver, r.payload, r.part)
        for r in table.snapshot().collect()
    }


def check(table, expected, step):
    actual = table_state(table)
    assert actual == expected, (
        f"step {step}: state mismatch "
        f"(missing={set(expected) - set(actual)}, "
        f"extra={set(actual) - set(expected)}, "
        f"diff={[k for k in set(actual) & set(expected) if actual[k] != expected[k]][:5]})"
    )
    dups = (
        table.snapshot(keep_meta=True)
        .groupBy("_oh_record_key")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0, f"step {step}: duplicate keys"


@pytest.mark.parametrize("table_type,seed,buckets", [
    ("cow", 42, None), ("mor", 42, None),
    ("cow", 1337, None), ("mor", 1337, None),
    # r8: the bucket-index layout through the FULL op matrix —
    # hash-routed writes must survive delete_partition, overwrite,
    # compaction, clustering, sizing, clean, and restore with the
    # same exact state as the dict oracle at every step.
    ("cow", 42, 8), ("mor", 1337, 8),
])
def test_dag_replay(spark, tmp_base, table_type, seed, buckets):
    rng = random.Random(seed)
    table = LakehouseTable.create(
        spark,
        f"{tmp_base}/dag_{table_type}_{seed}_{buckets}",
        TableConfig(
            name=f"dag_{table_type}",
            record_key=["rk"],
            precombine="ver",
            partition_by=["part"],
            table_type=table_type,
            bucket_index_buckets=buckets,
        ),
    )
    expected: dict[str, tuple] = {}
    ver = 0
    ops = ["insert", "upsert", "savepoint", "upsert", "delete", "compact",
           "cluster", "sizing", "delete_partition", "upsert", "overwrite",
           "insert", "delete", "compact", "clean", "restore", "upsert"]
    sp_instant = None
    sp_state: dict[str, tuple] = {}
    for step, op in enumerate(ops):
        ver += 1
        if op == "insert":
            # insert semantics: append; to keep the dict oracle exact we
            # insert only previously-unseen keys (reference DAGs configure
            # inserts over fresh key ranges the same way)
            rows = [
                r
                for r in dedupe_batch(gen_rows(rng, 40, 500, ver))
                if r[0] not in expected
            ]
            if rows:
                table.insert(spark.createDataFrame(rows, SCHEMA))
                expected.update({r[0]: r for r in rows})
        elif op == "upsert":
            rows = dedupe_batch(gen_rows(rng, 60, 500, ver))
            table.upsert(spark.createDataFrame(rows, SCHEMA))
            # commit-order-wins across commits (incoming replaces)
            expected.update({r[0]: r for r in rows})
        elif op == "delete":
            keys = [k for k in sorted(expected) if rng.random() < 0.3]
            if keys:
                table.delete(
                    spark.createDataFrame([(k,) for k in keys], "rk string")
                )
                for k in keys:
                    expected.pop(k)
        elif op == "delete_partition":
            part = rng.choice(PARTS)
            table.delete_partition([part])
            expected = {k: v for k, v in expected.items() if v[3] != part}
        elif op == "overwrite":
            # insert_overwrite replaces exactly one partition's
            # contents; keys come from a dedicated range so the
            # partition-scoped index semantics (same as Hudi's default)
            # keep the global dup-key invariant intact.
            part = rng.choice(PARTS)
            rows = dedupe_batch(
                [
                    (f"ow{rng.randrange(100)}_{part}", ver,
                     f"v{rng.randrange(1_000_000)}", part)
                    for _ in range(20)
                ]
            )
            table.insert_overwrite(spark.createDataFrame(rows, SCHEMA))
            expected = {k: v for k, v in expected.items() if v[3] != part}
            expected.update({r[0]: r for r in rows})
        elif op == "compact":
            run_compaction(table)
        elif op == "clean":
            # physical retention: state must be unaffected, and files
            # the savepoint pins must survive the horizon
            run_clean(table, keep_last_commits=3)
        elif op == "cluster":
            run_clustering(table, sort_columns=["rk"], target_file_rows=100)
        elif op == "sizing":
            run_file_sizing(table)  # layout-only: state unchanged
        elif op == "savepoint":
            sp_instant = create_savepoint(table)
            sp_state = dict(expected)
        elif op == "restore":
            # roll back through every mutation since the savepoint —
            # including a clean that ran in between (pinning must have
            # preserved the files the savepointed snapshot needs)
            assert sp_instant is not None
            run_restore(table, sp_instant)
            expected = dict(sp_state)
        check(table, expected, f"{step}:{op}")

    # final cross-view consistency: RO after full compaction == snapshot
    run_compaction(table)
    ro = {r.rk for r in table.read_optimized().collect()}
    assert ro == set(expected)


def test_dag_replay_incremental_chain(spark, tmp_base):
    """Incremental consumers replaying every commit range must
    reconstruct the final state (reference O18/O19 semantics)."""
    rng = random.Random(7)
    table = LakehouseTable.create(
        spark,
        f"{tmp_base}/chain",
        TableConfig(name="chain", record_key=["rk"], precombine="ver",
                    partition_by=["part"], table_type="cow"),
    )
    instants = [None]
    ver = 0
    for _ in range(5):
        ver += 1
        rows = dedupe_batch(gen_rows(rng, 30, 80, ver))
        inst = table.upsert(spark.createDataFrame(rows, SCHEMA))
        instants.append(inst.instant)
    run_compaction(table)  # replacecommit must stay invisible

    # replay: apply each incremental window onto a dict
    state = {}
    for begin, end in zip(instants, instants[1:]):
        inc = table.incremental(begin=begin, end=end).collect()
        for r in inc:
            state[r.rk] = (r.rk, r.ver, r.payload, r.part)
    assert state == table_state(table)
