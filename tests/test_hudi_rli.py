"""Hudi metadata-table `record_index` partition (r11 — the last
metadata-partition deviation closed).

The reference's Hudi personality enables the record-level index via
`hoodie.metadata.record.index.enable` (Hudi 0.14's RLI, the index the
notebook's point lookups lean on once `hoodie.metadata.enable=true` —
see `hudi-spark-minio-trino` fixture properties for the partition
naming convention `hoodie.table.metadata.partitions`). Here it is
published natively: SHARDED HoodieLogFormat delta chains under
`.hoodie/metadata/record_index/`, file groups `record-index-0000-0`..,
type-5 HoodieMetadataRecords carrying HoodieRecordIndexInfo with
Hudi's own UUID fileId bit-encoding (fileIdEncoding=0).

Per-ROW metadata demands a DISTRIBUTED writer: beyond the driver
fast-path bounds, Spark computes key->location over only the CHANGED
files and executors write the shard files (hash-clustered, one
single-writer file per shard). Both paths must produce
semantically identical indexes — pinned here.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import onehouse_demos_spark.tables.hudi_export as hx
from onehouse_demos_spark.tables.hudi_export import (
    _file_id_bits,
    _file_id_from_bits,
    _mdt_rli_group,
    _rli_shard_py,
    clean_hudi_personality,
    hudi_metadata_record_locations,
    read_hudi_point,
    sync_hudi_metadata,
)
from onehouse_demos_spark.tables.table import LakehouseTable, TableConfig

DDL = "key string, ver int, sym string, px double"


def _mk(spark, base, n=20, partitioned=True):
    t = LakehouseTable.create(
        spark,
        f"{base}/rli_src",
        TableConfig(
            name="rli_src",
            record_key=["key"],
            precombine="ver",
            partition_by=["sym"] if partitioned else [],
        ),
    )
    rows = [
        (f"k{i:02d}", 1, "GOOG" if i % 2 else "MSFT", 100.0 + i)
        for i in range(n)
    ]
    t.insert(spark.createDataFrame(rows, DDL))
    return t


def _rli_dir(t):
    return os.path.join(t.base_path, ".hoodie", "metadata", "record_index")


def _assert_locations_exact(spark, t):
    """EVERY key's located file, read directly, holds exactly that
    key's latest row — the contract a point read plans against."""
    snap = {
        r["key"]: r
        for r in t.snapshot().select("key", "ver", "sym", "px").collect()
    }
    locs = hudi_metadata_record_locations(t.base_path, sorted(snap))
    assert sorted(locs) == sorted(snap), "index must locate every live key"
    for k, (part, name) in locs.items():
        path = (
            os.path.join(t.base_path, name)
            if part == "."
            else os.path.join(t.base_path, part, name)
        )
        got = (
            spark.read.parquet(path)
            .filter(F.col("key") == k)
            .select("key", "ver", "sym", "px")
            .collect()
        )
        assert len(got) == 1 and tuple(got[0]) == tuple(
            snap[k]
        ), f"{k} located in the wrong file"


# ------------------------------------------------ bootstrap + shape


def test_bootstrap_writes_every_shard_and_locates_all_keys(spark, tmp_base):
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    names = sorted(
        n for n in os.listdir(_rli_dir(t)) if n.endswith(".hfile")
    )
    groups = {n.split("_")[0] for n in names}
    # bootstrap writes EVERY shard's HFile BASE slice (possibly
    # empty) so readers count file groups from the directory alone —
    # the fixture's base+log shape from the first sync on
    assert groups == {_mdt_rli_group(s) for s in range(4)}
    assert all(n.endswith("_00000000000000010.hfile") for n in names)
    assert not any(".log." in n for n in os.listdir(_rli_dir(t)))
    _assert_locations_exact(spark, t)


def test_properties_declare_record_index(spark, tmp_base):
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    props = open(
        os.path.join(t.base_path, ".hoodie", "hoodie.properties")
    ).read()
    assert "record_index" in props.split(
        "hoodie.table.metadata.partitions=", 1
    )[1].splitlines()[0].split(",")


def test_late_enablement_rewrites_declaration(spark, tmp_base):
    """record_index enabled AFTER a plain sync: the properties
    declaration upgrades (like column_stats/bloom_filters) and the
    bootstrap chain appears on the enabling sync."""
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t)
    assert not os.path.isdir(_rli_dir(t))
    sync_hudi_metadata(t, record_index=True)
    _assert_locations_exact(spark, t)
    props = open(
        os.path.join(t.base_path, ".hoodie", "hoodie.properties")
    ).read()
    assert "record_index" in props


def test_mdt_timeline_carries_record_index_stats(spark, tmp_base):
    import json

    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    mdt_hoodie = os.path.join(t.base_path, ".hoodie", "metadata", ".hoodie")
    commits = [
        n
        for n in os.listdir(mdt_hoodie)
        if n.endswith(".deltacommit") or n.endswith(".commit")
    ]
    stats = []
    for n in commits:
        meta = json.load(open(os.path.join(mdt_hoodie, n)))
        stats += meta["partitionToWriteStats"].get("record_index", [])
    assert {s["fileId"] for s in stats} == {
        _mdt_rli_group(s) for s in range(4)
    }
    # bootstrap stats name the per-shard HFile base slices
    assert all(
        s["path"].startswith("record_index/record-index-")
        and s["path"].endswith(".hfile")
        for s in stats
    )


# ------------------------------------------------ delta semantics


def test_move_and_delete_update_locations(spark, tmp_base):
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    t.upsert(spark.createDataFrame([("k03", 2, "GOOG", 999.0)], DDL))
    t.delete(spark.createDataFrame([("k10",)], "key string"))
    sync_hudi_metadata(t, record_index=True)
    _assert_locations_exact(spark, t)
    locs = hudi_metadata_record_locations(t.base_path, ["k10"])
    assert locs == {}, "deleted key must fold away through its tombstone"


def test_declared_partition_is_self_maintaining(spark, tmp_base):
    """Once `record_index` is DECLARED, plain syncs (no record_index
    flag) keep maintaining it — the `hoodie.table.metadata.partitions`
    contract: a stale record index would send point reads to cleaned
    files, so declaration means every sync refreshes the chain."""
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    t.upsert(spark.createDataFrame([("k03", 2, "GOOG", 999.0)], DDL))
    sync_hudi_metadata(t)  # plain sync, no flag
    _assert_locations_exact(spark, t)


def test_unchanged_sync_writes_no_new_chain_version(spark, tmp_base):
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    before = sorted(os.listdir(_rli_dir(t)))
    sync_hudi_metadata(t, record_index=True)
    assert sorted(os.listdir(_rli_dir(t))) == before


def test_point_read_scans_only_located_files(spark, tmp_base):
    t = _mk(spark, tmp_base, n=40)
    sync_hudi_metadata(t, record_index=True)
    locs = hudi_metadata_record_locations(t.base_path, ["k07"])
    df = read_hudi_point(spark, t.base_path, ["k07"], via="record_index")
    scanned = {os.path.basename(p) for p in df.inputFiles()}
    assert scanned == {name for _p, name in locs.values()}
    assert [tuple(r) for r in df.select("key", "ver").collect()] == [
        ("k07", 1)
    ]


def test_point_read_absent_key_keeps_schema(spark, tmp_base):
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    df = read_hudi_point(spark, t.base_path, ["zz"], via="record_index")
    assert df.count() == 0
    assert {"key", "ver", "sym", "px"} <= set(df.columns)


def test_auto_prefers_record_index_over_bloom(spark, tmp_base):
    """via='auto' with both partitions published plans from the
    record index (exact) — the bloom keeps false-positive files, the
    RLI never does."""
    t = _mk(spark, tmp_base, n=40)
    sync_hudi_metadata(t, record_index=True, bloom_filters=True)
    locs = hudi_metadata_record_locations(t.base_path, ["k01"])
    df = read_hudi_point(spark, t.base_path, ["k01"])  # auto
    assert {os.path.basename(p) for p in df.inputFiles()} == {
        name for _p, name in locs.values()
    }


# ------------------------------------------------ shard isolation


def test_probe_folds_only_its_shard_chain(spark, tmp_base, monkeypatch):
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    opened: list[str] = []
    real = hx._rli_fold_shard

    def spy(rli_dir, group):
        opened.append(group)
        return real(rli_dir, group)

    monkeypatch.setattr(hx, "_rli_fold_shard", spy)
    hudi_metadata_record_locations(t.base_path, ["k03"])
    assert opened == [_mdt_rli_group(_rli_shard_py("k03", 4))]


def test_shard_hash_portable(spark):
    """The Spark md5-mod expression and the Python shard hash agree —
    the invariant that lets driver writes, executor writes and reader
    probes address the same shard."""
    keys = [f"key-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k string").select(
        "k",
        (
            F.conv(F.substring(F.md5(F.col("k")), 1, 15), 16, 10).cast(
                "long"
            )
            % 4
        ).alias("s"),
    )
    got = {r.k: r.s for r in df.collect()}
    assert got == {k: _rli_shard_py(k, 4) for k in keys}


def test_shard_count_autosizes_with_row_count(
    spark, tmp_base, monkeypatch
):
    """First enablement sizes the shard count from the table's row
    count (Hudi's filegroup-count sizing) and the choice is STICKY —
    the shard hash must never move under an existing chain."""
    monkeypatch.setattr(hx, "_RLI_ROWS_PER_SHARD", 3)

    def _groups():
        out = set()
        for n in os.listdir(_rli_dir(t)):
            if ".log." in n:
                out.add(n[1:].split("_")[0])
            elif n.endswith(".hfile"):
                out.add(n.split("_")[0])
        return out

    t = _mk(spark, tmp_base)  # 20 rows -> ceil(20/3) = 7 shards
    sync_hudi_metadata(t, record_index=True)
    assert _groups() == {_mdt_rli_group(s) for s in range(7)}
    _assert_locations_exact(spark, t)
    # growth does not re-shard: the count is sticky
    t.upsert(
        spark.createDataFrame(
            [(f"x{i}", 1, "GOOG", 1.0) for i in range(30)], DDL
        )
    )
    sync_hudi_metadata(t, record_index=True)
    assert _groups() == {_mdt_rli_group(s) for s in range(7)}
    _assert_locations_exact(spark, t)


def test_file_id_bits_roundtrip():
    import uuid as _uuid

    for i in range(50):
        fid = f"{_uuid.uuid5(_uuid.NAMESPACE_URL, f'x{i}')}-{i % 3}"
        assert _file_id_from_bits(*_file_id_bits(fid)) == fid


# ------------------------------------------------ distributed writer


def test_spark_path_matches_driver_path(spark, tmp_base, monkeypatch):
    """Force the distributed writer (executors write the shard files)
    and run the same mutation sequence as the driver path: the folded
    index must be exactly location-correct, and the chain must carry
    one file per touched shard per version."""
    monkeypatch.setattr(hx, "_RLI_DRIVER_MAX_FILES", 0)
    t = _mk(spark, tmp_base, n=40)
    sync_hudi_metadata(t, record_index=True)
    _assert_locations_exact(spark, t)
    t.upsert(spark.createDataFrame([("k03", 2, "GOOG", 999.0)], DDL))
    t.delete(spark.createDataFrame([("k10",)], "key string"))
    sync_hudi_metadata(t, record_index=True)
    _assert_locations_exact(spark, t)
    assert hudi_metadata_record_locations(t.base_path, ["k10"]) == {}
    # bootstrap: every shard got an executor-written HFile base;
    # delta: version-1 logs only on touched shards
    bases = {
        n.split("_")[0]
        for n in os.listdir(_rli_dir(t))
        if n.endswith(".hfile")
    }
    assert bases == {_mdt_rli_group(s) for s in range(4)}
    logs = [n for n in os.listdir(_rli_dir(t)) if ".log." in n]
    assert logs and all(".log.1_" in n for n in logs)
    assert 1 <= len(logs) <= 4


# ------------------------------------------------ roll-up + clean


def test_rollup_compacts_chain_and_clean_ages_it(spark, tmp_base):
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    # 11 mutating syncs push the chain past _MDT_COMPACT_EVERY
    for i in range(11):
        # partition-stable upserts (the engine's index is
        # partition-local, like Hudi's non-global SimpleIndex)
        sym = "GOOG" if i % 2 else "MSFT"
        t.upsert(
            spark.createDataFrame(
                [(f"k{i % 20:02d}", 10 + i, sym, 1.0 * i)], DDL
            )
        )
        sync_hudi_metadata(t, record_index=True)
    _assert_locations_exact(spark, t)
    base_attaches = {
        n.rsplit("_", 1)[1][: -len(".hfile")]
        for n in os.listdir(_rli_dir(t))
        if n.endswith(".hfile")
    }
    assert len(base_attaches) == 2, "roll-up must write fresh bases"
    newest = max(base_attaches)
    # clean past the horizon drops the superseded base + its chain
    clean_hudi_personality(t, keep_last_instants=1)
    left_attaches = set()
    for n in os.listdir(_rli_dir(t)):
        if n.endswith(".hfile"):
            left_attaches.add(n.rsplit("_", 1)[1][: -len(".hfile")])
        elif ".log." in n:
            left_attaches.add(n[1:].split("_", 1)[1].split(".log.")[0])
    assert left_attaches == {newest}
    _assert_locations_exact(spark, t)


def test_spark_path_compaction_keeps_chain_bounded(
    spark, tmp_base, monkeypatch
):
    """When EVERY sync's delta takes the distributed path, the
    version-cap trigger must still compact (shard-parallel fold in
    executors) — otherwise the chain grows unboundedly. Force the
    distributed path and a cap of 2: after the third mutating sync
    the chain must have restarted under a fresh attachment instant,
    and locations stay exact."""
    monkeypatch.setattr(hx, "_RLI_DRIVER_MAX_FILES", 0)
    monkeypatch.setattr(hx, "_MDT_COMPACT_EVERY", 2)
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    for i in range(3):
        sym = "GOOG" if i % 2 else "MSFT"
        t.upsert(
            spark.createDataFrame(
                [(f"k{i:02d}", 10 + i, sym, 1.0 * i)], DDL
            )
        )
        sync_hudi_metadata(t, record_index=True)
    base_attaches = {
        n.rsplit("_", 1)[1][: -len(".hfile")]
        for n in os.listdir(_rli_dir(t))
        if n.endswith(".hfile")
    }
    assert len(base_attaches) == 2, "compaction must write fresh bases"
    newest = max(base_attaches)
    # the compacted bases (executor-written) cover EVERY shard
    fresh_groups = {
        n.split("_")[0]
        for n in os.listdir(_rli_dir(t))
        if n.endswith(f"_{newest}.hfile")
    }
    assert fresh_groups == {_mdt_rli_group(s) for s in range(4)}
    _assert_locations_exact(spark, t)
    clean_hudi_personality(t, keep_last_instants=1)
    left_attaches = set()
    for n in os.listdir(_rli_dir(t)):
        if n.endswith(".hfile"):
            left_attaches.add(n.rsplit("_", 1)[1][: -len(".hfile")])
        elif ".log." in n:
            left_attaches.add(n[1:].split("_", 1)[1].split(".log.")[0])
    assert left_attaches == {newest}
    _assert_locations_exact(spark, t)


def test_rebuild_when_retired_copy_already_cleaned(
    spark, tmp_base, monkeypatch
):
    """A removed file's keys come from its retained personality copy.
    If the index write crashed for some syncs (simulated by no-oping
    `_sync_rli_partition`) and clean then aged the retired slices past
    the horizon, the next real index sync cannot diff — it must detect
    the missing copy and REBUILD the chain from the current files,
    still exact."""
    t = _mk(spark, tmp_base)
    sync_hudi_metadata(t, record_index=True)
    # crash window: data syncs land, the index write never does
    monkeypatch.setattr(hx, "_sync_rli_partition", lambda *a, **k: None)
    for i in range(3):
        t.upsert(
            spark.createDataFrame([("k03", 2 + i, "GOOG", 999.0)], DDL)
        )
        sync_hudi_metadata(t)
    monkeypatch.undo()
    clean_hudi_personality(t, keep_last_instants=1)
    # rli_paths still names the bootstrap-era engine files whose
    # retained copies clean just removed -> full rebuild
    sync_hudi_metadata(t, record_index=True)
    _assert_locations_exact(spark, t)


# ------------------------------------------------ SQL surface


def test_call_xtable_sync_publishes_record_index(spark, tmp_base):
    from onehouse_demos_spark.sql import Engine

    eng = Engine(spark, f"{tmp_base}/wh_rli")
    eng.sql(
        "CREATE TABLE rsrc (key STRING, ver INT, sym STRING, px DOUBLE) "
        "USING lakehouse TBLPROPERTIES (primaryKey=key, "
        "preCombineField=ver)"
    )
    eng.sql(
        "INSERT INTO rsrc VALUES ('a', 1, 'GOOG', 1.0), "
        "('b', 1, 'MSFT', 2.0)"
    )
    eng.sql(
        "CALL xtable_sync(table => 'rsrc', formats => 'hudi', "
        "hudi_record_index => true)"
    )
    t = eng.table("rsrc")
    assert os.path.isdir(_rli_dir(t))
    locs = hudi_metadata_record_locations(t.base_path, ["a", "b"])
    assert sorted(locs) == ["a", "b"]


def test_call_hudi_index_builds_partitions(spark, tmp_base):
    """`CALL hudi_index(...)` — the async-indexer face: build the
    named metadata-index partitions over the CURRENT personality
    state with no data commit in between; they stay declared (and
    thus self-maintained) afterwards."""
    from onehouse_demos_spark.sql import Engine

    eng = Engine(spark, f"{tmp_base}/wh_idx")
    eng.sql(
        "CREATE TABLE isrc (key STRING, ver INT, sym STRING, px DOUBLE) "
        "USING lakehouse TBLPROPERTIES (primaryKey=key, "
        "preCombineField=ver)"
    )
    eng.sql(
        "INSERT INTO isrc VALUES ('a', 1, 'GOOG', 1.0), "
        "('b', 1, 'MSFT', 2.0)"
    )
    eng.sql("CALL xtable_sync(table => 'isrc', formats => 'hudi')")
    t = eng.table("isrc")
    md = os.path.join(t.base_path, ".hoodie", "metadata")
    assert not os.path.isdir(os.path.join(md, "record_index"))
    rows = eng.sql(
        "CALL hudi_index(table => 'isrc', "
        "partitions => 'record_index,column_stats')"
    ).collect()
    assert sorted(r.partition for r in rows) == [
        "column_stats", "record_index",
    ]
    assert os.path.isdir(os.path.join(md, "record_index"))
    assert os.path.isdir(os.path.join(md, "column_stats"))
    locs = hudi_metadata_record_locations(t.base_path, ["a", "b"])
    assert sorted(locs) == ["a", "b"]
    import pytest as _pytest

    with _pytest.raises(Exception, match="unknown partitions"):
        eng.sql("CALL hudi_index(table => 'isrc', partitions => 'nope')")


def test_wide_probe_folds_shards_in_executors(
    spark, tmp_base, monkeypatch
):
    """A probe spanning more shards than `_RLI_PROBE_SPARK_SHARDS`
    with a spark session folds shard chains in EXECUTORS and returns
    the same exact locations as the driver loop."""
    monkeypatch.setattr(hx, "_RLI_ROWS_PER_SHARD", 2)  # many shards
    t = _mk(spark, tmp_base, n=40)
    sync_hudi_metadata(t, record_index=True)
    keys = [f"k{i:02d}" for i in range(40)]
    driver_locs = hudi_metadata_record_locations(t.base_path, keys)
    monkeypatch.setattr(hx, "_RLI_PROBE_SPARK_SHARDS", 1)
    spark_locs = hudi_metadata_record_locations(
        t.base_path, keys, spark=spark
    )
    assert spark_locs == driver_locs
    assert sorted(spark_locs) == sorted(keys)


def test_nonpartitioned_table_locations(spark, tmp_base):
    t = _mk(spark, tmp_base, partitioned=False)
    sync_hudi_metadata(t, record_index=True)
    locs = hudi_metadata_record_locations(t.base_path, ["k00"])
    assert locs["k00"][0] == "."
    df = read_hudi_point(spark, t.base_path, ["k00"], via="record_index")
    assert df.count() == 1
