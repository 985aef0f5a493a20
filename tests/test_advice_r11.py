"""Regression tests for the four r11 advisor findings (ADVICE.md):

1. (medium) rt-log timestamp encoding assumed naive datetimes are
   UTC, but PySpark `collect()` returns naive datetimes in the
   driver's OS timezone — on any non-UTC host every rt log timestamp
   silently shifted by the UTC offset, and the float seconds math
   could drift values by 1 μs. Fixed: `hudi_log.timestamp_micros`
   mirrors `TimestampType.toInternal` with integer arithmetic;
   `hudi_export._from_avro_value` decodes to aware-UTC with integer
   arithmetic.
2. (medium) array/map/struct columns were `str(v)`-encoded into rt
   log records (irreversible), so `read_hudi_rt` /
   `read_hudi_incremental` crashed on any table with nested columns.
   Fixed: containers ride the "string" Avro branch as lossless JSON
   and are rebuilt against the base parquet schema at read.
3. (medium) `hoodie.properties` was written only when absent, so
   enabling mor_rt on a personality first synced compact/default
   published deltacommits into a table still declared COPY_ON_WRITE.
   Fixed: the sync rewrites the declaration (bumped checksum) on the
   COW→MOR flip, and the SQL engine's version token folds the
   properties mtime so the `_ro`/`_rt` pair re-registers.
4. (low) `_register_hudi_mor_pair` called `read_hudi_rt` for ANY
   registered MOR Hudi table, but the rt merge needs personality
   columns — a genuine foreign Hudi MOR table made registration
   raise. Fixed: foreign tables (no `.hoodie/sync_state.json`) get
   `_ro` only.
"""

from __future__ import annotations

import json
import os
import re
import time
from datetime import date, datetime, timedelta, timezone
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from onehouse_demos_spark.tables.hudi_export import (
    _from_avro_value,
    read_hudi_incremental,
    read_hudi_rt,
    sync_hudi_metadata,
)
from onehouse_demos_spark.tables.hudi_log import timestamp_micros
from onehouse_demos_spark.tables.table import LakehouseTable, TableConfig

DDL = "key string, ver int, sym string, px double"


@pytest.fixture
def ny_tz():
    """Run the test body with the driver OS timezone set to
    America/New_York (UTC-5/-4 with DST) — the exact condition the
    advisor's finding #1 triggers under."""
    old = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        yield
    finally:
        if old is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old
        time.tzset()


# -- finding 1: timestamp encoding ----------------------------------------


def test_timestamp_micros_matches_pyspark_internal_any_tz(ny_tz):
    """`timestamp_micros` must equal `TimestampType.toInternal` for
    the naive local datetimes collect() hands the driver — across
    DST and non-DST dates — and the decode side must map those micros
    back to the same internal value. Pure integer arithmetic: exact
    to the microsecond."""
    tt = T.TimestampType()
    for v in (
        datetime(2021, 7, 4, 12, 30, 45, 123456),  # EDT (DST active)
        datetime(2021, 1, 4, 12, 30, 45, 999999),  # EST
        datetime(1999, 12, 31, 23, 59, 59, 1),
        datetime(2021, 7, 4, 12, 30, 45, 123456, tzinfo=timezone.utc),
    ):
        micros = timestamp_micros(v)
        assert micros == tt.toInternal(v), v
        back = _from_avro_value(micros, tt)
        assert tt.toInternal(back) == micros, v


def test_rt_log_timestamps_survive_non_utc_host(spark, tmp_base, ny_tz):
    """Full pipeline under a non-UTC driver timezone: the log-borne
    row's timestamp must equal the value written, not shift by the
    UTC offset. Before the fix this read 4-5 hours off."""
    ddl = "key string, ver int, ts timestamp"
    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/tz",
        TableConfig(name="tz", record_key=["key"], precombine="ver"),
    )
    base_ts = datetime(2021, 7, 4, 9, 0, 0, 500000)
    t.insert(spark.createDataFrame([("k1", 1, base_ts)], ddl))
    sync_hudi_metadata(t)
    t.config.table_type = "mor"
    t._rewrite_config()
    log_ts = datetime(2021, 7, 4, 12, 30, 45, 123456)
    t.upsert(spark.createDataFrame([("k1", 2, log_ts)], ddl))
    sync_hudi_metadata(t, mor_rt=True)
    [row] = read_hudi_rt(spark, t.base_path).collect()
    assert row.ver == 2
    assert row.ts == log_ts, (row.ts, log_ts)


# -- finding 2: nested columns round-trip the rt log ----------------------

NESTED_DDL = (
    "key string, ver int, tags array<string>, "
    "meta struct<a:int,b:string>, scores map<string,double>, "
    "evts array<timestamp>, amt decimal(10,2)"
)


def _nested_rows(ver: int, px: float):
    ts = datetime(2024, 3, 1, 8, 0, 0, 250000)
    return [
        (
            f"k{i}",
            ver,
            [f"t{i}", f"u{ver}"],
            {"a": i * ver, "b": f"s{ver}"},
            {"x": px + i, "y": float(ver)},
            [ts + timedelta(minutes=i), ts + timedelta(hours=ver)],
            Decimal(f"{100 + i}.{ver:02d}"),
        )
        for i in range(4)
    ]


def test_rt_log_roundtrips_nested_columns(spark, tmp_base):
    """mor_rt sync on a table with array/struct/map/array<timestamp>/
    decimal columns: `read_hudi_rt` must equal the engine's own rt
    view exactly (before the fix, createDataFrame raised on the
    str()-encoded containers)."""
    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/nested",
        TableConfig(name="nested", record_key=["key"], precombine="ver"),
    )
    t.insert(spark.createDataFrame(_nested_rows(1, 10.0), NESTED_DDL))
    sync_hudi_metadata(t)
    t.config.table_type = "mor"
    t._rewrite_config()
    t.upsert(
        spark.createDataFrame(_nested_rows(2, 20.0)[:2], NESTED_DDL)
    )
    sync_hudi_metadata(t, mor_rt=True)

    def canon(df):
        cols = ["key", "ver", "tags", "meta", "scores", "evts", "amt"]
        return sorted(
            (r.asDict(recursive=True) for r in df.select(*cols).collect()),
            key=lambda d: d["key"],
        )

    got = canon(read_hudi_rt(spark, t.base_path))
    want = canon(t.snapshot())
    assert got == want
    assert got[0]["ver"] == 2 and got[0]["meta"] == {"a": 0, "b": "s2"}
    assert got[0]["evts"][1].hour == (
        datetime(2024, 3, 1, 8, 0) + timedelta(hours=2)
    ).hour


def test_incremental_read_decodes_nested_log_rows(spark, tmp_base):
    """`read_hudi_incremental` over a range containing only
    deltacommit log rows must rebuild nested values (before the fix
    it crashed on schema verification)."""
    from onehouse_demos_spark.tables.hudi_export import _load_state

    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/nested_inc",
        TableConfig(
            name="nested_inc", record_key=["key"], precombine="ver"
        ),
    )
    t.insert(spark.createDataFrame(_nested_rows(1, 10.0), NESTED_DDL))
    sync_hudi_metadata(t)
    begin = _load_state(os.path.join(t.base_path, ".hoodie"))["instants"][-1]
    t.config.table_type = "mor"
    t._rewrite_config()
    t.upsert(spark.createDataFrame(_nested_rows(2, 20.0)[:1], NESTED_DDL))
    sync_hudi_metadata(t, mor_rt=True)
    rows = read_hudi_incremental(spark, t.base_path, begin).collect()
    assert len(rows) == 1
    d = rows[0].asDict(recursive=True)
    assert d["key"] == "k0" and d["ver"] == 2
    assert d["scores"] == {"x": 20.0, "y": 2.0}
    assert d["tags"] == ["t0", "u2"]


def test_footer_stats_attribution_with_nested_column_first(
    spark, tmp_base
):
    """Parquet footers carry stats per physical LEAF column; a nested
    column ordered BEFORE the record key used to shift the leaf index
    so key-range pruning got another column's bounds (found fixing
    finding #2 — the old harvester indexed leaves by top-level name
    position). The key range must come from the key column."""
    ddl = "blob struct<z:int,w:string>, key string, ver int"
    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/statattr",
        TableConfig(name="statattr", record_key=["key"], precombine="ver"),
    )
    rows = [({"z": 100 + i, "w": "zzz"}, f"k{i}", 1) for i in range(5)]
    t.insert(spark.createDataFrame(rows, ddl))
    files = [
        f
        for f in t.manifest.live_files()
        if f.kind == "base" and f.rows > 0
    ]
    assert files
    for f in files:
        assert f.key_min is not None and f.key_min.startswith("k")
        assert f.key_max is not None and f.key_max.startswith("k")
        assert "blob" not in (f.col_stats or {})  # nested: no stats
        if "ver" in (f.col_stats or {}):
            assert f.col_stats["ver"] == [1, 1]


# -- finding 3: COW -> MOR mode upgrade rewrites the declaration ----------


def _read_props(path: str) -> dict[str, str]:
    out = {}
    with open(path) as fh:
        for line in fh:
            if "=" in line and not line.startswith("#"):
                k, v = line.strip().split("=", 1)
                out[k] = v
    return out


def test_mor_rt_upgrade_rewrites_properties(spark, tmp_base):
    """A personality first synced in default (COW) mode that later
    enables mor_rt must rewrite hoodie.properties to MERGE_ON_READ
    with a recomputed checksum BEFORE any deltacommit publishes —
    otherwise external readers plan a COW snapshot and never see the
    log rows."""
    from onehouse_demos_spark.tables.hudi_export import _table_checksum

    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/upg",
        TableConfig(name="upg", record_key=["key"], precombine="ver"),
    )
    t.insert(
        spark.createDataFrame([("k1", 1, "S", 1.0), ("k2", 1, "S", 2.0)], DDL)
    )
    sync_hudi_metadata(t)  # default mode: declares COPY_ON_WRITE
    props_path = os.path.join(t.base_path, ".hoodie", "hoodie.properties")
    assert _read_props(props_path)["hoodie.table.type"] == "COPY_ON_WRITE"

    t.config.table_type = "mor"
    t._rewrite_config()
    t.upsert(spark.createDataFrame([("k1", 2, "S", 9.0)], DDL))
    sync_hudi_metadata(t, mor_rt=True)

    props = _read_props(props_path)
    assert props["hoodie.table.type"] == "MERGE_ON_READ"
    stored = props.pop("hoodie.table.checksum")
    assert stored == _table_checksum(props)  # recomputed, not stale
    delta = [
        n
        for n in os.listdir(os.path.join(t.base_path, ".hoodie"))
        if re.fullmatch(r"\d+\.deltacommit", n)
    ]
    assert delta, "upgrade sync must still publish the log deltacommit"
    got = {r.key: r.ver for r in read_hudi_rt(spark, t.base_path).collect()}
    assert got == {"k1": 2, "k2": 1}


def test_mor_declaration_is_sticky_after_compact_sync(spark, tmp_base):
    """Once MERGE_ON_READ, later compact-mode syncs must NOT flip the
    declaration back to COPY_ON_WRITE — the deltacommits already in
    the timeline make COW a lie."""
    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/sticky",
        TableConfig(
            name="sticky",
            record_key=["key"],
            precombine="ver",
            table_type="mor",
        ),
    )
    t.insert(spark.createDataFrame([("k1", 1, "S", 1.0)], DDL))
    sync_hudi_metadata(t, mor_rt=True)
    t.upsert(spark.createDataFrame([("k1", 2, "S", 2.0)], DDL))
    sync_hudi_metadata(t, mor_rt=True)
    props_path = os.path.join(t.base_path, ".hoodie", "hoodie.properties")
    assert _read_props(props_path)["hoodie.table.type"] == "MERGE_ON_READ"
    sync_hudi_metadata(t, compact_mor=True)  # compaction path
    assert _read_props(props_path)["hoodie.table.type"] == "MERGE_ON_READ"


def test_sql_view_pair_appears_after_upgrade(spark, tmp_base):
    """The SQL engine's hudi version token folds the properties mtime:
    a COW-registered personality that upgrades to MOR re-registers
    with the `_ro`/`_rt` pair on the next statement."""
    from onehouse_demos_spark.sql.engine import Engine

    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/sqlupg",
        TableConfig(name="sqlupg", record_key=["key"], precombine="ver"),
    )
    t.insert(spark.createDataFrame([("k1", 1, "S", 1.0)], DDL))
    sync_hudi_metadata(t)
    eng = Engine(spark, f"{tmp_base}/wh_upg")
    eng.sql(f"CREATE TABLE upgt USING hudi LOCATION '{t.base_path}'")
    assert eng.sql("SELECT count(*) AS c FROM upgt").collect()[0][0] == 1
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM upgt_rt").collect()  # COW: no pair yet

    t.config.table_type = "mor"
    t._rewrite_config()
    t.upsert(spark.createDataFrame([("k1", 2, "S", 9.0)], DDL))
    sync_hudi_metadata(t, mor_rt=True)
    rows = eng.sql("SELECT key, ver FROM upgt_rt").collect()
    assert {(r.key, r.ver) for r in rows} == {("k1", 2)}


# -- finding 4: foreign MOR tables register _ro only ----------------------


def test_foreign_mor_table_registers_ro_only(spark, tmp_base):
    """A genuine foreign Hudi MOR table (real `.hoodie`, no
    personality `sync_state.json`) must register `_ro` and skip
    `_rt` instead of raising once log records decode."""
    from onehouse_demos_spark.sql.engine import Engine

    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/fmor",
        TableConfig(
            name="fmor",
            record_key=["key"],
            precombine="ver",
            table_type="mor",
        ),
    )
    t.insert(spark.createDataFrame([("k1", 1, "S", 1.0)], DDL))
    sync_hudi_metadata(t, mor_rt=True)
    # make it foreign: detach from the engine table and strip the
    # personality's private sync state
    foreign = f"{tmp_base}/foreign_only"
    os.makedirs(foreign)
    for n in os.listdir(t.base_path):
        if n != "_commits":
            os.rename(
                os.path.join(t.base_path, n), os.path.join(foreign, n)
            )
    os.remove(os.path.join(foreign, ".hoodie", "sync_state.json"))

    eng = Engine(spark, f"{tmp_base}/wh_fmor")
    eng.sql(f"CREATE TABLE fm USING hudi LOCATION '{foreign}'")
    assert eng.sql("SELECT count(*) AS c FROM fm").collect()[0][0] == 1
    assert eng.sql("SELECT count(*) AS c FROM fm_ro").collect()[0][0] == 1
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM fm_rt").collect()
