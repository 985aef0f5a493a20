"""SQL surface: CREATE/CTAS/INSERT/UPDATE/DELETE/MERGE + passthrough
(reference M5/M6/M10, Q12; spark-sql write path of the test suite)."""

import pytest

from onehouse_demos_spark.sql import Engine


@pytest.fixture()
def engine(spark, tmp_base):
    return Engine(spark, tmp_base + "/wh")


def test_create_insert_select(engine):
    engine.sql(
        "CREATE TABLE people (id INT, name STRING, age INT, city STRING, "
        "create_ts STRING) USING lakehouse PARTITIONED BY (city) "
        "TBLPROPERTIES (primaryKey=id, preCombineField=create_ts)"
    )
    engine.sql(
        "INSERT INTO people VALUES "
        "(1, 'alice', 30, 'NYC', '2024-01-01'), "
        "(2, 'bob', 40, 'SF', '2024-01-02')"
    )
    out = engine.sql("SELECT name FROM people ORDER BY id").collect()
    assert [r.name for r in out] == ["alice", "bob"]
    assert engine.table("people").config.partition_by == ["city"]


def test_ctas_and_passthrough_join(engine, spark):
    spark.range(5).selectExpr("id", "id * 10 AS v").createOrReplaceTempView("src5")
    engine.sql(
        "CREATE TABLE five USING lakehouse TBLPROPERTIES (primaryKey=id) "
        "AS SELECT * FROM src5"
    )
    assert engine.sql("SELECT COUNT(*) AS n FROM five").collect()[0].n == 5
    joined = engine.sql(
        "SELECT a.id FROM five a JOIN five b ON a.id = b.id WHERE a.v > 20"
    )
    assert joined.count() == 2


def test_update_and_delete(engine):
    engine.sql(
        "CREATE TABLE t (id INT, v INT, s STRING) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id)"
    )
    engine.sql("INSERT INTO t VALUES (1, 10, 'a'), (2, 20, 'b'), (3, 30, 'c')")
    engine.sql("UPDATE t SET v = v + 5 WHERE id >= 2")
    vals = {r.id: r.v for r in engine.sql("SELECT id, v FROM t").collect()}
    assert vals == {1: 10, 2: 25, 3: 35}
    engine.sql("DELETE FROM t WHERE v > 30")
    assert {r.id for r in engine.sql("SELECT id FROM t").collect()} == {1, 2}


def test_merge_update_insert_delete(engine, spark):
    engine.sql(
        "CREATE TABLE tgt (id INT, v INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id)"
    )
    engine.sql("INSERT INTO tgt VALUES (1, 10), (2, 20), (3, 30)")
    spark.createDataFrame(
        [(2, 200), (3, -1), (4, 400)], "id int, v int"
    ).createOrReplaceTempView("src")
    engine.sql(
        """
        MERGE INTO tgt t USING src s ON t.id = s.id
        WHEN MATCHED AND s.v < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
        """
    )
    vals = {r.id: r.v for r in engine.sql("SELECT id, v FROM tgt").collect()}
    assert vals == {1: 10, 2: 200, 4: 400}


def test_insert_overwrite_sql(engine):
    engine.sql(
        "CREATE TABLE p (id INT, part STRING) USING lakehouse "
        "PARTITIONED BY (part) TBLPROPERTIES (primaryKey=id)"
    )
    engine.sql("INSERT INTO p VALUES (1, 'a'), (2, 'b')")
    engine.sql("INSERT OVERWRITE p VALUES (9, 'a')")
    rows = {(r.id, r.part) for r in engine.sql("SELECT id, part FROM p").collect()}
    assert rows == {(9, "a"), (2, "b")}  # only partition 'a' replaced


def test_show_tables_and_mor_views(engine, spark):
    engine.sql(
        "CREATE TABLE mt (id INT, v INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id, type=mor)"
    )
    engine.sql("INSERT INTO mt VALUES (1, 1)")
    engine.register_views()
    assert spark.table("mt_ro").count() == 1
    assert spark.table("mt_rt").count() == 1
    assert "mt" in engine.tables()


def test_reload_warehouse(engine, spark, tmp_base):
    engine.sql(
        "CREATE TABLE keep (id INT, v INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id)"
    )
    engine.sql("INSERT INTO keep VALUES (7, 70)")
    e2 = Engine(spark, tmp_base + "/wh")
    assert e2.sql("SELECT v FROM keep").collect()[0].v == 70


def test_catalog_introspection(spark, tmp_base):
    """Reference Q11: SHOW TABLES / SHOW PARTITIONS / DESCRIBE
    (README.md:362,372)."""
    from onehouse_demos_spark.sql import Engine

    eng = Engine(spark, tmp_base + "/wh")
    eng.sql(
        "CREATE TABLE ticks (key STRING, ts STRING, sym STRING, d STRING) "
        "USING lakehouse PARTITIONED BY (d) "
        "TBLPROPERTIES (primaryKey=key, preCombineField=ts)"
    )
    eng.sql("INSERT INTO ticks VALUES ('k1','t1','GOOG','2018/08/31')")
    eng.sql("INSERT INTO ticks VALUES ('k2','t1','MSFT','2018/08/30')")
    tables = [r.tableName for r in eng.sql("SHOW TABLES").collect()]
    assert "ticks" in tables
    parts = {r.partition for r in eng.sql("SHOW PARTITIONS ticks").collect()}
    assert parts == {"2018/08/30", "2018/08/31"}
    desc = {r.col_name: r.value for r in eng.sql("DESCRIBE DETAIL ticks").collect()}
    assert int(desc["num_commits"]) >= 2  # the two INSERTs (+ any DDL instant)
    assert desc["num_live_files"] == "2"


def test_maintenance_sql_and_time_travel(spark, tmp_base):
    """COMPACT TABLE / CLUSTER TABLE BY / VACUUM statements + `VERSION
    AS OF` time travel (reference M11 CLI compaction + commit-range
    reads, README.md:1126-1160, 966-984)."""
    from onehouse_demos_spark.sql import Engine

    eng = Engine(spark, tmp_base + "/mwh")
    eng.sql(
        "CREATE TABLE tt (id BIGINT, v INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id, preCombineField=v, type=mor)"
    )
    eng.sql("INSERT INTO tt VALUES (1, 1), (2, 1)")
    t = eng.table("tt")
    v1 = t.timeline.latest_instant()
    eng.sql("UPDATE tt SET v = 2 WHERE id = 1")

    # time travel to the pre-update instant
    rows = {r.id: r.v for r in eng.sql(
        f"SELECT id, v FROM tt VERSION AS OF '{v1}'").collect()}
    assert rows == {1: 1, 2: 1}
    assert {r.id: r.v for r in eng.sql("SELECT id, v FROM tt_rt").collect()} \
        == {1: 2, 2: 1}

    # compaction via SQL: logs merge into base files
    assert any(f.kind == "log" for f in t.manifest.live_files())
    eng.sql("COMPACT TABLE tt")
    assert not any(f.kind == "log" for f in t.manifest.live_files())

    eng.sql("CLUSTER TABLE tt BY (id)")
    assert {r.id: r.v for r in t.snapshot().collect()} == {1: 2, 2: 1}

    removed = eng.sql("VACUUM tt RETAIN 1 COMMITS").collect()
    assert removed  # replaced file versions physically deleted
    assert {r.id: r.v for r in t.snapshot().collect()} == {1: 2, 2: 1}


def test_update_set_with_multiarg_function(engine):
    """SET-clause split must be paren-aware: an assignment containing a
    multi-argument function call is one assignment, not two."""
    engine.sql(
        "CREATE TABLE fx (id INT, a INT, b INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id)"
    )
    engine.sql("INSERT INTO fx VALUES (1, 5, 9), (2, 7, 3)")
    engine.sql("UPDATE fx SET a = greatest(a, b), b = least(a, b) WHERE id >= 1")
    vals = {r.id: (r.a, r.b) for r in engine.sql("SELECT id, a, b FROM fx").collect()}
    assert vals == {1: (9, 5), 2: (7, 3)}


def test_merge_update_set_with_multiarg_function(engine, spark):
    engine.sql(
        "CREATE TABLE fm (id INT, v INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id)"
    )
    engine.sql("INSERT INTO fm VALUES (1, 10), (2, 20)")
    spark.createDataFrame([(1, 100), (3, 5)], "id int, v int") \
        .createOrReplaceTempView("fm_src")
    engine.sql(
        """
        MERGE INTO fm t USING fm_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = greatest(t.v, s.v), id = s.id
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, greatest(s.v, 7))
        """
    )
    vals = {r.id: r.v for r in engine.sql("SELECT id, v FROM fm").collect()}
    assert vals == {1: 100, 2: 20, 3: 7}


def test_alter_table_add_columns(engine):
    """ALTER TABLE ADD COLUMNS is a metadata-only schema-evolution
    commit: old rows read back NULL for the new columns, new writes
    carry them, and re-adding an existing column fails cleanly."""
    from onehouse_demos_spark.tables.table import SchemaEvolutionError

    engine.sql(
        "CREATE TABLE ev (id INT, ver INT, v STRING) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id, preCombineField=ver)"
    )
    engine.sql("INSERT INTO ev VALUES (1, 1, 'a')")
    added = engine.sql("ALTER TABLE ev ADD COLUMNS (score DOUBLE, tag STRING)")
    assert {r.added_column for r in added.collect()} == {"score", "tag"}
    # old row resolves the new columns as NULL
    row = engine.sql("SELECT * FROM ev WHERE id = 1").collect()[0]
    assert row.score is None and row.tag is None
    # new write carries values for the evolved columns
    engine.sql("INSERT INTO ev VALUES (2, 1, 'b', 0.5, 'x')")
    rows = {r.id: (r.score, r.tag) for r in
            engine.sql("SELECT id, score, tag FROM ev").collect()}
    assert rows == {1: (None, None), 2: (0.5, "x")}
    import pytest as _pytest

    with _pytest.raises(SchemaEvolutionError):
        engine.sql("ALTER TABLE ev ADD COLUMNS (score DOUBLE)")


def test_describe_history(engine):
    """DESCRIBE HISTORY surfaces the commit timeline (instant, action,
    operation, files, rows) for audit/debug — the SQL face of the
    timeline the reference exposes through its CLI."""
    engine.sql(
        "CREATE TABLE h (id INT, ver INT, v STRING) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id, preCombineField=ver)"
    )
    engine.sql("INSERT INTO h VALUES (1, 1, 'a')")
    engine.sql("UPDATE h SET v = 'a2' WHERE id = 1")
    hist = engine.sql("DESCRIBE HISTORY h").collect()
    ops = [r.operation for r in hist]
    assert ops[0] in ("insert", "bulk_insert") and "upsert" in ops
    assert all(r.rows_written >= 0 for r in hist)
    assert hist == sorted(hist, key=lambda r: r.instant)


def test_changes_table_function_sql(engine):
    """SELECT * FROM CHANGES(t, 'begin') — the SQL face of the CDC
    change feed."""
    engine.sql(
        "CREATE TABLE cf (id INT, ver INT, v STRING) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id, preCombineField=ver)"
    )
    engine.sql("INSERT INTO cf VALUES (1, 1, 'a'), (2, 1, 'b')")
    t = engine._tables["cf"]
    mark = t.timeline.latest_instant()
    engine.sql("UPDATE cf SET v = 'a2', ver = 2 WHERE id = 1")
    engine.sql("DELETE FROM cf WHERE id = 2")
    feed = engine.sql(f"SELECT * FROM CHANGES(cf, '{mark}')").collect()
    kinds = {r._change_type for r in feed}
    assert kinds == {"update", "delete"}
    upd = [r for r in feed if r._change_type == "update"][0]
    assert upd.id == 1 and upd.v == "a2"
    # bootstrap form: empty begin → everything is an insert
    boot = engine.sql("SELECT * FROM CHANGES(cf, '')").collect()
    assert {r._change_type for r in boot} == {"insert"}


def test_timestamp_as_of_time_travel(spark, tmp_base):
    """r5: `TIMESTAMP AS OF '<wall time>'` resolves to the latest
    commit at or before the given UTC time (Delta/Hudi timestamp time
    travel) — between-commit timestamps see the earlier state, a
    pre-table timestamp errors."""
    from datetime import datetime, timezone

    from onehouse_demos_spark.sql import Engine

    eng = Engine(spark, tmp_base + "/tswh")
    eng.sql(
        "CREATE TABLE ts_t (id BIGINT, v INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id)"
    )
    eng.sql("INSERT INTO ts_t VALUES (1, 1), (2, 1)")
    mid = datetime.now(timezone.utc)
    eng.sql("UPDATE ts_t SET v = 2 WHERE id = 1")

    mid_s = mid.strftime("%Y-%m-%dT%H:%M:%S.%f+00:00")
    rows = {r.id: r.v for r in eng.sql(
        f"SELECT id, v FROM ts_t TIMESTAMP AS OF '{mid_s}'").collect()}
    assert rows == {1: 1, 2: 1}
    # a future timestamp sees the latest state
    rows2 = {r.id: r.v for r in eng.sql(
        "SELECT id, v FROM ts_t TIMESTAMP AS OF '2100-01-01T00:00:00+00:00'"
    ).collect()}
    assert rows2 == {1: 2, 2: 1}
    with pytest.raises(ValueError, match="no commit at or before"):
        eng.sql(
            "SELECT * FROM ts_t TIMESTAMP AS OF '2000-01-01T00:00:00+00:00'"
        ).collect()


def test_timestamp_as_of_naive_uses_session_timezone(spark, tmp_base):
    """r6 (VERDICT r5 polish #4): a NAIVE timestamp is interpreted in
    spark.sql.session.timeZone (Delta semantics), not blindly as UTC.
    With the session pinned to UTC+8, a naive wall time equal to
    `mid_utc + 8h` must resolve to the same boundary as the aware
    `mid_utc`."""
    from datetime import datetime, timedelta, timezone

    from onehouse_demos_spark.sql import Engine

    eng = Engine(spark, tmp_base + "/tzwh")
    eng.sql(
        "CREATE TABLE tz_t (id BIGINT, v INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id)"
    )
    eng.sql("INSERT INTO tz_t VALUES (1, 1)")
    mid = datetime.now(timezone.utc)
    eng.sql("UPDATE tz_t SET v = 2 WHERE id = 1")

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
        naive_shanghai = (mid + timedelta(hours=8)).strftime(
            "%Y-%m-%dT%H:%M:%S.%f"
        )
        rows = {r.id: r.v for r in eng.sql(
            f"SELECT id, v FROM tz_t TIMESTAMP AS OF '{naive_shanghai}'"
        ).collect()}
        assert rows == {1: 1}  # naive local time -> the pre-update commit
        # the same naive string read as UTC would be 8h in the future
        # and see the update — prove the session tz actually applied
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        rows2 = {r.id: r.v for r in eng.sql(
            f"SELECT id, v FROM tz_t TIMESTAMP AS OF '{naive_shanghai}'"
        ).collect()}
        assert rows2 == {1: 2}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_alter_set_tblproperties_and_show_create(spark, tmp_base):
    """r8: ALTER TABLE SET TBLPROPERTIES mutates exactly the mutable
    properties (payload, validator SQL, sizing target), persists them,
    and rejects identity-defining keys; SHOW CREATE TABLE reconstructs
    a re-runnable DDL."""
    from onehouse_demos_spark.tables.table import PreCommitValidationError

    eng = Engine(spark, tmp_base + "/wh")
    eng.sql(
        "CREATE TABLE st (id INT, v STRING, ver INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey='id', preCombineField='ver')"
    )
    eng.sql("INSERT INTO st VALUES (1, 'a', 1)")
    eng.sql(
        "ALTER TABLE st SET TBLPROPERTIES (preCommitSingleResultSql="
        "'select count(*) from <TABLE> where v is null#0')"
    )
    with pytest.raises(PreCommitValidationError):
        eng.sql("INSERT INTO st VALUES (2, CAST(NULL AS STRING), 1)")
    eng.sql(
        "ALTER TABLE st SET TBLPROPERTIES (payload='partial_update', "
        "targetFileRows='123456')"
    )
    t = eng.table("st")
    assert t.config.payload == "partial_update"
    assert t.config.target_file_rows == 123456
    with pytest.raises(ValueError, match="immutable"):
        eng.sql("ALTER TABLE st SET TBLPROPERTIES (primaryKey='v')")
    with pytest.raises(ValueError, match="unknown payload"):
        eng.sql("ALTER TABLE st SET TBLPROPERTIES (payload='bogus')")
    # clearing a validator class re-admits writes
    eng.sql("ALTER TABLE st SET TBLPROPERTIES (preCommitSingleResultSql='')")
    eng.sql("INSERT INTO st VALUES (2, CAST(NULL AS STRING), 1)")
    # everything persisted across an engine restart
    eng2 = Engine(spark, tmp_base + "/wh")
    assert eng2.table("st").config.payload == "partial_update"
    assert eng2.table("st").config.pre_commit_validators == []
    stmt = eng.sql("SHOW CREATE TABLE st").collect()[0][0]
    assert stmt.startswith("CREATE TABLE st (")
    assert "USING lakehouse" in stmt
    assert "primaryKey='id'" in stmt
    assert "payload='partial_update'" in stmt
    assert "LOCATION '" in stmt
