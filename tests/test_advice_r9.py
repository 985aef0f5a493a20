"""Round-9 ADVICE regression tests.

Each test pins one of the r8 advisor findings:
- coercing WHERE literals must never let the point probe silently
  skip rows the full-snapshot path would mutate (high);
- pre-commit validator results containing NULLs must compare, not
  TypeError (low);
- ALTER TABLE SET TBLPROPERTIES is all-or-nothing in memory (low);
- SHOW CREATE TABLE output is genuinely re-runnable, including
  partitionExpr / targetFileRows / validators / quoted values (low);
- a nondeterministic MERGE source disables key pruning (low).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from onehouse_demos_spark.sql.engine import Engine
from onehouse_demos_spark.tables.table import PreCommitValidationError


def _mk(spark, tmp_base, extra_props=""):
    eng = Engine(spark, f"{tmp_base}/wh")
    eng.sql(
        "CREATE TABLE pt (id INT, part STRING, v STRING, ver INT) "
        "USING lakehouse PARTITIONED BY (part) "
        f"TBLPROPERTIES (primaryKey='id', preCombineField='ver'{extra_props})"
    )
    for i in range(3):
        vals = ", ".join(
            f"({j + i * 100}, 'p{j % 3}', 'v{j + i * 100}', 1)"
            for j in range(30)
        )
        eng.sql(f"INSERT INTO pt VALUES {vals}")
    return eng


# ------------------------------------- coercing DML literals (high)


def test_update_coercing_double_literal_on_int_key(spark, tmp_base):
    """WHERE id = 5.0 on an INT key: Spark coercion matches id=5; the
    literal is losslessly coerced to the key type, so the point probe
    SURVIVES and mutates the right row (previously it probed the
    double form and silently skipped it)."""
    eng = _mk(spark, tmp_base, ", recordIndex='true'")
    eng.sql("UPDATE pt SET v = 'C' WHERE id = 5.0")
    assert eng.last_dml_probe["mode"] == "keys-index"
    assert eng.sql("SELECT v FROM pt WHERE id = 5").collect()[0][0] == "C"


def test_delete_coercing_literal_on_int_key(spark, tmp_base):
    eng = _mk(spark, tmp_base, ", recordIndex='true'")
    eng.sql("DELETE FROM pt WHERE id = 7.0")
    assert (
        eng.sql("SELECT count(*) AS c FROM pt WHERE id = 7").collect()[0][0]
        == 0
    )


def test_fractional_literal_on_int_key_stands_down(spark, tmp_base):
    """id = 5.5 can match no integer row, but its truncation would
    probe the WRONG value — the probe must stand down, and the
    (empty) mutation must still be exact."""
    eng = _mk(spark, tmp_base, ", recordIndex='true'")
    before = eng.table("pt").snapshot().count()
    eng.sql("DELETE FROM pt WHERE id = 5.5")
    assert not eng.last_dml_probe["mode"].startswith("keys-")
    assert eng.table("pt").snapshot().count() == before


def test_update_numeric_literal_on_string_key(spark, tmp_base):
    """Numeric literal probing a STRING key: '5' vs 5 hash apart; the
    probe must stand down and the coerced row still mutates."""
    eng = Engine(spark, f"{tmp_base}/wh")
    eng.sql(
        "CREATE TABLE st (k STRING, v STRING, ver INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey='k', preCombineField='ver', "
        "recordIndex='true')"
    )
    eng.sql("INSERT INTO st VALUES ('5', 'a', 1), ('6', 'b', 1)")
    eng.sql("UPDATE st SET v = 'Z' WHERE k = 5")
    assert not eng.last_dml_probe["mode"].startswith("keys-")
    assert eng.sql("SELECT v FROM st WHERE k = '5'").collect()[0][0] == "Z"


def test_exact_type_literal_still_point_probes(spark, tmp_base):
    """The gate must not over-fire: an exact-type literal keeps the
    index probe."""
    eng = _mk(spark, tmp_base, ", recordIndex='true'")
    eng.sql("UPDATE pt SET v = 'P' WHERE id = 5")
    assert eng.last_dml_probe["mode"] == "keys-index"
    assert eng.sql("SELECT v FROM pt WHERE id = 5").collect()[0][0] == "P"


# ------------------------------- validator NULL-safe comparison (low)


def test_validator_rows_with_nulls_compare(spark, tmp_base):
    """A multi-row equality validator whose result mixes NULL and
    values must evaluate (pass or fail), never crash the commit with
    TypeError."""
    eng = _mk(spark, tmp_base)
    t = eng.table("pt")
    # part-level max(v) per part plus a NULL row from a grouping-set
    t.set_pre_commit_validators(
        [
            {
                "type": "equality",
                "query": (
                    "SELECT part, count(*) FROM <TABLE> "
                    "GROUP BY ROLLUP(part)"
                ),
            }
        ]
    )
    # count changes → the equality validator must FAIL (cleanly)
    with pytest.raises(PreCommitValidationError):
        eng.sql("INSERT INTO pt VALUES (900, 'p0', 'x', 1)")
    # a no-op-count write (update in place) passes the same validator
    eng.sql("UPDATE pt SET v = 'same-count' WHERE id = 1")
    assert (
        eng.sql("SELECT v FROM pt WHERE id = 1").collect()[0][0]
        == "same-count"
    )


# ----------------------------- ALTER TBLPROPERTIES atomicity (low)


def test_alter_props_all_or_nothing(spark, tmp_base):
    eng = _mk(spark, tmp_base)
    t = eng.table("pt")
    before_payload = t.config.payload
    with pytest.raises(ValueError):
        eng.sql(
            "ALTER TABLE pt SET TBLPROPERTIES "
            "('payload'='partial_update', 'primaryKey'='nope')"
        )
    # the valid first property must NOT have been applied in-memory
    assert t.config.payload == before_payload


# ------------------------------ SHOW CREATE round-trip (low)


def test_show_create_round_trip(spark, tmp_base):
    eng = Engine(spark, f"{tmp_base}/wh")
    eng.sql(
        "CREATE TABLE rt (id INT, v STRING, ver INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey='id', preCombineField='ver', "
        "targetFileRows='1234', "
        "preCommitSingleResultSql='SELECT count(*) >= 0 FROM <TABLE>#True')"
    )
    eng.sql("INSERT INTO rt VALUES (1, 'it''s', 1)")
    stmt = eng.sql("SHOW CREATE TABLE rt").collect()[0][0]
    assert "targetFileRows='1234'" in stmt
    assert "preCommitSingleResultSql=" in stmt
    # replay into a second warehouse: same config shape
    eng2 = Engine(spark, f"{tmp_base}/wh2")
    eng2.sql(stmt.replace(f"{tmp_base}/wh", f"{tmp_base}/wh2"))
    c1, c2 = eng.table("rt").config, eng2.table("rt").config
    assert c2.record_key == c1.record_key
    assert c2.precombine == c1.precombine
    assert c2.target_file_rows == 1234
    assert c2.pre_commit_validators == c1.pre_commit_validators


def test_show_create_emits_partition_expr_and_quotes(spark, tmp_base):
    eng = Engine(spark, f"{tmp_base}/wh")
    eng.sql(
        "CREATE TABLE pe (id INT, ts TIMESTAMP, v STRING) USING lakehouse "
        "TBLPROPERTIES (primaryKey='id', "
        "partitionExpr='date_format(ts, ''yyyy-MM'')')"
    )
    t = eng.table("pe")
    assert t.config.partition_expr == "date_format(ts, 'yyyy-MM')"
    stmt = eng.sql("SHOW CREATE TABLE pe").collect()[0][0]
    # embedded quotes doubled in the emitted literal
    assert "partitionExpr='date_format(ts, ''yyyy-MM'')'" in stmt
    eng2 = Engine(spark, f"{tmp_base}/wh2")
    eng2.sql(stmt.replace(f"{tmp_base}/wh", f"{tmp_base}/wh2"))
    assert eng2.table("pe").config.partition_expr == "date_format(ts, 'yyyy-MM')"


# ------------------------- nondeterministic MERGE source (low)


def test_nondeterministic_merge_source_skips_pruning(spark, tmp_base):
    eng = _mk(spark, tmp_base, ", recordIndex='true'")
    eng.sql(
        "MERGE INTO pt USING (SELECT 105 + CAST(rand() * 0 AS INT) AS id, "
        "'p0' AS part, 'ND' AS v, 9 AS ver) s "
        "ON pt.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert eng.last_dml_probe["mode"] == "full"
    assert eng.sql("SELECT v FROM pt WHERE id = 105").collect()[0][0] == "ND"
    # no duplicate key materialized
    assert (
        eng.sql(
            "SELECT count(*) AS c FROM pt WHERE id = 105"
        ).collect()[0][0]
        == 1
    )


# ------------------- line-level repetition removal (r8 wrong #2)


def test_remove_repeated_units_line_default(spark):
    from onehouse_demos_spark.operators.text import remove_repeated_units

    docs = spark.createDataFrame(
        [
            ("d1", "the cat\nsat down\nthe cat\nslept"),
            ("d2", "a b\na b\na b"),
            ("d3", "unique line"),
        ],
        "doc_id string, text string",
    )
    got = {
        r.doc_id: (r.text, r.n_units, r.n_kept)
        for r in remove_repeated_units(docs).collect()
    }
    # duplicate LINES removed, first occurrence kept, words untouched
    assert got["d1"] == ("the cat\nsat down\nslept", 4, 3)
    assert got["d2"] == ("a b", 3, 1)
    assert got["d3"] == ("unique line", 1, 1)
    # token unit stays available (the old r8 behavior, now opt-in)
    tok = {
        r.doc_id: r.text
        for r in remove_repeated_units(docs, unit="token").collect()
    }
    # split on ' ' only: tokens are ["a","b\na","b\na","b"] → dedup
    assert tok["d2"] == "a b\na b"
    with pytest.raises(ValueError, match="unknown repetition unit"):
        remove_repeated_units(docs, unit="sentence")


def test_deterministic_merge_source_still_prunes(spark, tmp_base):
    eng = _mk(spark, tmp_base, ", recordIndex='true'")
    eng.sql(
        "MERGE INTO pt USING (SELECT 105 AS id, 'p0' AS part, "
        "'D' AS v, 9 AS ver) s "
        "ON pt.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert eng.last_dml_probe["mode"].startswith("keys-")
    assert eng.sql("SELECT v FROM pt WHERE id = 105").collect()[0][0] == "D"
