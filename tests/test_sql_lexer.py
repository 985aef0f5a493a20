"""Lexer-backed SQL front-end: adversarial identifiers and string
literals containing keywords must never steer clause detection
(VERDICT r3 ask #6 — `` `where` `` columns, values containing
'WHEN MATCHED', commas/equals inside literals).

Two layers: pure-lexer property tests (hypothesis, no Spark) and
engine statements that previously mis-parsed under the regex-only
front-end."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from onehouse_demos_spark.sql.lexer import (
    mask_literals,
    split_once_top_level,
    split_top_level,
    strip_ident_quotes,
)

# ------------------------------------------------------------- pure lexer

KEYWORDY = st.sampled_from([
    "WHERE", " WHEN MATCHED THEN ", "DELETE", "SET x = 1,",
    "USING", ") THEN (", "MERGE INTO", "values',",
])
PAYLOAD = st.text(
    alphabet=st.characters(blacklist_characters="'\"`\\"), max_size=20
) | KEYWORDY


def test_mask_preserves_length_and_structure():
    s = "UPDATE t SET a = 'x WHERE y', `we,ird` = 2 WHERE b = 'c''d'"
    m = mask_literals(s)
    assert len(m) == len(s)
    assert "WHERE y" not in m
    assert "we,ird" not in m
    assert m.count("'") == s.count("'") - 2  # the doubled '' is masked
    # real keyword survives
    assert "UPDATE t SET" in m and " WHERE b = " in m


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_mask_same_length_any_input(s):
    assert len(mask_literals(s)) == len(s)


@given(st.lists(PAYLOAD, min_size=1, max_size=5))
@settings(max_examples=200, deadline=None)
def test_split_never_splits_inside_literals(payloads):
    quoted = ["'" + p.replace("'", "''") + "'" for p in payloads]
    stmt = ", ".join(f"c{i} = {q}" for i, q in enumerate(quoted))
    parts = split_top_level(stmt)
    assert len(parts) == len(payloads)
    for i, (part, q) in enumerate(zip(parts, quoted)):
        k, v = split_once_top_level(part, "=")
        assert k.strip() == f"c{i}"
        assert v.strip() == q  # payload reaches the expression byte-exact


@given(st.text(alphabet=st.characters(blacklist_characters="`"), min_size=1,
               max_size=30))
@settings(max_examples=200, deadline=None)
def test_ident_quotes_round_trip(name):
    quoted = "`" + name.replace("`", "``") + "`"
    assert strip_ident_quotes(quoted) == name


def test_backslash_escape_inside_string():
    s = r"SET a = 'it\'s WHERE', b = 2"
    parts = split_top_level(s)
    assert len(parts) == 2
    assert parts[0].strip() == r"SET a = 'it\'s WHERE'"


# --------------------------------------------------------------- engine

@pytest.fixture()
def eng(spark, tmp_base):
    from onehouse_demos_spark.sql.engine import Engine

    e = Engine(spark, tmp_base + "/wh_lexer")
    e.sql(
        "CREATE TABLE notes (id INT, note STRING, ver INT) "
        "USING lakehouse "
        "TBLPROPERTIES (primaryKey = 'id', preCombineField = 'ver')"
    )
    e.sql("INSERT INTO notes VALUES (1, 'plain', 1), (2, 'other', 1)")
    return e


def _note(eng, i):
    return eng.sql(
        f"SELECT note FROM notes WHERE id = {i}"
    ).first().note


def test_update_value_containing_where_keyword(eng):
    eng.sql(
        "UPDATE notes SET note = 'use WHERE x WHEN MATCHED THEN', ver = 2 "
        "WHERE id = 1"
    )
    assert _note(eng, 1) == "use WHERE x WHEN MATCHED THEN"
    assert _note(eng, 2) == "other"


def test_update_without_where_but_keyword_in_string(eng):
    """The lazy sets/optional-WHERE split must not treat ' WHERE ' inside
    a literal as the predicate boundary."""
    eng.sql("UPDATE notes SET note = 'a WHERE id = 2', ver = 3")
    assert _note(eng, 1) == "a WHERE id = 2"
    assert _note(eng, 2) == "a WHERE id = 2"  # applies to ALL rows


def test_delete_predicate_string_with_delete_keyword(eng):
    eng.sql("DELETE FROM notes WHERE note = 'plain' OR note = 'DELETE FROM x'")
    ids = sorted(r.id for r in eng.sql("SELECT id FROM notes").collect())
    assert ids == [2]


def test_quoted_identifier_statements(eng):
    eng.sql(
        "CREATE TABLE `where` (`order` INT, `select` STRING, ver INT) "
        "USING lakehouse "
        "TBLPROPERTIES (primaryKey = '`order`', preCombineField = 'ver')"
    )
    # hmm: primaryKey property value arrives quoted — engine stores raw
    t = eng.table("where")
    eng.sql("INSERT INTO `where` (`order`, `select`, ver) VALUES (1, 'a', 1)")
    eng.sql("UPDATE `where` SET `select` = 'b WHERE 1', ver = 2")
    rows = eng.sql("SELECT `order`, `select` FROM `where`").collect()
    assert [(r[0], r[1]) for r in rows] == [(1, "b WHERE 1")]
    eng.sql("DELETE FROM `where`")
    assert eng.sql("SELECT * FROM `where`").count() == 0
    assert t is not None


def test_merge_with_keyword_strings_in_source_and_sets(eng, spark):
    spark.createDataFrame(
        [(1, "WHEN MATCHED THEN injected", 5), (3, "USING x ON y", 5)],
        "id int, note string, ver int",
    ).createOrReplaceTempView("src_notes")
    eng.sql(
        "MERGE INTO notes t USING src_notes s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET note = s.note, ver = s.ver "
        "WHEN NOT MATCHED THEN INSERT (id, note, ver) "
        "VALUES (s.id, 'new WHEN NOT MATCHED THEN', s.ver)"
    )
    assert _note(eng, 1) == "WHEN MATCHED THEN injected"
    assert _note(eng, 2) == "other"
    assert _note(eng, 3) == "new WHEN NOT MATCHED THEN"


def test_merge_delete_with_keyword_condition_string(eng, spark):
    spark.createDataFrame([(2, "x", 9)], "id int, note string, ver int"
                          ).createOrReplaceTempView("src_del")
    eng.sql(
        "MERGE INTO notes t USING src_del s ON t.id = s.id "
        "WHEN MATCHED AND t.note <> 'WHEN MATCHED THEN DELETE' THEN DELETE"
    )
    ids = sorted(r.id for r in eng.sql("SELECT id FROM notes").collect())
    assert ids == [1]


def test_insert_values_with_keyword_strings(eng):
    eng.sql(
        "INSERT INTO notes VALUES (7, 'INSERT INTO notes VALUES (9)', 1)"
    )
    assert _note(eng, 7) == "INSERT INTO notes VALUES (9)"


def test_merge_target_qualified_set_key(eng, spark):
    """`UPDATE SET t.note = ...` (target-alias-qualified key) must
    resolve to the column, not be dropped silently."""
    spark.createDataFrame([(1, "tq", 8)], "id int, note string, ver int"
                          ).createOrReplaceTempView("src_tq")
    eng.sql(
        "MERGE INTO notes t USING src_tq s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET t.note = s.note, t.ver = s.ver"
    )
    assert _note(eng, 1) == "tq"


def test_drop_table_statement(eng):
    eng.sql("CREATE TABLE droppable (id INT, ver INT) USING lakehouse "
            "TBLPROPERTIES (primaryKey = 'id', preCombineField = 'ver')")
    eng.sql("INSERT INTO droppable VALUES (1, 1)")
    assert "droppable" in eng.tables()
    eng.sql("DROP TABLE droppable")
    assert "droppable" not in eng.tables()
    # the view is gone from the Spark session too
    with pytest.raises(Exception):
        eng.spark.sql("SELECT * FROM droppable").collect()
    # IF EXISTS on a missing table: no-op; bare DROP: error
    eng.sql("DROP TABLE IF EXISTS droppable")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("DROP TABLE droppable")


def test_comments_masked_no_phantom_literal():
    """A quote inside a comment must not open a literal that swallows
    the rest of the statement — and keywords in comments must not
    steer clause detection."""
    s = "UPDATE t SET a = 1 -- don't WHERE\nWHERE b = 2"
    m = mask_literals(s)
    assert len(m) == len(s)
    assert "don't" not in m
    assert m.endswith("WHERE b = 2")  # the REAL clause survives
    s2 = "SELECT 1 /* it's a 'comment' WHERE */ , 2"
    m2 = mask_literals(s2)
    assert len(m2) == len(s2)
    assert "comment" not in m2 and m2.endswith(", 2")
    assert len(split_top_level(s2)) == 2


def test_update_with_trailing_comment(eng):
    eng.sql("UPDATE notes SET note = 'c1', ver = 4 "
            "WHERE id = 1 -- operator's note\n")
    assert _note(eng, 1) == "c1"


def test_strip_comments_preserves_literals():
    from onehouse_demos_spark.sql.lexer import strip_comments

    s = "UPDATE t SET a = '--not a comment' -- real\nWHERE b = '/*x*/'"
    got = strip_comments(s)
    assert "'--not a comment'" in got
    assert "'/*x*/'" in got
    assert " real" not in got
    # DELETE with a trailing comment now matches the anchored grammar
    assert strip_comments("DELETE FROM t -- bye").rstrip() == "DELETE FROM t"


def test_strip_comments_is_a_token_separator():
    """A comment separates tokens, same as whitespace: stripping must
    not glue the neighbours together ('1/*c*/WHERE' != '1WHERE')."""
    from onehouse_demos_spark.sql.lexer import strip_comments

    got = strip_comments("UPDATE t SET a=1/*c*/WHERE b=2")
    assert "1WHERE" not in got
    assert re.search(r"a=1\s+WHERE b=2", got)
    got2 = strip_comments("SELECT/*c*/a FROM t")
    assert "SELECTa" not in got2
    assert re.search(r"SELECT\s+a FROM t", got2)
    # line comment at a token boundary (no trailing newline)
    got3 = strip_comments("SELECT 1-- c")
    assert got3.rstrip() == "SELECT 1"


def test_block_comment_glue_executes(eng):
    """End-to-end: the statement the advisor flagged parses and runs."""
    eng.sql("UPDATE notes SET ver = 9/*c*/WHERE id = 1")
    row = eng.sql("SELECT ver FROM notes WHERE id = 1").collect()[0]
    assert row.ver == 9
    assert eng.sql("SELECT/*c*/id FROM notes WHERE id = 1").count() == 1


def test_delete_with_trailing_comment(eng):
    eng.sql("DELETE FROM notes WHERE id = 2 -- cleanup")
    ids = sorted(r.id for r in eng.sql("SELECT id FROM notes").collect())
    assert ids == [1]
