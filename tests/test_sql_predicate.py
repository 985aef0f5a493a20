"""Expression-safe MERGE/UPDATE conditions (VERDICT r4 ask #7): the
recursive-descent validator (sql/predicate.py) must parse the DML
expression surface — nested parens, CASE WHEN inside conditions,
AND/THEN/WHEN inside string literals — and reject what the engine
cannot execute (subqueries) with a clear error, never a silent
mis-split."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from onehouse_demos_spark.sql.predicate import (
    SqlParseError,
    find_top_level_keyword,
    split_top_level_keyword,
    validate_expression,
)

# ----------------------------------------------------- pure validator

GOOD = [
    "a = 1",
    "t.id = s.id",
    "(a + b) * 2 > c - 1",
    "((a = 1 AND b = 2) OR (c = 3 AND d = 4))",
    "NOT (a = 1 OR (b = 2 AND NOT c = 3))",
    "name LIKE 'x%' AND note <> 'a AND b'",
    "v IS NOT NULL AND v NOT IN (1, 2, 3)",
    "x BETWEEN 1 AND 10 AND y BETWEEN a + 1 AND b * 2",
    "greatest(a, least(b, c)) >= coalesce(d, 0)",
    "CAST(ts AS TIMESTAMP) > CAST('2024-01-01' AS DATE)",
    "CASE WHEN a = 1 THEN 'x' WHEN b = 2 THEN 'y' ELSE 'z' END = 'x'",
    "CASE a WHEN 1 THEN true ELSE false END",
    "`weird col` = 'v''al' AND `t`.`c` = \"lit\"",
    "amount % 13 = 0 OR -amount < +3.5e2",
    "concat(a, '|', b) = 'x|y'",
    "arr[0] = 1",
    "count(*) > 0",
    "s.ver > t.ver AND s.city IS DISTINCT FROM t.city",
    # r6 (ADVICE): higher-order-function lambdas in argument position
    "transform(arr, x -> x + 1)[0] = 2",
    "exists(arr, x -> x > 5)",
    "forall(tags, t -> t LIKE 'ok%')",
    "aggregate(vals, 0, (acc, x) -> acc + x) > 10",
    "zip_with(a, b, (x, y) -> x * y)[0] = 0",
    "filter(arr, (x, i) -> x > i)[0] IS NOT NULL",
    # r6 (ADVICE): `end` is non-reserved — usable as a column
    "end > 5",
    "end >= start AND end - start < 60",
    "CASE WHEN a THEN 1 ELSE 2 END + end = 3",
]


@pytest.mark.parametrize("expr", GOOD)
def test_accepts_dml_surface(expr):
    assert validate_expression(expr) == expr


BAD = [
    ("id IN (SELECT id FROM t)", "subqueries"),
    ("EXISTS (SELECT 1 FROM t)", "subqueries"),
    ("a = (SELECT max(b) FROM t)", "subqueries"),
    ("a = ", "unexpected"),
    ("(a = 1", r"expected '\)'"),
    ("a = 1)", "trailing"),
    ("a = 'unterminated", "unterminated"),
    ("CASE WHEN a THEN 1", "expected END"),
    ("a BETWEEN 1", "expected AND"),
    ("", "empty"),
    # lambdas are only legal as function arguments
    ("a -> 1", "trailing"),
    ("exists(SELECT 1)", "subqueries"),
]


@pytest.mark.parametrize("expr,msg", BAD)
def test_rejects_with_clear_error(expr, msg):
    with pytest.raises(SqlParseError, match=msg):
        validate_expression(expr)


def test_keyword_split_ignores_nested_structures():
    s = "x = CASE WHEN a THEN 1 ELSE 2 END AND f(1) = 2 WHEN MATCHED"
    # WHEN inside CASE...END is not top-level; the trailing one is
    assert find_top_level_keyword(s, "WHEN") == s.rindex("WHEN")
    s2 = "a = 'WHEN MATCHED' AND (b = 1 OR c = 2)"
    assert find_top_level_keyword(s2, "WHEN") == -1
    parts = split_top_level_keyword(
        "MATCHED AND x = 1 THEN UPDATE SET v = 2", "THEN"
    )
    assert [p.strip() for p in parts] == ["MATCHED AND x = 1",
                                          "UPDATE SET v = 2"]


def test_keyword_split_survives_bare_end_identifier():
    """r6 (ADVICE): a column named `end` (non-reserved in Spark) must
    not be mistaken for a CASE terminator — previously it drove the
    CASE depth negative and swallowed every later top-level keyword."""
    s = ("MATCHED AND end > 5 THEN UPDATE SET v = 1 "
         "WHEN NOT MATCHED THEN INSERT *")
    parts = split_top_level_keyword(s, "WHEN")
    assert len(parts) == 2, parts
    assert parts[1].strip().startswith("NOT MATCHED")
    # and with a REAL CASE..END before the bare `end`, depth still resolves
    s2 = ("MATCHED AND CASE WHEN a THEN b ELSE c END = 1 AND end > 0 "
          "THEN DELETE WHEN NOT MATCHED THEN INSERT *")
    assert len(split_top_level_keyword(s2, "WHEN")) == 2


@settings(max_examples=200, deadline=None)
@given(
    depth=st.integers(min_value=1, max_value=12),
    lit=st.sampled_from(
        ["'AND'", "' THEN '", "'WHEN MATCHED'", "'a (b'", "')'"]
    ),
)
def test_property_nested_parens_and_literals(depth, lit):
    """Arbitrarily nested boolean groups with hostile literals always
    validate; one paren short always fails."""
    expr = f"a = {lit}"
    for _ in range(depth):
        expr = f"({expr} AND b = 1)"
    assert validate_expression(expr) == expr
    with pytest.raises(SqlParseError):
        validate_expression(expr[:-1])  # drop the closing paren


# ------------------------------------------------- engine integration

from onehouse_demos_spark.sql import Engine  # noqa: E402


@pytest.fixture()
def eng(spark, tmp_base):
    e = Engine(spark, f"{tmp_base}/wh_pred")
    e.sql(
        "CREATE TABLE pt (id INT, grade STRING, v INT) USING lakehouse "
        "TBLPROPERTIES (primaryKey=id, preCombineField=v)"
    )
    e.sql("INSERT INTO pt VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    return e


def _vals(eng):
    return {
        (r.id, r.grade, r.v)
        for r in eng.sql("SELECT id, grade, v FROM pt").collect()
    }


def test_merge_with_case_when_in_on_condition(eng, spark):
    """The r4 lazy regex cut the ON condition at the CASE's WHEN;
    the splitter must carry it through to the join."""
    spark.createDataFrame(
        [(1, "z", 100), (9, "n", 90)], "id int, grade string, v int"
    ).createOrReplaceTempView("psrc")
    eng.sql(
        "MERGE INTO pt t USING psrc s "
        "ON t.id = CASE WHEN s.id < 5 THEN s.id ELSE -1 END "
        "WHEN MATCHED THEN UPDATE SET grade = s.grade, v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert _vals(eng) == {(1, "z", 100), (2, "b", 20), (3, "c", 30),
                          (9, "n", 90)}


def test_merge_when_condition_with_nested_parens_and_strings(eng, spark):
    spark.createDataFrame(
        [(2, "x", 99), (3, "x", 5)], "id int, grade string, v int"
    ).createOrReplaceTempView("psrc2")
    eng.sql(
        "MERGE INTO pt t USING psrc2 s ON t.id = s.id "
        "WHEN MATCHED AND ((s.v > t.v AND s.grade <> 'WHEN MATCHED') "
        "OR (t.grade = 'never' AND s.v = -1)) "
        "THEN UPDATE SET grade = s.grade, v = s.v"
    )
    # id=2 updated (99 > 20); id=3 untouched (5 < 30)
    assert _vals(eng) == {(1, "a", 10), (2, "x", 99), (3, "c", 30)}


def test_merge_update_delete_subqueries_rejected_loudly(eng, spark):
    spark.createDataFrame([(1,)], "id int").createOrReplaceTempView("psrc3")
    with pytest.raises(SqlParseError, match="subqueries"):
        eng.sql(
            "MERGE INTO pt t USING psrc3 s "
            "ON t.id = (SELECT max(id) FROM pt) "
            "WHEN MATCHED THEN DELETE"
        )
    with pytest.raises(SqlParseError, match="subqueries"):
        eng.sql("UPDATE pt SET v = 1 WHERE id IN (SELECT id FROM pt)")
    with pytest.raises(SqlParseError, match="subqueries"):
        eng.sql("DELETE FROM pt WHERE EXISTS (SELECT 1 FROM pt)")
    assert _vals(eng) == {(1, "a", 10), (2, "b", 20), (3, "c", 30)}


def test_malformed_merge_fails_loudly_not_silently(eng, spark):
    spark.createDataFrame([(1,)], "id int").createOrReplaceTempView("psrc4")
    with pytest.raises(SqlParseError, match="missing THEN"):
        eng.sql(
            "MERGE INTO pt t USING psrc4 s ON t.id = s.id "
            "WHEN MATCHED AND t.v > 1 UPDATE SET v = 1"
        )
    with pytest.raises(SqlParseError, match="expected AND"):
        eng.sql(
            "MERGE INTO pt t USING psrc4 s ON t.id = s.id "
            "WHEN MATCHED t.v > 1 THEN DELETE"
        )


# ----------------------------------- r6: multi-branch MERGE + BY SOURCE


def test_merge_multiple_when_matched_first_match_wins(eng, spark):
    """Ordered WHEN MATCHED branches (Spark 3.4 / Delta semantics): a
    row is consumed by the FIRST branch whose condition holds, later
    branches never see it."""
    spark.createDataFrame(
        [(1, "m", 100), (2, "m", 200), (3, "m", 300)],
        "id int, grade string, v int",
    ).createOrReplaceTempView("mb_src")
    eng.sql(
        "MERGE INTO pt t USING mb_src s ON t.id = s.id "
        "WHEN MATCHED AND s.v >= 300 THEN DELETE "
        "WHEN MATCHED AND s.v >= 200 THEN UPDATE SET grade = 'big', v = s.v "
        "WHEN MATCHED THEN UPDATE SET grade = 'small', v = s.v"
    )
    assert _vals(eng) == {(1, "small", 100), (2, "big", 200)}


def test_merge_not_matched_by_source_update_and_delete(eng, spark):
    """BY SOURCE branches act on TARGET-ONLY rows (full-outer plan):
    bare column refs bind to the target side, conditions gate in
    order, and matched/insert branches are unaffected."""
    spark.createDataFrame(
        [(1, "z", 11), (7, "n", 70)], "id int, grade string, v int"
    ).createOrReplaceTempView("bs_src")
    eng.sql(
        "MERGE INTO pt t USING bs_src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET grade = s.grade, v = s.v "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND id = 2 THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET grade = 'stale'"
    )
    assert _vals(eng) == {
        (1, "z", 11),        # matched update
        (3, "stale", 30),    # by-source update
        (7, "n", 70),        # insert
    }                        # id=2 deleted by the first BY SOURCE branch


def test_merge_by_source_rejects_source_references(eng, spark):
    spark.createDataFrame(
        [(1, "z", 11)], "id int, grade string, v int"
    ).createOrReplaceTempView("bsr_src")
    with pytest.raises(SqlParseError, match="cannot reference the source"):
        eng.sql(
            "MERGE INTO pt t USING bsr_src s ON t.id = s.id "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET grade = s.grade"
        )


def test_merge_unconditional_branch_must_be_last(eng, spark):
    """Adversarial mis-ordering: an unconditional WHEN MATCHED before a
    conditional one would shadow it — rejected at parse time, table
    untouched."""
    spark.createDataFrame(
        [(1, "z", 11)], "id int, grade string, v int"
    ).createOrReplaceTempView("ord_src")
    before = _vals(eng)
    with pytest.raises(SqlParseError, match="only the last WHEN MATCHED"):
        eng.sql(
            "MERGE INTO pt t USING ord_src s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET v = s.v "
            "WHEN MATCHED AND s.v > 5 THEN DELETE"
        )
    with pytest.raises(
        SqlParseError, match="only the last WHEN NOT MATCHED BY SOURCE"
    ):
        eng.sql(
            "MERGE INTO pt t USING ord_src s ON t.id = s.id "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE "
            "WHEN NOT MATCHED BY SOURCE AND id = 2 THEN UPDATE SET v = 0"
        )
    assert _vals(eng) == before


def test_merge_by_source_on_matched_clause_rejected(eng, spark):
    spark.createDataFrame(
        [(1, "z", 11)], "id int, grade string, v int"
    ).createOrReplaceTempView("bym_src")
    with pytest.raises(SqlParseError, match="NOT MATCHED clauses"):
        eng.sql(
            "MERGE INTO pt t USING bym_src s ON t.id = s.id "
            "WHEN MATCHED BY TARGET THEN UPDATE SET v = s.v"
        )
    with pytest.raises(SqlParseError, match="INSERT only"):
        eng.sql(
            "MERGE INTO pt t USING bym_src s ON t.id = s.id "
            "WHEN NOT MATCHED BY TARGET THEN UPDATE SET v = s.v"
        )
    with pytest.raises(SqlParseError, match="UPDATE SET / DELETE"):
        eng.sql(
            "MERGE INTO pt t USING bym_src s ON t.id = s.id "
            "WHEN NOT MATCHED BY SOURCE THEN INSERT *"
        )


def test_merge_update_set_star(eng, spark):
    """Delta's `UPDATE SET *`: every same-named source column lands on
    the matched target row; rejected under BY SOURCE (source is NULL)."""
    spark.createDataFrame(
        [(1, "s1", 111), (9, "s9", 999)], "id int, grade string, v int"
    ).createOrReplaceTempView("star_src")
    eng.sql(
        "MERGE INTO pt t USING star_src s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert _vals(eng) == {(1, "s1", 111), (2, "b", 20), (3, "c", 30),
                          (9, "s9", 999)}
    with pytest.raises(SqlParseError, match="meaningless"):
        eng.sql(
            "MERGE INTO pt t USING star_src s ON t.id = s.id "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *"
        )


def test_merge_subquery_source_with_inner_join_on(eng, spark):
    """r6: a USING (<subquery>) whose body itself contains
    `) alias ON` (a join of a derived table) must not be cut short by
    the lazy header regex — the balanced-paren re-extraction carries
    the full subquery into the plan."""
    spark.createDataFrame(
        [(1, 100), (9, 900)], "id int, v int"
    ).createOrReplaceTempView("outer_src")
    spark.createDataFrame(
        [(1, "j1"), (9, "j9")], "id int, grade string"
    ).createOrReplaceTempView("grade_src")
    eng.sql(
        "MERGE INTO pt t USING ("
        "  SELECT o.id, g.grade, o.v FROM outer_src o "
        "  JOIN (SELECT id, grade FROM grade_src) g ON o.id = g.id"
        ") s ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET grade = s.grade, v = s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert _vals(eng) == {(1, "j1", 100), (2, "b", 20), (3, "c", 30),
                          (9, "j9", 900)}
