"""SQL DML surface exposed as an oracle-checkable operator: the
CREATE TABLE → INSERT SELECT → UPDATE → DELETE → MERGE INTO statement
chain (reference M10/M1/M5/M4/M6 via the Spark-SQL write path,
`demo/config/test-suite/spark-sql-partition-cow-updates.yaml`),
executed through `sql.Engine` against a temp warehouse, with the final
table state verified against a pure-SQL oracle over `orders`.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onehouse_demos_spark.sql import Engine

_CACHE: dict[str, Engine] = {}
_TMPDIRS: list[str] = []
atexit.register(lambda: [shutil.rmtree(d, ignore_errors=True) for d in _TMPDIRS])

_COLS = "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority"


def _build(spark: SparkSession, sf_dir: str) -> Engine:
    if sf_dir in _CACHE:
        return _CACHE[sf_dir]
    tmp = tempfile.mkdtemp(prefix="oh_sql_")
    _TMPDIRS.append(tmp)
    eng = Engine(spark, f"{tmp}/wh")

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        *[c.strip() for c in _COLS.split(",")]
    )
    orders.createOrReplaceTempView("orders_src")
    # merge source: every %5 key with a rewritten priority (full row so
    # `INSERT *` can resurrect deleted keys)
    orders.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_orderpriority", F.lit("X-MERGED")
    ).createOrReplaceTempView("merge_src")

    eng.sql(
        "CREATE TABLE sql_orders (o_orderkey BIGINT, o_custkey BIGINT, "
        "o_orderstatus STRING, o_totalprice DOUBLE, o_orderpriority STRING) "
        "USING lakehouse TBLPROPERTIES (primaryKey=o_orderkey)"
    )
    eng.sql(f"INSERT INTO sql_orders SELECT {_COLS} FROM orders_src")
    # +100.0 keeps the price's decimal representation exact in both
    # engines (a 1.1 multiplier lands on .005 round-half boundaries
    # where Spark HALF_UP and DuckDB disagree).
    eng.sql(
        "UPDATE sql_orders SET o_totalprice = o_totalprice + 100.0 "
        "WHERE o_orderstatus = 'O'"
    )
    eng.sql("DELETE FROM sql_orders WHERE o_orderkey % 13 = 0")
    eng.sql(
        "MERGE INTO sql_orders t USING merge_src s "
        "ON t.o_orderkey = s.o_orderkey "
        "WHEN MATCHED THEN UPDATE SET o_orderpriority = s.o_orderpriority "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    _CACHE[sf_dir] = eng
    return eng


def sql_dml_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state after the DML chain; every statement's effect is
    encoded in the oracle's CASE logic."""
    eng = _build(spark, sf_dir)
    return eng.table("sql_orders").snapshot().select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 2).alias("o_totalprice_r"),
    )


SQL_DML_PIPELINE_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       CASE WHEN o_orderkey % 5 = 0 THEN 'X-MERGED'
            ELSE o_orderpriority END AS o_orderpriority,
       ROUND(CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice
                  WHEN o_orderstatus = 'O' THEN o_totalprice + 100.0
                  ELSE o_totalprice END, 2) AS o_totalprice_r
FROM orders
WHERE o_orderkey % 13 <> 0 OR o_orderkey % 5 = 0
"""


QUERIES = {
    "sql_dml_pipeline": sql_dml_pipeline,
}

ORACLES = {
    "sql_dml_pipeline": SQL_DML_PIPELINE_SQL,
}
