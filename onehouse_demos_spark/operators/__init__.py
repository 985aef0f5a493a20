"""Query operators exposed through ``__spark_entry__``.

Each submodule defines two registries:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` —
  named operators; each callable loads parquet tables from ``sf_dir``
  and returns a DataFrame.
- ``ORACLES: dict[str, str]`` — for each query name, ANSI SQL that
  DuckDB can run against the same parquet files (views pre-registered
  with the bare table names) and that must match the Spark result on
  row count, schema (column names) and values.

Column-name parity between the two is part of the contract: the
correctness harness sorts columns by name before hashing values.
"""

from onehouse_demos_spark.operators import (
    analytics,
    dedup,
    multimodal,
    mutations,
    relational,
    similarity,
    sql_ops,
    streaming_ops,
    text,
)

_MODULES = (
    relational,
    analytics,
    mutations,
    dedup,
    similarity,
    text,
    multimodal,
    streaming_ops,
    sql_ops,
)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
