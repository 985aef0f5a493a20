"""Parse Spark's formatted explain output for plan assertions.

Used by perf tests to pin the plan properties that matter at 100 TB
(SURVEY §4): predicate pushdown reaching the parquet scan, column
pruning (ReadSchema), broadcast joins for dims, wide WholeStageCodegen
spans. Pinning them in tests prevents silent plan regressions — the
Spark-native analog of the reference's reliance on engine-side
pushdown (`README.md:389,414` sub-second filtered scans).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters:\s*\[([^\]]*)\]", text):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read from each parquet scan (pruning
    check: a 2-column projection must not read 16 columns)."""
    text = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema:\s*struct<([^>]*)>", text):
        cols = {
            c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()
        }
        out.append(cols)
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (fewer = wider spans =
    more operators fused into generated code)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))


def num_exchanges(df: DataFrame) -> int:
    """Count distinct Exchange NODES. Formatted explain prints each
    node twice (tree line `Exchange (7)` + detail header
    `(7) Exchange`), so count unique node ids, not substring hits."""
    ids = set(re.findall(r"\((\d+)\) Exchange", explain_str(df)))
    return len(ids)


def scan_stats(df: DataFrame) -> dict:
    text = explain_str(df)
    return {
        "num_scans": len(re.findall(r"Scan parquet", text)),
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schema_columns(df),
        "broadcast_join": "BroadcastHashJoin" in text,
        "sort_merge_join": "SortMergeJoin" in text,
        "shuffles": num_exchanges(df),
        "codegen_spans": wholestage_codegen_spans(df),
    }
