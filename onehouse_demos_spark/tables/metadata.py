"""Table metadata extraction (reference M16 — LakeView
`metadataExtractorConfig`, `lakeview/hudi.yaml:35-43`,
`README.md:1381-1390`): walk table metadata and produce an
observability report. Local JSON output instead of an upload; driven
purely from commit metadata (no data scan)."""

from __future__ import annotations

import json
import os
from typing import Any

from onehouse_demos_spark.tables.table import LakehouseTable


def table_report(table: LakehouseTable) -> dict[str, Any]:
    base = table.manifest.describe()
    instants = table.timeline.instants()
    files = table.manifest.live_files()
    by_partition: dict[str, dict] = {}
    for f in files:
        p = f.partition or ""
        slot = by_partition.setdefault(
            p, {"num_files": 0, "num_log_files": 0, "rows": 0}
        )
        slot["num_files"] += 1
        if f.kind == "log":
            slot["num_log_files"] += 1
        else:
            slot["rows"] += f.rows
    ops: dict[str, int] = {}
    for i in instants:
        if i.operation:
            ops[i.operation] = ops.get(i.operation, 0) + 1
    base.update(
        {
            "table_name": table.config.name,
            "table_type": table.config.table_type,
            "record_key": table.config.record_key,
            "precombine": table.config.precombine,
            "partition_by": table.config.partition_by,
            "partitions_detail": by_partition,
            "operations": ops,
            "timeline_span": (
                [instants[0].instant, instants[-1].instant] if instants else None
            ),
            "pending_compaction_partitions": sorted(
                {f.partition or "" for f in files if f.kind == "log"}
            ),
            # observability for the round-2 services: what is pinned,
            # how healthy is the file layout, how indexed are probes
            "savepoints": [
                i.extra.get("saved_instant")
                for i in instants
                if i.action == "savepoint"
            ],
            "small_files": sum(
                1
                for f in files
                if f.kind == "base"
                and f.rows < table.config.target_file_rows * 0.5
            ),
            "bloom_indexed_files": sum(
                1 for f in files if f.kind == "base" and f.key_bloom
            ),
        }
    )
    return base


def warehouse_report(engine, out_path: str | None = None) -> dict[str, Any]:
    """Report for every table in an Engine's warehouse (the lake-level
    view LakeView presents: lake → databases → tables)."""
    report = {
        "warehouse_dir": engine.warehouse_dir,
        "num_tables": len(engine.tables()),
        "tables": {name: table_report(engine.table(name)) for name in engine.tables()},
    }
    if out_path:
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=2, default=str)
        os.rename(tmp, out_path)
    return report
