"""Partition-incremental materialized aggregates (hypertable-rollup
style).

A ``MaterializedAggregate`` keeps the result of a groupBy over a
lakehouse table continuously fresh: each ``refresh()`` reads the
table's commit timeline since the last refresh, derives the set of
TOUCHED PARTITIONS (pure metadata — no data scan), recomputes the
aggregate for those partitions only from the current snapshot, and
splices the rows into the previous materialization. Work is
∝ changed partitions, never table size — the property that makes
continuous rollups viable at 100 TB.

Correctness does not depend on the mutation type: upserts, deletes,
insert_overwrite and delete_partition all reduce to "these partitions
changed, recompute them from the snapshot" (recompute-from-snapshot
sidesteps the before-image problem that delta-based incremental view
maintenance has with non-additive updates). Compaction/clustering
replace-commits rewrite files without changing logical rows; they are
skipped via the same RECORD_ACTIONS rule the incremental reader uses
(reference `hudi-spark-minio-trino/README.md:1224-1227`).

The reference's LakeView metadata extraction (`lakeview/hudi.yaml`)
walks the same timeline for observability; this module walks it to
keep derived data fresh.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from onehouse_demos_spark.tables.table import HIVE_DEFAULT_PARTITION, LakehouseTable
from onehouse_demos_spark.tables.timeline import RECORD_ACTIONS

_STATE_FILE = "_matview.json"


class MaterializedAggregate:
    """Continuously-refreshable aggregate over a partitioned table.

    ``agg_fn(df)`` must return one row per group and include the
    table's partition column among its output columns (that column is
    the splice key). For unpartitioned tables every refresh is a full
    recompute — correct, but without the incremental win.
    """

    def __init__(
        self,
        table: LakehouseTable,
        path: str,
        agg_fn: Callable[[DataFrame], DataFrame],
    ):
        self.table = table
        self.path = path
        self.agg_fn = agg_fn
        pby = table.config.partition_by or []
        self.partition_col = pby[0] if len(pby) == 1 else None
        os.makedirs(path, exist_ok=True)

    # -- state ----------------------------------------------------------------

    def _state(self) -> dict:
        p = os.path.join(self.path, _STATE_FILE)
        if not os.path.exists(p):
            return {"last_instant": None, "version": None}
        with open(p) as fh:
            return json.load(fh)

    def _save_state(self, state: dict) -> None:
        tmp = os.path.join(self.path, _STATE_FILE + ".tmp")
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, os.path.join(self.path, _STATE_FILE))

    # -- partition-delta planning (metadata only) -----------------------------

    def _touched_partitions(self, since: str) -> set[str]:
        """Partitions changed by record-bearing commits in
        (since, latest]: partitions of added files plus partitions of
        removed paths (resolved from the add that introduced them —
        covers delete_partition, whose commit has removes only)."""
        part_of: dict[str, str] = {}
        touched: set[str] = set()
        for inst in self.table.timeline.instants():
            for fm in inst.adds:
                part_of[fm.path] = fm.partition or ""
            if inst.instant <= since:
                continue
            if inst.action not in RECORD_ACTIONS and inst.operation not in (
                "delete_partition",
                "insert_overwrite",
                "insert_overwrite_table",
            ):
                continue  # compaction/clustering: no logical change
            for fm in inst.adds:
                touched.add(fm.partition or "")
            for path in inst.removes:
                touched.add(part_of.get(path, ""))
        return touched

    # -- refresh --------------------------------------------------------------

    def refresh(self) -> dict:
        """Bring the materialization up to the table's latest commit.
        Returns {"mode", "partitions_recomputed", "instant"}."""
        state = self._state()
        latest = self.table.timeline.latest_instant()
        if latest is None or latest == state["last_instant"]:
            return {
                "mode": "noop",
                "partitions_recomputed": 0,
                "instant": state["last_instant"],
            }

        full = state["last_instant"] is None or self.partition_col is None
        if full:
            fresh = self.agg_fn(self.table.snapshot())
            merged = fresh
            n_parts = -1  # full recompute
        else:
            touched = self._touched_partitions(state["last_instant"])
            if not touched:
                self._save_state({**state, "last_instant": latest})
                return {
                    "mode": "noop",
                    "partitions_recomputed": 0,
                    "instant": latest,
                }
            # Splice key must be NULL-safe on BOTH filters: a NULL
            # partition value makes bare isin() evaluate to NULL (row
            # silently dropped from `keep`) while the manifest records
            # those files under HIVE_DEFAULT_PARTITION — so without the
            # coalesce the null-partition groups would vanish from the
            # materialization on every incremental refresh.
            pkey = F.coalesce(
                F.col(self.partition_col).cast("string"),
                F.lit(HIVE_DEFAULT_PARTITION),
            )
            recompute = [p if p else HIVE_DEFAULT_PARTITION for p in touched]
            snap = self.table.snapshot().filter(pkey.isin(recompute))
            fresh = self.agg_fn(snap)
            prev = self.read()
            keep = prev.filter(~pkey.isin(recompute))
            merged = keep.unionByName(fresh)
            n_parts = len(touched)

        vdir = os.path.join(self.path, f"v{latest}")
        merged.write.mode("overwrite").parquet(vdir)
        old_version = state.get("version")
        self._save_state({"last_instant": latest, "version": f"v{latest}"})
        if old_version and old_version != f"v{latest}":
            shutil.rmtree(os.path.join(self.path, old_version), ignore_errors=True)
        return {
            "mode": "full" if full else "incremental",
            "partitions_recomputed": n_parts,
            "instant": latest,
        }

    def read(self) -> DataFrame:
        state = self._state()
        if state["version"] is None:
            raise ValueError("materialized view has never been refreshed")
        return self.table.spark.read.parquet(
            os.path.join(self.path, state["version"])
        )
