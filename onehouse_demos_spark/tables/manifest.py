"""Manifest: resolve the live file set for any query view, from the
timeline alone (never by listing storage).

This is the reader half of the table format: snapshot / read-optimized
/ incremental / time-travel all reduce to "which files, then which
rows" (SURVEY §2.4). File skipping for incremental queries mirrors the
reference behavior "file-ids that do not have any updates from the
commit ... filtered out without scanning"
(`hudi-spark-minio-trino/README.md:954,979`).
"""

from __future__ import annotations

from onehouse_demos_spark.tables.timeline import (
    RECORD_ACTIONS,
    FileMeta,
    Timeline,
)


class Manifest:
    def __init__(self, timeline: Timeline):
        self.timeline = timeline

    # -- live file resolution -------------------------------------------------

    def live_files(
        self,
        as_of: str | None = None,
        include_logs: bool = True,
    ) -> list[FileMeta]:
        """Files visible in a snapshot as of `as_of` (default: latest).

        Replays the timeline: adds accumulate, removes drop. Cost is
        O(#commits × #files-per-commit) of pure metadata.
        """
        alive: dict[str, FileMeta] = {}
        for inst in self.timeline.instants():
            if as_of is not None and inst.instant > as_of:
                break
            for path in inst.removes:
                alive.pop(path, None)
            for fm in inst.adds:
                alive[fm.path] = fm
        files = list(alive.values())
        if not include_logs:
            files = [f for f in files if f.kind == "base"]
        return sorted(files, key=lambda f: f.path)

    def incremental_files(self, begin: str | None, end: str | None = None) -> list[FileMeta]:
        """Files added by record-bearing commits in (begin, end].

        replacecommits (compaction/clustering/overwrite) are skipped:
        they carry no new logical records (reference
        `README.md:1224-1227` — incremental readers see the commit
        chain across compaction without re-reading rewritten data).
        """
        out: list[FileMeta] = []
        for inst in self.timeline.instants():
            if inst.action not in RECORD_ACTIONS:
                continue
            if begin is not None and inst.instant <= begin:
                continue
            if end is not None and inst.instant > end:
                continue
            out.extend(inst.adds)
        return sorted(out, key=lambda f: f.path)

    # -- pruning --------------------------------------------------------------

    @staticmethod
    def prune_by_partition(
        files: list[FileMeta], partitions: set[str] | None
    ) -> list[FileMeta]:
        if partitions is None:
            return files
        return [f for f in files if f.partition in partitions]

    @staticmethod
    def prune_by_key_range(
        files: list[FileMeta], key_min: str, key_max: str
    ) -> list[FileMeta]:
        """Keep files whose [key_min, key_max] intersects the probe
        range. Files without stats are conservatively kept. This is
        the write-side index that keeps upsert/delete from scanning
        the whole table at 100 TB."""
        out = []
        for f in files:
            if f.key_min is None or f.key_max is None:
                out.append(f)
            elif not (f.key_max < key_min or f.key_min > key_max):
                out.append(f)
        return out

    @staticmethod
    def prune_by_col_stats(
        files: list[FileMeta], filters: list[tuple[str, str, object]]
    ) -> list[FileMeta]:
        """Data skipping: drop files whose [min, max] for a filtered
        column proves no row can satisfy the predicate. Files without
        stats for the column are conservatively kept. Supported ops:
        = < <= > >=."""

        def may_match(f: FileMeta, col: str, op: str, val) -> bool:
            rng = f.col_stats.get(col)
            if rng is None:
                return True
            lo, hi = rng
            try:
                if op == "=":
                    return lo <= val <= hi
                if op == "<":
                    return lo < val
                if op == "<=":
                    return lo <= val
                if op == ">":
                    return hi > val
                if op == ">=":
                    return hi >= val
            except TypeError:
                return True  # incomparable types → keep
            return True  # unknown op → keep

        out = files
        for col, op, val in filters:
            out = [f for f in out if may_match(f, col, op, val)]
        return out

    # -- stats ----------------------------------------------------------------

    def partitions(self) -> list[str]:
        return sorted({f.partition or "" for f in self.live_files()})

    def describe(self) -> dict:
        """DESCRIBE DETAIL-style metadata report (reference M16
        'LakeView metadata extraction', `lakeview/hudi.yaml:35-43`)."""
        files = self.live_files()
        instants = self.timeline.instants()
        return {
            "base_path": self.timeline.base_path,
            "num_commits": len(instants),
            "latest_instant": instants[-1].instant if instants else None,
            "num_live_files": len(files),
            "num_base_files": sum(1 for f in files if f.kind == "base"),
            "num_log_files": sum(1 for f in files if f.kind == "log"),
            "total_rows_estimate": sum(f.rows for f in files if f.kind == "base"),
            "partitions": self.partitions(),
            "actions": {
                a: sum(1 for i in instants if i.action == a)
                for a in {i.action for i in instants}
            },
        }
