"""Incremental table-as-source: consume another lakehouse table's
commits beyond a checkpoint (reference S4 — pipeline chaining via
`hoodie-incr.properties:26-29`: `hoodieincr.path` +
`read_latest_on_missing_ckpt`).

Each `pull()` returns exactly the records changed in
(checkpoint, latest] and advances the durable checkpoint, so chained
pipelines (bronze → silver → gold) process each commit exactly once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from onehouse_demos_spark.tables.table import LakehouseTable


class IncrementalTableSource:
    def __init__(
        self,
        table: LakehouseTable,
        checkpoint_path: str,
        read_latest_on_missing_ckpt: bool = False,
    ):
        """`read_latest_on_missing_ckpt=True` mirrors the reference
        flag: a missing checkpoint starts from the CURRENT snapshot
        boundary (skip history) instead of replaying from the
        beginning."""
        self.table = table
        self.checkpoint_path = checkpoint_path
        if read_latest_on_missing_ckpt and self._read_ckpt() is None:
            self._write_ckpt(table.timeline.latest_instant() or "")

    def _read_ckpt(self) -> str | None:
        if not os.path.exists(self.checkpoint_path):
            return None
        with open(self.checkpoint_path) as f:
            return json.load(f)["instant"]

    def _write_ckpt(self, instant: str) -> None:
        os.makedirs(os.path.dirname(self.checkpoint_path) or ".", exist_ok=True)
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"instant": instant}, f)
        os.rename(tmp, self.checkpoint_path)

    def pull(self) -> tuple[DataFrame | None, str | None]:
        """Changed records since the checkpoint, or (None, None) when
        caught up. Returns (df, end_instant); call `commit(end_instant)`
        after successfully processing to advance — pull/process/commit
        gives at-least-once, with exactly-once when the downstream
        write is an idempotent upsert (which LakehouseTable upserts
        are, per record key)."""
        begin = self._read_ckpt() or None
        end = self.table.timeline.latest_instant()
        if end is None or (begin is not None and end <= begin):
            return None, None
        df = self.table.incremental(begin=begin, end=end)
        return df, end

    def commit(self, end_instant: str) -> None:
        self._write_ckpt(end_instant)

    def process_available(self, fn) -> int:
        """Drain all pending commits through `fn(df)`; returns number
        of pulls processed."""
        n = 0
        while True:
            df, end = self.pull()
            if df is None:
                return n
            fn(df)
            self.commit(end)
            n += 1


class ChangeFeedSource(IncrementalTableSource):
    """CDF variant of the incremental table-as-source: each `pull()`
    returns `table.changes(begin, end)` — one row per changed key with
    `_change_type` ∈ insert/update/delete — instead of the upsert-only
    incremental records. This carries the reference's pipeline-chaining
    semantics (`hoodie-incr.properties:26-29`) WITH delete propagation:
    a plain incremental read cannot surface a vanished key, so a
    downstream table chained through `IncrementalTableSource` silently
    retains rows the upstream deleted. Chaining through this source
    keeps the downstream an exact (optionally transformed) mirror.

    Works across compaction/clustering: `changes()` diffs the begin/end
    SNAPSHOTS, and replace-commits rewrite files without touching
    logical records — so a delete folded into a MOR log before a
    compaction still reaches the downstream even when the pull window
    spans the compaction commit.

    Scale shape: one pull = two manifest-pruned snapshot reads + one
    co-partitioned full-outer key join (see `LakehouseTable.changes`);
    the apply is one upsert + one delete on the target — all bounded by
    the snapshots, never by timeline length."""

    def pull(
        self, end: str | None = None
    ) -> tuple[DataFrame | None, str | None]:
        """Change rows in (checkpoint, end] — `end` defaults to the
        latest instant; an explicit `end` bounds the window (catch-up
        in controlled steps, or deterministic replay in tests)."""
        begin = self._read_ckpt() or None
        end = end or self.table.timeline.latest_instant()
        if end is None or (begin is not None and end <= begin):
            return None, None
        df = self.table.changes(begin=begin, end=end)
        return df, end

    def _delete_keys(self, deletes: DataFrame) -> DataFrame:
        """Reconstruct the upstream's record-key COLUMNS from the
        change feed's composite `_oh_record_key` (delete rows carry no
        post-image, so the key witness is the only handle). Inverse of
        `table._key_expr`: single keys are a cast, composite keys
        split on the '|' separator then part-unescaped ('\\p' -> '|',
        '\\b' -> '\\'; the escape guarantees parts hold no raw '|')."""
        from pyspark.sql import functions as F

        from onehouse_demos_spark.tables.table import KEY_COL, unescape_key_part

        key_cols = self.table.config.record_key
        schema = self.table._latest_schema()
        types = {f.name: f.dataType for f in schema.fields}
        if len(key_cols) == 1:
            c = key_cols[0]
            return deletes.select(F.col(KEY_COL).cast(types[c]).alias(c))
        parts = F.split(F.col(KEY_COL), "\\|", -1)
        return deletes.select(
            *[
                unescape_key_part(parts.getItem(i)).cast(types[c]).alias(c)
                for i, c in enumerate(key_cols)
            ]
        )

    def apply_to(self, target, transform=None, end: str | None = None) -> int:
        """Drain pending upstream commits (optionally bounded at `end`)
        into `target`: inserts/updates upsert the post-image
        (optionally mapped through `transform(df)`), deletes propagate
        as target deletes keyed by the upstream record key. Returns
        pulls processed. At-least-once per pull; exactly-once end state
        because both upsert and delete are idempotent per record key."""
        from onehouse_demos_spark.tables.table import KEY_COL

        def fn(changes: DataFrame) -> None:
            deletes = changes.filter(changes["_change_type"] == "delete")
            upserts = changes.filter(changes["_change_type"] != "delete")
            drop = [
                c
                for c in changes.columns
                if c == KEY_COL or c == "_change_type" or c.startswith("_pre_")
            ]
            upserts = upserts.drop(*drop)
            if transform is not None:
                upserts = transform(upserts)
            if not upserts.isEmpty():
                target.upsert(upserts)
            if KEY_COL in changes.columns:
                keys = self._delete_keys(deletes)
                if not keys.isEmpty():
                    target.delete(keys)

        if end is None:
            return self.process_available(fn)
        df, got_end = self.pull(end=end)
        if df is None:
            return 0
        fn(df)
        self.commit(got_end)
        return 1
