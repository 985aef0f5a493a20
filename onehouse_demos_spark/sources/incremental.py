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
