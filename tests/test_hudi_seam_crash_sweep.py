"""Crash-consistency sweep of the personality sync over the object
store (r12, the strong form of the single-point crash tests in
test_hudi_store_seam.py).

Kill the store at the N-th PUT for N swept across the whole publish
sequence of one sync (timeline transitions, data-slice uploads,
properties, sync state, metadata-table chains) and assert, at EVERY
crash point:

1. **Atomic visibility** — an external replay reader
   (`read_hudi_snapshot`) sees EXACTLY the pre-sync view or exactly
   the post-sync view, never a torn mixture. The completed-instant
   conditional put is the only visibility flip.
2. **Retry convergence** — a healthy re-sync lands the post view, and
   the metadata-table listing then names exactly the live slices
   (`via_metadata` read equals the direct replay).

This is the S3 contract the r12 seam buys: everything before the
commit point is invisible garbage, everything after is fully
committed, and recovery is a plain retry — no fsck, no rename
semantics assumed anywhere.
"""

import os
import shutil

import pytest

from onehouse_demos_spark import LakehouseTable, TableConfig
from onehouse_demos_spark.tables.interop import (
    read_hudi_snapshot,
    sync_hudi_metadata,
)
from onehouse_demos_spark.tables.locks import TreeFSObjectStoreEmulator

DDL = "key string, ver int, sym string, px double"


class CountingStore(TreeFSObjectStoreEmulator):
    """Counts puts; optionally dies at put number `crash_at` (1-based,
    counting put_object and put_object_from_file together)."""

    def __init__(self, root, crash_at=None):
        super().__init__(root)
        self.n_puts = 0
        self.crash_at = crash_at

    def _tick(self):
        self.n_puts += 1
        if self.crash_at is not None and self.n_puts >= self.crash_at:
            raise RuntimeError(f"simulated crash at put #{self.n_puts}")

    def put_object(self, key, data, if_none_match=False):
        self._tick()
        return super().put_object(key, data, if_none_match=if_none_match)

    def put_object_from_file(self, key, src_path, if_none_match=False):
        self._tick()
        return super().put_object_from_file(
            key, src_path, if_none_match=if_none_match
        )


def _rows(spark, base):
    return {
        (r.key, r.px)
        for r in read_hudi_snapshot(spark, base).collect()
    }


def test_crash_sweep_every_put_is_atomic(spark, tmp_base):
    # Template table: one synced commit, then a second engine commit
    # whose sync we crash at every put index.
    src = os.path.join(tmp_base, "template")
    t = LakehouseTable.create(
        spark,
        src,
        TableConfig(name="sweep_t", record_key=["key"], precombine="ver"),
    )
    t.insert(
        spark.createDataFrame(
            [(f"k{i}", 1, "GOOG" if i % 2 else "MSFT", 100.0 + i)
             for i in range(8)],
            DDL,
        )
    )
    sync_hudi_metadata(t, column_stats=True)
    t.upsert(
        spark.createDataFrame(
            [("k1", 2, "MSFT", 999.0), ("k9", 2, "GOOG", 111.0)], DDL
        )
    )
    pre = _rows(spark, t.base_path)

    # dry run on a clone to learn the put count of the second sync
    probe = os.path.join(tmp_base, "probe")
    shutil.copytree(src, probe)
    pt = LakehouseTable.load(spark, probe)
    counter = CountingStore(probe)
    sync_hudi_metadata(pt, column_stats=True, store=counter)
    post = _rows(spark, probe)
    assert post != pre and ("k1", 999.0) in post and ("k9", 111.0) in post
    total_puts = counter.n_puts
    assert total_puts >= 8, total_puts

    # sweep ~8 crash points across the whole publish sequence
    points = sorted(
        {1, 2, total_puts // 4, total_puts // 2, total_puts // 2 + 1,
         (3 * total_puts) // 4, total_puts - 1, total_puts}
        - {0}
    )
    for n in points:
        clone = os.path.join(tmp_base, f"crash_{n}")
        shutil.copytree(src, clone)
        ct = LakehouseTable.load(spark, clone)
        with pytest.raises(RuntimeError, match="simulated crash"):
            sync_hudi_metadata(
                ct, column_stats=True,
                store=CountingStore(clone, crash_at=n),
            )
        seen = _rows(spark, clone)
        assert seen in (pre, post), (
            f"crash at put #{n}/{total_puts}: torn external view\n"
            f"  pre={sorted(pre)}\n  post={sorted(post)}\n"
            f"  seen={sorted(seen)}"
        )
        # healthy retry converges…
        sync_hudi_metadata(ct, column_stats=True)
        assert _rows(spark, clone) == post, f"crash at #{n}: no convergence"
        # …and the metadata-planned read agrees with the direct replay
        via_md = {
            (r.key, r.px)
            for r in read_hudi_snapshot(
                spark, clone, via_metadata=True
            ).collect()
        }
        assert via_md == post, f"crash at #{n}: stale metadata listing"
        shutil.rmtree(clone, ignore_errors=True)
