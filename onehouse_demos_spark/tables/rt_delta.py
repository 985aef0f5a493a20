"""Group-pruned base-vs-realtime delta for the personality exporters.

MOR log content (deletes / updates / inserts) is invisible to a
base-files-only personality. The exporters close that gap in the
idiom of each target format, but both start from the same pruned
computation here (r14, VERDICT r13 #2/#3):

- the Iceberg exporter consumes ``rt_delta`` — equality-delete keys
  plus the log-borne winner rows — and publishes them as v2 delete
  files + an appended data file (MOR-style, Flink-CDC commit shape);
- the Delta exporter consumes ``rt_group_rewrite`` — the full
  real-time view of ONLY the log-bearing file groups — and publishes
  copy-on-write replacement parquet (remove stale base adds, add
  rewritten files; Delta's protocol has no row-level delete vocabulary
  below deletion vectors, so COW of the hot groups is its idiom).

Both prune identically: log-borne changes can only touch keys inside
the live logs' footer key ranges, so the base side cuts to files whose
(partition, key range) overlaps a live log — a metadata-only file cut.
At 100 TB with a small hot log tail this is two scans of the hot
groups, never two full-table scans.
"""

from __future__ import annotations

import os
import shutil
import tempfile


def _overlapping(a, b, match_partition: bool) -> bool:
    """Can file `a` and file `b` share a record key? Partition match
    (per-partition key identity — skipped for global-index tables,
    where a log row may target any partition) + footer key-range
    overlap; missing stats are conservatively kept."""
    if match_partition and (a.partition or "") != (b.partition or ""):
        return False
    if None in (a.key_min, a.key_max, b.key_min, b.key_max):
        return True
    return not (a.key_max < b.key_min or a.key_min > b.key_max)


def _scope(table):
    """(cand_base, logs) — the log-bearing file groups, or None when
    the table has no live log files."""
    files = table.manifest.live_files(include_logs=True)
    logs = [f for f in files if f.kind == "log"]
    if not logs:
        return None
    match_part = table.config.index_scope != "global"
    cand_base = [
        b
        for b in files
        if b.kind == "base"
        and any(_overlapping(b, lg, match_part) for lg in logs)
    ]
    return cand_base, logs


def rt_delta(table, part_cols: list[str]):
    """The exact difference between the real-time MOR merge and the
    base files, GROUP-PRUNED. Returns None when the table has no live
    log files, else a dict:

    - ``eqdel``: frame of `_oh_record_key` (+ BASE-row partition
      columns) whose base rows the personality must mask — keys the
      merge deletes AND keys whose winning version is log-borne
      (updates; the fresh version rides ``new_rows``).
    - ``new_rows``: full winner rows whose version is not in any base
      file — log-borne updates and inserts — exactly what an appended
      data file at the new sequence must carry for the personality to
      serve the `_rt` view (reference `README.md:756-776`).
    - ``base_paths`` / ``log_paths``: the pruned scan scope, exposed
      for plan pins (tests assert inputFiles ⊆ these).

    EXACT by construction: the engine's own `_merge_latest`
    (latest-commit-wins + precombine) decides winners, and the
    commit-time witness — winner commit ≠ base-row commit — is the
    same rewrite test the CDF `changes()` feed uses. Fully
    distributed; no driver collection."""
    from pyspark.sql import functions as F

    from onehouse_demos_spark.tables.table import (
        COMMIT_COL,
        DELETED_COL,
        KEY_COL,
    )

    scope = _scope(table)
    if scope is None:
        return None
    cand_base, logs = scope
    match_part = table.config.index_scope != "global"
    merged = table._merge_latest(
        table._read_files(cand_base + logs), filter_deleted=False
    )
    cols = merged.columns
    base_df = table._read_files(cand_base) if cand_base else None
    if base_df is None:
        # no base file can hold a logged key: every surviving winner
        # is a log-borne insert; nothing exists to mask
        return {
            "eqdel": None,
            "new_rows": merged.filter(~F.col(DELETED_COL)).select(*cols),
            "base_paths": [],
            "log_paths": [f.path for f in logs],
        }
    bk_cols = [
        F.col(KEY_COL).alias("_oh_base_key"),
        F.col(COMMIT_COL).alias("_oh_base_commit"),
    ] + [F.col(c).alias(f"_oh_base_{c}") for c in part_cols]
    base_keys = base_df.filter(~F.col(DELETED_COL)).select(*bk_cols)
    cond = F.col(KEY_COL) == F.col("_oh_base_key")
    if match_part:
        for c in part_cols:
            cond = cond & F.col(c).eqNullSafe(F.col(f"_oh_base_{c}"))
    j = merged.join(base_keys, cond, "left_outer")
    in_base = F.col("_oh_base_key").isNotNull()
    # "rewritten" = the winning version is not the base row — the
    # commit-time witness, exact regardless of precombine stability
    rewritten = ~in_base | (
        ~F.col(COMMIT_COL).eqNullSafe(F.col("_oh_base_commit"))
    )
    eqdel = j.filter(
        in_base & (F.col(DELETED_COL) | rewritten)
    ).select(
        F.col(KEY_COL),
        # mask the BASE row: its own partition (a global-index upsert
        # may move a key across partitions)
        *[F.col(f"_oh_base_{c}").alias(c) for c in part_cols],
    )
    # A key held by TWO live base twins (delete + base re-insert, then
    # a log write) joins the one winner row to BOTH twins — the eqdel
    # side wants both pairs (both twins must be masked; the reader
    # distincts delete keys anyway), but the winner must be appended
    # exactly ONCE per merge identity or the personality serves
    # duplicates the engine merge never does.
    ident = [KEY_COL] + (part_cols if match_part else [])
    new_rows = (
        j.filter(~F.col(DELETED_COL) & rewritten)
        .select(*cols)
        .dropDuplicates(ident)
    )
    return {
        "eqdel": eqdel,
        "new_rows": new_rows,
        "base_paths": [f.path for f in cand_base],
        "log_paths": [f.path for f in logs],
    }


def rt_group_rewrite(table):
    """The COW flavour: the full real-time view of ONLY the
    log-bearing file groups (merged winners of candidate base files +
    all live logs, deletes dropped) — what a Delta personality must
    serve in place of the stale candidate base files. Returns None
    when no live logs exist, else {"merged": DataFrame,
    "cand_base": [FileMeta], "log_paths": [...]}. Log-only inserts
    (keys in no base file) ride the same frame."""
    scope = _scope(table)
    if scope is None:
        return None
    cand_base, logs = scope
    merged = table._merge_latest(table._read_files(cand_base + logs))
    return {
        "merged": merged,
        "cand_base": cand_base,
        "log_paths": [f.path for f in logs],
    }


def publish_group_rewrite(
    table, merged, part_cols: list[str], pub, digest: str
):
    """Stage the rewrite frame (hive-partitioned via SHADOW copies so
    the partition source columns stay physical, matching the engine's
    base files), publish each part file through the store seam as
    ``rtcow-<digest>-<n>.parquet``, and return harvested FileMeta
    rows (footer stats power the Delta add-action stats JSON). The
    digest names make re-syncs idempotent: an unchanged log-bearing
    state reuses the already-published files by name."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from onehouse_demos_spark.tables.table import _footer_col_stats
    from onehouse_demos_spark.tables.timeline import FileMeta

    staging = tempfile.mkdtemp(prefix="oh_rtcow_staging_")
    shadow = [f"_oh_stage_pp_{i}" for i in range(len(part_cols))]
    stage_df = merged
    for s, c in zip(shadow, part_cols):
        stage_df = stage_df.withColumn(s, F.col(c))
    writer = stage_df.write.mode("overwrite")
    if part_cols:
        writer = writer.partitionBy(*shadow)
    writer.parquet(staging)
    out: list[FileMeta] = []
    seq = 0
    try:
        for dirpath, _dirs, names in sorted(os.walk(staging)):
            from urllib.parse import unquote

            rel = os.path.relpath(dirpath, staging)
            for n in sorted(names):
                if not (n.endswith(".parquet") and n.startswith("part-")):
                    continue
                src = os.path.join(dirpath, n)
                pf = pq.ParquetFile(src)
                if pf.metadata.num_rows == 0:
                    continue
                segs = (
                    [s.split("=", 1)[1] for s in rel.split(os.sep)]
                    if rel != "."
                    else []
                )
                values = [unquote(v) for v in segs]
                partition = "/".join(values) if values else None
                part_dir = (
                    "/".join(
                        f"{c}={v}" for c, v in zip(part_cols, segs)
                    )
                    if values
                    else ""
                )
                name = f"rtcow-{digest}-{seq:04d}.parquet"
                seq += 1
                dst = os.path.join(table.base_path, part_dir, name)
                pub.put_file(dst, src)
                col_stats = _footer_col_stats(pf)
                out.append(
                    FileMeta(
                        path=os.path.join(part_dir, name).replace(
                            os.sep, "/"
                        ) if part_dir else name,
                        # hive NULL segments keep the literal
                        # HIVE_DEFAULT_PARTITION marker, matching the
                        # engine's own harvested FileMeta convention
                        partition=partition,
                        rows=pf.metadata.num_rows,
                        kind="base",
                        col_stats=col_stats,
                    )
                )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    # An EMPTY result is legal: when the logs delete every row of the
    # candidate groups, the correct personality is removes-only (the
    # stale base files drop with no replacement). A failed staging
    # write raises out of writer.parquet above — it never reaches
    # here — so empty part files mean a genuinely empty rewrite.
    return out


def rewrite_digest(cand_base, log_paths: list[str]) -> str:
    """Deterministic name component for the rewrite outputs: the
    log-bearing state is fully identified by the immutable candidate
    base files + live log files (log files are append-unique, so any
    new log content changes the set)."""
    import hashlib

    payload = "\n".join(
        sorted(f.path for f in cand_base) + ["--"] + sorted(log_paths)
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:12]
