"""Record-level index: a persisted, hash-bucketed (record key -> file)
mapping that turns the upsert/delete probe into a metadata lookup.

Motivation (100 TB design): the COW merge path must answer "which live
base files contain these incoming keys?". Partition + key-range + bloom
pruning (``table.py:_candidate_files``) shrink the candidate set, but
the remaining probe is still a key-column scan of candidate DATA files.
On a multi-TB table with random-key point upserts — the dominant CDC
shape — that scan dwarfs the write itself. A record-level index answers
the same question by reading only index entries for the hash buckets
the incoming keys occupy: O(batch) instead of O(candidate data).

This mirrors the record-level index the reference stack exposes through
Hudi's metadata table (``hoodie.metadata.record.index.enable``, cited
in the reference's tuning walkthroughs); the layout here is our own:

    {table}/_index/record_index/
        delta_{instant}/_oh_bucket={b}/*.parquet   one dir per indexed commit
        base_{instant}/_oh_bucket={b}/*.parquet    folded deltas (compact())
        base_{instant}/_covered.json                instants folded into the base

Entry columns: ``_oh_record_key`` (string), ``_oh_ipart`` (partition
path string, HIVE_DEFAULT for unpartitioned), ``_oh_file`` (path
relative to the table base), ``_oh_instant`` (adding commit).

Correctness model — safe by construction:
  * Data files are immutable: once (key, file) is written it stays true
    for the file's lifetime, so entries never need in-place updates.
  * Stale entries (file since rewritten/cleaned) are dropped at probe
    time by joining against the CURRENT live file set from the
    manifest — the index can only over-approximate, never lie.
  * Coverage is tracked per instant (a ``delta_{instant}`` dir exists,
    or the instant is listed in a base's ``_covered.json``). Any live
    file whose adding commit is NOT covered makes ``probe_files``
    return None and the caller falls back to the legacy scan probe —
    a partially-maintained index degrades, it never corrupts.

Scale posture: the probe reads only the buckets the incoming keys hash
into (directory-level pruning — for a point lookup that is 1 of
``buckets`` directories), filters entries to live files via a broadcast
of the metadata-scale live path set, and joins the (broadcastable)
incoming key set. No data file is opened. Index maintenance per commit
reads back ONE column (the record key) of just-written, batch-sized
files. ``compact()`` bounds the delta-dir count the same way the
timeline archives commits.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_oh_bucket"
IPART_COL = "_oh_ipart"
FILE_COL = "_oh_file"
INSTANT_COL = "_oh_instant"
#: entry value column: the record key (record index) or the indexed
#: column's value (secondary index), always string-cast so schema
#: widenings never fork the entry type across delta dirs.
VAL_COL = "_oh_val"

INDEX_REL_DIR = os.path.join("_index", "record_index")


class RecordIndex:
    def __init__(self, base_path: str, buckets: int):
        self.table_base = base_path.rstrip("/")
        self.dir = os.path.join(self.table_base, INDEX_REL_DIR)
        self.buckets = max(1, int(buckets))

    # ------------------------------------------------------------- layout

    def _dirs(self) -> tuple[list[str], list[str]]:
        """(delta dirs, base dirs) currently visible, sorted by instant."""
        if not os.path.isdir(self.dir):
            return [], []
        deltas, bases = [], []
        for name in sorted(os.listdir(self.dir)):
            full = os.path.join(self.dir, name)
            if not os.path.isdir(full) or name.startswith("."):
                continue
            if name.startswith("delta_"):
                deltas.append(full)
            elif name.startswith("base_"):
                bases.append(full)
        return deltas, bases

    def covered_instants(self) -> set[str]:
        deltas, bases = self._dirs()
        covered = {os.path.basename(d)[len("delta_"):] for d in deltas}
        for b in bases:
            meta = os.path.join(b, "_covered.json")
            try:
                with open(meta) as f:
                    covered.update(json.load(f)["instants"])
            except (OSError, KeyError, ValueError):
                # Unreadable base: claim nothing — the caller falls back.
                continue
        return covered

    # ------------------------------------------------------------ maintain

    def _bucket_expr(self, key_col):
        # Portable 60-bit md5-prefix hash (same construction as the
        # operators' _hash_mod): bit-identical on the JVM and in
        # _bucket_py below, which is what lets small commits index on
        # the driver without a Spark job.
        return (
            F.conv(F.substring(F.md5(key_col), 1, 15), 16, 10).cast("long")
            % self.buckets
        )

    def _bucket_py(self, value: str) -> int:
        import hashlib

        return (
            int(hashlib.md5(value.encode("utf-8")).hexdigest()[:15], 16)
            % self.buckets
        )

    def _value_expr(self, key_col: str):
        """The indexed value as a Column; ExpressionIndex overrides."""
        return F.col(key_col)

    #: Driver fast path bounds: commits at or below this size index on
    #: the driver with pyarrow (one column read of batch-sized local
    #: files — the same pattern as bloom harvesting in _harvest_one).
    #: A distributed job costs ~seconds of fixed scheduling; for a CDC
    #: trickle commit that overhead IS the write path, so metadata-
    #: scale work must not pay it. Larger commits take the Spark path.
    DRIVER_UPDATE_MAX_FILES = 16
    DRIVER_UPDATE_MAX_ROWS = 2_000_000

    def _update_driver(
        self, instant: str, adds, key_col: str, out: str,
        covered: set | None = None,
    ) -> bool:
        """Driver-side delta write. Returns False (caller falls back to
        the Spark path) when a file is not locally readable or the
        indexed column is not string-typed (the JVM cast-to-string of
        non-strings is not replicated here)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        per_bucket: dict[int, list] = {}
        for f in adds:
            path = os.path.join(self.table_base, f.path)
            try:
                col = pq.read_table(path, columns=[key_col]).column(0)
            except Exception:
                return False
            t = col.type
            if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
                return False
            part = f.partition or ""
            for v in set(col.to_pylist()):
                if v is None:
                    continue  # NULL never equality-matches a probe
                per_bucket.setdefault(self._bucket_py(v), []).append(
                    (v, part, f.path)
                )
        tmp = out + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        schema = pa.schema(
            [
                (VAL_COL, pa.string()),
                (IPART_COL, pa.string()),
                (FILE_COL, pa.string()),
                (INSTANT_COL, pa.string()),
            ]
        )
        for b, rows in per_bucket.items():
            bdir = os.path.join(tmp, f"{BUCKET_COL}={b}")
            os.makedirs(bdir, exist_ok=True)
            vals, parts, files = zip(*rows)
            tbl = pa.table(
                {
                    VAL_COL: list(vals),
                    IPART_COL: list(parts),
                    FILE_COL: list(files),
                    INSTANT_COL: [instant] * len(rows),
                },
                schema=schema,
            )
            pq.write_table(tbl, os.path.join(bdir, "part-0.parquet"))
        if covered is not None:
            with open(os.path.join(tmp, "_covered.json"), "w") as f:
                json.dump({"instants": sorted(covered)}, f)
        os.rename(tmp, out)
        return True

    def update_for_commit(
        self,
        spark: SparkSession,
        instant: str,
        adds,  # list[FileMeta]
        key_col: str,
        out_name: str | None = None,
        covered: set | None = None,
    ) -> None:
        """Index the files a commit added: one key-column read of the
        just-written (batch-sized) files, written as a bucket-partitioned
        delta dir. Idempotent per instant (an existing dir wins).

        ``backfill`` reuses this writer with ``out_name="base_..."`` and
        an explicit ``covered`` instant set (stamped as _covered.json
        before the atomic publish)."""
        out = os.path.join(self.dir, out_name or f"delta_{instant}")
        if os.path.isdir(out):
            return
        os.makedirs(self.dir, exist_ok=True)
        adds = list(adds)
        if (
            adds
            and len(adds) <= self.DRIVER_UPDATE_MAX_FILES
            and sum(f.rows for f in adds) <= self.DRIVER_UPDATE_MAX_ROWS
            and self._update_driver(
                instant, adds, key_col, out, covered=covered
            )
        ):
            return
        if not adds:
            # Zero-file commits still need a coverage marker, otherwise
            # probe_files would treat the instant as unindexed forever.
            tmp = out + f".tmp-{uuid.uuid4().hex[:8]}"
            os.makedirs(tmp, exist_ok=True)
            if covered is not None:
                with open(os.path.join(tmp, "_covered.json"), "w") as f:
                    json.dump({"instants": sorted(covered)}, f)
            os.rename(tmp, out)
            return
        abs_paths = [os.path.join(self.table_base, f.path) for f in adds]
        value_col = self._value_expr(key_col)
        # Map each row back to its FileMeta by the unique "data/..."
        # suffix of input_file_name(). The URI is percent-decoded JVM
        # side (url_decode); paths here are commit-generated
        # (data/{instant}_{hex}/[pp=value/]part-*.parquet) so the only
        # user-influenced segment is the partition value, which the
        # writer percent-encodes the same way.
        mapping = spark.createDataFrame(
            [(f.path, f.partition or "") for f in adds],
            f"{FILE_COL} string, {IPART_COL} string",
        )
        entries = (
            spark.read.parquet(*abs_paths)
            .select(
                value_col.cast("string").alias(VAL_COL),
                F.url_decode(
                    F.regexp_extract(F.input_file_name(), "(data/.*)$", 1)
                ).alias(FILE_COL),
            )
            .join(F.broadcast(mapping), FILE_COL, "inner")
            .select(
                F.col(VAL_COL),
                F.col(IPART_COL),
                F.col(FILE_COL),
                F.lit(instant).alias(INSTANT_COL),
                self._bucket_expr(F.col(VAL_COL)).alias(BUCKET_COL),
            )
        )
        tmp = out + f".tmp-{uuid.uuid4().hex[:8]}"
        # Cluster by bucket first: ~one file per touched bucket instead
        # of (write tasks × buckets) shards. Small commits (few added
        # files) coalesce without an exchange — the delta is tiny and
        # a shuffle stage would cost more than it saves; big commits
        # hash-cluster so no single task writes every bucket.
        if len(adds) <= 8:
            entries = entries.coalesce(len(adds))
        else:
            entries = entries.repartition(F.col(BUCKET_COL))
        entries.write.partitionBy(BUCKET_COL).parquet(tmp, mode="overwrite")
        if covered is not None:
            with open(os.path.join(tmp, "_covered.json"), "w") as f:
                json.dump({"instants": sorted(covered)}, f)
        os.rename(tmp, out)

    def backfill(
        self,
        spark: SparkSession,
        live_files,  # list[FileMeta]: ALL live files (logs included)
        all_instants,  # every instant id in the timeline
        key_col: str,
    ) -> None:
        """Build the index for an EXISTING table in one pass: entries
        for every live file, published as a base covering every
        timeline instant — this is what makes enabling an index on a
        table with history practical (without it, coverage gaps route
        probes to the scan path until every old file rotates).
        Pre-existing partial delta/base dirs are superseded and
        removed after the atomic publish."""
        instants = sorted(set(all_instants))
        if not instants:
            return
        top = instants[-1]
        out_name = f"base_{top}"
        out = os.path.join(self.dir, out_name)
        if os.path.isdir(out):
            shutil.rmtree(out)  # re-backfill replaces the base
        self.update_for_commit(
            spark,
            top,
            list(live_files),
            key_col,
            out_name=out_name,
            covered=set(instants),
        )
        deltas, bases = self._dirs()
        for d in deltas + bases:
            if os.path.basename(d) != out_name:
                shutil.rmtree(d, ignore_errors=True)

    def _compact_driver(
        self, dirs: list[str], live_paths: set[str], covered: set[str],
        top: str,
    ) -> bool:
        """Driver-side fold of small indexes (≤ DRIVER_PROBE_MAX_BYTES
        of leaves): pyarrow read -> live filter -> per-bucket rewrite.
        Returns False above the cap (Spark path handles it)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        all_leaves = []
        for d in dirs:
            for name in os.listdir(d):
                if name.startswith(BUCKET_COL + "="):
                    all_leaves.append(os.path.join(d, name))
        if self._leaf_bytes(all_leaves) > self.DRIVER_PROBE_MAX_BYTES:
            return False
        per_bucket: dict[int, dict] = {}
        cols = [VAL_COL, IPART_COL, FILE_COL, INSTANT_COL]
        for leaf in all_leaves:
            b = int(os.path.basename(leaf).split("=", 1)[1])
            for name in os.listdir(leaf):
                if not name.endswith(".parquet"):
                    continue
                tbl = pq.read_table(os.path.join(leaf, name), columns=cols)
                rows = zip(*(tbl.column(i).to_pylist() for i in range(4)))
                dedup = per_bucket.setdefault(b, {})
                for v, pt, fl, inst in rows:
                    if live_paths and fl not in live_paths:
                        continue
                    dedup[(v, pt, fl)] = inst
        out = os.path.join(self.dir, f"base_{top}")
        tmp = out + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        schema = pa.schema(
            [
                (VAL_COL, pa.string()),
                (IPART_COL, pa.string()),
                (FILE_COL, pa.string()),
                (INSTANT_COL, pa.string()),
            ]
        )
        for b, dedup in per_bucket.items():
            if not dedup:
                continue
            bdir = os.path.join(tmp, f"{BUCKET_COL}={b}")
            os.makedirs(bdir, exist_ok=True)
            keys = list(dedup)
            tbl = pa.table(
                {
                    VAL_COL: [k[0] for k in keys],
                    IPART_COL: [k[1] for k in keys],
                    FILE_COL: [k[2] for k in keys],
                    INSTANT_COL: [dedup[k] for k in keys],
                },
                schema=schema,
            )
            pq.write_table(tbl, os.path.join(bdir, "part-0.parquet"))
        with open(os.path.join(tmp, "_covered.json"), "w") as f:
            json.dump({"instants": sorted(covered)}, f)
        if os.path.isdir(out):
            shutil.rmtree(out)
        os.rename(tmp, out)
        for d in dirs:
            if os.path.abspath(d) != os.path.abspath(out):
                shutil.rmtree(d, ignore_errors=True)
        return True

    def compact(self, spark: SparkSession, live_paths: set[str]) -> int:
        """Fold every delta (and prior base) into one base dir, dropping
        entries for dead files. Returns the number of dirs folded.
        Liveness is still re-checked at probe time, so compacting
        against a slightly-stale live set stays correct."""
        deltas, bases = self._dirs()
        dirs = bases + deltas
        if len(dirs) <= 1 and not deltas:
            return 0
        covered = self.covered_instants()
        if not covered:
            return 0
        top = max(covered)
        if self._compact_driver(dirs, live_paths, covered, top):
            return len(dirs)
        df = self._read_dirs(spark, dirs)
        if df is not None and live_paths:
            live = spark.createDataFrame(
                [(p,) for p in sorted(live_paths)], f"{FILE_COL} string"
            )
            df = df.join(F.broadcast(live), FILE_COL, "inner")
        out = os.path.join(self.dir, f"base_{top}")
        tmp = out + f".tmp-{uuid.uuid4().hex[:8]}"
        if df is None:
            os.makedirs(tmp, exist_ok=True)
        else:
            df.repartition(F.col(BUCKET_COL)).write.partitionBy(
                BUCKET_COL
            ).parquet(tmp, mode="overwrite")
        with open(os.path.join(tmp, "_covered.json"), "w") as f:
            json.dump({"instants": sorted(covered)}, f)
        if os.path.isdir(out):  # re-compact at the same top instant
            shutil.rmtree(out)
        os.rename(tmp, out)
        for d in dirs:
            if os.path.abspath(d) != os.path.abspath(out):
                shutil.rmtree(d, ignore_errors=True)
        return len(dirs)

    #: Fold delta dirs into a base once this many accumulate — bounds
    #: both the probe's path-listing cost and the open-dir count, the
    #: same way the timeline archives commits. Hudi's metadata table
    #: is the same shape (an MOR table log-compacted on a cadence).
    AUTO_COMPACT_DELTAS = 16

    def maybe_compact(self, spark: SparkSession, live_paths: set[str]) -> int:
        deltas, _bases = self._dirs()
        if len(deltas) < self.AUTO_COMPACT_DELTAS:
            return 0
        return self.compact(spark, live_paths)

    # --------------------------------------------------------------- probe

    def _bucket_leaf_paths(self, dirs: list[str], buckets) -> list[str]:
        """Leaf bucket dirs for the probed buckets only — path-level
        partition pruning resolved on the DRIVER, so the executor-side
        read is ONE parquet load of exactly the touched buckets (never
        a per-dir DataFrame union whose width grows with commit
        count)."""
        paths = []
        for d in dirs:
            for b in buckets:
                p = os.path.join(d, f"{BUCKET_COL}={b}")
                if os.path.isdir(p):
                    paths.append(p)
        return paths

    def _read_dirs(self, spark: SparkSession, dirs: list[str]) -> DataFrame | None:
        # One read per index dir (each is its own partitioned root),
        # unioned. Dir count is bounded by compact(); bucket-filter
        # pushdown prunes _oh_bucket partitions inside every root.
        parts = []
        for d in dirs:
            # Bucket dirs only — skips empty coverage markers and
            # _covered.json without schema-inference surprises.
            if any(n.startswith(BUCKET_COL + "=") for n in os.listdir(d)):
                parts.append(spark.read.option("basePath", d).parquet(d))
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    #: Probe fast path: point batches (≤ this many keys — a ~few-MB
    #: driver collect, metadata-scale) against index leaves totalling
    #: ≤ the byte cap match on the driver with pyarrow — zero Spark
    #: jobs beyond the one tiny probe collect.
    DRIVER_PROBE_MAX_KEYS = 65536
    DRIVER_PROBE_MAX_BYTES = 64 * 1024 * 1024

    @staticmethod
    def _leaf_bytes(paths: list[str]) -> int:
        total = 0
        for p in paths:
            for name in os.listdir(p):
                if name.endswith(".parquet"):
                    total += os.path.getsize(os.path.join(p, name))
        return total

    def _match_driver(
        self, paths: list[str], probe_rows: set, live_paths: set,
        with_part: bool,
    ) -> set:
        """Pure-Python entry matching over locally-read index leaves."""
        import pyarrow.parquet as pq

        touched = set()
        cols = [VAL_COL, IPART_COL, FILE_COL]
        for p in paths:
            for name in os.listdir(p):
                if not name.endswith(".parquet"):
                    continue
                tbl = pq.read_table(os.path.join(p, name), columns=cols)
                vals, parts, files = (
                    tbl.column(0).to_pylist(),
                    tbl.column(1).to_pylist(),
                    tbl.column(2).to_pylist(),
                )
                for v, pt, fl in zip(vals, parts, files):
                    if fl not in live_paths or fl in touched:
                        continue
                    key = (v, pt) if with_part else v
                    if key in probe_rows:
                        touched.add(fl)
        return touched

    def probe_files(
        self,
        spark: SparkSession,
        keys_df: DataFrame,
        key_col: str,
        live_files,  # list[FileMeta] (base files)
        path_to_instant: dict[str, str],
        on_partition: bool = False,
        part_expr=None,
        n_rows: int | None = None,
    ) -> list | None:
        """Exact set of live base files containing any incoming key, or
        None when coverage is incomplete (caller falls back to the scan
        probe). ``keys_df`` must be small-ish on the driver-collect side
        ONLY for its distinct bucket set (≤ ``self.buckets`` ints) —
        except on the point-batch fast path, which collects the (tiny)
        probe itself.

        on_partition: partition-scoped tables match (key, partition) —
        a key living in an untouched partition must not be rewritten;
        global scope matches the key alone."""
        covered = self.covered_instants()
        if any(
            path_to_instant.get(f.path) not in covered for f in live_files
        ):
            return None
        if not live_files:
            return []
        with_part = on_partition and part_expr is not None
        probe = keys_df.select(
            F.col(key_col).cast("string").alias(VAL_COL),
            self._bucket_expr(F.col(key_col).cast("string")).alias(BUCKET_COL),
            *([part_expr.alias(IPART_COL)] if with_part else []),
        )
        deltas, bases = self._dirs()
        dirs = bases + deltas
        if n_rows is not None and n_rows <= self.DRIVER_PROBE_MAX_KEYS:
            rows = probe.collect()  # point batch: tiny by contract
            buckets = sorted({r[BUCKET_COL] for r in rows})
            paths = self._bucket_leaf_paths(dirs, buckets)
            if not paths:
                return []
            if self._leaf_bytes(paths) <= self.DRIVER_PROBE_MAX_BYTES:
                probe_rows = {
                    (r[VAL_COL], r[IPART_COL]) if with_part else r[VAL_COL]
                    for r in rows
                }
                live_paths = {f.path for f in live_files}
                touched = self._match_driver(
                    paths, probe_rows, live_paths, with_part
                )
                return [f for f in live_files if f.path in touched]
        else:
            # Bucket pruning: a metadata-scale collect (≤ buckets ints)
            # resolves the touched bucket set.
            buckets = [
                r[0] for r in probe.select(BUCKET_COL).distinct().collect()
            ]
            paths = self._bucket_leaf_paths(dirs, buckets)
            if not paths:
                return []
        # Spark path: ONE parquet load of exactly the touched leaves.
        df = spark.read.parquet(*paths)
        live = spark.createDataFrame(
            [(f.path,) for f in live_files], f"{FILE_COL} string"
        )
        join_cols = [VAL_COL] + ([IPART_COL] if with_part else [])
        hit = (
            df.join(F.broadcast(live), FILE_COL, "inner")
            .join(
                F.broadcast(probe.drop(BUCKET_COL).distinct()),
                join_cols,
                "inner",
            )
            .select(FILE_COL)
            .distinct()
        )
        touched = {r[0] for r in hit.collect()}
        return [f for f in live_files if f.path in touched]


class SecondaryIndex(RecordIndex):
    """Secondary index on a non-key column (Hudi 1.0 secondary-index
    analog): the same delta/base bucket layout, but entries map a
    COLUMN VALUE (string-cast, so schema widenings never fork the
    entry type) to the files containing it. Complements per-file
    [min,max] stats skipping exactly where stats fail — high-churn
    columns whose value ranges overlap across every file — by pruning
    an equality predicate to the exact file set.

    Same safety model as the record index: entries are immutable facts
    about immutable files, liveness re-checked at probe, coverage gaps
    force the caller back to stats-only pruning."""

    def __init__(self, base_path: str, buckets: int, column: str):
        super().__init__(base_path, buckets)
        self.column = column
        self.dir = os.path.join(
            self.table_base, "_index", "secondary", column
        )

    def files_for_value(
        self,
        spark: SparkSession,
        value,
        live_files,  # list[FileMeta]
        path_to_instant: dict[str, str],
    ) -> set | None:
        """Relative paths of live files that may contain `value` in the
        indexed column (exact under full coverage), or None on a
        coverage gap. A one-bucket partition-pruned index read."""
        covered = self.covered_instants()
        if any(
            path_to_instant.get(f.path) not in covered for f in live_files
        ):
            return None
        if not live_files:
            return set()
        val = F.lit(value).cast("string")
        one = spark.range(1).select(
            val.alias(VAL_COL),
            self._bucket_expr(val).alias(BUCKET_COL),
        )
        bucket_row = one.collect()[0]
        if bucket_row[VAL_COL] is None:
            return None  # NULL predicate: not indexable, fall back
        deltas, bases = self._dirs()
        paths = self._bucket_leaf_paths(
            bases + deltas, [int(bucket_row[BUCKET_COL])]
        )
        if not paths:
            return set()
        if self._leaf_bytes(paths) <= self.DRIVER_PROBE_MAX_BYTES:
            return self._match_driver(
                paths,
                {bucket_row[VAL_COL]},
                {f.path for f in live_files},
                with_part=False,
            )
        live = spark.createDataFrame(
            [(f.path,) for f in live_files], f"{FILE_COL} string"
        )
        hit = (
            spark.read.parquet(*paths)
            .filter(F.col(VAL_COL) == bucket_row[VAL_COL])
            .join(F.broadcast(live), FILE_COL, "inner")
            .select(FILE_COL)
            .distinct()
        )
        return {r[0] for r in hit.collect()}


class ExpressionIndex(SecondaryIndex):
    """Expression index (Hudi 1.0 functional-index analog — `CREATE
    INDEX ... ON t USING column_stats/bloom (expr)` family): the same
    delta/base bucket layout, entries keyed by a SQL EXPRESSION of the
    row (e.g. ``hour(ts)``, ``lower(email)``) cast to string.
    `snapshot_filtered` prunes an equality predicate whose "column" IS
    that expression text to the exact file set — predicates no
    column-stat range can answer (a function of a column has no
    harvested [min,max]).

    Catalyst-only: the driver fast paths are disabled (a Python-side
    evaluator for arbitrary SQL expressions would be a second engine),
    and column-mapped tables skip maintenance (the expression names
    LOGICAL columns; files carry physical) — the coverage check then
    routes probes to the stats fallback, degrade-never-corrupt as
    everywhere else."""

    def __init__(self, base_path: str, buckets: int, expr: str):
        import hashlib

        RecordIndex.__init__(self, base_path, buckets)
        self.expr = expr
        slug = hashlib.md5(expr.encode("utf-8")).hexdigest()[:12]
        self.dir = os.path.join(self.table_base, "_index", "expression", slug)

    def _value_expr(self, key_col: str):
        return F.expr(self.expr)

    def _update_driver(self, *a, **k) -> bool:
        return False  # expressions evaluate on the JVM only
