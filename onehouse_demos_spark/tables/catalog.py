"""HMS-style persistent catalog sync (SURVEY §2 S9).

The reference registers every table — and for MOR the `_ro`/`_rt` pair
— in a Hive Metastore so any engine can resolve it by name
(`hudi-spark-minio-trino/README.md:312-344`, `run_sync_tool.sh
--sync-mode hms`, `--partition-value-extractor`). This module does the
same against Spark's persistent `spark_catalog` (derby-backed Hive
catalog locally; a real HMS thrift URI in production — only the
connection conf changes):

- ``hive_session_builder`` — a session builder wired for a persistent
  metastore + warehouse, reusable across process restarts.
- ``sync_table`` — registers the table as an EXTERNAL partitioned
  parquet table whose partition directories track the CURRENT live
  file set, then ``MSCK REPAIR TABLE`` to (re)discover partitions.

Why a "current view" directory: our table layout is multi-versioned
(`data/<instant>_<uuid>/...` keeps old file versions for time travel),
so pointing a plain-parquet catalog table at the base path would read
every version. The sync instead maintains
``<base>/_catalog/<view>/_oh_pp=<part>/`` holding HARDLINKS to the
live base files — a metadata-only refresh (no data copy; the object-
store analog is copy-free manifest rewriting). External engines
(Trino/Presto/DuckDB — reference S10) read the same directories.

MOR views (reference O17, `README.md:343-344`):
- ``<name>_ro``  — base files only (hardlinks, metadata-only sync).
- ``<name>_rt``  — requires the log merge, which plain parquet cannot
  express; the sync MATERIALIZES the merged snapshot (same work a
  compaction would do). Documented trade-off: `_rt` freshness costs a
  write, `_ro` is free.
"""

from __future__ import annotations

import json
import os
import shutil
from urllib.parse import quote

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from onehouse_demos_spark.tables.table import (
    HIVE_DEFAULT_PARTITION,
    PP_COL,
    LakehouseTable,
)

_STATE = "_catalog_sync.json"


def hive_session_builder(
    warehouse_dir: str,
    metastore_dir: str,
    app_name: str = "onehouse-demos-catalog",
    master: str | None = None,
):
    """Builder for a session whose catalog PERSISTS across restarts
    (derby metastore locally; point ConnectionURL/metastore.uris at a
    real HMS in production)."""
    from onehouse_demos_spark.session import session_builder

    b = session_builder(app_name=app_name, master=master)
    return (
        b.config("spark.sql.warehouse.dir", warehouse_dir)
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={metastore_dir};create=true",
        )
        .enableHiveSupport()
    )


def _esc_part(value: str) -> str:
    """Hive-style partition-dir escaping: multi-level values like
    '2018/08/31' must stay ONE directory level (`%2F`), matching the
    reference's SlashEncodedDayPartitionValueExtractor concern."""
    return quote(value, safe="")


def _link_or_copy(src: str, dst: str) -> None:
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _ddl_columns(table: LakehouseTable) -> str:
    schema = table._latest_schema()
    if schema is None:
        raise ValueError(f"table {table.config.name} has no committed schema")
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in schema.fields
        if f.name != PP_COL
    )


def _build_current_view(table: LakehouseTable, view_dir: str, files) -> int:
    """(Re)build the hardlink current-view directory for a file set.
    O(#live files) metadata ops, zero data movement."""
    if os.path.isdir(view_dir):
        shutil.rmtree(view_dir)
    n = 0
    for fm in files:
        part = fm.partition if fm.partition is not None else HIVE_DEFAULT_PARTITION
        pdir = os.path.join(view_dir, f"{PP_COL}={_esc_part(part)}")
        os.makedirs(pdir, exist_ok=True)
        src = os.path.join(table.base_path, fm.path)
        # Unique name: flatten the per-instant dir into the file name.
        # '=' must not survive into the link name — external engines
        # with hive-partition inference (DuckDB, Trino) parse k=v
        # segments ANYWHERE in the path and would reject the scan as a
        # partition-schema mismatch.
        flat = fm.path.replace("/", "__").replace("=", "-")
        _link_or_copy(src, os.path.join(pdir, flat))
        n += 1
    return n


def _register(
    spark: SparkSession,
    db: str,
    name: str,
    cols_ddl: str,
    location: str,
    partitioned: bool,
) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{db}`")
    # Schema reconciliation: the reference's sync tool pushes evolved
    # schemas to HMS per commit. The table is EXTERNAL (drop touches
    # only metadata), so drop + recreate when the registered column
    # set no longer matches the table's latest schema.
    if spark.catalog.tableExists(f"{db}.{name}"):
        drop = False
        try:
            loc_rows = [
                r
                for r in spark.sql(
                    f"DESCRIBE TABLE EXTENDED `{db}`.`{name}`"
                ).collect()
                if r.col_name == "Location"
            ]
            reg_loc = loc_rows[0].data_type if loc_rows else None
            if reg_loc is not None and os.path.realpath(
                reg_loc.removeprefix("file:")
            ) != os.path.realpath(location):
                # Same name, different storage location (table was
                # recreated elsewhere, or its old files are gone):
                # the external entry must follow the new location.
                drop = True
            else:
                existing = [
                    (f.name, f.dataType.simpleString())
                    for f in spark.table(f"{db}.{name}").schema.fields
                    if f.name != PP_COL
                ]
                wanted = [
                    tuple(
                        col.strip().strip("`")
                        for col in c.strip().split(" ", 1)
                    )
                    for c in cols_ddl.split(", ")
                ]
                drop = existing != wanted
        except Exception:
            # Unreadable registration (e.g. location deleted out from
            # under the catalog): recreate from scratch.
            drop = True
        if drop:
            spark.sql(f"DROP TABLE `{db}`.`{name}`")
    part_clause = f"PARTITIONED BY (`{PP_COL}` STRING)" if partitioned else ""
    spark.sql(
        f"CREATE EXTERNAL TABLE IF NOT EXISTS `{db}`.`{name}` ({cols_ddl}) "
        f"USING parquet {part_clause} LOCATION '{location}'"
    )
    if partitioned:
        # (re)discover partition dirs AND drop vanished ones — a
        # delete_partition must not leave a stale catalog partition
        # pointing at a removed current-view dir.
        spark.sql(f"MSCK REPAIR TABLE `{db}`.`{name}` SYNC PARTITIONS")
    spark.sql(f"REFRESH TABLE `{db}`.`{name}`")


def sync_table(
    spark: SparkSession,
    table: LakehouseTable,
    db: str = "default",
    name: str | None = None,
) -> dict:
    """Sync one lakehouse table into the persistent catalog. Returns
    {"tables": [...], "files": n, "instant": latest}. Idempotent; a
    re-sync after new commits refreshes partition contents and runs
    MSCK for any new partitions only."""
    base = name or table.config.name
    latest = table.timeline.latest_instant()
    cat_dir = os.path.join(table.base_path, "_catalog")
    os.makedirs(cat_dir, exist_ok=True)
    state_path = os.path.join(cat_dir, _STATE)
    state = {}
    if os.path.exists(state_path):
        with open(state_path) as fh:
            state = json.load(fh)

    cols_ddl = _ddl_columns(table)
    registered: list[str] = []
    n_files = 0

    if table.config.table_type == "mor":
        ro_files = table.manifest.live_files(include_logs=False)
        ro_dir = os.path.join(cat_dir, "ro")
        if state.get("instant") != latest:
            n_files += _build_current_view(table, ro_dir, ro_files)
        _register(spark, db, f"{base}_ro", cols_ddl, ro_dir, partitioned=True)
        registered.append(f"{db}.{base}_ro")

        # _rt: merged snapshot materialized (the log merge is not
        # expressible as a plain-parquet location).
        rt_dir = os.path.join(cat_dir, "rt")
        if state.get("instant") != latest:
            snap = table.snapshot(keep_meta=True)
            pp = table._partition_path_expr()
            writer = snap.withColumn(
                PP_COL,
                pp if pp is not None else F.lit(HIVE_DEFAULT_PARTITION),
            )
            writer.write.mode("overwrite").partitionBy(PP_COL).parquet(rt_dir)
        _register(spark, db, f"{base}_rt", cols_ddl, rt_dir, partitioned=True)
        registered.append(f"{db}.{base}_rt")
    else:
        files = table.manifest.live_files(include_logs=False)
        view_dir = os.path.join(cat_dir, "snapshot")
        if state.get("instant") != latest:
            n_files += _build_current_view(table, view_dir, files)
        _register(spark, db, base, cols_ddl, view_dir, partitioned=True)
        registered.append(f"{db}.{base}")

    with open(state_path, "w") as fh:
        json.dump({"instant": latest, "tables": registered}, fh)
    return {"tables": registered, "files": n_files, "instant": latest}
