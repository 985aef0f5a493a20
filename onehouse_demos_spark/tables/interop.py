"""Multi-format interop (reference M15 — xTable conversion:
`xtable/xtable_hudi.yaml:17-25`, `notebook/demo.ipynb` cells 6-18,
`xtable.md`).

The reference converts table METADATA between Hudi/Iceberg/Delta over
one set of Parquet files. Our design position (SURVEY §2.2 M15): we do
not transpile metadata — when interop is requested we write through the
target format's own Spark writer (`CREATE TABLE ... USING DELTA
LOCATION` per `xtable.md:34-37`, Iceberg `register_table` per
`xtable.md:54-59`), which yields a first-class native table instead of
a synced shadow.

delta-spark / iceberg runtimes are optional jars; every entry point is
capability-gated so the engine runs without them. `export_parquet_view`
is the always-available fallback: our tables ARE plain parquet + a
manifest, so any engine that reads parquet can read a materialized
snapshot.

Jar-free personalities (the true xTable model — metadata over the SAME
files, zero data copies): `sync_delta_log` (tables/delta_export.py)
writes a public-protocol `_delta_log/` in place, and
`sync_iceberg_metadata` (tables/iceberg_export.py) the Iceberg
`metadata/` tree; both are re-exported here as the one-stop interop
surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from onehouse_demos_spark.tables.delta_export import (  # noqa: F401
    clean_delta_log,
    read_delta_snapshot,
    sync_delta_log,
    write_delta_checkpoint,
)
from onehouse_demos_spark.tables.hadoop_bloom import (  # noqa: F401
    HadoopDynamicBloom,
)
from onehouse_demos_spark.tables.hfile import (  # noqa: F401
    parse_hfile,
    read_hudi_metadata_base,
    write_hfile,
)
from onehouse_demos_spark.tables.hudi_export import (  # noqa: F401
    clean_hudi_personality,
    hudi_files_for_keys,
    hudi_live_files,
    hudi_metadata_bloom_filters,
    hudi_metadata_column_stats,
    hudi_metadata_listing,
    hudi_metadata_record_locations,
    read_hudi_incremental,
    read_hudi_point,
    read_hudi_rt,
    read_hudi_snapshot,
    sync_hudi_metadata,
)
from onehouse_demos_spark.tables.iceberg_export import (  # noqa: F401
    expire_iceberg_snapshots,
    read_iceberg_snapshot,
    sync_iceberg_metadata,
)
from onehouse_demos_spark.tables.table import LakehouseTable


def available_formats(spark: SparkSession) -> dict[str, bool]:
    """Probe which interop writers this session can use."""
    out = {"parquet": True}
    for fmt, probe_class in (
        ("delta", "org.apache.spark.sql.delta.catalog.DeltaCatalog"),
        ("iceberg", "org.apache.iceberg.spark.SparkCatalog"),
    ):
        try:
            spark._jvm.java.lang.Class.forName(probe_class)  # type: ignore[union-attr]
            out[fmt] = True
        except Exception:
            out[fmt] = False
    return out


def export_snapshot(
    table: LakehouseTable,
    target_path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    register_as: str | None = None,
) -> None:
    """Materialize the current snapshot in a target format.

    fmt='parquet' always works. fmt='delta'/'iceberg' requires the
    respective runtime on the classpath (reference's multi-engine
    read path keeps working because everything stays parquet
    underneath — SURVEY S10)."""
    caps = available_formats(table.spark)
    if not caps.get(fmt):
        raise RuntimeError(
            f"format {fmt!r} unavailable in this session "
            f"(available: {[k for k, v in caps.items() if v]}); "
            "add the runtime jar (e.g. delta-spark) to enable it"
        )
    df = table.snapshot()
    writer = df.write.format(fmt).mode(mode)
    writer.save(target_path)
    if register_as:
        # reference pattern: CREATE TABLE ... USING <fmt> LOCATION ...
        table.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {register_as} USING {fmt} "
            f"LOCATION '{target_path}'"
        )


def export_parquet_view(table: LakehouseTable, target_path: str) -> int:
    """Zero-copy-ish interop floor: write the snapshot as plain parquet
    for engines without lakehouse support; returns row count written."""
    df = table.snapshot()
    df.write.mode("overwrite").parquet(target_path)
    return table.spark.read.parquet(target_path).count()
