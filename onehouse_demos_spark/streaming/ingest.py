"""Streamer: continuous ingest into a LakehouseTable (reference EP1 —
HoodieStreamer semantics re-expressed as Structured Streaming +
foreachBatch upsert; `README.md:220-243`).

Each micro-batch becomes one atomic table commit, so downstream
snapshot/incremental readers see the same commit-by-commit evolution
the reference demos show. Checkpointing is Spark's own offset log
(exactly-once per micro-batch against our idempotent commit publish).

Late data needs no watermark for correctness: the precombine field
resolves order per key at merge time, exactly like the reference's
`--source-ordering-field ts` (README.md:226). Watermarked windowed
aggregation is provided separately for analytics streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from onehouse_demos_spark.sources.cdc import (
    apply_cdc_batch,
    apply_mongo_cdc_batch,
)
from onehouse_demos_spark.tables.table import LakehouseTable


class Streamer:
    """Wire any streaming DataFrame into a table with upsert (or CDC)
    semantics.

    Inline table services (the reference's `hoodie.compact.inline.*`
    pattern, base.properties): `inline_compact_every=N` runs MOR
    compaction after every Nth applied micro-batch,
    `inline_sizing_every=N` bin-packs the small-file tail continuous
    ingest accumulates. Both are replace-commits — incremental
    consumers never see them, so enabling services does not perturb
    downstream pipelines.
    """

    def __init__(
        self,
        table: LakehouseTable,
        mode: str = "upsert",
        inline_compact_every: int | None = None,
        inline_sizing_every: int | None = None,
        inline_split_every: int | None = None,
        inline_xtable_sync_every: int | None = None,
        xtable_formats: tuple[str, ...] = ("delta",),
        hudi_rt: bool = False,
        doc_schema=None,
    ):
        assert mode in ("upsert", "insert", "cdc", "cdc_mongo")
        if mode == "cdc_mongo" and doc_schema is None:
            raise ValueError(
                "cdc_mongo mode needs doc_schema (the document "
                "StructType the extended-JSON after-images parse into)"
            )
        self.table = table
        self.mode = mode
        self.doc_schema = doc_schema
        self.inline_compact_every = inline_compact_every
        self.inline_sizing_every = inline_sizing_every
        #: consistent-engine hot-bucket auto-split (r10): every Nth
        #: batch, split any bucket whose live rows exceed the table's
        #: target — ingest alone keeps the layout healthy, no operator
        #: watching bucket sizes (the split_bucket service form).
        self.inline_split_every = inline_split_every
        #: inline xTable personality sync (the reference runs the
        #: conversion as a sidecar utility after ingest, xtable.md:
        #: 24-33; inline_every=N keeps the Delta/Iceberg personalities
        #: continuously fresh during streaming ingest, the same
        #: inline-service pattern as hoodie.compact.inline.*)
        self.inline_xtable_sync_every = inline_xtable_sync_every
        self.xtable_formats = tuple(xtable_formats)
        #: r10: the inline hudi leg's MOR mode — False folds logs via
        #: compaction (rewrite, `_rt`-equal base), True publishes them
        #: as real HoodieLogFormat blocks (no rewrite, genuine `_rt`)
        self.hudi_rt = hudi_rt
        self._applied_batches = 0

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if self.mode == "cdc":
            apply_cdc_batch(self.table, batch_df)
        elif self.mode == "cdc_mongo":
            # MongoDB Debezium envelopes (extended-JSON after-images,
            # updateDescription patches, key-only deletes) — the
            # per-key ordered fold in sources/cdc.py
            apply_mongo_cdc_batch(self.table, batch_df, self.doc_schema)
        elif self.mode == "insert":
            self.table.insert(batch_df)
        else:
            self.table.upsert(batch_df)
        self._applied_batches += 1
        self._run_inline_services()

    def _run_inline_services(self) -> None:
        n = self._applied_batches
        if (
            self.inline_compact_every
            and self.table.config.table_type == "mor"
            and n % self.inline_compact_every == 0
        ):
            from onehouse_demos_spark.tables.maintenance import run_compaction

            run_compaction(self.table)
        if self.inline_sizing_every and n % self.inline_sizing_every == 0:
            from onehouse_demos_spark.tables.maintenance import run_file_sizing

            run_file_sizing(self.table)
        if self.inline_split_every and n % self.inline_split_every == 0:
            # one layout-health hook for BOTH bucket engines (r11):
            # consistent tables split the hot bucket (O(one bucket)),
            # modulo tables re-bucket when over target (their
            # documented full-rewrite tradeoff) — each policy no-ops
            # on the other engine
            from onehouse_demos_spark.tables.maintenance import (
                run_auto_resize,
                run_auto_split,
            )

            run_auto_split(self.table)
            run_auto_resize(self.table)
        if (
            self.inline_xtable_sync_every
            and n % self.inline_xtable_sync_every == 0
        ):
            if "delta" in self.xtable_formats:
                from onehouse_demos_spark.tables.delta_export import (
                    sync_delta_log,
                )

                sync_delta_log(self.table)
            if "iceberg" in self.xtable_formats:
                from onehouse_demos_spark.tables.iceberg_export import (
                    sync_iceberg_metadata,
                )

                sync_iceberg_metadata(self.table)
            if "hudi" in self.xtable_formats:
                from onehouse_demos_spark.tables.hudi_export import (
                    sync_hudi_metadata,
                )

                # r10: external readers see the `_rt` state either way
                # — compact-on-sync folds the logs (rewrite), hudi_rt
                # publishes them as real log blocks (no rewrite)
                sync_hudi_metadata(
                    self.table,
                    compact_mor=not self.hudi_rt,
                    mor_rt=self.hudi_rt,
                )

    def start(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        trigger_once: bool = False,
        processing_time: str = "5 seconds",
    ):
        """Start the query. `trigger_once` = drain-available-and-stop
        (the reference's non-continuous deltastreamer mode; also what
        tests use)."""
        writer = stream.writeStream.foreachBatch(self._apply_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()


class ChangeFeedStreamer:
    """Continuous table→table CDF chaining as a REAL Structured
    Streaming query: a rate source ticks micro-batches and each batch
    drains the upstream table's change feed into the downstream table
    through `ChangeFeedSource.apply_to` (upserts AND deletes — the
    `hoodie-incr.properties:26-29` pipeline-chaining semantics with
    delete propagation).

    Why a rate-driven loop instead of a custom V2 source: the change
    feed is computed from two manifest-resolved snapshots, not from an
    append-only offset log, so offsets are table instants — the
    ChangeFeedSource checkpoint (instant high-watermark) IS the source
    offset, and it survives restarts independently of Spark's own
    offset log. The rate stream only provides the scheduling loop;
    dropping a rate tick loses nothing (the next tick pulls the same
    window). Exactly-once end state: upsert/delete are idempotent per
    record key, pulls are serialized by foreachBatch.
    """

    def __init__(self, source, target: LakehouseTable, transform=None):
        self.source = source  # ChangeFeedSource
        self.target = target
        self.transform = transform
        self.pulls_applied = 0

    def _tick(self, batch_df: DataFrame, batch_id: int) -> None:
        self.pulls_applied += self.source.apply_to(
            self.target, transform=self.transform
        )

    def start(
        self,
        checkpoint_dir: str,
        trigger_once: bool = False,
        processing_time: str = "5 seconds",
        rows_per_second: int = 1,
    ):
        """Start the chaining query. `trigger_once` drains what's
        pending and stops (tests / cron-style catch-up); otherwise the
        feed is polled every `processing_time`."""
        spark = self.target.spark
        ticks = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second)
            .load()
        )
        writer = ticks.writeStream.foreachBatch(self._tick).option(
            "checkpointLocation", checkpoint_dir
        )
        if trigger_once:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()


def file_json_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-drop source (reference S3 DFS source,
    `dfs-source.properties:28`): new files under a root dir are
    ingested incrementally. `max_files_per_trigger` bounds micro-batch
    size (the reference's source-limit knob) — with AvailableNow it
    splits a backlog into multiple commits instead of one giant batch.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def windowed_counts(
    stream: DataFrame,
    event_time_col: str,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation for late-tolerant
    streaming analytics (standard Structured Streaming pattern; the
    reference's analytic surface is batch-only so this is
    beyond-reference)."""
    gcols = group_cols or []
    return (
        stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window_duration), *gcols)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *gcols,
            "n",
        )
    )
