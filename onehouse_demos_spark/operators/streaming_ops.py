"""Structured Streaming queries exposed as oracle-checkable operators.

Each query runs a REAL streaming pipeline (readStream → windowed
aggregation → sink) to completion with `Trigger.AvailableNow`, then
returns the sink contents as a DataFrame. The DuckDB oracle is the
equivalent batch SQL — proving the streaming plan computes the same
answer as the batch plan over identical input (the reference's EP1
pattern of stream-ingest-then-query, `hudi-spark-minio-trino/
README.md:159-344`, with the analytics pushed INTO the stream).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table with `ts` normalized to TimestampType.

    The generator has shipped `ts` as TIMESTAMP(NANOS) (Spark reads it
    as long under the legacy conf) and as TIMESTAMP(MICROS) ntz; sniff
    the physical schema with a batch footer read, then declare the
    matching stream schema and normalization — same contract as
    operators.relational.load_events.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    physical = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(physical)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict((f.name, f.dataType.simpleString()) for f in physical)["ts"]
    if ts_type == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type != "timestamp":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windowed counts per event type, computed BY THE
    STREAMING ENGINE (incremental state store aggregation), drained
    with AvailableNow into a memory sink. Complete output mode so every
    window emits regardless of watermark position."""
    agg = (
        _events_stream(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n",
        )
    )
    view = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(view)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="oh_stream_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(view)


STREAMING_HOURLY_COUNTS_SQL = """
SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H') AS hour,
       event_type,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2
"""


def streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: drop re-deliveries by key inside the
    stream (state-store keyed dedup — the exactly-once guard every
    at-least-once ingest pipeline needs), then aggregate the deduped
    stream. The oracle is batch one-row-per-key aggregation over the
    same input. Synthetic duplicates are injected by unioning the
    source with a 1-in-10 sample of itself, so the dedup state is
    provably exercised — without it the counts would overshoot.

    Scale note: unbounded `dropDuplicates` state grows with stream
    length; production deployments bound it with a watermark +
    `dropDuplicatesWithinWatermark(["event_id"])` so the re-delivery
    window (not the stream) sizes the state store. AvailableNow batch
    drain here keeps the exact variant oracle-comparable."""
    src = _events_stream(spark, sf_dir)
    dup_stream = src.union(src.filter(F.col("event_id") % 10 == 0))
    deduped = dup_stream.dropDuplicates(["event_id"])
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("sum_value_r"),
    )
    view = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(view)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="oh_stream_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(view)


STREAMING_DEDUP_COUNTS_SQL = """
SELECT event_type,
       COUNT(*) AS n_unique_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS sum_value_r
FROM events
GROUP BY event_type
"""


QUERIES = {
    "streaming_hourly_counts": streaming_hourly_counts,
    "streaming_dedup_counts": streaming_dedup_counts,
}

ORACLES = {
    "streaming_hourly_counts": STREAMING_HOURLY_COUNTS_SQL,
    "streaming_dedup_counts": STREAMING_DEDUP_COUNTS_SQL,
}
