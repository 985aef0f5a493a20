"""Kafka source/sink wrappers (reference S1/S11, EP1).

The reference ingests `stock_ticks` JSON from Kafka with checkpointed
offsets (`demo/config/kafka-source.properties:25-28`,
`README.md:222-243`). Our equivalent is Structured Streaming's kafka
source + `from_json` decode. The spark-sql-kafka connector jar is an
external package; every entry point here is import-gated so the rest
of the engine works without it (tests exercise the identical decode
path through file/memory streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """`readStream.format("kafka")` (reference
    `kafka-source.properties`: topic :25, servers :27,
    auto.offset.reset=earliest :28)."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def decode_json_value(raw: DataFrame, schema: T.StructType | str) -> DataFrame:
    """Kafka value bytes → typed columns (reference S1 JsonKafkaSource:
    JSON decoded against a declared schema, `demo/config/schema.avsc`)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("rec")
    ).select("rec.*")


def write_batch(
    df: DataFrame, bootstrap_servers: str, topic: str
) -> None:
    """JSON-publish a batch to a topic (reference S11 `kafkacat ... -P`
    test harness)."""
    (
        df.selectExpr("to_json(struct(*)) AS value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
