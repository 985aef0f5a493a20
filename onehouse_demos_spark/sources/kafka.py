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

def _kafka_package() -> str:
    """The external package providing the `kafka` source/sink, with
    the version resolved from the running Spark build (Spark 4.x is
    Scala 2.13; a Scala-2.12 Spark 3.x build needs the _2.12
    artifact)."""
    import pyspark

    scala = "2.12" if pyspark.__version__.startswith("3.") else "2.13"
    return (
        f"org.apache.spark:spark-sql-kafka-0-10_{scala}:"
        f"{pyspark.__version__}"
    )


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def _require_kafka(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise RuntimeError(
            "kafka connector unavailable: the spark-sql-kafka jar is "
            f"not on the classpath. Launch with --packages {_kafka_package()} "
            "(reference EP1 runs it inside the Hudi streamer bundle). "
            "File/memory streams exercise the identical decode + "
            "foreachBatch path without a broker — see streaming/ingest.py."
        )


def read_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """`readStream.format("kafka")` (reference
    `kafka-source.properties`: topic :25, servers :27,
    auto.offset.reset=earliest :28). Raises the documented gate error
    when the connector jar is absent."""
    _require_kafka(spark)
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
    test harness). Raises the documented gate error when the connector
    jar is absent."""
    _require_kafka(df.sparkSession)
    (
        df.selectExpr("to_json(struct(*)) AS value")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )


def stock_ticks_schema() -> T.StructType:
    """The EP1 topic schema, derived from the reference's Avro schema
    declaration (`demo/config/schema.avsc`: volume long, ts/symbol
    string, year int, month string, high/low double, key string, date
    string, close/open double, day string) through the same Avro→Spark
    conversion the CDC decoder uses."""
    import json as _json

    from onehouse_demos_spark.sources.avro_codec import avro_to_spark_type

    avsc = {
        "type": "record",
        "name": "stock_ticks",
        "fields": [
            {"name": "volume", "type": "long"},
            {"name": "ts", "type": "string"},
            {"name": "symbol", "type": "string"},
            {"name": "year", "type": "int"},
            {"name": "month", "type": "string"},
            {"name": "high", "type": "double"},
            {"name": "low", "type": "double"},
            {"name": "key", "type": "string"},
            {"name": "date", "type": "string"},
            {"name": "close", "type": "double"},
            {"name": "open", "type": "double"},
            {"name": "day", "type": "string"},
        ],
    }
    return avro_to_spark_type(_json.dumps(avsc))
