"""Debezium CDC envelope handling (reference S2/EP3:
`mysql-debezium/register-mysql-avro.json`, `postgressql-debezium/...`,
`mongodb-debezium/register-mongodb.json`).

A Debezium change event is `{before, after, op, ts_ms, source}` with
op ∈ {c,u,d,r} (create/update/delete/read-snapshot). Flattening turns
a stream of envelopes into upsert/delete rows our table layer applies:
op in (c,u,r) → upsert `after.*`; op = d → delete `before` key
(FIXTURES.md F7). All pure DataFrame ops — usable on a batch frame or
inside a Structured Streaming foreachBatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Marker column carrying delete-ness through the flatten, consumed by
#: apply_cdc_batch / LakehouseTable soft-delete handling.
CDC_DELETED = "_cdc_is_deleted"
CDC_TS = "_cdc_ts_ms"


def flatten_debezium(envelopes: DataFrame) -> DataFrame:
    """Envelope frame (`before struct, after struct, op string,
    ts_ms long`) → row-per-change frame: payload columns + delete flag.

    Delete events surface the `before` image (that's where the key
    lives); everything else surfaces `after`.
    """
    payload = F.when(F.col("op") == "d", F.col("before")).otherwise(F.col("after"))
    flat = envelopes.select(
        payload.alias("_payload"),
        (F.col("op") == "d").alias(CDC_DELETED),
        F.col("ts_ms").alias(CDC_TS),
    )
    return flat.select("_payload.*", CDC_DELETED, CDC_TS)


def latest_change_per_key(changes: DataFrame, key_cols: list[str]) -> DataFrame:
    """Collapse a CDC batch to the newest change per key (by ts_ms) —
    the per-batch dedup a streaming upsert applies before merging."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(F.col(CDC_TS).desc())
    return (
        changes.withColumn("_cdc_rn", F.row_number().over(w))
        .filter(F.col("_cdc_rn") == 1)
        .drop("_cdc_rn")
    )


def apply_cdc_batch(table, envelopes: DataFrame, drop_meta: bool = True) -> None:
    """Apply one batch of Debezium envelopes to a LakehouseTable:
    flatten → collapse per key → upserts + deletes (EP3 step 3)."""
    changes = latest_change_per_key(
        flatten_debezium(envelopes), [c for c in table.config.record_key]
    )
    upserts = changes.filter(~F.col(CDC_DELETED)).drop(CDC_DELETED, CDC_TS)
    deletes = changes.filter(F.col(CDC_DELETED)).drop(CDC_DELETED, CDC_TS)
    # Deletes first, then upserts: within one batch the per-key collapse
    # already picked a single winner, so order only matters across keys
    # where it is independent.
    if deletes.limit(1).count() > 0:
        table.delete(deletes)
    if upserts.limit(1).count() > 0:
        table.upsert(upserts)


#: Dead-letter column added by `on_error="quarantine"` decodes: NULL
#: for clean rows, the decode exception text for poison ones (whose
#: payload columns are NULL). Route `WHERE _decode_error IS NOT NULL`
#: to a dead-letter table; the clean stream proceeds.
DECODE_ERROR = "_decode_error"


def decode_avro_stream(
    df: DataFrame,
    value_schema_json: str,
    confluent_framed: bool = False,
    on_error: str = "fail",
) -> DataFrame:
    """Avro value decode (reference S2 uses Schema Registry
    AvroConverter, `register-mysql-avro.json:20-24`).

    Fast path: JVM `from_avro` when the spark-avro package is loaded.
    Fallback: a REAL pure-Python Avro binary decoder running inside an
    Arrow-batched `mapInPandas` (sources/avro_codec.py) — same bytes,
    same envelope columns, no jar required. `confluent_framed=True`
    strips the Schema Registry wire header (magic 0 + 4-byte id) that
    the reference's converters prepend.

    `on_error="quarantine"`: poison bytes (truncated frames, wrong
    schema, corrupt varints) do NOT fail the job — each bad record
    yields NULL payload columns plus a `_decode_error` message so the
    caller can dead-letter it. A CDC pipeline ingesting a busy topic
    must survive one malformed message (at-least-once transports WILL
    re-deliver garbage eventually); this path always uses the Python
    decoder for per-record isolation.
    """
    if on_error not in ("fail", "quarantine"):
        raise ValueError("on_error must be 'fail' or 'quarantine'")
    value = F.col("value")
    if confluent_framed:
        jvm_value = F.expr("substring(value, 6, length(value) - 5)")
    else:
        jvm_value = value
    if on_error == "fail":
        try:
            from pyspark.sql.avro.functions import from_avro

            out = df.select(
                from_avro(jvm_value, value_schema_json).alias("envelope")
            )
            return out.select("envelope.*")
        except Exception:
            # spark-avro package not loaded (import succeeds but
            # analysis raises AVRO_NOT_LOADED...): python decode.
            pass
    from onehouse_demos_spark.sources.avro_codec import avro_to_spark_type

    out_schema = avro_to_spark_type(value_schema_json)
    quarantine = on_error == "quarantine"
    if quarantine:
        out_schema = T.StructType(
            list(out_schema.fields)
            + [T.StructField(DECODE_ERROR, T.StringType(), True)]
        )

    def decode_batches(batches):
        import pandas as pd

        from onehouse_demos_spark.sources import avro_codec as ac

        sch = ac.AvroSchema(value_schema_json)
        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            recs = []
            for raw in pdf["value"]:
                try:
                    body = bytes(raw)
                    if confluent_framed:
                        body = ac.strip_confluent_header(body)
                    rec = ac.decode(body, sch)
                    if quarantine:
                        rec[DECODE_ERROR] = None
                except Exception as exc:
                    if not quarantine:
                        raise
                    rec = {DECODE_ERROR: f"{type(exc).__name__}: {exc}"}
                recs.append(rec)
            yield pd.DataFrame(
                {c: [r.get(c) for r in recs] for c in cols}, columns=cols
            )

    return df.select("value").mapInPandas(decode_batches, schema=out_schema)


def decode_protobuf_stream(
    df: DataFrame,
    message_name: str,
    descriptor_file: str | None = None,
    message_spec: dict | None = None,
    on_error: str = "fail",
) -> DataFrame:
    """Protobuf value decode (reference S2 variant:
    `register-mysql-protobuf.json:20-24` ProtobufConverter).

    Fast path: JVM `from_protobuf` with a compiled descriptor file
    when the spark-protobuf jar is on the classpath. Fallback: a REAL
    pure-Python wire-format decoder driven by a JSON message spec
    (sources/protobuf_codec.py), running inside an Arrow-batched
    `mapInPandas` — same bytes, same envelope columns, no jar or
    protoc required.
    """
    if on_error not in ("fail", "quarantine"):
        raise ValueError("on_error must be 'fail' or 'quarantine'")
    if descriptor_file is not None and on_error == "fail":
        try:
            from pyspark.sql.protobuf.functions import from_protobuf

            return df.select(
                from_protobuf(
                    F.col("value"), message_name, descFilePath=descriptor_file
                ).alias("envelope")
            ).select("envelope.*")
        except Exception:
            if message_spec is None:  # pragma: no cover - classpath path
                raise RuntimeError(
                    "protobuf decode unavailable (spark-protobuf jar not on "
                    "classpath) and no message_spec fallback was provided"
                )
    if message_spec is None:
        if descriptor_file is not None and on_error == "quarantine":
            raise ValueError(
                "quarantine mode requires message_spec: the JVM "
                "descriptor_file path decodes whole batches and cannot "
                "isolate per-record failures"
            )
        raise ValueError("need a descriptor_file or a message_spec")
    from onehouse_demos_spark.sources import protobuf_codec as pc

    out_schema = pc.spec_to_spark_type(message_spec)
    quarantine = on_error == "quarantine"
    if quarantine:
        out_schema = T.StructType(
            list(out_schema.fields)
            + [T.StructField(DECODE_ERROR, T.StringType(), True)]
        )

    def decode_batches(batches):
        import pandas as pd

        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            recs = []
            for raw in pdf["value"]:
                try:
                    rec = pc.decode(bytes(raw), message_spec)
                    if quarantine:
                        rec[DECODE_ERROR] = None
                except Exception as exc:
                    if not quarantine:
                        raise
                    rec = {DECODE_ERROR: f"{type(exc).__name__}: {exc}"}
                recs.append(rec)
            yield pd.DataFrame(
                {c: [r.get(c) for r in recs] for c in cols}, columns=cols
            )

    return df.select("value").mapInPandas(decode_batches, schema=out_schema)
