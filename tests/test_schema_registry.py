"""Schema Registry client protocol + registry-resolved CDC decode
(reference S2: `mysql-debezium/register-mysql-avro.json:16-24` wires
AvroConverter to a Schema Registry with USER_INFO basic auth).

The transport is injected (`dict_fetcher` over recorded protocol
responses), so the full client surface — URL shapes, auth header, id
cache, error mapping — and the multi-schema-version decode path
execute without a network; only the urllib transport itself stays
env-gated (same gating philosophy as the Kafka source).
"""

from __future__ import annotations

import base64
import json

import pytest

from onehouse_demos_spark.sources.avro_codec import (
    AvroSchema,
    confluent_frame,
    encode,
)
from onehouse_demos_spark.sources.cdc import DECODE_ERROR, decode_avro_stream
from onehouse_demos_spark.sources.schema_registry import (
    SchemaRegistryClient,
    SchemaRegistryError,
    dict_fetcher,
    parse_schema_id,
)

#: v1 writer schema: the plain Debezium-ish envelope payload.
V1 = json.dumps(
    {
        "type": "record",
        "name": "Customer",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "email", "type": ["null", "string"], "default": None},
        ],
    }
)

#: v2 adds a nullable field (additive evolution) — topics carry BOTH
#: versions simultaneously after a schema change.
V2 = json.dumps(
    {
        "type": "record",
        "name": "Customer",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "email", "type": ["null", "string"], "default": None},
            {"name": "tier", "type": ["null", "string"], "default": None},
        ],
    }
)

RESPONSES = {
    "/schemas/ids/7": {"schema": V1},
    "/schemas/ids/9": {"schema": V2},
    "/subjects/customers-value/versions/latest": {
        "subject": "customers-value",
        "id": 9,
        "version": 2,
        "schema": V2,
    },
}


def _client(calls=None):
    inner = dict_fetcher(RESPONSES)

    def fetch(url, headers):
        if calls is not None:
            calls.append((url, headers))
        return inner(url, headers)

    return SchemaRegistryClient(
        "http://schema-registry:8081", auth="admin:admin", fetcher=fetch
    )


def test_client_protocol_urls_auth_and_cache():
    calls: list = []
    c = _client(calls)
    assert json.loads(c.get_schema_by_id(7)) == json.loads(V1)
    # immutable-id cache: second lookup makes no fetch
    c.get_schema_by_id(7)
    assert len(calls) == 1
    url, headers = calls[0]
    assert url == "http://schema-registry:8081/schemas/ids/7"
    expect = "Basic " + base64.b64encode(b"admin:admin").decode()
    assert headers["Authorization"] == expect  # USER_INFO basic auth

    sid, schema = c.latest_schema("customers-value")
    assert sid == 9 and json.loads(schema) == json.loads(V2)
    assert calls[-1][0].endswith("/subjects/customers-value/versions/latest")


def test_client_error_mapping():
    c = _client()
    with pytest.raises(SchemaRegistryError) as ei:
        c.get_schema_by_id(404404)
    assert ei.value.status == 404
    assert "40403" in str(ei.value) or "not found" in str(ei.value).lower()


def test_parse_schema_id():
    framed = confluent_frame(b"\x02", schema_id=9)
    assert parse_schema_id(framed) == 9
    with pytest.raises(ValueError):
        parse_schema_id(b"\x01\x00\x00\x00\x09payload")


def _mixed_version_frames(spark):
    """Six framed records: ids alternate between v1 (id 7) and v2
    (id 9) — exactly what a topic looks like mid schema migration."""
    s1, s2 = AvroSchema(V1), AvroSchema(V2)
    frames = []
    for i in range(6):
        if i % 2 == 0:
            body = encode({"id": i, "email": f"u{i}@x"}, s1)
            frames.append(confluent_frame(body, schema_id=7))
        else:
            body = encode({"id": i, "email": f"u{i}@x", "tier": "gold"}, s2)
            frames.append(confluent_frame(body, schema_id=9))
    return spark.createDataFrame(
        [(bytearray(b),) for b in frames], "value binary"
    )


def test_registry_resolved_decode_mixed_versions(spark):
    """Reader pinned at v2: v1 records decode with their v1 writer
    schema (tier → NULL), v2 records carry tier through."""
    df = _mixed_version_frames(spark)
    out = decode_avro_stream(
        df, V2, confluent_framed=True, registry=_client()
    ).orderBy("id")
    rows = out.collect()
    assert [r.id for r in rows] == list(range(6))
    assert [r.tier for r in rows] == [None, "gold"] * 3
    assert rows[0].email == "u0@x"


def test_registry_resolved_decode_old_reader_drops_new_field(spark):
    """Reader pinned at v1 while writers already produce v2: the
    writer-only field is pruned, nothing fails."""
    df = _mixed_version_frames(spark)
    out = decode_avro_stream(
        df, V1, confluent_framed=True, registry=_client()
    ).orderBy("id")
    rows = out.collect()
    assert [r.id for r in rows] == list(range(6))
    assert "tier" not in out.columns


def test_registry_unknown_id_quarantines(spark):
    s1 = AvroSchema(V1)
    good = confluent_frame(encode({"id": 1, "email": "a@b"}, s1), schema_id=7)
    unknown = confluent_frame(encode({"id": 2, "email": "c@d"}, s1), schema_id=31337)
    df = spark.createDataFrame(
        [(bytearray(good),), (bytearray(unknown),)], "value binary"
    )
    out = decode_avro_stream(
        df, V1, confluent_framed=True, registry=_client(), on_error="quarantine"
    ).collect()
    by_err = {r[DECODE_ERROR] is None: r for r in out}
    assert by_err[True].id == 1
    assert "SchemaRegistryError" in by_err[False][DECODE_ERROR]
    # fail mode propagates instead
    with pytest.raises(Exception):
        decode_avro_stream(
            df, V1, confluent_framed=True, registry=_client()
        ).collect()


def test_registry_requires_confluent_framing(spark):
    df = spark.createDataFrame([(bytearray(b"x"),)], "value binary")
    with pytest.raises(ValueError, match="confluent_framed"):
        decode_avro_stream(df, V1, registry=_client())
