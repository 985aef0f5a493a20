"""HoodieLogFormat writer/parser (tables/hudi_log.py): structural pin
against the reference's COMMITTED log files (written by real Hudi
0.14 into `hudi_dimCustomer/.hoodie/metadata/files/`), plus
write->parse round trips of our own AVRO data blocks.
"""

from __future__ import annotations

import os

import pytest

from onehouse_demos_spark.tables.hudi_log import (
    BLOCK_AVRO_DATA,
    HEADER_INSTANT_TIME,
    HEADER_SCHEMA,
    LOG_FORMAT_VERSION,
    encode_records,
    parse_log_file,
    write_avro_log_file,
)

REF_FILES = (
    "/root/reference/hudi-spark-minio-trino/data/db/hudi_dimCustomer"
    "/.hoodie/metadata/files"
)


@pytest.mark.skipif(
    not os.path.isdir(REF_FILES), reason="reference fixture absent"
)
def test_parser_consumes_real_hudi_log_files():
    """The parser walks every block of BOTH fixture log files (real
    Hudi bytes): magic/size/trailer framing verifies exactly, the
    format version is 1, and the headers carry the instant (and, for
    the data block, the HoodieMetadataRecord schema)."""
    logs = sorted(
        n for n in os.listdir(REF_FILES) if ".log." in n
    )
    assert len(logs) == 2
    for name in logs:
        blocks = parse_log_file(os.path.join(REF_FILES, name))
        assert len(blocks) == 1
        b = blocks[0]
        assert b["version"] == LOG_FORMAT_VERSION
        assert (
            b["headers"][HEADER_INSTANT_TIME].decode()
            in ("00000000000000010", "20231105172136406")
        )
    # the 13 KB file is the metadata payload block: HFILE content
    # (DATABLK* inside) with the HoodieMetadataRecord schema header
    big = [n for n in logs if os.path.getsize(os.path.join(REF_FILES, n)) > 1000][0]
    b = parse_log_file(os.path.join(REF_FILES, big))[0]
    assert b["type"] == 4  # HFILE_DATA_BLOCK ordinal
    assert b"HoodieMetadataRecord" in b["headers"][HEADER_SCHEMA]
    assert b["content"][:8] == b"DATABLK*"


def test_avro_data_block_round_trip(tmp_path):
    schema = (
        '{"type":"record","name":"r","fields":['
        '{"name":"id","type":["null","int"],"default":null},'
        '{"name":"v","type":["null","string"],"default":null},'
        '{"name":"px","type":["null",{"type":"bytes",'
        '"logicalType":"decimal","precision":18,"scale":2}],'
        '"default":null},'
        '{"name":"_hoodie_is_deleted","type":"boolean","default":false}'
        "]}"
    )
    from decimal import Decimal

    rows = [
        {"id": 1, "v": "a", "px": Decimal("12.34"), "_hoodie_is_deleted": False},
        {"id": 2, "v": None, "px": None, "_hoodie_is_deleted": True},
    ]
    recs = encode_records(rows, schema)
    path = str(tmp_path / ".grp_001.log.1_0-0-0")
    write_avro_log_file(path, "00000000000000077", schema, recs)
    blocks = parse_log_file(path)
    assert len(blocks) == 1
    b = blocks[0]
    assert b["type"] == BLOCK_AVRO_DATA
    assert b["version"] == LOG_FORMAT_VERSION
    assert b["headers"][HEADER_INSTANT_TIME] == b"00000000000000077"
    assert b["content_version"] == 3
    got = b["records"]
    assert got[0]["id"] == 1 and got[0]["v"] == "a"
    assert not got[0]["_hoodie_is_deleted"]
    # decimal round-trips as the two's-complement unscaled bytes
    assert int.from_bytes(got[0]["px"], "big", signed=True) == 1234
    assert got[1]["id"] == 2 and got[1]["v"] is None
    assert got[1]["_hoodie_is_deleted"]


def test_framing_matches_fixture_relationships(tmp_path):
    """The two length fields relate to the file exactly as the
    fixture's do: blocksize = filelen - 14 (everything after the size
    field, trailer included) and trailer = filelen - 8."""
    import struct

    schema = (
        '{"type":"record","name":"r","fields":'
        '[{"name":"id","type":["null","int"],"default":null}]}'
    )
    path = str(tmp_path / ".g.log.1_0-0-0")
    write_avro_log_file(
        path, "1" * 17, schema, encode_records([{"id": 5}], schema)
    )
    buf = open(path, "rb").read()
    assert buf[:6] == b"#HUDI#"
    size = struct.unpack(">Q", buf[6:14])[0]
    total = struct.unpack(">Q", buf[-8:])[0]
    assert size == len(buf) - 14
    assert total == len(buf) - 8
    if os.path.isdir(REF_FILES):
        ref = [
            os.path.join(REF_FILES, n)
            for n in os.listdir(REF_FILES)
            if ".log." in n
        ][0]
        rbuf = open(ref, "rb").read()
        rsize = struct.unpack(">Q", rbuf[6:14])[0]
        rtotal = struct.unpack(">Q", rbuf[-8:])[0]
        assert rsize == len(rbuf) - 14
        assert rtotal == len(rbuf) - 8
