"""HFile v3 container (tables/hfile.py) — pinned against the
reference's COMMITTED Hudi-0.14 metadata-table base slice
(`hudi_dimCustomer/.hoodie/metadata/files/
files-0000-0_0-73-165_00000000000000010.hfile`), the same external
anchoring the HoodieLogFormat module has. Closes the r10/r11
documented deviation: the files-partition base slice is no longer a
PARQUET stand-in but the fixture's own format."""

from __future__ import annotations

import json
import os
import struct

import pytest

from onehouse_demos_spark.tables.hfile import (
    COMPRESSION_GZ,
    DATA_MAGIC,
    TRAILER_MAGIC,
    TRAILER_SIZE,
    VERSION_WORD,
    crc32c,
    parse_hfile,
    read_hudi_metadata_base,
    write_hfile,
)

REF_HFILE = (
    "/root/reference/hudi-spark-minio-trino/data/db/hudi_dimCustomer/"
    ".hoodie/metadata/files/files-0000-0_0-73-165_00000000000000010.hfile"
)

ref_missing = pytest.mark.skipif(
    not os.path.exists(REF_HFILE), reason="reference fixture absent"
)


# ------------------------------------------------ fixture anchoring


@ref_missing
def test_fixture_parses_with_verified_checksums():
    """The parser consumes the REAL Hudi-0.14 base slice: one
    __all_partitions__ cell, GZ compression, v3.3 trailer, Hudi's
    HBase comparator — with every block's CRC32C checksum verified."""
    p = parse_hfile(REF_HFILE, verify_checksums=True)
    assert [k for k, _ in p["cells"]] == ["__all_partitions__"]
    t = p["trailer"]
    assert (t["major_version"], t["minor_version"]) == (3, 3)
    assert t["compression_codec"] == COMPRESSION_GZ
    assert t["entry_count"] == 1
    assert t["num_data_index_levels"] == 1
    assert t["comparator"] == (
        "org.apache.hudi.io.storage.HoodieHBaseKVComparator"
    )
    assert b"schema" in p["fileinfo"]
    assert p["fileinfo"][b"minRecordKey"] == b"__all_partitions__"


@ref_missing
def test_fixture_value_decodes_with_repo_avro_codec():
    """The cell value is an Avro HoodieMetadataRecord under the
    embedded schema — decoded by the repo's own codec; the key rides
    the cell row (the value's `key` field is empty and gets
    restored), and `_hoodie_file_name` names the slice itself."""
    (rec,) = read_hudi_metadata_base(REF_HFILE)
    assert rec["key"] == "__all_partitions__"
    assert rec["type"] == 1
    assert rec["_hoodie_file_name"] == os.path.basename(REF_HFILE)
    assert rec["filesystemMetadata"] == {}


@ref_missing
def test_checksum_corruption_detected(tmp_base):
    data = bytearray(open(REF_HFILE, "rb").read())
    data[40] ^= 0xFF  # inside the first data block's payload
    bad = os.path.join(tmp_base, "corrupt.hfile")
    open(bad, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="checksum"):
        parse_hfile(bad)


@ref_missing
def test_writer_schema_matches_fixture_embedded_schema():
    """Field-name/order parity: the schema our base slices embed is
    the fixture's own HoodieMetadataRecord field list."""
    from onehouse_demos_spark.tables.hudi_export import (
        _mdt_full_record_schema,
    )

    ref = json.loads(
        parse_hfile(REF_HFILE)["fileinfo"][b"schema"].decode()
    )
    ours = json.loads(_mdt_full_record_schema())
    assert [f["name"] for f in ours["fields"]] == [
        f["name"] for f in ref["fields"]
    ]
    assert ours["name"] == ref["name"] == "HoodieMetadataRecord"
    assert ours["namespace"] == ref["namespace"]


def test_crc32c_known_vector():
    # RFC 3720 test vector: 32 zero bytes -> 0x8A9136AA
    assert crc32c(bytes(32)) == 0x8A9136AA


@ref_missing
def test_fixture_bloom_deserializes_and_hits_real_key():
    """The fixture's `bloomFilter` meta block is a REAL Hadoop
    DYNAMIC_V0 bloom written by Hudi 0.14: our pure-Python murmur
    chain must hit ALL of its probe positions for the one key it
    holds — proving Java-exact hashing (signed byte loads, truncated
    `%` on negative hashes) and bit order — and miss for others."""
    from onehouse_demos_spark.tables.hadoop_bloom import (
        HadoopDynamicBloom,
    )

    meta = parse_hfile(REF_HFILE)["meta"]
    assert set(meta) == {"bloomFilter"}
    bloom = HadoopDynamicBloom.from_base64(meta["bloomFilter"])
    assert bloom.nb_hash == 30
    assert bloom.vector_size == 2587966
    assert bloom.nr == 60000
    assert bloom.membership_test("__all_partitions__")
    for probe in ("not_a_key", "2015/03/16", "files", ""):
        assert not bloom.membership_test(probe), probe


def test_hadoop_bloom_roundtrip_and_membership():
    from onehouse_demos_spark.tables.hadoop_bloom import (
        HadoopDynamicBloom,
    )

    keys = [f"key-{i}" for i in range(500)]
    bloom = HadoopDynamicBloom.build(keys, entries=1000)
    blob = bloom.to_base64()
    back = HadoopDynamicBloom.from_base64(blob)
    assert all(back.membership_test(k) for k in keys)
    misses = sum(
        back.membership_test(f"absent-{i}") for i in range(1000)
    )
    assert misses == 0  # 1e-9 design rate: zero expected


def test_meta_block_roundtrip(tmp_base):
    path = os.path.join(tmp_base, "meta.hfile")
    write_hfile(
        path,
        [("k", b"v")],
        meta_blocks={"bloomFilter": b"abc", "other": b"xyz"},
    )
    p = parse_hfile(path)
    assert p["meta"] == {"bloomFilter": b"abc", "other": b"xyz"}
    assert p["trailer"]["meta_index_count"] == 2


# ------------------------------------------------ round-trip


def test_roundtrip_single_block(tmp_base):
    path = os.path.join(tmp_base, "t.hfile")
    cells = [("b", b"two"), ("a", b"one"), ("c", b"")]
    write_hfile(path, cells, fileinfo_extra={"x": b"y"})
    p = parse_hfile(path)
    assert p["cells"] == sorted(cells)  # HFile key order
    assert p["fileinfo"][b"x"] == b"y"
    assert p["fileinfo"][b"minRecordKey"] == b"a"
    assert p["fileinfo"][b"maxRecordKey"] == b"c"
    assert p["trailer"]["entry_count"] == 3
    assert p["trailer"]["meta_index_count"] == 0


def test_roundtrip_multi_block(tmp_base):
    path = os.path.join(tmp_base, "m.hfile")
    cells = [(f"k{i:06d}", os.urandom(0) + bytes([i % 251]) * 97)
             for i in range(3000)]
    write_hfile(path, cells, block_size=4096)
    p = parse_hfile(path)
    assert p["cells"] == cells  # already sorted
    assert p["trailer"]["data_index_count"] > 1
    assert p["trailer"]["first_data_block_offset"] == 0
    assert p["trailer"]["last_data_block_offset"] > 0


def test_structural_pins(tmp_base):
    """On-disk invariants a real HBase reader relies on: DATABLK*
    first, GZ payload behind the 33-byte header, fixed 4096-byte
    trailer ending in the v3.3 version word."""
    path = os.path.join(tmp_base, "s.hfile")
    write_hfile(path, [("k", b"v")])
    data = open(path, "rb").read()
    assert data[:8] == DATA_MAGIC
    assert data[33:35] == b"\x1f\x8b"  # gzip magic behind the header
    assert data[-TRAILER_SIZE : -TRAILER_SIZE + 8] == TRAILER_MAGIC
    assert struct.unpack(">I", data[-4:])[0] == VERSION_WORD
    (on_disk_wo_header,) = struct.unpack(">I", data[8:12])
    (odwh,) = struct.unpack(">I", data[29:33])
    # onDiskSizeWithoutHeader = payload + checksums; one CRC chunk here
    assert 33 + on_disk_wo_header == odwh + 4


# ------------------------------------------------ integration


def test_files_partition_base_is_hfile(spark, tmp_base):
    from pyspark.sql import functions as F  # noqa: F401

    from onehouse_demos_spark.tables.hudi_export import (
        hudi_live_files,
        hudi_metadata_listing,
        sync_hudi_metadata,
    )
    from onehouse_demos_spark.tables.table import (
        LakehouseTable,
        TableConfig,
    )

    t = LakehouseTable.create(
        spark,
        f"{tmp_base}/hf_src",
        TableConfig(name="hf_src", record_key=["key"], precombine="ver"),
    )
    t.insert(
        spark.createDataFrame(
            [(f"k{i}", 1, float(i)) for i in range(10)],
            "key string, ver int, px double",
        )
    )
    sync_hudi_metadata(t)
    files_dir = os.path.join(t.base_path, ".hoodie", "metadata", "files")
    (base,) = [n for n in os.listdir(files_dir) if not n.startswith(".")]
    assert base.endswith(".hfile")
    recs = read_hudi_metadata_base(os.path.join(files_dir, base))
    by_key = {r["key"]: r for r in recs}
    assert by_key["__all_partitions__"]["type"] == 1
    listing = hudi_metadata_listing(t.base_path)
    live = {os.path.basename(p) for p in hudi_live_files(t.base_path)}
    assert {n for fs in listing.values() for n in fs} == live
    # every record in the base declares the slice as its file name
    assert all(r["_hoodie_file_name"] == base for r in recs)
    # and the base carries a REAL DYNAMIC_V0 bloom over its keys
    from onehouse_demos_spark.tables.hadoop_bloom import (
        HadoopDynamicBloom,
    )

    parsed = parse_hfile(os.path.join(files_dir, base))
    assert parsed["fileinfo"][b"bloomFilterTypeCode"] == b"DYNAMIC_V0"
    bloom = HadoopDynamicBloom.from_base64(parsed["meta"]["bloomFilter"])
    assert bloom.membership_test("__all_partitions__")
    assert not bloom.membership_test("no_such_partition")


def test_legacy_parquet_base_still_reads(spark, tmp_base):
    """Pre-r11 personalities wrote the base slice as PARQUET (the
    documented stand-in); the listing reader must keep consuming
    them. Simulate one in the old writer's exact shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from onehouse_demos_spark.tables.hudi_export import (
        hudi_metadata_listing,
    )

    files_dir = os.path.join(tmp_base, "legacy", ".hoodie", "metadata", "files")
    os.makedirs(files_dir)
    map_type = pa.map_(
        pa.string(),
        pa.struct([("size", pa.int64()), ("isDeleted", pa.bool_())]),
    )
    tbl = pa.table(
        {
            "key": pa.array(["__all_partitions__", "."], pa.string()),
            "type": pa.array([1, 2], pa.int32()),
            "filesystemMetadata": pa.array(
                [
                    [(".", {"size": 0, "isDeleted": False})],
                    [("f1.parquet", {"size": 7, "isDeleted": False})],
                ],
                map_type,
            ),
        }
    )
    pq.write_table(
        tbl,
        os.path.join(
            files_dir, "files-0000-0_0-0-0_00000000000000010.parquet"
        ),
    )
    listing = hudi_metadata_listing(os.path.join(tmp_base, "legacy"))
    assert listing == {".": {"f1.parquet": 7}}
