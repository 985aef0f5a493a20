"""HBase HFile v3 writer + parser (pure Python) — the REAL container
of Hudi's metadata-table base slices (r11, closing the last container
deviation: the `files` partition base was a documented PARQUET
stand-in; it is now the fixture's own format).

Anchored byte-for-byte against the reference's COMMITTED base slice
(`hudi-spark-minio-trino/data/db/hudi_dimCustomer/.hoodie/metadata/
files/files-0000-0_0-73-165_00000000000000010.hfile`, written by real
Hudi 0.14 / HBase 2.x — see tests/test_hfile.py, which parses those
exact bytes, verifies their CRC32C block checksums and decodes the
cell value with the repo's own Avro codec).

On-disk layout (public HBase HFile format, version 3):

    block*                 each: 33-byte header + payload + checksums
      header: magic[8]                DATABLK* / METABLKc / IDXROOT2 /
                                      FILEINF2
              i32  onDiskSizeWithoutHeader   (payload + checksums)
              i32  uncompressedSizeWithoutHeader
              i64  prevBlockOffset            (-1 for first of kind)
              u8   checksumType               1=CRC32 2=CRC32C
              i32  bytesPerChecksum           (16384)
              i32  onDiskDataSizeWithHeader   (header + payload)
      payload: GZ (compression_codec 1) or raw (2=NONE)
      checksums: one u32 per bytesPerChecksum chunk of
                 header+payload bytes
    DATA blocks: cells `i32 keyLen, i32 valLen, key, value, vlong mvcc`
      cell key: `i16 rowLen, row, u8 famLen, family, qualifier,
                 i64 timestamp (LATEST=Long.MAX), u8 type (4=Put)`
    load-on-open section (trailer names its offset):
      IDXROOT2  root data index: per data block
                `i64 offset, i32 onDiskSizeWithHeader,
                 vint keyLen, first cell key`
      IDXROOT2  root meta index: same shape, key = meta block name
      FILEINF2  "PBUF" + protobuf map<bytes,bytes> (sorted)
    trailer (fixed 4096 bytes): magic TRABLK"$ + protobuf
      FileTrailerProto (fileInfoOffset, loadOnOpenOffset, counts,
      comparator, compressionCodec) + zero padding + u32 version
      word (minor<<24 | major, v3 = 0x03000003)

Scale note: a base slice is a single-writer artifact (Hudi's metadata
compactor writes one per file group); chains stay metadata-scale by
construction, so the driver-side write here mirrors Hudi's own
metadata-table writer placement. The values are Avro
HoodieMetadataRecords under the SAME schema the log-block chain uses
(`key` rides the cell row and is stored empty in the value, exactly
like the fixture).
"""

from __future__ import annotations

import json
import os
import struct
import zlib

DATA_MAGIC = b"DATABLK*"
META_MAGIC = b"METABLKc"
ROOT_INDEX_MAGIC = b"IDXROOT2"
FILE_INFO_MAGIC = b"FILEINF2"
TRAILER_MAGIC = b'TRABLK"$'

CHECKSUM_CRC32 = 1
CHECKSUM_CRC32C = 2
BYTES_PER_CHECKSUM = 16384
#: HBase Compression.Algorithm ordinals (fixture uses GZ)
COMPRESSION_GZ = 1
COMPRESSION_NONE = 2
TRAILER_SIZE = 4096
VERSION_WORD = (3 << 24) | 3  # minorVersion=3, majorVersion=3
CELL_TYPE_PUT = 4
LATEST_TIMESTAMP = 0x7FFFFFFFFFFFFFFF
COMPARATOR = "org.apache.hudi.io.storage.HoodieHBaseKVComparator"

_HEADER_LEN = 33


# -- CRC32C (Castagnoli), the checksum the fixture declares ---------------

_CRC32C_POLY = 0x82F63B78
_CRC32C_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC32C_POLY if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC32C_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _checksum(data: bytes, ctype: int) -> int:
    if ctype == CHECKSUM_CRC32C:
        return crc32c(data)
    return zlib.crc32(data) & 0xFFFFFFFF


# -- varints ---------------------------------------------------------------


def _read_pb_varint(b: bytes, p: int) -> tuple[int, int]:
    out = sh = 0
    while True:
        x = b[p]
        p += 1
        out |= (x & 0x7F) << sh
        if not x & 0x80:
            return out, p
        sh += 7


def _pb_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        if v < 0x80:
            out.append(v)
            return bytes(out)
        out.append((v & 0x7F) | 0x80)
        v >>= 7


def _read_hadoop_vlong(b: bytes, p: int) -> tuple[int, int]:
    """Hadoop WritableUtils.readVLong (cell mvcc + vint key lengths):
    first byte in [-112, 127] IS the value; [-120, -113] prefixes
    -(first+112) big-endian bytes of a positive value; [-128, -121]
    prefixes -(first+120) bytes of a bitwise-inverted value."""
    first = b[p]
    p += 1
    if first > 127:
        first -= 256  # signed byte
    if first >= -112:
        return first, p
    ln = -(first + 112) if first >= -120 else -(first + 120)
    out = 0
    for _ in range(ln):
        out = (out << 8) | b[p]
        p += 1
    return (out if first >= -120 else ~out), p


def _hadoop_vlong(v: int) -> bytes:
    """Hadoop WritableUtils.writeVLong; this module only ever writes
    small non-negative values (mvcc 0, key lengths < 128), for which
    the encoding is the single byte itself, but keep the general
    non-negative form for safety."""
    if v <= 127:
        return bytes([v])
    tmp, ln = v, 0
    while tmp:
        tmp >>= 8
        ln += 1
    out = bytearray([(-112 - ln) & 0xFF])
    for i in range(ln - 1, -1, -1):
        out.append((v >> (8 * i)) & 0xFF)
    return bytes(out)


# -- block layer -----------------------------------------------------------


def _encode_block(
    magic: bytes, payload: bytes, prev_offset: int, codec: int,
    ctype: int = CHECKSUM_CRC32C,
) -> tuple[bytes, int, int]:
    """One on-disk block. Returns (bytes, onDiskSizeWithHeader,
    uncompressedSizeWithoutHeader)."""
    if codec == COMPRESSION_GZ:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        comp = co.compress(payload) + co.flush()
    else:
        comp = payload
    odwh = _HEADER_LEN + len(comp)
    n_chunks = -(-odwh // BYTES_PER_CHECKSUM)
    on_disk_without_header = len(comp) + 4 * n_chunks
    header = magic + struct.pack(
        ">IIqBII",
        on_disk_without_header,
        len(payload),
        prev_offset,
        ctype,
        BYTES_PER_CHECKSUM,
        odwh,
    )
    blob = header + comp
    sums = b""
    for i in range(n_chunks):
        chunk = blob[i * BYTES_PER_CHECKSUM : (i + 1) * BYTES_PER_CHECKSUM]
        sums += struct.pack(">I", _checksum(chunk, ctype))
    blob += sums
    return blob, _HEADER_LEN + on_disk_without_header, len(payload)


def _decode_block_at(
    data: bytes, pos: int, codec: int, verify: bool = True
) -> tuple[bytes, bytes, int]:
    """(magic, decompressed payload, next block offset)."""
    magic = data[pos : pos + 8]
    (
        on_disk_without_header,
        _uncomp,
        _prev,
        ctype,
        bpc,
        odwh,
    ) = struct.unpack(">IIqBII", data[pos + 8 : pos + _HEADER_LEN])
    comp = data[pos + _HEADER_LEN : pos + odwh]
    if verify:
        region = data[pos : pos + odwh]
        sums = data[pos + odwh : pos + _HEADER_LEN + on_disk_without_header]
        for i in range(len(sums) // 4):
            chunk = region[i * bpc : (i + 1) * bpc]
            want = struct.unpack(">I", sums[i * 4 : i * 4 + 4])[0]
            got = _checksum(chunk, ctype)
            if want != got:
                raise ValueError(
                    f"hfile block checksum mismatch at offset {pos}"
                )
    if codec == COMPRESSION_GZ:
        payload = zlib.decompress(comp, 47)
    else:
        payload = comp
    return magic, payload, pos + _HEADER_LEN + on_disk_without_header


# -- cells -----------------------------------------------------------------


def _encode_cell(row: bytes, value: bytes) -> bytes:
    key = (
        struct.pack(">H", len(row))
        + row
        + b"\x00"  # famLen 0, no family, no qualifier
        + struct.pack(">q", LATEST_TIMESTAMP)
        + bytes([CELL_TYPE_PUT])
    )
    return (
        struct.pack(">II", len(key), len(value))
        + key
        + value
        + _hadoop_vlong(0)  # mvcc
    )


def _first_cell_key(row: bytes) -> bytes:
    return (
        struct.pack(">H", len(row))
        + row
        + b"\x00"
        + struct.pack(">q", LATEST_TIMESTAMP)
        + bytes([CELL_TYPE_PUT])
    )


def _decode_cells(
    payload: bytes, with_mvcc: bool
) -> list[tuple[bytes, bytes]]:
    out = []
    p = 0
    while p < len(payload):
        klen, vlen = struct.unpack(">II", payload[p : p + 8])
        p += 8
        key = payload[p : p + klen]
        p += klen
        value = payload[p : p + vlen]
        p += vlen
        if with_mvcc:
            _mvcc, p = _read_hadoop_vlong(payload, p)
        (rowlen,) = struct.unpack(">H", key[:2])
        out.append((key[2 : 2 + rowlen], value))
    return out


# -- file info (PBUF map) ----------------------------------------------------


def _encode_fileinfo(entries: dict[bytes, bytes]) -> bytes:
    body = bytearray()
    for k in sorted(entries):
        v = entries[k]
        ent = (
            b"\x0a" + _pb_varint(len(k)) + k
            + b"\x12" + _pb_varint(len(v)) + v
        )
        body += b"\x0a" + _pb_varint(len(ent)) + ent
    return b"PBUF" + _pb_varint(len(body)) + bytes(body)


def _decode_fileinfo(payload: bytes) -> dict[bytes, bytes]:
    if payload[:4] != b"PBUF":
        raise ValueError("hfile file-info block missing PBUF magic")
    ln, p = _read_pb_varint(payload, 4)
    end = p + ln
    out: dict[bytes, bytes] = {}
    while p < end:
        _tag, p = _read_pb_varint(payload, p)
        elen, p = _read_pb_varint(payload, p)
        ee = p + elen
        k = v = b""
        while p < ee:
            t2, p = _read_pb_varint(payload, p)
            l2, p = _read_pb_varint(payload, p)
            if t2 == 0x0A:
                k = payload[p : p + l2]
            else:
                v = payload[p : p + l2]
            p += l2
        out[k] = v
    return out


# -- trailer -----------------------------------------------------------------

_TRAILER_FIELDS = (
    "file_info_offset",
    "load_on_open_data_offset",
    "uncompressed_data_index_size",
    "total_uncompressed_bytes",
    "data_index_count",
    "meta_index_count",
    "entry_count",
    "num_data_index_levels",
    "first_data_block_offset",
    "last_data_block_offset",
)


def _encode_trailer(t: dict) -> bytes:
    msg = bytearray()
    for i, name in enumerate(_TRAILER_FIELDS, start=1):
        msg += _pb_varint(i << 3) + _pb_varint(t[name])
    comp = COMPARATOR.encode()
    msg += _pb_varint((11 << 3) | 2) + _pb_varint(len(comp)) + comp
    msg += _pb_varint(12 << 3) + _pb_varint(t["compression_codec"])
    blob = TRAILER_MAGIC + _pb_varint(len(msg)) + bytes(msg)
    pad = TRAILER_SIZE - len(blob) - 4
    return blob + b"\x00" * pad + struct.pack(">I", VERSION_WORD)


def _decode_trailer(data: bytes) -> dict:
    if len(data) < TRAILER_SIZE:
        raise ValueError("hfile shorter than its fixed trailer")
    t = data[-TRAILER_SIZE:]
    if t[:8] != TRAILER_MAGIC:
        raise ValueError("hfile trailer magic missing")
    version = struct.unpack(">I", t[-4:])[0]
    out = {"major_version": version & 0xFF, "minor_version": version >> 24}
    ln, p = _read_pb_varint(t, 8)
    end = p + ln
    while p < end:
        tag, p = _read_pb_varint(t, p)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            val, p = _read_pb_varint(t, p)
            if 1 <= fn <= 10:
                out[_TRAILER_FIELDS[fn - 1]] = val
            elif fn == 12:
                out["compression_codec"] = val
        elif wt == 2:
            l2, p = _read_pb_varint(t, p)
            if fn == 11:
                out["comparator"] = t[p : p + l2].decode()
            p += l2
        else:  # pragma: no cover - no other wire types in this proto
            raise ValueError(f"unexpected trailer wire type {wt}")
    return out


# -- public API --------------------------------------------------------------


def _decode_root_index(payload: bytes) -> list[tuple[int, int, bytes]]:
    """Root index entries: (block offset, onDiskSizeWithHeader, key)."""
    out = []
    p = 0
    while p < len(payload):
        off, size = struct.unpack(">qI", payload[p : p + 12])
        p += 12
        klen, p = _read_hadoop_vlong(payload, p)
        out.append((off, size, payload[p : p + klen]))
        p += klen
    return out


def hfile_bytes(
    cells: list[tuple[str, bytes]],
    fileinfo_extra: dict[str, bytes] | None = None,
    codec: int = COMPRESSION_GZ,
    block_size: int = 64 * 1024,
    meta_blocks: dict[str, bytes] | None = None,
) -> bytes:
    """Build a v3 HFile of (row key, value bytes) cells, sorted by
    key as HFiles require. `meta_blocks` (name -> payload, e.g. the
    fixture's "bloomFilter") ride as METABLKc blocks with a root
    meta index; `fileinfo_extra` carries the Hudi entries (schema,
    min/maxRecordKey, bloomFilterTypeCode). Returns the full file
    image so the caller can publish it as one atomic object-store
    PUT (VERDICT r11 #3)."""
    cells = sorted(cells, key=lambda kv: kv[0])
    buf = bytearray()
    data_blocks: list[tuple[int, int, bytes]] = []  # offset, size, first key
    cur = bytearray()
    first_row: bytes | None = None
    prev_data = -1

    def _flush():
        nonlocal cur, first_row, prev_data
        if not cur:
            return
        off = len(buf)
        blob, size, _ = _encode_block(DATA_MAGIC, bytes(cur), prev_data, codec)
        buf.extend(blob)
        data_blocks.append((off, size, _first_cell_key(first_row)))
        prev_data = off
        cur, first_row = bytearray(), None

    total_uncomp = 0
    for key, value in cells:
        row = key.encode()
        if first_row is None:
            first_row = row
        cur += _encode_cell(row, value)
        if len(cur) >= block_size:
            total_uncomp += len(cur)
            _flush()
    total_uncomp += len(cur)
    _flush()

    meta_index: list[tuple[int, int, bytes]] = []
    prev_meta = -1
    for name in sorted(meta_blocks or {}):
        payload = meta_blocks[name]
        off = len(buf)
        blob, size, _ = _encode_block(META_MAGIC, payload, prev_meta, codec)
        buf.extend(blob)
        meta_index.append((off, size, name.encode()))
        prev_meta = off
        total_uncomp += len(payload)

    load_on_open = len(buf)
    root_index = bytearray()
    for off, size, fkey in data_blocks:
        root_index += struct.pack(">qI", off, size)
        root_index += _hadoop_vlong(len(fkey)) + fkey
    blob, _size, idx_uncomp = _encode_block(
        ROOT_INDEX_MAGIC, bytes(root_index), -1, codec
    )
    buf.extend(blob)
    meta_root = bytearray()
    for off, size, name in meta_index:
        meta_root += struct.pack(">qI", off, size)
        meta_root += _hadoop_vlong(len(name)) + name
    blob, _size, _ = _encode_block(
        ROOT_INDEX_MAGIC, bytes(meta_root), -1, codec
    )
    buf.extend(blob)

    file_info_offset = len(buf)
    rows = [k.encode() for k, _ in cells]
    avg_key = (
        sum(len(_first_cell_key(r)) for r in rows) // max(1, len(rows))
    )
    avg_val = sum(len(v) for _, v in cells) // max(1, len(cells))
    info: dict[bytes, bytes] = {
        b"KEY_VALUE_VERSION": struct.pack(">I", 1),
        b"MAX_MEMSTORE_TS_KEY": struct.pack(">q", 0),
        b"hfile.AVG_KEY_LEN": struct.pack(">I", avg_key),
        b"hfile.AVG_VALUE_LEN": struct.pack(">I", avg_val),
        b"hfile.CREATE_TIME_TS": struct.pack(">q", 0),
    }
    if rows:
        info[b"hfile.LASTKEY"] = _first_cell_key(rows[-1])
        info[b"minRecordKey"] = rows[0]
        info[b"maxRecordKey"] = rows[-1]
    for k, v in (fileinfo_extra or {}).items():
        info[k.encode()] = v
    payload = _encode_fileinfo(info)
    total_uncomp += idx_uncomp + len(payload)
    blob, _size, _ = _encode_block(FILE_INFO_MAGIC, payload, -1, codec)
    buf.extend(blob)

    buf.extend(
        _encode_trailer(
            {
                "file_info_offset": file_info_offset,
                "load_on_open_data_offset": load_on_open,
                "uncompressed_data_index_size": idx_uncomp,
                "total_uncompressed_bytes": total_uncomp,
                "data_index_count": len(data_blocks),
                "meta_index_count": len(meta_index),
                "entry_count": len(cells),
                "num_data_index_levels": 1,
                "first_data_block_offset": data_blocks[0][0] if data_blocks else 0,
                "last_data_block_offset": data_blocks[-1][0] if data_blocks else 0,
                "compression_codec": codec,
            }
        )
    )
    return bytes(buf)


def write_hfile(
    path: str,
    cells: list[tuple[str, bytes]],
    fileinfo_extra: dict[str, bytes] | None = None,
    codec: int = COMPRESSION_GZ,
    block_size: int = 64 * 1024,
    meta_blocks: dict[str, bytes] | None = None,
) -> None:
    """Local-filesystem writer over hfile_bytes (tmp+rename)."""
    blob = hfile_bytes(
        cells,
        fileinfo_extra=fileinfo_extra,
        codec=codec,
        block_size=block_size,
        meta_blocks=meta_blocks,
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(blob)
    os.replace(tmp, path)


def parse_hfile(path: str, verify_checksums: bool = True) -> dict:
    """Parse a v3 HFile from the filesystem — see
    ``parse_hfile_bytes`` for the format contract."""
    with open(path, "rb") as fh:
        data = fh.read()
    return parse_hfile_bytes(data, verify_checksums=verify_checksums)


def parse_hfile_bytes(data: bytes, verify_checksums: bool = True) -> dict:
    """Parse a v3 HFile: {"cells": [(row key str, value bytes)...],
    "fileinfo": {str: bytes}, "trailer": {...}}. Consumes REAL
    Hudi/HBase files (the committed fixture base slice) and this
    module's own output alike; block checksums (CRC32 or CRC32C per
    the block's declared type) are verified by default. The bytes
    entry point exists so writer-internal reads can ride the object
    store seam (GET → parse) instead of a local open()."""
    trailer = _decode_trailer(data)
    codec = trailer.get("compression_codec", COMPRESSION_NONE)
    cells: list[tuple[bytes, bytes]] = []
    pos = 0
    fileinfo: dict[bytes, bytes] = {}
    meta_payload_at: dict[int, bytes] = {}
    load_on_open = trailer["load_on_open_data_offset"]
    # data section: everything before load-on-open (data + meta blocks)
    while pos < load_on_open:
        magic, payload, nxt = _decode_block_at(
            data, pos, codec, verify_checksums
        )
        if magic == DATA_MAGIC:
            cells.append(payload)  # decoded after fileinfo (mvcc flag)
        elif magic == META_MAGIC:
            meta_payload_at[pos] = payload
        else:
            raise ValueError(f"unexpected block magic {magic!r} at {pos}")
        pos = nxt
    # load-on-open: root data index, root meta index, file info
    index_roots: list[bytes] = []
    while pos < len(data) - TRAILER_SIZE:
        magic, payload, nxt = _decode_block_at(
            data, pos, codec, verify_checksums
        )
        if magic == FILE_INFO_MAGIC:
            fileinfo = _decode_fileinfo(payload)
        elif magic == ROOT_INDEX_MAGIC:
            index_roots.append(payload)
        pos = nxt
    meta: dict[str, bytes] = {}
    if len(index_roots) >= 2:  # data index root first, then meta root
        for off, _size, name in _decode_root_index(index_roots[1]):
            if off in meta_payload_at:
                meta[name.decode()] = meta_payload_at[off]
    with_mvcc = b"MAX_MEMSTORE_TS_KEY" in fileinfo
    out_cells: list[tuple[str, bytes]] = []
    for payload in cells:
        for row, value in _decode_cells(payload, with_mvcc):
            out_cells.append((row.decode(), value))
    return {
        "cells": out_cells,
        "fileinfo": fileinfo,
        "trailer": trailer,
        "meta": meta,
    }


def hfile_schema_json(path: str) -> str | None:
    """The Avro schema a Hudi metadata base slice embeds in its file
    info ("schema" entry), if present."""
    info = parse_hfile(path)["fileinfo"]
    raw = info.get(b"schema")
    if raw is None:
        return None
    return raw.decode()


def read_hudi_metadata_base(path: str) -> list[dict]:
    """Decode a Hudi metadata-table base slice from the filesystem —
    see ``read_hudi_metadata_base_bytes``."""
    return _decode_metadata_base(parse_hfile(path), path)


def read_hudi_metadata_base_bytes(data: bytes, name: str = "<bytes>") -> list[dict]:
    """Decode a Hudi metadata-table base slice from raw bytes (the
    seam-riding GET path of writer-internal index folds)."""
    return _decode_metadata_base(parse_hfile_bytes(data), name)


def _decode_metadata_base(parsed: dict, name: str) -> list[dict]:
    """Each cell's value is an Avro HoodieMetadataRecord under the
    file info's embedded schema, with the record key riding the CELL
    ROW (the value's own `key` field is empty — fixture behavior);
    returns records with `key` restored."""
    from onehouse_demos_spark.sources.avro_codec import AvroSchema, decode

    raw = parsed["fileinfo"].get(b"schema")
    if raw is None:
        raise ValueError(f"{name}: no embedded metadata record schema")
    sch = AvroSchema(json.loads(raw.decode()))
    out = []
    for row, value in parsed["cells"]:
        rec = decode(value, sch)
        rec["key"] = row
        out.append(rec)
    return out
