"""Hadoop/Hudi bloom filter (pure Python) — the DYNAMIC_V0 format
real Hudi readers consume (`org.apache.hudi.common.bloom.
HoodieDynamicBoundedBloomFilter` wrapping Hadoop's
`DynamicBloomFilter` with `MurmurHash` (Murmur2 32-bit)).

Anchored on the reference's COMMITTED bloom: the `bloomFilter` meta
block of `hudi_dimCustomer/.hoodie/metadata/files/
files-0000-0_0-73-165_00000000000000010.hfile` deserializes with
this module and `membership_test("__all_partitions__")` hits all 30
probe positions of the real 2.6M-bit vector (tests/test_hfile.py) —
proving hash-chain, sign handling (Java's truncated `%` on negative
hashes) and bit order are Hudi's own.

Wire format (Hadoop `Filter`/`DynamicBloomFilter.write`):

    i32 VERSION (-1)   i32 nbHash   u8 hashType (1=MURMUR)
    i32 vectorSize
    i32 nr (keys per row)   i32 currentNbRecord   i32 matrix length
    per matrix row: the same 13-byte Filter header + bit vector,
    bit i -> byte[i/8] mask 1<<(i%8)

Scale note: this module serves METADATA-SCALE key sets (the HFile
base slice's bloom covers one cell per partition). Per-DATA-FILE
blooms on the write path stay on the engine's vectorized KeyBloom
(tables/bloom.py) — 30 chained scalar murmur rounds per key would be
the wrong cost model at 500k keys/file, and the bloom_filters
metadata partition labels those bytes with an honest custom type
code so real readers skip rather than misparse them.
"""

from __future__ import annotations

import base64
import math
import struct

_M32 = 0xFFFFFFFF
HASH_MURMUR = 1
VERSION = -1
#: Hudi DYNAMIC_V0 defaults (HoodieIndexConfig): 60k entries per
#: internal row, 1e-9 target false-positive rate
DEFAULT_ENTRIES = 60000
DEFAULT_ERROR_RATE = 1e-9


def _s32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def _sbyte(b: int) -> int:
    return b - 256 if b >= 128 else b


def murmur2_32(data: bytes, seed: int) -> int:
    """Hadoop `MurmurHash.hash(byte[], int, int)` — Murmur2 32-bit
    with Java's SIGNED byte loads (the top byte of each 4-byte group
    and every tail byte sign-extend, a detail that changes the
    result; pinned against the fixture bloom)."""
    m, r = 0x5BD1E995, 24
    h = _s32(seed ^ len(data))
    n4 = len(data) >> 2
    for i in range(n4):
        i4 = i << 2
        k = _sbyte(data[i4 + 3])
        k = _s32((k << 8) | data[i4 + 2])
        k = _s32((k << 8) | data[i4 + 1])
        k = _s32((k << 8) | data[i4])
        k = _s32(k * m)
        k = _s32(k ^ ((k & _M32) >> r))
        k = _s32(k * m)
        h = _s32(h * m)
        h = _s32(h ^ k)
    left = len(data) - (n4 << 2)
    if left:
        if left >= 3:
            h = _s32(h ^ _s32(_sbyte(data[-3]) << 16))
        if left >= 2:
            h = _s32(h ^ _s32(_sbyte(data[-2]) << 8))
        if left >= 1:
            h = _s32(h ^ _sbyte(data[-1]))
        h = _s32(h * m)
    h = _s32(h ^ ((h & _M32) >> 13))
    h = _s32(h * m)
    h = _s32(h ^ ((h & _M32) >> 15))
    return h


def _positions(key: bytes, nb_hash: int, vector_size: int) -> list[int]:
    """Hadoop `HashFunction.hash(Key)`: chained murmur (each round
    seeds with the previous hash), position = Math.abs(java `%`) —
    Java's `%` truncates toward zero, so a negative hash needs the
    truncated remainder, NOT Python's floored one."""
    out = []
    iv = 0
    for _ in range(nb_hash):
        iv = murmur2_32(key, iv)
        rem = iv - int(iv / vector_size) * vector_size
        out.append(abs(rem))
    return out


def bit_size(entries: int, error_rate: float) -> int:
    """Hudi BloomFilterUtils.getBitSize."""
    return int(
        math.ceil(entries * (-math.log(error_rate) / math.log(2) ** 2))
    )


def num_hashes(bits: int, entries: int) -> int:
    """Hudi BloomFilterUtils.getNumHashes."""
    return int(math.ceil(math.log(2) * bits / entries))


class _Row:
    __slots__ = ("bits",)

    def __init__(self, vector_size: int, bits: bytearray | None = None):
        self.bits = (
            bits
            if bits is not None
            else bytearray(-(-vector_size // 8))
        )

    def get(self, i: int) -> bool:
        return bool((self.bits[i >> 3] >> (i & 7)) & 1)

    def set(self, i: int) -> None:
        self.bits[i >> 3] |= 1 << (i & 7)


class HadoopDynamicBloom:
    """Hadoop DynamicBloomFilter semantics: rows of `nr` keys each; a
    full row starts a new one (Hudi's bounded variant keeps growing
    the LAST row past `nr` once the row count would exceed the bound
    — irrelevant at metadata scale, mirrored for fidelity)."""

    def __init__(
        self,
        vector_size: int,
        nb_hash: int,
        nr: int,
        rows: list[_Row],
        current_nb_record: int = 0,
        max_rows: int = 0,
    ):
        self.vector_size = vector_size
        self.nb_hash = nb_hash
        self.nr = nr
        self.rows = rows
        self.current_nb_record = current_nb_record
        self.max_rows = max_rows

    @classmethod
    def build(
        cls,
        keys: list[str],
        entries: int = DEFAULT_ENTRIES,
        error_rate: float = DEFAULT_ERROR_RATE,
        max_entries: int = 0,
    ) -> "HadoopDynamicBloom":
        bits = bit_size(entries, error_rate)
        bloom = cls(
            vector_size=bits,
            nb_hash=num_hashes(bits, entries),
            nr=entries,
            rows=[_Row(bits)],
            max_rows=max(1, -(-max_entries // entries)) if max_entries else 0,
        )
        for k in sorted(keys):
            bloom.add(k)
        return bloom

    def add(self, key: str) -> None:
        if self.current_nb_record >= self.nr and (
            not self.max_rows or len(self.rows) < self.max_rows
        ):
            self.rows.append(_Row(self.vector_size))
            self.current_nb_record = 0
        row = self.rows[-1]
        for i in _positions(key.encode(), self.nb_hash, self.vector_size):
            row.set(i)
        self.current_nb_record += 1

    def membership_test(self, key: str) -> bool:
        pos = _positions(key.encode(), self.nb_hash, self.vector_size)
        return any(
            all(row.get(i) for i in pos) for row in self.rows
        )

    # -- wire ---------------------------------------------------------

    def serialize(self) -> bytes:
        head = struct.pack(
            ">iiBi", VERSION, self.nb_hash, HASH_MURMUR, self.vector_size
        )
        out = bytearray(head)
        out += struct.pack(
            ">iii", self.nr, self.current_nb_record, len(self.rows)
        )
        nbytes = -(-self.vector_size // 8)
        for row in self.rows:
            out += head
            out += bytes(row.bits[:nbytes])
        return bytes(out)

    def to_base64(self) -> bytes:
        """Hudi stores the serialized bloom BASE64-encoded (both in
        the HFile meta block and in parquet footers)."""
        return base64.b64encode(self.serialize())

    @classmethod
    def deserialize(cls, blob: bytes) -> "HadoopDynamicBloom":
        ver, nb_hash, htype, vector_size = struct.unpack(
            ">iiBi", blob[:13]
        )
        if ver != VERSION or htype != HASH_MURMUR:
            raise ValueError(
                f"unsupported bloom header version={ver} hash={htype}"
            )
        nr, cur, nrows = struct.unpack(">iii", blob[13:25])
        p = 25
        nbytes = -(-vector_size // 8)
        rows = []
        for _ in range(nrows):
            rv, rnb, rh, rvs = struct.unpack(">iiBi", blob[p : p + 13])
            if (rv, rh) != (VERSION, HASH_MURMUR) or rnb != nb_hash:
                raise ValueError("bloom matrix row header mismatch")
            p += 13
            rows.append(_Row(rvs, bytearray(blob[p : p + nbytes])))
            p += nbytes
        return cls(vector_size, nb_hash, nr, rows, cur)

    @classmethod
    def from_base64(cls, text: bytes | str) -> "HadoopDynamicBloom":
        if isinstance(text, str):
            text = text.encode("ascii")
        return cls.deserialize(base64.b64decode(text))
