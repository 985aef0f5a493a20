"""Per-file record-key bloom filters for write-path probe pruning.

Min/max key ranges (already in the manifest) prune candidates only
when files hold DISJOINT key ranges — after enough random-key upserts
every file's [min, max] spans the whole key space and range pruning
degenerates to "all files". A bloom filter per file keeps point-lookup
pruning sharp regardless of layout: a file whose bloom matches none of
the incoming keys provably holds none of them (no false negatives),
so the upsert/delete probe skips it entirely.

Construction is fully vectorized (numpy): keys hash with FNV-1a 64
computed column-wise over a padded byte matrix (one numpy pass per
byte position, not one Python call per key), then double hashing
(Kirsch–Mitzenmacher: h1 + i*h2) spreads each key over k probe bits.
Building a 500k-key bloom takes ~100 ms; probing a batch of keys
against a file's bloom is a handful of numpy ops. FNV is processor-
and process-independent, so blooms built on executors verify anywhere.

Sized at ≥10 bits/key → ≤1% false positives; m_bits rounds UP to the
next power of two (the probe masks with `& (m_bits-1)` instead of a
modulo), so the realized rate is 10-20 bits/key. Serialized base64
into the commit metadata next to the key range. Bytes per file stay
metadata-scale (worst case 2^23 bits = 1 MiB at the 500k-row cap;
larger files skip the bloom and fall back to range pruning).
"""

from __future__ import annotations

import base64
import math

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _hash_pair(keys: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized FNV-1a 64 over all keys at once → (h1, h2) arrays.
    One numpy pass per byte position of the longest key."""
    bs = [str(k).encode("utf-8") for k in keys]
    n = len(bs)
    maxlen = max((len(b) for b in bs), default=1) or 1
    flat = b"".join(b.ljust(maxlen, b"\0") for b in bs)
    arr = np.frombuffer(flat, dtype=np.uint8).reshape(n, maxlen)
    lens = np.fromiter((len(b) for b in bs), dtype=np.int64, count=n)
    with np.errstate(over="ignore"):
        h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
        for j in range(maxlen):
            active = j < lens
            nh = (h ^ arr[:, j].astype(np.uint64)) * _FNV_PRIME
            h = np.where(active, nh, h)
        h1 = h
        # independent second hash: one more mixed multiply-xor round
        h2 = ((h ^ (h >> np.uint64(33))) * _MIX) | np.uint64(1)
    return h1, h2


class KeyBloom:
    __slots__ = ("m_bits", "k", "bits")

    def __init__(self, m_bits: int, k: int, bits: np.ndarray):
        self.m_bits = m_bits
        self.k = k
        self.bits = bits  # uint8 array of m_bits // 8

    # ------------------------------------------------------------ build

    @staticmethod
    def build(keys, bits_per_key: int = 10) -> "KeyBloom":
        keys = list(keys)
        n = max(1, len(keys))
        m_bits = 1 << max(6, (n * bits_per_key).bit_length())
        k = max(1, round(math.log(2) * m_bits / n))
        k = min(k, 16)
        bloom = KeyBloom(m_bits, k, np.zeros(m_bits // 8, dtype=np.uint8))
        if keys:
            bloom.add_all(keys)
        return bloom

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing."""
        i = np.arange(self.k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            pos = h1[:, None] + i[None, :] * h2[:, None]
        return pos & np.uint64(self.m_bits - 1)  # m_bits is a power of two

    def add_all(self, keys) -> None:
        pos = self._positions(*_hash_pair(list(keys))).ravel()
        np.bitwise_or.at(
            self.bits,
            (pos >> np.uint64(3)).astype(np.int64),
            (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)),
        )

    def add(self, key: str) -> None:
        self.add_all([key])

    # ------------------------------------------------------------ probe

    def contains_mask(self, keys) -> np.ndarray:
        """Boolean array: might the bloom contain each key?"""
        keys = list(keys)
        if not keys:
            return np.zeros(0, dtype=bool)
        pos = self._positions(*_hash_pair(keys))
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
        return ((byte & bit) != 0).all(axis=1)

    def might_contain(self, key: str) -> bool:
        return bool(self.contains_mask([key])[0])

    def might_contain_any(self, keys) -> bool:
        return bool(self.contains_mask(keys).any())

    # -------------------------------------------------------- serialize

    def to_b64(self) -> str:
        head = self.m_bits.to_bytes(4, "big") + bytes([self.k])
        return base64.b64encode(head + self.bits.tobytes()).decode("ascii")

    @staticmethod
    def from_b64(s: str) -> "KeyBloom":
        raw = base64.b64decode(s)
        m_bits = int.from_bytes(raw[:4], "big")
        k = raw[4]
        return KeyBloom(
            m_bits, k, np.frombuffer(raw[5:], dtype=np.uint8).copy()
        )
