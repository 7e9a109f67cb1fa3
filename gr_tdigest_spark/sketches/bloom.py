"""Bloom filter kernel (membership over conv_id/key columns).

Companion sketch per BASELINE.json#north_rule. m bits / k hashes via
Kirsch–Mitzenmacher double hashing; FPR ≈ (1 − e^{−kn/m})^k, zero false
negatives. Mergeable monoid: merge = bitwise OR (same m, k, seed).

Wire: ``GSBF`` + version + m + k + seed + n_added + bit words.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from gr_tdigest_spark.sketches.hashing import hash_pair

__all__ = ["BloomFilter", "optimal_bloom"]

_MAGIC = b"GSBF"


def optimal_bloom(n_expected: int, fpr: float = 0.01, seed: int = 11) -> "BloomFilter":
    """Size a filter for ``n_expected`` keys at the target false-positive
    rate: m = −n·ln(p)/ln(2)², k = (m/n)·ln 2."""
    n = max(int(n_expected), 1)
    m = int(math.ceil(-n * math.log(fpr) / (math.log(2) ** 2)))
    m = max(64, 1 << (m - 1).bit_length())  # round up to power of two
    k = max(1, round(m / n * math.log(2)))
    return BloomFilter(m_bits=m, k=k, seed=seed)


@dataclass
class BloomFilter:
    m_bits: int = 1 << 20
    k: int = 7
    seed: int = 11
    words: np.ndarray = field(default=None)
    n_added: int = 0

    def __post_init__(self):
        if self.m_bits % 64 != 0:
            raise ValueError("m_bits must be a multiple of 64")
        if self.k < 1:
            raise ValueError("k must be >= 1")
        if self.words is None:
            self.words = np.zeros(self.m_bits // 64, dtype=np.uint64)

    def _bit_positions(self, values) -> np.ndarray:
        h1, h2 = hash_pair(np.asarray(values), seed=self.seed)
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + ks * h2[None, :]) % np.uint64(self.m_bits))

    def add(self, values) -> None:
        arr = np.asarray(values)
        if arr.size == 0:
            return
        pos = self._bit_positions(arr).ravel()
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        np.bitwise_or.at(self.words, word, bit)
        self.n_added += int(arr.size)

    def contains(self, values) -> np.ndarray:
        arr = np.asarray(values)
        if arr.size == 0:
            return np.empty(0, dtype=bool)
        pos = self._bit_positions(arr)
        word = (pos >> np.uint64(6)).astype(np.int64)
        bit = np.uint64(1) << (pos & np.uint64(63))
        hits = (self.words[word] & bit) != 0
        return np.all(hits, axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.k, self.seed) != (
            other.m_bits, other.k, other.seed,
        ):
            raise ValueError("Bloom merge: incompatible (m_bits, k, seed)")
        return BloomFilter(
            self.m_bits, self.k, self.seed,
            self.words | other.words, self.n_added + other.n_added,
        )

    @property
    def design_fpr(self) -> float:
        """(1 − e^{−kn/m})^k at the observed n_added."""
        if self.n_added == 0:
            return 0.0
        return (1.0 - math.exp(-self.k * self.n_added / self.m_bits)) ** self.k

    # ---------------- wire ----------------

    def to_bytes(self) -> bytes:
        head = _MAGIC + struct.pack(
            "<BQIqq", 1, self.m_bits, self.k, self.seed, self.n_added
        )
        return head + self.words.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        blob = bytes(blob)
        if blob[:4] != _MAGIC:
            raise ValueError("invalid GSBF magic")
        version, m_bits, k, seed, n_added = struct.unpack_from("<BQIqq", blob, 4)
        if version != 1:
            raise ValueError(f"unsupported GSBF version {version}")
        off = 4 + struct.calcsize("<BQIqq")
        words = np.frombuffer(blob, dtype="<u8", offset=off)
        if words.size != m_bits // 64:
            raise ValueError("GSBF payload length mismatch")
        return cls(int(m_bits), int(k), int(seed), words.copy(), int(n_added))

    def __reduce__(self):
        return (BloomFilter.from_bytes, (self.to_bytes(),))
