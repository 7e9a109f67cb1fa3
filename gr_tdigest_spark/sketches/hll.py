"""HyperLogLog kernel (dense, 2^p byte registers).

Companion sketch required by BASELINE.json#north_rule ("distinct conv_id
counts"). Standard Flajolet–Fusy–Gandouet–Meunier HLL with the 64-bit
variant's corrections: relative standard error 1.04/√m.

Mergeable monoid: merge = elementwise register max (same p required).
Wire: ``GSHL`` + version + p + registers.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from gr_tdigest_spark.sketches.hashing import hash64

__all__ = ["HLL"]

_MAGIC = b"GSHL"


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@dataclass
class HLL:
    p: int = 14  # 2^14 registers → ±0.81% typical error
    registers: np.ndarray = field(default=None)

    def __post_init__(self):
        if not (4 <= self.p <= 18):
            raise ValueError("HLL precision p must be in [4, 18]")
        if self.registers is None:
            self.registers = np.zeros(1 << self.p, dtype=np.uint8)

    @property
    def m(self) -> int:
        return 1 << self.p

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        # remaining bits after the register index; force low p bits to 1 so
        # the value is never 0 (max observable rank = 64 - p + 1)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # vectorized count-leading-zeros: split into 32-bit halves (uint32
        # fits exactly in f64, so floor(log2) is exact there)
        hi = (rest >> np.uint64(32)).astype(np.uint32)
        lo = (rest & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        clz_hi = 31 - np.floor(
            np.log2(np.maximum(hi, 1).astype(np.float64))
        ).astype(np.int64)
        clz_lo = 31 - np.floor(
            np.log2(np.maximum(lo, 1).astype(np.float64))
        ).astype(np.int64)
        clz = np.where(hi != 0, clz_hi, 32 + clz_lo)
        rank = (clz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add(self, values) -> None:
        arr = np.asarray(values)
        if arr.size == 0:
            return
        self.add_hashes(hash64(arr))

    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError(
                f"HLL merge: precision mismatch (p={self.p} vs p={other.p})"
            )
        out = HLL(self.p, np.maximum(self.registers, other.registers))
        return out

    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        e = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if e <= 2.5 * m:
            v = int(np.count_nonzero(self.registers == 0))
            if v > 0:
                return m * math.log(m / v)  # linear counting
        return float(e)

    @property
    def std_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    # ---------------- wire ----------------

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<BB", 1, self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HLL":
        blob = bytes(blob)
        if blob[:4] != _MAGIC:
            raise ValueError("invalid GSHL magic")
        version, p = struct.unpack_from("<BB", blob, 4)
        if version != 1:
            raise ValueError(f"unsupported GSHL version {version}")
        regs = np.frombuffer(blob, dtype=np.uint8, offset=6)
        if regs.size != (1 << p):
            raise ValueError("GSHL register payload length mismatch")
        return cls(p, regs.copy())

    def __reduce__(self):
        return (HLL.from_bytes, (self.to_bytes(),))
