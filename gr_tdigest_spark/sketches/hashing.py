"""Deterministic vectorized 64-bit hashing shared by HLL/CMS/Bloom.

All sketch hash functions must be identical on every executor and every
run (merge correctness + reproducible estimates), so everything routes
through one seeded primitive:

- integers → splitmix64 (public-domain finalizer; Steele et al. 2014)
- strings/bytes/objects → ``pandas.util.hash_array`` (SipHash-based,
  fixed key, vectorized in cython) then splitmix64 finalization

Independent hash families h_i(x) (for CMS rows / Bloom double-hashing)
derive from two base hashes via the standard Kirsch–Mitzenmacher
``h1 + i·h2`` construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["hash64", "hash_pair", "splitmix64"]

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 input."""
    z = (x.astype(np.uint64) + _U64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
    with np.errstate(over="ignore"):
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def hash64(values, seed: int = 0) -> np.ndarray:
    """Deterministic uint64 hash of an array of any dtype."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        base = arr.astype(np.uint64)
    elif arr.dtype.kind == "f":
        # canonicalize -0.0 == 0.0, then reinterpret bits
        canon = np.where(arr == 0.0, 0.0, arr)
        base = canon.astype(np.float64).view(np.uint64)
    else:
        base = pd.util.hash_array(
            np.asarray(arr, dtype=object), encoding="utf8", categorize=False
        )
    return splitmix64(base, seed=seed + 1)


def hash_pair(values, seed: int = 0):
    """Two independent base hashes for h1 + i*h2 derivation."""
    h1 = hash64(values, seed=seed)
    h2 = splitmix64(h1, seed=seed + 0x51AB)
    # make h2 odd so strides cover the table
    return h1, h2 | np.uint64(1)


def dedupe_hash_pairs(h1: np.ndarray, h2: np.ndarray, codes=None):
    """Drop duplicate (codes, h1, h2) triples (or (h1, h2) pairs when
    ``codes`` is None) via one lexsort + adjacent-run mask.

    For sketches whose per-slot hashes derive from (h1, h2) alone and
    whose update is multiplicity-invariant (MinHash min), this is
    exactly result-preserving and cuts the O(k·n) slot expansion to
    O(k·n_distinct).  When ``codes`` is given it is the PRIMARY sort
    key, so the returned codes are ascending and group-bounds walks
    over them work unchanged.  Returns (h1, h2) or (codes, h1, h2).
    """
    keys = (h2, h1) if codes is None else (h2, h1, codes)
    order = np.lexsort(keys)
    h1, h2 = h1[order], h2[order]
    codes_s = None if codes is None else codes[order]
    if h1.size > 1:
        keep = np.empty(h1.size, dtype=bool)
        keep[0] = True
        keep[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        if codes_s is not None:
            keep[1:] |= codes_s[1:] != codes_s[:-1]
        h1, h2 = h1[keep], h2[keep]
        if codes_s is not None:
            codes_s = codes_s[keep]
    return (h1, h2) if codes is None else (codes_s, h1, h2)
