"""Deterministic, vectorized 64-bit hashing shared by the sibling sketches.

All sketches must produce identical results across processes and runs (no
``PYTHONHASHSEED`` dependence), so row hashing uses ``pandas.util.hash_array``
(SipHash-1-3 with a fixed key for objects / strings, deterministic uint64
mixing for numerics) and derived hash functions use SplitMix64-style mixing
(Steele et al., "Fast Splittable Pseudorandom Number Generators", OOPSLA'14 —
public domain constants).
"""

from __future__ import annotations

import numpy as np
from pandas.util import hash_array

_U64 = np.uint64
MERSENNE61 = np.uint64((1 << 61) - 1)


def hash64(values) -> np.ndarray:
    """Deterministic uint64 hash of a 1-D array of any dtype."""
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in "US":
        arr = np.asarray(arr, dtype=object)
    return hash_array(arr)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — bijective uint64 mixing."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += _U64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        z = z ^ (z >> _U64(31))
    return z


def derive_hash(h: np.ndarray, seed: int) -> np.ndarray:
    """The seed-th derived hash function of pre-hashed values ``h``."""
    with np.errstate(over="ignore"):
        return splitmix64(h ^ splitmix64(np.uint64(seed + 1) * np.ones(1, np.uint64))[0])


def ctz_rank(w: np.ndarray, max_rank: int) -> np.ndarray:
    """Position of the least-significant 1-bit, 1-based, capped at
    ``max_rank`` (used as the HLL rho). Exact: isolates the lowest set bit
    (a power of two, exactly representable in float64) and takes log2."""
    w = w.astype(np.uint64, copy=False)
    with np.errstate(over="ignore", divide="ignore"):
        lsb = w & (~w + _U64(1))
        rho = np.where(
            w == 0,
            max_rank,
            np.log2(lsb.astype(np.float64) + (w == 0)).astype(np.int64) + 1,
        )
    return np.minimum(rho, max_rank).astype(np.uint8)
