"""Deterministic, vectorized 64-bit hashing shared by the sibling sketches.

All sketches must produce identical results across processes and runs (no
``PYTHONHASHSEED`` dependence), so row hashing uses ``pandas.util.hash_array``
(SipHash with a fixed key for objects / strings, deterministic uint64
mixing for numerics) and derived hash functions use SplitMix64-style mixing
(Steele et al., "Fast Splittable Pseudorandom Number Generators", OOPSLA'14 —
public domain constants).

The buffer-level string hashes below are built from public algorithms:
the compatibility path re-implements SipHash-2-4 (Aumasson & Bernstein,
"SipHash: a fast short-input PRF", 2012 — public specification) plus
pandas' published finalizer mix; the hot path is a multilinear
(Carter-Wegman-family) block hash with SplitMix64-derived constants.
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


# ------------------------------------------------------------------ #
# zero-object string hashing over Arrow buffers
# ------------------------------------------------------------------ #
#
# ``hash_array`` on an object array is SipHash-2-4 of each string's UTF-8
# bytes (fixed key b"0123456789123456") followed by a 64-bit finalizer mix
# — but reaching it costs one Python str per row (``to_pylist``), the last
# per-row cost on the 100-TB dedup hot path (VERDICT r2 item 1). The
# functions below reproduce hash_array BIT-EXACTLY (pinned by a parity
# test) straight from the Arrow string column's (offsets, data) buffers:
# strings are sorted by length so each 8-byte SipHash block round runs as
# one numpy gather + a few uint64 kernels over the still-active prefix —
# no Python object ever materializes. Work is O(total_bytes/8) vector ops.

_SIP_KEY = b"0123456789123456"  # pandas' default hash_key
_SIP_K0 = _U64(int.from_bytes(_SIP_KEY[:8], "little"))
_SIP_K1 = _U64(int.from_bytes(_SIP_KEY[8:], "little"))
_MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def _rotl(x: np.ndarray, b: int) -> np.ndarray:
    return (x << _U64(b)) | (x >> _U64(64 - b))


def _pandas_finalize(x: np.ndarray) -> np.ndarray:
    """hash_array's post-SipHash 64-bit redistribution mix."""
    x = x.copy()
    x ^= x >> _U64(30)
    x *= _U64(0xBF58476D1CE4E5B9)
    x ^= x >> _U64(27)
    x *= _U64(0x94D049BB133111EB)
    x ^= x >> _U64(31)
    return x


def _sipround_inplace(v0, v1, v2, v3):
    """One SipHash round, mutating the four uint64 state arrays in place
    (fewest temporaries — these run ~2x per 8 input bytes)."""
    v0 += v1
    v1[:] = _rotl(v1, 13)
    v1 ^= v0
    v0[:] = _rotl(v0, 32)
    v2 += v3
    v3[:] = _rotl(v3, 16)
    v3 ^= v2
    v0 += v3
    v3[:] = _rotl(v3, 21)
    v3 ^= v0
    v2 += v1
    v1[:] = _rotl(v1, 17)
    v1 ^= v2
    v2[:] = _rotl(v2, 32)


def _aligned_blocks(data: np.ndarray, st: np.ndarray, ln: np.ndarray):
    """Copy ragged byte segments once into an 8-aligned zero-padded scratch
    so every 8-byte message block is an aligned uint64 load. Row i owns
    blocks ``bstart[i] : bstart[i] + nfull[i] + 1`` — the +1 is the
    zero-padded tail block (its padding zeros double as the SipHash tail
    encoding). Returns (blocks: uint64[], bstart, nfull)."""
    nfull = ln >> 3
    pad_blocks = nfull + 1
    bstart = np.concatenate([[0], np.cumsum(pad_blocks)])[:-1]
    scratch = np.zeros(int(pad_blocks.sum()) * 8, dtype=np.uint8)
    total = int(ln.sum())
    if total:
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(ln)])[:-1], ln)
        scratch[np.repeat(bstart * 8, ln) + intra] = \
            data[np.repeat(st, ln) + intra]
    return scratch.view(np.uint64), bstart, nfull


def _siphash24_segments(data: np.ndarray, starts: np.ndarray,
                        lens: np.ndarray) -> np.ndarray:
    """Vectorized SipHash-2-4 of ``data[starts[i]:starts[i]+lens[i]]`` per
    row.

    Two tricks keep the per-8-byte-block cost at ONE uint64 gather plus a
    handful of in-place kernels: (1) the 8-aligned scratch layout of
    :func:`_aligned_blocks`; (2) rows are processed longest-first, so
    block round j touches only the contiguous prefix of rows still having
    a j-th block. Still O(max_len/8) sequential rounds — SipHash chains
    block state, so this is the COMPATIBILITY path; the hot paths use
    :func:`fast_hash64_utf8`."""
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    order = np.argsort(-lens, kind="stable")
    st = starts[order].astype(np.int64)
    ln = lens[order].astype(np.int64)
    blocks, bstart, nfull = _aligned_blocks(data, st, ln)

    v0 = np.full(n, _U64(0x736F6D6570736575) ^ _SIP_K0, dtype=np.uint64)
    v1 = np.full(n, _U64(0x646F72616E646F6D) ^ _SIP_K1, dtype=np.uint64)
    v2 = np.full(n, _U64(0x6C7967656E657261) ^ _SIP_K0, dtype=np.uint64)
    v3 = np.full(n, _U64(0x7465646279746573) ^ _SIP_K1, dtype=np.uint64)

    with np.errstate(over="ignore"):
        max_blocks = int(nfull[0])
        for j in range(max_blocks):
            # rows with nfull > j form a prefix of the length-sorted order
            k = int(np.searchsorted(-nfull, -(j + 1), side="right"))
            m = blocks[bstart[:k] + j]
            a0, a1, a2, a3 = v0[:k], v1[:k], v2[:k], v3[:k]
            a3 ^= m
            _sipround_inplace(a0, a1, a2, a3)
            _sipround_inplace(a0, a1, a2, a3)
            a0 ^= m
        # tail block: the zero-padded remainder bytes + (len & 0xff) << 56
        b = blocks[bstart + nfull] | (
            (ln.astype(np.uint64) & _U64(0xFF)) << _U64(56))
        v3 ^= b
        _sipround_inplace(v0, v1, v2, v3)
        _sipround_inplace(v0, v1, v2, v3)
        v0 ^= b
        v2 ^= _U64(0xFF)
        for _ in range(4):
            _sipround_inplace(v0, v1, v2, v3)
        out_sorted = v0 ^ v1 ^ v2 ^ v3

    out = np.empty(n, dtype=np.uint64)
    out[order] = out_sorted
    return out


def _utf8_segments(arr):
    """(data: uint8[], starts, lens) of an Arrow string OR binary column's
    buffers — no Python objects. Nulls read as empty segments. Returns None
    when the input is not an Arrow array (caller falls back to ``hash64``)."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        return None
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"expected a string/binary column, got {arr.type}")
    n = len(arr)
    if n == 0:
        return (np.empty(0, dtype=np.uint8), np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype,
                            count=arr.offset + n + 1)[arr.offset:]
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:].astype(np.int64) - starts)
    if arr.null_count:
        nullmask = np.asarray(arr.is_null())
        lens = np.where(nullmask, 0, lens)
    return data, starts, lens


def hash64_utf8(arr) -> np.ndarray:
    """``hash_array``-parity uint64 hash of an Arrow string column, computed
    directly from its (offsets, data) buffers — zero Python-object
    materialization (bit-exact parity with ``hash64`` on object arrays is
    pinned by a test). Nulls hash as the empty string (``hash_array`` on
    ``None`` goes through ``hash()`` and is NOT process-stable, so the
    deterministic empty-string reading strictly dominates).

    Parity includes pandas' NUL quirk: ``hash_object_array`` reads strings
    as null-terminated C strings, so ``"a\\x00b"`` hashes like ``"a"`` —
    reproduced here by truncating each segment at its first NUL byte.
    (:func:`fast_hash64_utf8` deliberately does NOT reproduce this: texts
    differing after an embedded NUL are different documents.)

    SipHash chains per-block state, so cost grows with the LONGEST string
    in the batch; this is the compatibility/verification path — hot paths
    use :func:`fast_hash64_utf8` (same dedup semantics, fully parallel)."""
    seg = _utf8_segments(arr)
    if seg is None:
        return hash64(np.asarray(list(arr), dtype=object))
    data, starts, lens = seg
    zeros = np.flatnonzero(data == 0)
    if len(zeros):
        idx = np.searchsorted(zeros, starts)
        first_nul = zeros[np.minimum(idx, len(zeros) - 1)]
        in_range = (idx < len(zeros)) & (first_nul < starts + lens)
        lens = np.where(in_range, first_nul - starts, lens)
    return _pandas_finalize(_siphash24_segments(data, starts, lens))


def fast_hash64_utf8(arr) -> np.ndarray:
    """Deterministic uint64 content hash of an Arrow string column, built
    for the dedup hot path: equal texts always collide, distinct texts
    collide with probability ~2^-64, and the whole batch is hashed in
    ~15 flat numpy kernels regardless of string lengths.

    Construction (multilinear hashing, cf. Carter-Wegman / NH-style
    universal families): every 8-byte block — assembled from two ALIGNED
    uint64 loads of a tail-padded copy of the Arrow data buffer, so no
    per-byte work ever happens — is multiplied by a fixed odd 64-bit
    constant keyed to its position in the row, summed per row with one
    ``np.add.reduceat`` (mod 2^64), and finalized against the byte
    length. Odd multipliers are invertible mod 2^64, so two texts
    differing in exactly one block NEVER collide; multi-block
    differences collide with ~2^-63 probability. Unlike the SipHash
    paths there is NO sequential chain, so cost is O(total_bytes)
    data-parallel work — skewed length distributions (one 1 MB doc among
    tweets) cost the same as uniform ones. NOT ``hash_array``-compatible
    by design; the dedup-equivalence parity with :func:`hash64_utf8`
    (same equal-text classes) is pinned by a test. Nulls hash as the
    empty string. Also accepts Arrow binary columns (same buffer layout),
    e.g. for content-hashing digest blobs."""
    seg = _utf8_segments(arr)
    if seg is None:
        raise TypeError("fast_hash64_utf8 needs an Arrow string/binary column")
    data, starts, lens = seg
    n = len(starts)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    ln = lens.astype(np.int64)
    nfull = ln >> 3
    nb = nfull + 1  # +1: the (possibly empty) tail block
    bstart = np.concatenate([[0], np.cumsum(nb)])[:-1]

    # tail-padded contiguous copy: unaligned block at byte offset o reads
    # as (A[o>>3] >> 8(o&7)) | (A[(o>>3)+1] << (64-8(o&7)))
    data2 = np.zeros((len(data) // 8 + 3) * 8, dtype=np.uint8)
    data2[:len(data)] = data
    A = data2.view(np.uint64)

    # block index math: o = starts + 8*pos, and since 8*pos = 0 (mod 8),
    # t = o>>3 = (starts>>3) + pos and the shift s = starts&7 per row —
    # everything derives from ONE repeat of starts plus the pos ramp
    pos = np.arange(int(nb.sum()), dtype=np.int64) - np.repeat(bstart, nb)
    st_rep = np.repeat(starts.astype(np.int64), nb)
    t = (st_rep >> 3) + pos
    sh = ((st_rep & 7) << 3).astype(np.uint64)
    with np.errstate(over="ignore"):
        # ((x << (63-sh)) << 1) == x << (64-sh), valid at sh == 0 too
        m = (A[t] >> sh) | ((A[t + 1] << (_U64(63) - sh)) << _U64(1))
        # tail blocks: zero the garbage past the string's last rem bytes —
        # an n-sized scatter (tail block = last block of each row)
        tail_idx = bstart + nfull
        rem8 = ((ln & 7).astype(np.uint64)) << _U64(3)
        m[tail_idx] &= (_U64(1) << rem8) - _U64(1)
        # multilinear: block * odd-constant(position), summed per row
        mixed = m * _pos_multipliers(int(pos.max()) + 1)[pos]
        row_sum = np.add.reduceat(mixed, bstart)
        out = splitmix64(row_sum ^ (ln.astype(np.uint64) *
                                    _U64(0x9E3779B97F4A7C15)))
    return out


_PMIX_CACHE = np.empty(0, dtype=np.uint64)


def _pos_multipliers(size: int) -> np.ndarray:
    """Fixed odd 64-bit multipliers per block position (SplitMix64 stream,
    forced odd), grown on demand and cached."""
    global _PMIX_CACHE
    if len(_PMIX_CACHE) < size:
        grow = max(size, 2 * len(_PMIX_CACHE), 1024)
        _PMIX_CACHE = splitmix64(
            np.arange(grow, dtype=np.uint64)) | _U64(1)
    return _PMIX_CACHE


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
