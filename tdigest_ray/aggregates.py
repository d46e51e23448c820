"""Ray Data ``AggregateFnV2`` adapters for the sketch library.

The reference's PostgreSQL aggregate protocol — SFUNC (per-row update),
COMBINEFUNC (merge partial states), SERIAL/DESERIAL, FINALFUNC, all
``PARALLEL SAFE`` (tdigest--1.0.0.sql:62-70) — maps 1:1 onto Ray Data's
``AggregateFnV2`` contract: ``aggregate_block`` folds a whole zero-copy Arrow
block into a partial sketch, ``combine`` merges partial sketches (shipped
pickled through the object store), ``finalize`` extracts the answer.

Ray's sort-based aggregate does map-side partial aggregation before the
shuffle (``SortAggregateTaskSpec.map``), so for ``groupby(key).aggregate``
only compact sketch states cross the wire — shuffle traffic is
O(#blocks x #groups x sketch_size), independent of row count. That is the
same partial->combine->finalize plan PostgreSQL runs for parallel aggregates
(test/sql/parallel_query.sql), generalized to a cluster.

Aggregates over raw values capture their parameters (compression, percentiles,
trim fractions) at construction, like the reference's aggregate arguments.
Weighted (<value,count>, README.md:168-189) and digest-column variants read a
second/sole column from the block; they disable Ray's column pruning by
reporting no single target column.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

from ray.data.aggregate import AggregateFnV2
from ray.data.block import Block, BlockAccessor

from tdigest_ray.functions import serde
from tdigest_ray.sketches.tdigest import (
    TDigest,
    check_compression,
    check_percentiles,
    check_trim_values,
)


import struct as _struct

# Internal accumulator layout: 4-byte big-endian (ncompactions, ncompacted
# flag) header + the reference wire format. The header preserves the
# compaction-direction alternation (tdigest.c:458-467) across the combine
# chain — the wire format itself has no room for it, and losing it makes
# every chain compaction scan the same direction (a measurable bias).
# Finalizers always strip the header and emit pure wire format.
_STATE_HDR = _struct.Struct(">HH")


def _pack_state(d: TDigest, compacted: bool) -> bytes:
    return _STATE_HDR.pack(d.ncompactions & 0xFFFF, int(compacted)) + \
        serde.to_bytes(d)


def _unpack_state(b: bytes) -> TDigest:
    ncomp, compacted = _STATE_HDR.unpack_from(b)
    d = serde.from_bytes(b[_STATE_HDR.size:])
    d.ncompactions = ncomp
    if not compacted:
        d.ncompacted = 0  # lazy state: sorted but not yet compacted
    return d


def _freeze_bytes(d: Optional[TDigest]) -> Optional[bytes]:
    """Compact + serialize an accumulator state.

    Accumulator states live in block columns between the map-side partial
    aggregation and the reduce; as plain ``bytes`` they take Arrow's native
    binary path (no per-block type-inference fallback) and stay ~16 B per
    centroid on the wire."""
    if d is None or d.count == 0:
        return None
    d.compress()
    return _pack_state(d, True)


def _combine_bytes(cur: bytes, new: bytes) -> bytes:
    """COMBINEFUNC over serialized states: re-insert the source's centroids
    into the target (first-seen compression wins, tdigest.c:1504-1513).

    Compaction is lazy along the combine chain: intermediate states are only
    kept sorted until they exceed half the buffer — fewer compaction rounds
    reduce merged-digest error at low compression and save CPU. Digest-
    valued finalizers compact before storing."""
    d = _unpack_state(cur)
    d.merge_digest(_unpack_state(new))
    if d.ncentroids > 5 * d.compression:
        d.compress()
        return _pack_state(d, True)
    d._sort()
    return _pack_state(d, False)


def _final_digest(blob: Optional[bytes]) -> Optional[TDigest]:
    """Accumulator state -> digest ready for finalization (compacts lazy
    states, mirroring the reference finalizers' tdigest_compact call)."""
    if blob is None:
        return None
    d = _unpack_state(blob)
    d.compress()
    return d


def _final_wire(blob: Optional[bytes]) -> Optional[bytes]:
    """Accumulator state -> pure wire format for storage."""
    d = _final_digest(blob)
    return None if d is None else serde.to_bytes(d)


def _column_values(block: Block, col: str) -> np.ndarray:
    """Extract a column from an Arrow/pandas block as float64 with nulls
    dropped (the reference skips NULL inputs in every transition fn,
    tdigest.c:994-1005)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(block, pa.Table):
        arr = block.column(col)
        if arr.null_count:
            arr = pc.drop_null(arr)
        return arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    # pandas fallback
    vals = BlockAccessor.for_block(block).to_pandas()[col].dropna().to_numpy()
    return vals.astype(np.float64, copy=False)


def _column_pairs(block: Block, value_col: str, count_col: str):
    """(value, count) pairs with rows dropped when value is null; a null
    count means 1 (tdigest.c:1210-1215)."""
    import pyarrow as pa

    if isinstance(block, pa.Table):
        values = block.column(value_col).to_numpy(zero_copy_only=False)
        counts = block.column(count_col).to_numpy(zero_copy_only=False)
    else:
        df = BlockAccessor.for_block(block).to_pandas()
        values = df[value_col].to_numpy()
        counts = df[count_col].to_numpy()
    values = np.asarray(values, dtype=np.float64)
    counts = np.asarray(counts, dtype=np.float64)  # float to hold NaN
    keep = ~np.isnan(values)
    values, counts = values[keep], counts[keep]
    counts = np.where(np.isnan(counts), 1.0, counts).astype(np.int64)
    return values, counts


class _TDigestAggBase(AggregateFnV2):
    """Shared accumulate/combine for t-digest aggregates over raw values."""

    def __init__(self, on: str, compression: int, name: str):
        self._compression = check_compression(compression)
        super().__init__(
            name,
            zero_factory=lambda: None,
            on=on,
            ignore_nulls=True,
        )

    def aggregate_block(self, block: Block) -> Optional[bytes]:
        values = _column_values(block, self._target_col_name)
        if len(values) == 0:
            return None
        d = TDigest(self._compression)
        d.add_many(values)
        return _freeze_bytes(d)

    def combine(self, current: bytes, new: bytes) -> bytes:
        return _combine_bytes(current, new)

    def finalize(self, accumulator: bytes) -> Any:
        raise NotImplementedError


class TDigestAgg(_TDigestAggBase):
    """``tdigest(value, compression)`` — materialize the digest itself as the
    binary wire format (row 5 of SURVEY.md §2.2; tdigest--1.0.0.sql:138-146)."""

    def __init__(self, on: str, compression: int = 100,
                 alias_name: Optional[str] = None):
        super().__init__(on, compression, alias_name or f"tdigest({on})")

    def finalize(self, accumulator: bytes) -> bytes:
        return _final_wire(accumulator)


class TDigestPercentile(_TDigestAggBase):
    """``tdigest_percentile(value, compression, q | q[])`` (rows 1-2)."""

    def __init__(self, on: str, q, compression: int = 100,
                 alias_name: Optional[str] = None):
        self._q = q
        self._scalar = np.isscalar(q)
        check_percentiles(q)
        super().__init__(on, compression,
                         alias_name or f"tdigest_percentile({on})")

    def finalize(self, accumulator: bytes):
        out = _final_digest(accumulator).quantile(self._q)
        return float(out) if self._scalar else list(out)


class TDigestPercentileOf(_TDigestAggBase):
    """``tdigest_percentile_of(value, compression, x | x[])`` (rows 3-4)."""

    def __init__(self, on: str, value, compression: int = 100,
                 alias_name: Optional[str] = None):
        self._value = value
        self._scalar = np.isscalar(value)
        super().__init__(on, compression,
                         alias_name or f"tdigest_percentile_of({on})")

    def finalize(self, accumulator: bytes):
        out = _final_digest(accumulator).cdf(self._value)
        return float(out) if self._scalar else list(out)


class TDigestTrimmedSum(_TDigestAggBase):
    """``tdigest_sum(value, compression, low, high)`` (row 14)."""

    def __init__(self, on: str, low: float, high: float, compression: int = 100,
                 alias_name: Optional[str] = None):
        check_trim_values(low, high)
        self._low, self._high = low, high
        super().__init__(on, compression, alias_name or f"tdigest_sum({on})")

    def finalize(self, accumulator: bytes):
        return _final_digest(accumulator).trimmed_sum(self._low, self._high)


class TDigestTrimmedAvg(_TDigestAggBase):
    """``tdigest_avg(value, compression, low, high)`` (row 14)."""

    def __init__(self, on: str, low: float, high: float, compression: int = 100,
                 alias_name: Optional[str] = None):
        check_trim_values(low, high)
        self._low, self._high = low, high
        super().__init__(on, compression, alias_name or f"tdigest_avg({on})")

    def finalize(self, accumulator: bytes):
        return _final_digest(accumulator).trimmed_avg(self._low, self._high)


# --------------------------------------------------------------------- #
# weighted <value,count> variants (rows 6-10; README.md:168-189)
# --------------------------------------------------------------------- #

class _TDigestWeightedBase(_TDigestAggBase):
    """Aggregates over (value, count) column pairs.

    Reports no target column so Ray keeps all columns for ``aggregate_block``
    (the map-side partial aggregation still collapses each block to one
    digest before the shuffle).
    """

    def __init__(self, on: str, count_on: str, compression: int, name: str):
        self._value_col = on
        self._count_col = count_on
        super().__init__(on, compression, name)

    def get_target_column(self) -> Optional[str]:
        return None  # keep both columns in the block

    def aggregate_block(self, block: Block) -> Optional[bytes]:
        values, counts = _column_pairs(block, self._value_col, self._count_col)
        if len(values) == 0:
            return None
        d = TDigest(self._compression)
        # per-value expansion with the same compaction boundaries as the
        # reference's one-at-a-time loop; huge counts take the
        # tdigest_generate fast path (tdigest.c:1230-1242)
        big = counts > 10 * self._compression
        if big.any():
            for v, c in zip(values[big], counts[big]):
                d.add(float(v), int(c))
            values, counts = values[~big], counts[~big]
        if len(values):
            d.add_weighted(values, counts)
        return _freeze_bytes(d)


class TDigestWeightedAgg(_TDigestWeightedBase):
    """``tdigest(value, count, compression)`` (row 6)."""

    def __init__(self, on: str, count_on: str, compression: int = 100,
                 alias_name: Optional[str] = None):
        super().__init__(on, count_on, compression,
                         alias_name or f"tdigest({on},{count_on})")

    def finalize(self, accumulator: bytes) -> bytes:
        return _final_wire(accumulator)


class TDigestWeightedPercentile(_TDigestWeightedBase):
    """``tdigest_percentile(value, count, compression, q | q[])`` (rows 7-8)."""

    def __init__(self, on: str, count_on: str, q, compression: int = 100,
                 alias_name: Optional[str] = None):
        self._q = q
        self._scalar = np.isscalar(q)
        check_percentiles(q)
        super().__init__(on, count_on, compression,
                         alias_name or f"tdigest_percentile({on},{count_on})")

    def finalize(self, accumulator: bytes):
        out = _final_digest(accumulator).quantile(self._q)
        return float(out) if self._scalar else list(out)


class TDigestWeightedPercentileOf(_TDigestWeightedBase):
    """``tdigest_percentile_of(value, count, compression, x | x[])``
    (rows 9-10)."""

    def __init__(self, on: str, count_on: str, value, compression: int = 100,
                 alias_name: Optional[str] = None):
        self._value = value
        self._scalar = np.isscalar(value)
        super().__init__(
            on, count_on, compression,
            alias_name or f"tdigest_percentile_of({on},{count_on})")

    def finalize(self, accumulator: bytes):
        out = _final_digest(accumulator).cdf(self._value)
        return float(out) if self._scalar else list(out)


class TDigestWeightedTrimmedSum(_TDigestWeightedBase):
    """``tdigest_sum(value, count, compression, low, high)`` (row 15)."""

    def __init__(self, on: str, count_on: str, low: float, high: float,
                 compression: int = 100, alias_name: Optional[str] = None):
        check_trim_values(low, high)
        self._low, self._high = low, high
        super().__init__(on, count_on, compression,
                         alias_name or f"tdigest_sum({on},{count_on})")

    def finalize(self, accumulator: bytes):
        return _final_digest(accumulator).trimmed_sum(self._low, self._high)


class TDigestWeightedTrimmedAvg(_TDigestWeightedBase):
    """``tdigest_avg(value, count, compression, low, high)`` (row 15)."""

    def __init__(self, on: str, count_on: str, low: float, high: float,
                 compression: int = 100, alias_name: Optional[str] = None):
        check_trim_values(low, high)
        self._low, self._high = low, high
        super().__init__(on, count_on, compression,
                         alias_name or f"tdigest_avg({on},{count_on})")

    def finalize(self, accumulator: bytes):
        return _final_digest(accumulator).trimmed_avg(self._low, self._high)


# --------------------------------------------------------------------- #
# aggregates over stored digests (rows 11-13, 16) — the rollup primitive
# --------------------------------------------------------------------- #

class _TDigestMergeBase(AggregateFnV2):
    """Aggregates whose input column holds binary digests (wire format).

    ``tdigest_add_digest`` semantics (tdigest.c:1437-1518): each stored
    digest's centroids are re-inserted into the state; the state keeps the
    first-seen compression, so digests with different compression values
    merge safely (combine_crash.sql regression).
    """

    def __init__(self, on: str, name: str):
        super().__init__(name, zero_factory=lambda: None, on=on,
                         ignore_nulls=True)

    def aggregate_block(self, block: Block) -> Optional[bytes]:
        import pyarrow as pa

        if isinstance(block, pa.Table):
            blobs = block.column(self._target_col_name).to_pylist()
        else:
            blobs = BlockAccessor.for_block(block).to_pandas()[
                self._target_col_name
            ].tolist()
        state: Optional[TDigest] = None
        for blob in blobs:
            if blob is None:
                continue
            d = serde.from_bytes(bytes(blob))
            if state is None:
                state = TDigest(d.compression)
            state.merge_digest(d)
        return _freeze_bytes(state)

    def combine(self, current: Optional[bytes], new: Optional[bytes]):
        if current is None:
            return new
        if new is None:
            return current
        return _combine_bytes(current, new)


class TDigestMergeAgg(_TDigestMergeBase):
    """``tdigest(tdigest)`` (row 11) — merge stored digests into one."""

    def __init__(self, on: str, alias_name: Optional[str] = None):
        super().__init__(on, alias_name or f"tdigest({on})")

    def finalize(self, accumulator: bytes):
        return _final_wire(accumulator)


class TDigestMergePercentile(_TDigestMergeBase):
    """``tdigest_percentile(tdigest, q | q[])`` (row 12)."""

    def __init__(self, on: str, q, alias_name: Optional[str] = None):
        self._q = q
        self._scalar = np.isscalar(q)
        check_percentiles(q)
        super().__init__(on, alias_name or f"tdigest_percentile({on})")

    def finalize(self, accumulator: bytes):
        if accumulator is None:
            return None
        out = _final_digest(accumulator).quantile(self._q)
        return float(out) if self._scalar else list(out)


class TDigestMergePercentileOf(_TDigestMergeBase):
    """``tdigest_percentile_of(tdigest, x | x[])`` (row 13)."""

    def __init__(self, on: str, value, alias_name: Optional[str] = None):
        self._value = value
        self._scalar = np.isscalar(value)
        super().__init__(on, alias_name or f"tdigest_percentile_of({on})")

    def finalize(self, accumulator: bytes):
        if accumulator is None:
            return None
        out = _final_digest(accumulator).cdf(self._value)
        return float(out) if self._scalar else list(out)


class TDigestMergeTrimmedSum(_TDigestMergeBase):
    """``tdigest_sum(tdigest, low, high)`` (row 16)."""

    def __init__(self, on: str, low: float, high: float,
                 alias_name: Optional[str] = None):
        check_trim_values(low, high)
        self._low, self._high = low, high
        super().__init__(on, alias_name or f"tdigest_sum({on})")

    def finalize(self, accumulator: bytes):
        if accumulator is None:
            return None
        return _final_digest(accumulator).trimmed_sum(self._low, self._high)


class TDigestMergeTrimmedAvg(_TDigestMergeBase):
    """``tdigest_avg(tdigest, low, high)`` (row 16)."""

    def __init__(self, on: str, low: float, high: float,
                 alias_name: Optional[str] = None):
        check_trim_values(low, high)
        self._low, self._high = low, high
        super().__init__(on, alias_name or f"tdigest_avg({on})")

    def finalize(self, accumulator: bytes):
        if accumulator is None:
            return None
        return _final_digest(accumulator).trimmed_avg(self._low, self._high)


# --------------------------------------------------------------------- #
# sibling sketches (north_rule): HLL / count-min / KLL / Bloom — the same
# partial -> combine -> finalize protocol with trivially associative merges
# --------------------------------------------------------------------- #

from tdigest_ray.sketches.base import SketchAgg  # noqa: E402
from tdigest_ray.sketches.bloom import BloomFilter  # noqa: E402
from tdigest_ray.sketches.countmin import CountMin  # noqa: E402
from tdigest_ray.sketches.hll import HLL  # noqa: E402
from tdigest_ray.sketches.kll import KLL  # noqa: E402


class HLLAgg(SketchAgg):
    """Merged HyperLogLog sketch (serialized) of a column."""

    def __init__(self, on: str, p: int = 14, alias_name: Optional[str] = None):
        super().__init__(on, lambda: HLL(p), alias_name or f"hll({on})")


class HLLCountAgg(SketchAgg):
    """Approximate COUNT(DISTINCT col); std error ~ 1.04/sqrt(2^p)."""

    def __init__(self, on: str, p: int = 14, alias_name: Optional[str] = None):
        super().__init__(
            on,
            lambda: HLL(p),
            alias_name or f"approx_distinct({on})",
            finalizer=lambda s: int(round(s.estimate())),
        )


class KLLAgg(SketchAgg):
    """Merged KLL sketch (serialized) of a numeric column."""

    def __init__(self, on: str, k: int = 200, alias_name: Optional[str] = None):
        super().__init__(on, lambda: KLL(k), alias_name or f"kll({on})")


class KLLQuantileAgg(SketchAgg):
    """Approximate quantile(s) via KLL (rank error ~ O(1/k))."""

    def __init__(self, on: str, q, k: int = 200,
                 alias_name: Optional[str] = None):
        scalar = np.isscalar(q)

        def _fin(s: KLL):
            out = s.quantile(q)
            return float(out) if scalar else list(out)

        super().__init__(on, lambda: KLL(k),
                         alias_name or f"kll_quantile({on})", finalizer=_fin)


class BloomAgg(SketchAgg):
    """Merged Bloom filter (serialized) over a key column."""

    def __init__(self, on: str, nbits: int = 1 << 20, k: int = 7,
                 alias_name: Optional[str] = None):
        super().__init__(on, lambda: BloomFilter(nbits, k),
                         alias_name or f"bloom({on})")


class CountMinAgg(SketchAgg):
    """Merged count-min sketch (serialized) over a key column."""

    def __init__(self, on: str, depth: int = 4, width: int = 2048,
                 alias_name: Optional[str] = None):
        super().__init__(on, lambda: CountMin(depth, width),
                         alias_name or f"countmin({on})")


class BottomKSampleAgg(SketchAgg):
    """Deterministic uniform sample of k distinct values (bottom-k hashing;
    merge-order independent, retry-safe). Finalize returns the sampled
    values as a list."""

    def __init__(self, on: str, k: int = 256, alias_name: Optional[str] = None):
        from tdigest_ray.sketches.sampling import BottomKSample

        super().__init__(on, lambda: BottomKSample(k),
                         alias_name or f"sample({on})",
                         finalizer=lambda s: s.sample())


class HeavyHittersAgg(AggregateFnV2):
    """Approximate top-k frequent values (heavy hitters).

    Count-min sketch for frequencies + a bounded per-block candidate set
    (every block's local top ``candidates`` keys). Merge adds tables and
    unions candidates; finalize queries the merged sketch for every
    candidate and returns the top-k ``[(value, est_count), ...]``.

    Guarantee: any value with true frequency > N/candidates in some block
    is in that block's candidate set, and CM estimates are overestimates
    within eps*N — so true global heavy hitters cannot be missed by the
    sketch, only over-reported.
    """

    def __init__(self, on: str, k: int = 10, depth: int = 5,
                 width: int = 8192, candidates: int = 128,
                 alias_name: Optional[str] = None):
        from tdigest_ray.sketches.countmin import CountMin

        self._k = k
        self._depth = depth
        self._width = width
        self._ncand = candidates
        self._cm_cls = CountMin
        super().__init__(alias_name or f"heavy_hitters({on})",
                         zero_factory=lambda: None, on=on, ignore_nulls=True)

    def aggregate_block(self, block: Block):
        import pickle

        from tdigest_ray.sketches.base import column_array

        values = column_array(block, self._target_col_name)
        if len(values) == 0:
            return None
        cm = self._cm_cls(self._depth, self._width)
        cm.update(values)
        uniq, counts = np.unique(values, return_counts=True)
        top = uniq[np.argsort(-counts)[: self._ncand]]
        return pickle.dumps((cm.to_bytes(), list(top)))

    def combine(self, current, new):
        import pickle

        cm_b, cand = pickle.loads(current)
        cm2_b, cand2 = pickle.loads(new)
        cm = self._cm_cls.from_bytes(cm_b)
        cm.merge(self._cm_cls.from_bytes(cm2_b))
        merged = list(dict.fromkeys(list(cand) + list(cand2)))
        cap = 16 * self._ncand
        if len(merged) > cap:
            # rank survivors by the MERGED sketch's estimate (not insertion
            # order): a true heavy hitter surfaced by a late block keeps its
            # global count and therefore survives the cap
            arr = np.asarray(merged, dtype=object)
            est = cm.query(arr)
            keep = np.lexsort((arr.astype(str), -est))[:cap]
            merged = [merged[i] for i in np.sort(keep)]
        return pickle.dumps((cm.to_bytes(), merged))

    def finalize(self, accumulator):
        import pickle

        if accumulator is None:
            return None
        cm_b, cand = pickle.loads(accumulator)
        cm = self._cm_cls.from_bytes(cm_b)
        arr = np.asarray(cand, dtype=object)
        est = cm.query(arr)
        order = np.lexsort((arr.astype(str), -est))[: self._k]
        return [[str(arr[i]), int(est[i])] for i in order]


class TDigestCountAgg(_TDigestMergeBase):
    """Total item count across merged digests — exact by construction
    (sum of centroid counts is preserved through every merge), which makes
    it a strong end-to-end invariant for the distributed merge machinery."""

    def __init__(self, on: str, alias_name: Optional[str] = None):
        super().__init__(on, alias_name or f"tdigest_count({on})")

    def finalize(self, accumulator: bytes):
        if accumulator is None:
            return None
        return _final_digest(accumulator).count
