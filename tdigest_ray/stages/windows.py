"""Temporal windowing for the events stream: tumbling + sliding windows as
batch transforms, composed with the sketch aggregates.

Windows are epoch-aligned (``floor(epoch/slide)*slide``), so window
identities are a pure function of the timestamp — no global state, no
watermark machinery: each batch emits its rows' (window_start, value)
assignments (a sliding window of width W and slide S emits W/S rows per
input row), and the normal grouped-digest shuffle does the rest. At scale
the fan-out factor W/S multiplies shuffle input rows, but the map-side
partial digests still collapse each block to #windows-per-block digest
rows before anything moves.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


_UNIT_DIVISOR = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _epoch_seconds(batch: pa.Table, ts_col: str,
                   unit: str = "s") -> np.ndarray:
    """Epoch seconds regardless of the timestamp column's unit (s/ms/us/ns).

    Timestamp columns carry their unit in the type. INTEGER columns are
    interpreted per the explicit ``unit`` parameter (default ``"s"`` —
    the reading that round-trips this module's own ``window_start``
    output). Pass ``unit="us"`` etc. for integer epochs in other units;
    the explicit parameter exists because r1 implicitly read integers as
    microseconds and r2 changed that silently (ADVICE r2) — callers with
    non-second integer epochs should say so."""
    ts = batch.column(ts_col)
    if pa.types.is_timestamp(ts.type):
        div = _UNIT_DIVISOR[ts.type.unit]
    elif pa.types.is_integer(ts.type):
        if unit not in _UNIT_DIVISOR:
            raise ValueError(
                f"unit must be one of {sorted(_UNIT_DIVISOR)}, got {unit!r}")
        div = _UNIT_DIVISOR[unit]
    else:
        raise TypeError(
            f"window timestamp column {ts_col!r} must be timestamp or "
            f"integer epoch (see unit=), got {ts.type}")
    raw = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
    return raw // div


def assign_tumbling(batch: pa.Table, ts_col: str, width_s: int,
                    out_col: str = "window_start",
                    unit: str = "s") -> pa.Table:
    """Append the epoch-aligned tumbling window start (int64 seconds).
    ``unit`` applies to integer timestamp columns only."""
    epoch = _epoch_seconds(batch, ts_col, unit)
    ws = (epoch // width_s) * width_s
    return batch.append_column(out_col, pa.array(ws, pa.int64()))


def assign_sliding(batch: pa.Table, ts_col: str, width_s: int, slide_s: int,
                   out_col: str = "window_start",
                   unit: str = "s") -> pa.Table:
    """Flat-emit each row into every sliding window covering it.

    ``width_s`` must be a multiple of ``slide_s``; each row lands in
    ``width_s // slide_s`` windows with epoch-aligned starts. ``unit``
    applies to integer timestamp columns only.
    """
    if width_s % slide_s:
        raise ValueError("width must be a multiple of slide")
    nwin = width_s // slide_s
    epoch = _epoch_seconds(batch, ts_col, unit)
    base = (epoch // slide_s) * slide_s
    n = len(epoch)
    ws = (
        np.repeat(base, nwin)
        - np.tile(np.arange(nwin, dtype=np.int64) * slide_s, n)
    )
    idx = np.repeat(np.arange(n, dtype=np.int64), nwin)
    out = batch.take(pa.array(idx))
    return out.append_column(out_col, pa.array(ws, pa.int64()))


def windowed_digests(ds, ts_col: str, value_col: str, width_s: int,
                     slide_s: int | None = None, compression: int = 100,
                     unit: str = "s"):
    """Digest of ``value_col`` per (sliding or tumbling) window —
    window assignment composed with the fast partial-digest shuffle.
    ``unit`` applies to integer timestamp columns only."""
    from tdigest_ray.stages.partial import grouped_digests_fast

    if slide_s is None or slide_s == width_s:
        fn = lambda b: assign_tumbling(b, ts_col, width_s, unit=unit)  # noqa: E731
    else:
        fn = lambda b: assign_sliding(b, ts_col, width_s, slide_s, unit=unit)  # noqa: E731
    assigned = ds.map_batches(fn, batch_format="pyarrow")
    return grouped_digests_fast(assigned, "window_start", [value_col],
                                compression)
