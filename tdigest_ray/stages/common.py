"""Small shared Arrow helpers for the stage modules."""

from __future__ import annotations

import pyarrow as pa

__all__ = ["as_single_array"]


def as_single_array(col) -> pa.Array:
    """Return ``col`` as one contiguous Array (ChunkedArray columns out
    of ``pa.Table`` are combined; plain Arrays pass through)."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col
