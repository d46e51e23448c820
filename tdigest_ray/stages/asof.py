"""As-of (backward) join: match each left row to the LATEST right row
with the same key and timestamp <= the left row's — attribution ("which
campaign touch preceded this purchase"), feature freshness ("model
version live at event time"), log enrichment. Ray Data has no as-of
join; this is the composition the task calls for: co-partition by key
(tagged union -> one bounded-partition groupby), then a single
vectorized merge pass per partition.

The merge trick (no per-key Python): concatenate both sides' rows, tag
them, lexsort by (key, ts, side, order) with right-side rows sorting
BEFORE left rows on timestamp ties (inclusive <= semantics). A running
``maximum.accumulate`` of right-row positions then gives every left row
the latest preceding right row in one pass; a final key-equality check
nulls out carries across key boundaries (valid because runs are
key-contiguous after the sort).

Tie contract: among right rows sharing (key, ts), the latest in input
order wins (deterministic within a run; pre-deduplicate the right side
if row identity on ties matters — matched VALUES from tied rows with
equal payloads are always deterministic).

Scale: both sides shuffle ONCE as narrow projections (caller selects
columns; the join needs key co-location, which no broadcast can avoid
unless the right side is small — then use ``broadcast_join`` plus a
window instead). Partition count bounds Python callbacks at P.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from tdigest_ray.sketches.hashing import splitmix64
from tdigest_ray.stages.graph import auto_partitions


def _ts64(col) -> np.ndarray:
    arr = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[us]").view(np.int64)
    return arr.astype(np.int64)


def asof_join(left, right, key_col: str, ts_col: str,
              value_cols: list, suffix: str = "_r",
              num_partitions: int | None = None):
    """Left rows (all columns) + matched right ``value_cols`` (each
    renamed with ``suffix``) and ``ts_col + suffix`` as int64
    microseconds — null when the key has no right row at or before the
    left timestamp. Keys are int64; ``ts_col`` is integer or timestamp.
    """
    num_partitions = auto_partitions(num_partitions)
    left_cols = list(left.schema().names)
    overlap = [f"{c}{suffix}" for c in [*value_cols, ts_col]
               if f"{c}{suffix}" in left_cols]
    if overlap:
        raise ValueError(f"output columns {overlap} collide with left "
                         f"columns; pick a different suffix")
    reserved = {"_side", "_part", "_ts64"} & set(left_cols)
    if reserved:
        raise ValueError(f"left columns {sorted(reserved)} collide with "
                         "asof_join's internal tag columns; rename them")
    if ts_col in value_cols:
        raise ValueError(
            f"value_cols must not contain ts_col ({ts_col!r}): the "
            f"matched timestamp is always emitted as '{ts_col}{suffix}' "
            "(int64 microseconds) and would silently overwrite the "
            "typed right column")
    lsch, rsch = left.schema(), right.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                part = (splitmix64(keys.astype(np.uint64))
                        % np.uint64(num_partitions)).astype(np.int64)
            # ONE unified schema for both sides (union requires it):
            # the other side's columns are all-null placeholders
            cols = {
                "_side": pa.array(np.full(n, side, np.int8)),
                "_part": pa.array(part, pa.int64()),
                key_col: batch.column(key_col),
                "_ts64": pa.array(_ts64(batch.column(ts_col)), pa.int64()),
            }
            for c in left_cols:
                if c == key_col:
                    continue
                cols[f"_l_{c}"] = (batch.column(c) if side == 0
                                   else pa.nulls(n, ltypes[c]))
            for c in value_cols:
                cols[f"_r_{c}"] = (batch.column(c) if side == 1
                                   else pa.nulls(n, rtypes[c]))
            return pa.table(cols)
        return f

    l_tag = left.map_batches(tag(0), batch_format="pyarrow")
    r_tag = right.map_batches(tag(1), batch_format="pyarrow")

    out_ts_col = f"{ts_col}{suffix}"

    def merge(group: pa.Table) -> pa.Table:
        keys = group.column(key_col).to_numpy(zero_copy_only=False)
        ts = group.column("_ts64").to_numpy(zero_copy_only=False)
        side = group.column("_side").to_numpy(zero_copy_only=False)
        n = len(keys)
        # right rows before left rows on (key, ts) ties -> inclusive <=;
        # among tied right rows the last in input order wins
        order = np.lexsort((np.arange(n), side == 0, ts, keys))
        k_s, side_s = keys[order], side[order]
        is_r = side_s == 1
        rlast = np.maximum.accumulate(np.where(is_r, np.arange(n), -1))
        lmask = ~is_r
        l_sorted_idx = order[lmask]           # left rows, original index
        match_sorted = rlast[lmask]           # position in sorted stream
        valid = match_sorted >= 0
        # a carried match from the previous key run has a different key
        safe = np.clip(match_sorted, 0, max(n - 1, 0))
        valid &= k_s[safe] == k_s[lmask]
        match_orig = order[safe]
        lsel = pa.array(l_sorted_idx, pa.int64())
        out = {}
        for c in left_cols:
            src = c if c == key_col else f"_l_{c}"
            out[c] = group.column(src).take(lsel)
        # null take-indices produce null output values — the clean way
        # to leave unmatched rows null
        gather = pa.array(match_orig, pa.int64(), mask=~valid)
        for c in value_cols:
            out[f"{c}{suffix}"] = group.column(f"_r_{c}").take(gather)
        out[out_ts_col] = pa.array(ts[match_orig], pa.int64(),
                                   mask=~valid)
        return pa.table(out)

    return (l_tag.union(r_tag)
            .groupby("_part")
            .map_groups(merge, batch_format="pyarrow"))
