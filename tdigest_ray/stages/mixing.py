"""Dataset mixing: reweight corpus sources by down- and up-sampling —
"web x0.6, books x2.3" — the step that turns curated sources into a
training mixture.

Deterministic by construction: each row's fate is a pure function of
(id, seed, its group's weight) through the same Lehmer-LCG bucket hash
as the split stage, so mixtures are reproducible across reruns and
cluster layouts and auditable in SQL. Row-local, zero shuffle, zero
state: weights ride into the closure (a handful of floats — no
broadcast needed).

Weights: ``w < 1`` keeps each row with probability w; ``w >= 1`` emits
``floor(w)`` copies of every row and one extra copy with probability
``w - floor(w)`` (the standard fractional-epoch upsampling). Copies
carry a ``copy_id`` column (0-based) so downstream packing/shuffling
can distinguish them.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from tdigest_ray.stages.splits import N_BUCKETS, lehmer_buckets


def mix_sources(ds, weights: dict, group_col: str = "source",
                id_col: str = "doc_id", seed: int = 0,
                copy_col: str = "copy_id"):
    """Resample a corpus to the given per-group weights.

    ``weights``: {group value: multiplier}; groups absent from the dict
    are dropped (explicit is better than silently keeping them at x1).
    Returns the mixed Dataset with ``copy_col`` appended.
    """
    for g, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {g!r}")
    wmap = {g: float(w) for g, w in weights.items()}

    def mix(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(copy_col,
                                       pa.array([], pa.int64()))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        gcol = batch.column(group_col)
        if isinstance(gcol, pa.ChunkedArray):
            gcol = gcol.combine_chunks()
        denc = gcol.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False)
        w_of_code = np.array(
            [wmap.get(v, 0.0) for v in denc.dictionary.to_pylist()],
            np.float64)
        w = w_of_code[codes]
        base = np.floor(w).astype(np.int64)
        # fractional part decided by the id's bucket: bucket < frac*N
        # keeps — identical arithmetic to the SQL oracle
        frac_keep = (lehmer_buckets(ids, seed=seed)
                     < np.round((w - base) * N_BUCKETS).astype(np.int64))
        copies = base + frac_keep
        sel = np.repeat(np.arange(n, dtype=np.int64), copies)
        out = batch.take(pa.array(sel, pa.int64()))
        # 0-based copy index within each emitted row's copies
        offs = np.cumsum(copies) - copies
        copy_id = np.arange(len(sel), dtype=np.int64) - offs[sel]
        return out.append_column(copy_col, pa.array(copy_id, pa.int64()))

    return ds.map_batches(mix, batch_format="pyarrow")
