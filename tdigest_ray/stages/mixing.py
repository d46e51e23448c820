"""Dataset mixing: reweight corpus sources by down- and up-sampling —
"web x0.6, books x2.3" — the step that turns curated sources into a
training mixture.

Deterministic by construction: each row's fate is a pure function of
(id, seed, its group's weight) through a Lehmer-LCG bucket hash, so
mixtures are reproducible across reruns and cluster layouts and
auditable in SQL. Row-local, zero shuffle, zero state: weights ride
into the closure (a handful of floats — no broadcast needed).

Decorrelation from the split stage: mixing uses THREE Lehmer rounds
where ``splits.add_split`` uses two, so the two stages' bucket streams
are independent permutations of the id space. With a shared stream,
composing split (val = buckets 9800-9899) with a w=0.6 mix (keep
buckets < 6000) would delete EVERY val/test row of a downsampled
source; with distinct round counts the val survival rate is ~w, as it
should be. (Still plain integer arithmetic — one extra multiply in the
SQL oracle.)

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
        import pyarrow.compute as pc

        # null group = absent from the weight dict = dropped (code -1
        # maps to weight 0; raw null indices would crash the gather)
        codes = pc.fill_null(denc.indices, -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        w_of_code = np.array(
            [wmap.get(v, 0.0) for v in denc.dictionary.to_pylist()]
            + [0.0], np.float64)  # [-1] = the null sentinel
        w = w_of_code[codes]
        base = np.floor(w).astype(np.int64)
        # fractional part decided by the id's bucket: bucket < frac*N
        # keeps — identical arithmetic to the SQL oracle; rounds=3
        # decorrelates from the 2-round split stream (see module doc)
        frac_keep = (lehmer_buckets(ids, seed=seed, rounds=3)
                     < np.round((w - base) * N_BUCKETS).astype(np.int64))
        copies = base + frac_keep
        sel = np.repeat(np.arange(n, dtype=np.int64), copies)
        out = batch.take(pa.array(sel, pa.int64()))
        # 0-based copy index within each emitted row's copies
        offs = np.cumsum(copies) - copies
        copy_id = np.arange(len(sel), dtype=np.int64) - offs[sel]
        return out.append_column(copy_col, pa.array(copy_id, pa.int64()))

    return ds.map_batches(mix, batch_format="pyarrow")
