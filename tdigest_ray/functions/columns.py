"""Column-level projections over digest columns — the cast analogs.

The reference exposes casts ``tdigest::json``, ``tdigest::float8[]``,
``tdigest::text`` and scalar readers (``tdigest_count``, quantile /
rank / trimmed moments of a stored digest). Here they are ``map_batches``
projections over a binary digest column (SURVEY.md §2.2 rows 17-22)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from tdigest_ray.functions import scalar, serde


def _digests(batch: pa.Table, col: str):
    for blob in batch.column(col).to_pylist():
        yield None if blob is None else serde.from_bytes(bytes(blob))


def cast_columns(batch: pa.Table, col: str, *,
                 json: bool = True, array: bool = True,
                 text: bool = False, count: bool = True) -> pa.Table:
    """Append json/float8[]/text/count projections of a digest column."""
    ds = list(_digests(batch, col))
    if json:
        batch = batch.append_column(
            f"{col}_json",
            pa.array([None if d is None else serde.to_json(d) for d in ds],
                     pa.string()))
    if array:
        batch = batch.append_column(
            f"{col}_array",
            pa.array([None if d is None else serde.to_array(d).tolist()
                      for d in ds], pa.list_(pa.float64())))
    if text:
        batch = batch.append_column(
            f"{col}_text",
            pa.array([None if d is None else serde.to_text(d) for d in ds],
                     pa.string()))
    if count:
        batch = batch.append_column(
            f"{col}_count",
            pa.array([None if d is None else d.count for d in ds],
                     pa.int64()))
    return batch


def quantile_columns(batch: pa.Table, col: str, percentiles,
                     prefix: str | None = None) -> pa.Table:
    """Append one float64 column per requested percentile of a digest
    column (``tdigest_percentile(digest, q)`` as a projection)."""
    ps = list(percentiles)
    prefix = prefix or col
    ds = list(_digests(batch, col))
    qs = np.full((len(ds), len(ps)), np.nan)
    for i, d in enumerate(ds):
        if d is not None and d.count:
            qs[i] = d.quantile(ps)
    for j, p in enumerate(ps):
        batch = batch.append_column(
            f"{prefix}_p{str(p).replace('.', '')}", pa.array(qs[:, j]))
    return batch


def rank_columns(batch: pa.Table, col: str, values,
                 prefix: str | None = None) -> pa.Table:
    """Append one float64 rank column per probe value
    (``tdigest_percentile_of(digest, x)`` as a projection)."""
    vs = list(values)
    prefix = prefix or col
    ds = list(_digests(batch, col))
    rs = np.full((len(ds), len(vs)), np.nan)
    for i, d in enumerate(ds):
        if d is not None and d.count:
            rs[i] = d.cdf(vs)
    for j, v in enumerate(vs):
        batch = batch.append_column(
            f"{prefix}_rank_{str(v).replace('.', '_')}", pa.array(rs[:, j]))
    return batch


def trimmed_columns(batch: pa.Table, col: str, low: float, high: float,
                    prefix: str | None = None) -> pa.Table:
    """Append trimmed sum/avg projections (``tdigest_digest_sum/avg``)."""
    prefix = prefix or col
    sums, avgs = [], []
    for d in _digests(batch, col):
        sums.append(scalar.tdigest_digest_sum(d, low, high))
        avgs.append(scalar.tdigest_digest_avg(d, low, high))
    batch = batch.append_column(f"{prefix}_trimmed_sum",
                                pa.array(sums, pa.float64()))
    batch = batch.append_column(f"{prefix}_trimmed_avg",
                                pa.array(avgs, pa.float64()))
    return batch
