"""The flagship pipeline: Common-Crawl-style pages -> per-language feature
digests -> quantile answers.

Ray translation of the reference's pre-aggregation rollup
(README.md:104-155, SURVEY.md §3.2):

1. column-pruned ``read_parquet`` (html/text/lang only — never carry page
   payloads past feature extraction),
2. ``map_batches`` feature extraction (zero-copy Arrow kernels),
3. grouped sketch aggregation — Ray's aggregate does map-side partial
   digests per block, so the ONLY shuffle moves compact digest states,
4. finalize projections (quantiles / ranks / trimmed moments per group).

Skew note: web language keys are Zipfian (en >> rest). The shuffle payload
is already one digest per (block x lang) regardless of row skew, so the hot
key costs merge CPU, not network. For ultra-hot keys
:func:`grouped_digests_salted` splits each language into ``nsalt``
sub-digests merged in a second (tiny) pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from tdigest_ray.aggregates import TDigestMergeAgg
from tdigest_ray.functions import serde
from tdigest_ray.stages.features import add_features, extract_text

DEFAULT_FEATURES = ("text_len", "token_count", "html_size")
DEFAULT_PERCENTILES = (0.5, 0.95, 0.99)


def prepare_features(ds, from_html: bool = False,
                     keep_cols=("lang",)) -> "ray.data.Dataset":
    """Feature-extraction stage; drops payload columns before any shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        if from_html:
            if "text" in batch.column_names:
                batch = batch.drop_columns(["text"])
            batch = extract_text(batch, out_col="text")
        batch = add_features(
            batch,
            html_col="html" if "html" in batch.column_names else None,
        )
        keep = [c for c in (*keep_cols, "text_len", "token_count",
                            "html_size") if c in batch.column_names]
        return batch.select(keep)

    return ds.map_batches(fn, batch_format="pyarrow")


def grouped_digests(ds, group_col: str = "lang",
                    features=DEFAULT_FEATURES, compression: int = 100):
    """One digest column per feature, grouped — `tdigest(v, c) GROUP BY lang`.

    Uses the vectorized per-block partial stage (stages/partial.py): the
    groupby only ever sees #blocks x #keys partial digest rows, so CPU/row
    stays flat as blocks grow (Ray's built-in grouped aggregate walks block
    rows in Python to find group boundaries)."""
    from tdigest_ray.stages.partial import grouped_digests_fast

    present = [f for f in features if f in ds.schema().names]
    if not present:
        raise ValueError(
            f"none of the requested features {tuple(features)} exist in "
            f"the dataset schema {tuple(ds.schema().names)}")
    return grouped_digests_fast(ds, group_col, present, compression)


def grouped_digests_table(ds, group_col: str = "lang",
                          features=DEFAULT_FEATURES,
                          compression: int = 100):
    """Per-FILE finisher for checkpointed runs: map-side partials plus
    ONE driver-side merge of the tiny partial table
    (``partial.merge_partial_digest_table``) — returns a ``pa.Table``
    with the same schema as :func:`grouped_digests`.

    A per-file pipeline's wall time is dominated by the coalesce +
    groupby barriers, not by work (#blocks x #groups partial rows for
    one file is a few dozen rows); skipping them took the checkpointed
    CLI from ~8 s/file amortized to ~1 s/file. Use
    :func:`grouped_digests` for corpus-sized datasets, where the
    distributed merge is the right shape."""
    import ray

    from tdigest_ray.stages.partial import (make_partial_digest_fn,
                                            merge_partial_digest_table)

    present = [f for f in features if f in ds.schema().names]
    if not present:
        raise ValueError(
            f"none of the requested features {tuple(features)} exist in "
            f"the dataset schema {tuple(ds.schema().names)}")
    partial = ds.map_batches(
        make_partial_digest_fn([group_col], present, compression),
        batch_format="pyarrow", batch_size=None)
    tables = [ray.get(r) for r in partial.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows] or tables[:1]
    tbl = pa.concat_tables(tables, promote_options="permissive")
    return merge_partial_digest_table(tbl, [group_col], present)


def grouped_digests_salted(ds, group_col: str = "lang",
                           features=DEFAULT_FEATURES, compression: int = 100,
                           nsalt: int = 16):
    """Two-level merge TREE over the partial-digest table.

    Measured context (bench ``skewed_merge``, r3): this engine's
    UNSALTED path is already skew-tolerant — Ray's grouped aggregate
    combines block-locally before the shuffle, so a 90%-hot key merges
    in the same wall time as a uniform spread (the hot key's row walk is
    parallel across blocks; the reduce only sees #blocks x #keys
    pre-combined states). Salting therefore does NOT beat the unsalted
    path at bench scale — the extra groupby level costs more than it
    saves — and :func:`grouped_digests` is the default for a reason.

    This tree variant exists for the regime where the REDUCE-STATE count
    itself explodes (10^6+ surviving partial states per key, e.g. an
    un-coalesced 100 TB run): the per-(block x key) partial table gets
    ``_salt = content_hash(digest bytes) % nsalt``, the first merge
    level reduces (key, salt) — #states/nsalt per reducer, nsalt-way
    parallel — and the second level merges the nkeys x nsalt survivors.
    The salt is content-derived (a pure function of the partial's wire
    bytes), so task retries and block re-splits land partials
    deterministically; salted and unsalted results agree (count exact,
    quantiles within digest error — pinned in tests)."""
    from tdigest_ray.sketches.hashing import fast_hash64_utf8
    from tdigest_ray.stages.partial import (
        make_null_key_mask,
        make_null_key_unmask,
        make_partial_digest_fn,
    )

    present = [f for f in features if f in ds.schema().names]
    if not present:
        raise ValueError(
            f"none of the requested features {tuple(features)} exist in "
            f"the dataset schema {tuple(ds.schema().names)}")
    first = f"{present[0]}_digest"

    def add_salt(batch: pa.Table) -> pa.Table:
        # content-derived salt straight from the binary column's Arrow
        # buffers (nulls hash as empty) — no per-row Python objects
        h = fast_hash64_utf8(batch.column(first))
        salt = (h % np.uint64(nsalt)).astype(np.int32)
        return batch.append_column("_salt", pa.array(salt))

    partial = ds.map_batches(
        make_partial_digest_fn([group_col], present, compression),
        batch_format="pyarrow", batch_size=None,
    ).map_batches(add_salt, batch_format="pyarrow")
    cpus = int(ray.cluster_resources().get("CPU", 8))
    partial = partial.repartition(min(cpus, 64))
    # same null-string-key sentinel discipline as grouped_digests_fast:
    # Ray's sort-shuffle sampling dies comparing None to str
    partial = partial.map_batches(make_null_key_mask([group_col]),
                                  batch_format="pyarrow")
    aggs = [TDigestMergeAgg(f"{f}_digest", alias_name=f"{f}_digest")
            for f in present]
    fine = partial.groupby([group_col, "_salt"]).aggregate(*aggs)
    return fine.groupby(group_col).aggregate(*aggs).map_batches(
        make_null_key_unmask([group_col]), batch_format="pyarrow")


def finalize_quantiles(digest_table, features=DEFAULT_FEATURES,
                       percentiles=DEFAULT_PERCENTILES,
                       group_col: str = "lang"):
    """Project quantiles out of a grouped digest table (the ~1.5 ms
    'query the summary table' step of README.md:131-133, as map_batches)."""
    ps = list(percentiles)

    def fn(batch: pa.Table) -> pa.Table:
        cols = {group_col: batch.column(group_col)}
        for f in features:
            col = f"{f}_digest"
            if col not in batch.column_names:
                continue
            blobs = batch.column(col).to_pylist()
            qs = np.full((len(blobs), len(ps)), np.nan)
            ns = np.zeros(len(blobs), dtype=np.int64)
            for i, blob in enumerate(blobs):
                if blob is None:
                    continue
                d = serde.from_bytes(bytes(blob))
                qs[i] = d.quantile(ps)
                ns[i] = d.count
            for j, p in enumerate(ps):
                # round, not truncate: int(0.29 * 100) == 28
                cols[f"{f}_p{int(round(p * 100)):02d}"] = pa.array(qs[:, j])
            cols[f"{f}_count"] = pa.array(ns)
        return pa.table(cols)

    return digest_table.map_batches(fn, batch_format="pyarrow")


def flagship(pages, compression: int = 100, from_html: bool = True,
             percentiles=DEFAULT_PERCENTILES, salted: bool = False,
             nsalt: int = 16, num_blocks: int | None = None):
    """pages Dataset/path -> per-language quantile summary table.

    ``num_blocks`` repartitions explicitly after the read — use ~4-16 blocks
    per CPU when input files are too few/too coarse for the cluster (the
    partial-digest stage parallelizes per block)."""
    if isinstance(pages, str):
        cols = ["html", "lang"] if from_html else ["text", "lang"]
        pages = ray.data.read_parquet(pages, columns=cols)
    if num_blocks:
        pages = pages.repartition(num_blocks)
    feats = prepare_features(pages, from_html=from_html)
    features = [f for f in DEFAULT_FEATURES if f in feats.schema().names]
    if salted:
        digests = grouped_digests_salted(feats, compression=compression,
                                         features=features, nsalt=nsalt)
    else:
        digests = grouped_digests(feats, compression=compression,
                                  features=features)
    return finalize_quantiles(digests, features=features,
                              percentiles=percentiles)
