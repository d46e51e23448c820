"""Scale-design invariants: the shapes that make the pipelines viable at
10^12 rows (SCALE.md) hold structurally, not just in prose."""

import numpy as np
import pyarrow as pa
import ray

from tdigest_ray.functions import serde
from tdigest_ray.stages.partial import make_partial_digest_fn


def test_partial_stage_output_is_blocks_times_groups():
    # the only shuffle input of the flagship is #blocks x #groups digest
    # rows, independent of row count
    n, nblocks, ngroups = 40_000, 8, 5
    tbl = pa.table(
        {
            "k": pa.array([f"g{i % ngroups}" for i in range(n)]),
            "v": pa.array(np.arange(n, dtype=np.float64)),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(nblocks)
    partial = ds.map_batches(
        make_partial_digest_fn(["k"], ["v"]), batch_format="pyarrow"
    ).materialize()
    assert partial.count() == nblocks * ngroups
    # and each partial is bounded: compacted wire digests stay ~2 KB
    sizes = [len(r["v_digest"]) for r in partial.take_all()]
    assert max(sizes) < 4096


def test_digest_size_bounded_by_compression():
    # 16 B/centroid; compacted digests stay O(compression) regardless of n
    # (the README.md:61-64 size bound)
    from tdigest_ray.sketches.tdigest import TDigest

    for comp in (10, 100, 1000):
        d = TDigest(comp)
        d.add_many(np.random.default_rng(comp).random(500_000))
        d.compress()
        blob = serde.to_bytes(d)
        assert len(blob) <= 20 + 16 * 3 * comp, (comp, len(blob))


def test_band_rows_carry_no_signatures():
    # the MinHash band shuffle moves (band_key, id) only — 16 B/row, never
    # the 1 KB signature
    from tdigest_ray.stages.dedup import minhash_signatures, band_keys

    texts = ["some document text about %d things" % i for i in range(100)]
    sig = minhash_signatures(texts, num_perm=128)
    keys = band_keys(sig, bands=32)
    assert keys.shape == (100, 32)
    assert keys.dtype == np.int64  # one int64 key per (doc, band)
