"""Bottom-k hash sampling: determinism, merge-order independence,
uniformity, KMV distinct estimate, Ray aggregation."""

import numpy as np
import pyarrow as pa
import ray

from tdigest_ray.aggregates import BottomKSampleAgg
from tdigest_ray.sketches.sampling import BottomKSample


class TestBottomK:
    def test_deterministic_and_order_independent(self):
        vals = np.arange(10_000, dtype=np.int64)
        a = BottomKSample(64)
        a.update(vals)
        b = BottomKSample(64)
        rng = np.random.default_rng(1)
        for chunk in np.array_split(rng.permutation(vals), 7):
            part = BottomKSample(64)
            part.update(chunk)
            b.merge(part)
        assert a == b
        assert sorted(a.sample()) == sorted(b.sample())

    def test_merge_idempotent(self):
        a = BottomKSample(32)
        a.update(np.arange(1000, dtype=np.int64))
        b = BottomKSample.from_bytes(a.to_bytes())
        b.merge(a)
        assert b == a

    def test_uniformity(self):
        # sampled ids from [0, 100k) should cover the range evenly
        s = BottomKSample(512)
        s.update(np.arange(100_000, dtype=np.int64))
        sample = np.asarray(s.sample(), dtype=np.int64)
        assert len(sample) == 512
        # quartile occupancy within 3-sigma of 128 each
        hist, _ = np.histogram(sample, bins=4, range=(0, 100_000))
        assert (np.abs(hist - 128) < 3 * np.sqrt(128 * 0.75)).all(), hist

    def test_kmv_distinct_estimate(self):
        s = BottomKSample(256)
        s.update(np.arange(50_000, dtype=np.int64))
        s.update(np.arange(50_000, dtype=np.int64))  # duplicates ignored
        est = s.distinct_estimate()
        assert abs(est - 50_000) / 50_000 < 0.2

    def test_undersaturated_exact(self):
        s = BottomKSample(256)
        s.update(np.asarray(["a", "b", "c"], dtype=object))
        assert s.distinct_estimate() == 3.0
        assert sorted(s.sample()) == ["a", "b", "c"]

    def test_kmv_set_operations(self):
        # two corpora with known overlap: |A|=30k, |B|=30k, |A∩B|=10k
        a = BottomKSample(512)
        a.update(np.arange(0, 30_000, dtype=np.int64))
        b = BottomKSample(512)
        b.update(np.arange(20_000, 50_000, dtype=np.int64))
        assert abs(a.union_estimate(b) - 50_000) / 50_000 < 0.15
        assert abs(a.intersection_estimate(b) - 10_000) / 10_000 < 0.3
        assert abs(a.jaccard_estimate(b) - 0.2) < 0.06

    def test_kmv_disjoint_and_identical(self):
        a = BottomKSample(256)
        a.update(np.arange(0, 5000, dtype=np.int64))
        b = BottomKSample(256)
        b.update(np.arange(10_000, 15_000, dtype=np.int64))
        assert a.intersection_estimate(b) == 0.0
        c = BottomKSample.from_bytes(a.to_bytes())
        assert abs(a.jaccard_estimate(c) - 1.0) < 1e-9

    def test_ray_aggregate(self):
        n = 30_000
        tbl = pa.table({"v": pa.array(np.arange(n, dtype=np.int64))})
        ds = ray.data.from_arrow(tbl).repartition(8)
        res = ds.aggregate(BottomKSampleAgg("v", k=128, alias_name="s"))
        sample = res["s"]
        assert len(sample) == 128
        # identical to a single-node run (determinism across plans)
        local = BottomKSample(128)
        local.update(np.arange(n, dtype=np.int64))
        assert sorted(sample) == sorted(local.sample())
