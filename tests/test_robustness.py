"""Edge-case robustness: empty/singleton datasets, pandas-format blocks,
heavy hitters."""

import numpy as np
import pyarrow as pa
import ray

from tdigest_ray.aggregates import (
    HeavyHittersAgg,
    HLLCountAgg,
    TDigestAgg,
    TDigestPercentile,
)
from tdigest_ray.functions import serde


class TestEdgeDatasets:
    def test_empty_dataset_global(self):
        tbl = pa.table({"v": pa.array([], pa.float64())})
        ds = ray.data.from_arrow(tbl)
        res = ds.aggregate(TDigestPercentile("v", 0.5, 100, alias_name="q"))
        assert res["q"] is None

    def test_single_row(self):
        ds = ray.data.from_arrow(pa.table({"v": pa.array([42.0])}))
        res = ds.aggregate(TDigestPercentile("v", 0.5, 100, alias_name="q"))
        assert res["q"] == 42.0
        dg = ds.aggregate(TDigestAgg("v", 100, alias_name="d"))
        assert serde.digest_count(dg["d"]) == 1

    def test_filtered_to_empty_group(self):
        tbl = pa.table({"k": pa.array(["a", "b"]),
                        "v": pa.array([1.0, 2.0])})
        ds = ray.data.from_arrow(tbl).filter(lambda r: r["v"] > 10)
        out = ds.groupby("k").aggregate(
            TDigestPercentile("v", 0.5, 100, alias_name="q")).to_pandas()
        assert len(out) == 0

    def test_pandas_format_blocks(self):
        # upstream pandas-format map_batches produces pandas blocks; the
        # aggregate block-extraction must handle both block types
        tbl = pa.table({"v": pa.array(np.arange(1000, dtype=np.float64))})
        ds = ray.data.from_arrow(tbl).map_batches(
            lambda df: df, batch_format="pandas")
        res = ds.aggregate(TDigestPercentile("v", 0.5, 100, alias_name="q"))
        assert abs(res["q"] - 499.5) < 5
        nd = ds.aggregate(HLLCountAgg("v", alias_name="nd"))
        assert abs(nd["nd"] - 1000) / 1000 < 0.05

    def test_infinity_values(self):
        # the reference accepts +/-inf doubles (only NaN rejected)
        ds = ray.data.from_arrow(
            pa.table({"v": pa.array([1.0, float("inf"), 2.0])}))
        res = ds.aggregate(TDigestPercentile("v", 1.0, 100, alias_name="q"))
        assert res["q"] == float("inf")


class TestHeavyHitters:
    def test_zipfian_topk(self):
        rng = np.random.default_rng(9)
        keys = (rng.zipf(1.5, 100_000) % 1000).astype(np.int64)
        tbl = pa.table({"k": pa.array([f"key{x}" for x in keys])})
        ds = ray.data.from_arrow(tbl).repartition(8)
        res = ds.aggregate(HeavyHittersAgg("k", k=10, alias_name="hh"))
        got = {k for k, _ in res["hh"]}
        import collections

        true_top = [k for k, _ in collections.Counter(
            f"key{x}" for x in keys).most_common(5)]
        assert set(true_top) <= got  # true top-5 inside estimated top-10
        # estimated counts are overestimates within eps*N
        counter = collections.Counter(f"key{x}" for x in keys)
        for k, est in res["hh"]:
            assert est >= counter[k]
            assert est <= counter[k] + (np.e / 8192) * len(keys)

    def test_grouped_heavy_hitters(self):
        tbl = pa.table(
            {
                "g": pa.array(["x"] * 600 + ["y"] * 600),
                "k": pa.array((["a"] * 500 + ["b"] * 100)
                              + (["c"] * 500 + ["d"] * 100)),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        out = (
            ds.groupby("g")
            .aggregate(HeavyHittersAgg("k", k=1, alias_name="hh"))
            .to_pandas().set_index("g")
        )
        assert out.loc["x", "hh"][0][0] == "a"
        assert out.loc["y", "hh"][0][0] == "c"


class TestDedupEmptyInputs:
    def _empty_docs(self):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
        }))

    def test_exact_dedup_empty(self):
        from tdigest_ray.stages.dedup import exact_dedup

        assert exact_dedup(self._empty_docs()).count() == 0

    def test_minhash_dedup_empty(self):
        from tdigest_ray.stages.dedup import minhash_dedup

        clusters, n_pairs = minhash_dedup(self._empty_docs())
        assert clusters == {} and n_pairs == 0

    def test_simhash_dedup_empty(self):
        from tdigest_ray.stages.dedup import simhash_dedup

        clusters, n_pairs = simhash_dedup(self._empty_docs())
        assert clusters == {} and n_pairs == 0

    def test_ngram_jaccard_pairs_empty(self):
        from tdigest_ray.stages.dedup import ngram_jaccard_pairs

        out = ngram_jaccard_pairs(self._empty_docs()).to_pandas()
        assert len(out) == 0
        # a fully-empty input never flows a batch, so Ray Data reports a
        # schema-less empty table; when columns exist they must be ours
        assert list(out.columns) == [] or sorted(out.columns) == [
            "doc_a", "doc_b", "jaccard", "n_inter", "n_union"]

    def test_ngram_jaccard_pairs_all_unique(self):
        from tdigest_ray.stages.dedup import ngram_jaccard_pairs

        texts = [f"doc{i}x doc{i}y doc{i}z doc{i}w" for i in range(12)]
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(12), pa.int64()),
            "text": pa.array(texts),
        }))
        assert ngram_jaccard_pairs(ds, threshold=0.01).count() == 0

    def test_minhash_all_unique_no_pairs(self):
        from tdigest_ray.stages.dedup import minhash_dedup

        texts = [f"completely distinct document number {i} about topic "
                 f"{i * 37} with unique words w{i}a w{i}b w{i}c" * 3
                 for i in range(20)]
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(20), pa.int64()),
            "text": pa.array(texts),
        }))
        clusters, n_pairs = minhash_dedup(ds, threshold=0.9)
        assert clusters == {} and n_pairs == 0


def test_minhash_sig_spill_path_matches_materialize(tmp_path):
    """The corpus-scale signature spill (stream to Parquet, re-read for
    both consumers — VERDICT r3 item 3) must produce byte-identical
    clustering to the object-store materialize default."""
    from tdigest_ray.stages.dedup import (
        _labels_to_clusters,
        minhash_dedup_labels,
    )

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank on a sunny day in spring time %s")
    texts = ([base % "alpha"] * 3 + [base % "beta"] * 2
             + [f"unique doc {i} with words u{i}x u{i}y u{i}z" * 4
                for i in range(10)])
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    lab_mem, n_mem = minhash_dedup_labels(ds, threshold=0.8)
    lab_spill, n_spill = minhash_dedup_labels(
        ds, threshold=0.8, sig_spill_dir=str(tmp_path / "sigs"))
    assert n_mem == n_spill and n_mem > 0
    assert _labels_to_clusters(lab_mem) == _labels_to_clusters(lab_spill)
    # the spill really wrote signature shards
    assert list((tmp_path / "sigs").glob("*.parquet"))
