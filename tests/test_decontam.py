"""Benchmark decontamination (stages/decontam.py) vs a brute-force
Python n-gram reference."""
import numpy as np
import pyarrow as pa
import ray

from tdigest_ray.sketches.bloom import BloomFilter
from tdigest_ray.stages import decontam

TEXTS = [
    "the quick brown fox jumps over the lazy dog",      # 0 (bench)
    "pack my box with five dozen liquor jugs today",    # 1
    "the quick brown fox naps under the old tree",      # 2 shares grams w/ 0
    "completely unrelated words without any overlap",   # 3
    "the quick brown fox jumps over the lazy dog",      # 4 dup of bench doc
    "tiny doc",                                         # 5 short (<3 tokens)
    "",                                                 # 6 empty
    None,                                               # 7 null
]
LANGS = ["en", "en", "en", "fr", "en", "fr", "fr", "fr"]


def _table():
    return pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(LANGS),
    })


def _ref_grams(text, k=3):
    """Reference shingles matching _shingle_hashes' contract: word
    k-grams, whole-text fallback below k tokens."""
    toks = (text or "").split()
    if len(toks) < k:
        return {("__raw__", text or "")}
    return {tuple(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _ref_hits(bench_ids, corpus_ids, k=3):
    bench = set()
    for i in bench_ids:
        bench |= _ref_grams(TEXTS[i], k)
    return {i: len(_ref_grams(TEXTS[i], k) & bench) for i in corpus_ids}


class TestDecontamination:
    BENCH = [0, 6]          # a real doc and the empty doc
    CORPUS = [1, 2, 3, 4, 5, 7]

    def _split(self):
        t = _table()
        bench = t.filter(pa.array([i in self.BENCH for i in range(len(TEXTS))]))
        corpus = t.filter(pa.array([i in self.CORPUS for i in range(len(TEXTS))]))
        return ray.data.from_arrow(bench), ray.data.from_arrow(corpus)

    def test_exact_counts_match_reference(self):
        bench_ds, corpus_ds = self._split()
        grams = decontam.benchmark_gram_set(bench_ds, k=3)
        assert grams.dtype == np.uint64
        assert np.all(np.diff(grams.view(np.uint64)) > 0)  # sorted distinct
        stats = decontam.contamination_stats(
            corpus_ds, grams, k=3, carry_cols=("lang",)).to_pandas()
        ref = _ref_hits(self.BENCH, self.CORPUS)
        got = dict(zip(stats["doc_id"], stats["n_hits"]))
        assert got == ref
        # the exact dup of a bench doc is fully contaminated
        assert got[4] == len(_ref_grams(TEXTS[4]))
        # null text == empty text == bench doc 6's whole-text shingle
        assert got[7] == 1
        by_id = dict(zip(stats["doc_id"], stats["contaminated"]))
        assert by_id == {i: ref[i] > 0 for i in self.CORPUS}
        langs = dict(zip(stats["doc_id"], stats["lang"]))
        assert langs == {i: LANGS[i] for i in self.CORPUS}

    def test_decontaminate_filters(self):
        bench_ds, corpus_ds = self._split()
        grams = decontam.benchmark_gram_set(bench_ds, k=3)
        kept = decontam.decontaminate(corpus_ds, grams, k=3).to_pandas()
        ref = _ref_hits(self.BENCH, self.CORPUS)
        assert sorted(kept["doc_id"]) == sorted(
            i for i in self.CORPUS if ref[i] == 0)
        assert list(kept.columns) == ["doc_id", "text", "lang"]  # passthrough
        # max_hits loosens the cut
        loose = decontam.decontaminate(
            corpus_ds, grams, k=3, max_hits=max(ref.values())).to_pandas()
        assert sorted(loose["doc_id"]) == sorted(self.CORPUS)

    def test_bloom_variant_never_misses(self):
        bench_ds, corpus_ds = self._split()
        bf = decontam.benchmark_gram_set(bench_ds, k=3, bloom_fpr=0.001)
        assert isinstance(bf, BloomFilter)
        stats = decontam.contamination_stats(corpus_ds, bf, k=3).to_pandas()
        ref = _ref_hits(self.BENCH, self.CORPUS)
        got = dict(zip(stats["doc_id"], stats["n_hits"]))
        for i in self.CORPUS:  # Bloom may over-count, never under-count
            assert got[i] >= ref[i]

    def test_empty_benchmark(self):
        _, corpus_ds = self._split()
        empty = ray.data.from_arrow(_table().slice(0, 0))
        grams = decontam.benchmark_gram_set(empty, k=3)
        assert len(grams) == 0
        stats = decontam.contamination_stats(corpus_ds, grams).to_pandas()
        assert (stats["n_hits"] == 0).all()
        assert not stats["contaminated"].any()
        kept = decontam.decontaminate(corpus_ds, grams).to_pandas()
        assert len(kept) == len(self.CORPUS)
