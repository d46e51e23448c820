"""Property-based invariants (hypothesis) for the sketches.

These pin the algebraic contracts that make distributed execution safe:
exact count conservation, quantile bounds/monotonicity, serde round-trips,
merge tolerance, and the no-false-negative / overestimate-only guarantees.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from tdigest_ray.functions import serde
from tdigest_ray.sketches.bloom import BloomFilter
from tdigest_ray.sketches.countmin import CountMin
from tdigest_ray.sketches.hll import HLL
from tdigest_ray.sketches.kll import KLL
from tdigest_ray.sketches.tdigest import TDigest

finite_floats = st.floats(min_value=-1e12, max_value=1e12,
                          allow_nan=False, allow_infinity=False)
value_lists = st.lists(finite_floats, min_size=1, max_size=500)
compressions = st.sampled_from([10, 37, 100, 500])


class TestTDigestProperties:
    @settings(max_examples=60, deadline=None)
    @given(values=value_lists, compression=compressions)
    def test_count_and_bounds(self, values, compression):
        d = TDigest(compression)
        d.add_many(np.asarray(values))
        assert d.count == len(values)
        means, counts = d.centroids()
        assert int(counts.sum()) == len(values)
        qs = d.quantile([0.0, 0.25, 0.5, 0.75, 1.0])
        assert qs[0] == min(values) and qs[-1] == max(values)
        assert (np.diff(qs) >= 0).all()
        assert qs.min() >= min(values) and qs.max() <= max(values)

    @settings(max_examples=40, deadline=None)
    @given(values=value_lists, compression=compressions)
    def test_serde_roundtrip_bitexact(self, values, compression):
        d = TDigest(compression)
        d.add_many(np.asarray(values))
        d.compress()
        assert serde.from_bytes(serde.to_bytes(d)) == d
        rt = serde.from_array(serde.to_array(d))
        assert rt == d

    @settings(max_examples=40, deadline=None)
    @given(a=value_lists, b=value_lists, compression=compressions)
    def test_merge_count_conservation(self, a, b, compression):
        da = TDigest(compression)
        da.add_many(np.asarray(a))
        db = TDigest(compression)
        db.add_many(np.asarray(b))
        da.merge_digest(db)
        da.compress()
        assert da.count == len(a) + len(b)
        lo = min(min(a), min(b))
        hi = max(max(a), max(b))
        assert lo <= da.quantile(0.5) <= hi

    @settings(max_examples=30, deadline=None)
    @given(values=st.lists(st.floats(min_value=0, max_value=1,
                                     allow_nan=False), min_size=50,
                           max_size=500, unique=True))
    def test_cdf_quantile_consistency(self, values):
        # unique values: for point masses cdf(mean) is the midpoint rank
        # by design (tdigest.c:689-705), which breaks naive inversion
        d = TDigest(100)
        d.add_many(np.asarray(values))
        for p in (0.2, 0.5, 0.8):
            q = d.quantile(p)
            r = d.cdf(q)
            assert abs(r - p) < 0.2  # loose inverse-consistency

    @settings(max_examples=40, deadline=None)
    @given(values=value_lists, compression=compressions)
    def test_compress_idempotent(self, values, compression):
        d = TDigest(compression)
        d.add_many(np.asarray(values))
        d.compress()
        snapshot = serde.to_bytes(d)
        d.compress()  # second compaction with no new data is a no-op
        assert serde.to_bytes(d) == snapshot
        q1 = d.quantile(0.5)
        q2 = d.quantile(0.5)  # queries don't mutate observable state
        assert q1 == q2 and serde.to_bytes(d) == snapshot

    @settings(max_examples=30, deadline=None)
    @given(value=finite_floats,
           count=st.integers(min_value=1, max_value=10_000_000))
    def test_weighted_single_value(self, value, count):
        d = TDigest(10)
        d.add(value, count)
        assert d.count == count
        # all mass at one point: every quantile is that point exactly
        # (equal means never re-averaged)
        assert d.quantile(0.5) == value


class TestSiblingProperties:
    @settings(max_examples=20, deadline=None)
    @given(keys=st.lists(st.integers(min_value=0, max_value=10**9),
                         min_size=1, max_size=300))
    def test_bloom_no_false_negatives(self, keys):
        bf = BloomFilter(1 << 14, 5)
        bf.update(np.asarray(keys, dtype=np.int64))
        assert bf.contains(np.asarray(keys, dtype=np.int64)).all()

    @settings(max_examples=20, deadline=None)
    @given(keys=st.lists(st.integers(min_value=0, max_value=1000),
                         min_size=1, max_size=300))
    def test_countmin_overestimates(self, keys):
        cm = CountMin(4, 512)
        arr = np.asarray(keys, dtype=np.int64)
        cm.update(arr)
        uniq, true = np.unique(arr, return_counts=True)
        est = cm.query(uniq)
        assert (est >= true).all()
        assert cm.total() == len(keys)

    @settings(max_examples=20, deadline=None)
    @given(keys=st.lists(st.integers(min_value=0, max_value=10**9),
                         min_size=1, max_size=500))
    def test_hll_merge_idempotent(self, keys):
        arr = np.asarray(keys, dtype=np.int64)
        a = HLL(10)
        a.update(arr)
        b = HLL(10)
        b.update(arr)
        merged = HLL.from_bytes(a.to_bytes()).merge(b)
        assert merged == a  # union with itself is itself

    @settings(max_examples=20, deadline=None)
    @given(values=st.lists(finite_floats, min_size=1, max_size=1000))
    def test_kll_weight_conservation(self, values):
        s = KLL(32)
        s.update(np.asarray(values))
        items, weights = s._weighted_items()
        assert int(weights.sum()) == len(values)
        q = s.quantile(0.5)
        assert min(values) <= q <= max(values)


class TestNgramJoinKernels:
    """Pure-kernel invariants for the distributed exact Jaccard join
    (stages/dedup.py): the vectorized pair expansion and the per-doc
    distinct-gram extraction, each against a plain-Python oracle."""

    @given(st.lists(st.integers(min_value=2, max_value=9),
                    min_size=0, max_size=8),
           st.lists(st.integers(min_value=0, max_value=5),
                    min_size=0, max_size=8))
    def test_expand_run_pairs_matches_oracle(self, lens, gaps):
        from tdigest_ray.stages.dedup import _expand_run_pairs

        lens = np.asarray(lens[:len(gaps)], dtype=np.int64)
        gaps = np.asarray(gaps[:len(lens)], dtype=np.int64)
        # disjoint sorted runs with arbitrary gaps between them
        starts = np.cumsum(np.concatenate([[0], (lens + gaps)[:-1]])) \
            if len(lens) else np.empty(0, np.int64)
        left, right = _expand_run_pairs(starts, lens)
        expect = [(i, j)
                  for s, m in zip(starts, lens)
                  for i in range(s, s + m)
                  for j in range(i + 1, s + m)]
        assert list(zip(left.tolist(), right.tolist())) == expect

    @given(st.lists(st.one_of(
        st.none(),
        st.text(alphabet="ab x", min_size=0, max_size=24)),
        min_size=0, max_size=12),
        st.integers(min_value=1, max_value=4))
    def test_distinct_gram_rows_matches_oracle(self, texts, k):
        import pyarrow as pa

        from tdigest_ray.stages.dedup import _distinct_gram_rows

        arr = pa.array(texts, pa.string())
        d, g, doc_n = _distinct_gram_rows(arr, k)
        # oracle: the documented shingling contract — whitespace tokens,
        # empties dropped, word-k-grams, whole-text fallback below k
        # tokens (null reads as ''); per-doc DISTINCT gram multiset
        per_doc_sets = []
        for t in texts:
            toks = (t or "").split()
            grams = ({" ".join(toks[i:i + k])
                      for i in range(len(toks) - k + 1)}
                     if len(toks) >= k else {t or ""})
            per_doc_sets.append(grams)
        assert doc_n.tolist() == [len(s) for s in per_doc_sets]
        # row counts per doc match; distinct-hash count == distinct grams
        # (64-bit collisions impossible to hit at this size)
        got_per_doc = np.bincount(d, minlength=len(texts)).tolist() \
            if len(d) else [0] * len(texts)
        assert got_per_doc == [len(s) for s in per_doc_sets]
        # equal gram strings hash equal ACROSS docs: the number of
        # distinct hashes globally == number of distinct gram strings
        all_grams = set().union(*per_doc_sets) if per_doc_sets else set()
        assert len(np.unique(g)) == len(all_grams)


class TestSessionKernelProperties:
    """stages/sessions._assign_arrays vs a per-key scalar reference."""

    @settings(max_examples=40, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 5),        # key
                      st.integers(0, 500),      # ts
                      st.integers(0, 10**6)),   # id
            min_size=1, max_size=80, unique_by=lambda r: r[2]),
        gap=st.integers(1, 100),
    )
    def test_matches_scalar_reference(self, rows, gap):
        import pyarrow as pa

        from tdigest_ray.stages.sessions import _assign_arrays

        t = pa.table({
            "event_id": pa.array([r[2] for r in rows], pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "_ts": pa.array([r[1] for r in rows], pa.int64()),
        })
        ids, keys, ts, first, gap_prev, seq = _assign_arrays(
            t, "user_id", "event_id", np.int64(gap))
        got = {i: (k, s) for i, k, s in zip(ids, keys, seq)}
        # scalar reference
        ref = {}
        per = {}
        for k, ts_, i in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
            per.setdefault(k, []).append((i, ts_))
        for k, evs in per.items():
            s, prev = 0, None
            for i, ts_ in evs:
                if prev is not None and ts_ - prev > gap:
                    s += 1
                ref[i] = (k, s)
                prev = ts_
        assert got == ref


class TestTopNKernelProperties:
    """stages/topn._block_topn vs a pandas reference."""

    @settings(max_examples=40, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 4),        # group
                      st.integers(0, 9),        # score (ties likely)
                      st.integers(0, 10**6)),   # id
            min_size=0, max_size=60, unique_by=lambda r: r[2]),
        n=st.integers(1, 5),
        ascending=st.booleans(),
    )
    def test_matches_pandas_reference(self, rows, n, ascending):
        import pandas as pd
        import pyarrow as pa

        from tdigest_ray.stages.topn import _block_topn

        t = pa.table({
            "g": pa.array([r[0] for r in rows], pa.int64()),
            "s": pa.array([float(r[1]) for r in rows], pa.float64()),
            "i": pa.array([r[2] for r in rows], pa.int64()),
        })
        got = set(_block_topn(t, n, "g", "s", "i",
                              ascending).column("i").to_pylist())
        df = pd.DataFrame(rows, columns=["g", "s", "i"])
        if len(df):
            df = df.sort_values(["g", "s", "i"],
                                ascending=[True, ascending, True])
            ref = set(df.groupby("g").head(n)["i"])
        else:
            ref = set()
        assert got == ref
