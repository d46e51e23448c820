"""Top-N per group (stages/topn.py) vs a pandas reference."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from tdigest_ray.stages.topn import top_n_ids, top_n_rows


def _docs(n=500, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(rng.choice(["en", "fr", "de", "zz"], n).tolist()),
        "score": pa.array(rng.integers(0, 50, n), pa.int64()),  # many ties
        "text": pa.array([f"doc {i}" for i in range(n)]),
    })


def _ref(t, n, ascending=False):
    df = t.to_pandas()
    df = df.sort_values(["lang", "score", "doc_id"],
                        ascending=[True, ascending, True])
    return set(df.groupby("lang").head(n)["doc_id"])


class TestTopN:
    def test_matches_reference(self):
        t = _docs()
        for n in (1, 3, 10):
            got = set(top_n_ids(ray.data.from_arrow(t), n, "lang",
                                "score").to_pandas()["doc_id"])
            assert got == _ref(t, n), n

    def test_ascending(self):
        t = _docs()
        got = set(top_n_ids(ray.data.from_arrow(t), 5, "lang", "score",
                            ascending=True).to_pandas()["doc_id"])
        assert got == _ref(t, 5, ascending=True)

    def test_block_layout_invariance(self):
        t = _docs(200)
        sparse = [t.slice(0, 0), t.slice(0, 37), t.slice(37, 100),
                  t.slice(137, 63)]
        a = set(top_n_ids(ray.data.from_arrow(sparse), 4, "lang",
                          "score").to_pandas()["doc_id"])
        b = set(top_n_ids(ray.data.from_arrow([t]), 4, "lang",
                          "score").to_pandas()["doc_id"])
        assert a == b == _ref(t, 4)

    def test_rows_semi_join_carries_all_columns(self):
        t = _docs(120)
        df = top_n_rows(ray.data.from_arrow(t), 2, "lang",
                        "score").to_pandas()
        assert set(df.columns) == {"doc_id", "lang", "score", "text"}
        assert set(df["doc_id"]) == _ref(t, 2)
        # full winner rows intact
        for r in df.itertuples():
            assert r.text == f"doc {r.doc_id}"

    def test_n_larger_than_group(self):
        t = _docs(20)
        got = top_n_ids(ray.data.from_arrow(t), 1000, "lang",
                        "score").to_pandas()
        assert len(got) == 20  # everything wins

    def test_validation(self):
        with pytest.raises(ValueError):
            top_n_ids(ray.data.from_arrow(_docs(10)), 0, "lang", "score")


def test_int64_scores_beyond_float53_exact():
    """Scores near 2^60 must rank exactly (a float64 cast would merge
    them; reported by review)."""
    import pyarrow as pa

    from tdigest_ray.stages.topn import _block_topn

    base = 1 << 60
    t = pa.table({
        "g": pa.array([0, 0, 0], pa.int64()),
        "s": pa.array([base, base + 1, base - 1], pa.int64()),
        "i": pa.array([1, 2, 3], pa.int64()),
    })
    top = _block_topn(t, 1, "g", "s", "i", ascending=False)
    assert top.column("i").to_pylist() == [2]
    bot = _block_topn(t, 1, "g", "s", "i", ascending=True)
    assert bot.column("i").to_pylist() == [3]


def test_nan_scores_always_lose():
    import numpy as np
    import pyarrow as pa

    from tdigest_ray.stages.topn import _block_topn

    t = pa.table({
        "g": pa.array([0, 0, 0], pa.int64()),
        "s": pa.array([1.0, np.nan, 2.0], pa.float64()),
        "i": pa.array([1, 2, 3], pa.int64()),
    })
    assert _block_topn(t, 2, "g", "s", "i", False).column(
        "i").to_pylist() == sorted([3, 1])
    assert _block_topn(t, 2, "g", "s", "i", True).column(
        "i").to_pylist() == sorted([1, 3])
