"""Dataset mixing (stages/mixing.py)."""
import numpy as np
import pyarrow as pa
import pytest
import ray

from tdigest_ray.stages.mixing import mix_sources
from tdigest_ray.stages.splits import N_BUCKETS, lehmer_buckets


def _corpus(n=4000):
    src = np.array(["web", "books", "code", "junk"])[
        np.arange(n) % 4]
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(src.tolist()),
        "v": pa.array(np.arange(n, dtype=np.float64)),
    })


WEIGHTS = {"web": 0.5, "books": 2.25, "code": 1.0}  # junk dropped


def _ref(t, seed=0):
    out = {}
    ids = t.column("doc_id").to_pylist()
    srcs = t.column("source").to_pylist()
    buckets = lehmer_buckets(np.asarray(ids, np.int64), seed=seed,
                             rounds=3)
    for i, s, b in zip(ids, srcs, buckets):
        w = WEIGHTS.get(s, 0.0)
        base = int(np.floor(w))
        frac = int(b < round((w - base) * N_BUCKETS))
        out[i] = base + frac
    return out


class TestMixSources:
    def test_matches_reference(self):
        t = _corpus()
        df = mix_sources(ray.data.from_arrow(t), WEIGHTS).to_pandas()
        ref = _ref(t)
        got = df.groupby("doc_id").size().to_dict()
        assert got == {i: c for i, c in ref.items() if c > 0}
        # copy ids are 0..c-1 per doc
        for i, grp in df.groupby("doc_id"):
            assert sorted(grp["copy_id"]) == list(range(ref[i]))

    def test_rates_are_close(self):
        t = _corpus(8000)
        df = mix_sources(ray.data.from_arrow(t), WEIGHTS).to_pandas()
        rates = df.groupby("source").size() / 2000  # per-source input size
        assert abs(rates["web"] - 0.5) < 0.05
        assert abs(rates["books"] - 2.25) < 0.05
        assert rates["code"] == 1.0
        assert "junk" not in rates.index  # absent groups dropped

    def test_deterministic_and_layout_invariant(self):
        t = _corpus(600)
        parts = [t.slice(0, 0), t.slice(0, 123), t.slice(123, 477)]
        a = mix_sources(ray.data.from_arrow(parts),
                        WEIGHTS).to_pandas().sort_values(
            ["doc_id", "copy_id"]).reset_index(drop=True)
        b = mix_sources(ray.data.from_arrow([t]),
                        WEIGHTS).to_pandas().sort_values(
            ["doc_id", "copy_id"]).reset_index(drop=True)
        assert a.equals(b)

    def test_seed_changes_fractional_choice(self):
        t = _corpus(2000)
        a = set(mix_sources(ray.data.from_arrow(t), {"web": 0.5},
                            seed=0).to_pandas()["doc_id"])
        b = set(mix_sources(ray.data.from_arrow(t), {"web": 0.5},
                            seed=9).to_pandas()["doc_id"])
        assert a != b

    def test_negative_weight_raises(self):
        with pytest.raises(ValueError):
            mix_sources(ray.data.from_arrow(_corpus(10)), {"web": -1})


def test_null_group_rows_dropped():
    """Null group = absent from the weight dict = dropped, not a crash
    (reported by review)."""
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "source": pa.array(["web", None, "web"], pa.string()),
    })
    df = mix_sources(ray.data.from_arrow(t), {"web": 1.0}).to_pandas()
    assert sorted(df["doc_id"]) == [0, 2]


def test_decorrelated_from_splits():
    """Composing add_split with a downsampling mix must keep val/test
    rows at ~the mix rate, not delete them all (reported by review:
    a shared bucket stream put every val row outside any w<0.98 keep
    set)."""
    from tdigest_ray.stages.splits import add_split

    n = 20000
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(["web"] * n),
    })
    tagged = add_split(ray.data.from_arrow(t), seed=0)
    mixed = mix_sources(tagged, {"web": 0.6}, seed=0).to_pandas()
    val = mixed[mixed["split"] == "val"]
    # ~1% of 20k rows are val (~200); at w=0.6 expect ~120 survivors
    assert len(val) > 60, len(val)
