"""Linear quality classifier (stages/classify.py)."""
import numpy as np
import pyarrow as pa
import ray

from tdigest_ray.stages.classify import (DEFAULT_WEIGHTS,
                                         LinearQualityClassifier,
                                         classify_quality)
from tdigest_ray.stages.textstats import _EN_STOPWORDS

TEXTS = [
    "the cat sat on the mat and it was good for a while",  # stopword-rich
    "1 2 3 4 5 6 7 8 9 0 1 2 3 4",                         # digit-heavy
    "!!! ??? ;;; ,,, ...",                                  # punct-heavy
    "word " * 200,                                          # long
    "",                                                     # empty
    None,                                                   # null
]


def _ref_logit(text):
    if text is None:
        return None
    n_tokens = text.count(" ") + 1
    n_punct = sum(text.count(c) for c in ".,!?;:")
    n_digit = sum(c.isdigit() for c in text)
    stops = set(_EN_STOPWORDS)
    n_stop = sum(1 for t in text.split() if t in stops)
    return (-4.0 + (-0.125) * n_digit + (-0.25) * n_punct
            + 0.0625 * n_tokens + 0.5 * n_stop)


def _table():
    return pa.table({
        "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
    })


class TestLinearQualityClassifier:
    def test_matches_scalar_reference(self):
        out = LinearQualityClassifier()(_table())
        logits = out.column("logit").to_pylist()
        keeps = out.column("keep").to_pylist()
        for i, text in enumerate(TEXTS):
            ref = _ref_logit(text)
            if ref is None:
                assert np.isnan(logits[i]) and keeps[i] is False
            else:
                assert logits[i] == ref, (i, logits[i], ref)  # exact
                assert keeps[i] == (ref > 0)

    def test_known_decisions(self):
        out = LinearQualityClassifier()(_table())
        keep = out.column("keep").to_pylist()
        assert keep[0] is True    # stopword-rich prose
        assert keep[1] is False   # digit spam
        assert keep[2] is False   # punct spam
        assert keep[3] is True    # long text

    def test_empty_batch(self):
        out = LinearQualityClassifier()(_table().slice(0, 0))
        assert out.num_rows == 0
        assert "logit" in out.column_names and "keep" in out.column_names

    def test_custom_weights(self):
        w = {"bias": 1.0, "n_tokens": 0.0}
        out = LinearQualityClassifier(weights=w)(_table())
        assert all(k is True for k, t in zip(
            out.column("keep").to_pylist(), TEXTS) if t is not None)

    def test_actor_pool_dataset_path(self):
        ds = ray.data.from_arrow(_table())
        df = classify_quality(ds, concurrency=2).to_pandas()
        direct = LinearQualityClassifier()(_table())
        df = df.sort_values("doc_id").reset_index(drop=True)
        np.testing.assert_array_equal(
            df["keep"].to_numpy(), direct.column("keep").to_numpy(
                zero_copy_only=False))
