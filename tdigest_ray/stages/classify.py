"""Model-scoring stages: batched linear classifiers over text features.

The shape every learned-filter deployment uses (fastText quality
classifiers, logistic-regression spam filters): load the model ONCE per
actor in ``__init__``, score each Arrow batch vectorized in
``__call__``. Here the model is a linear logit over integer-exact text
features, which keeps the stage fully auditable: with power-of-two
weights every product is exact in float64 and the fixed left-to-right
summation order makes the logit — and therefore the keep/drop decision
— bit-identical to a SQL engine evaluating the same expression (no
"approximately matches the oracle", it MUST match).

Swapping in a real learned model changes only ``__init__`` (load
weights from a file instead of the dict) — the Ray plumbing, batch
contract, and output layout stay as tested here.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from tdigest_ray.stages.textstats import add_stopword_stats, add_text_counts

# default linear model: favors token count and stopword density (prose
# signal), penalizes punctuation/digit density (boilerplate signal).
# All weights are powers of two -> products exact in float64.
DEFAULT_WEIGHTS = {
    "bias": -4.0,
    "n_tokens": 0.0625,
    "stopword_tokens": 0.5,
    "n_punct": -0.25,
    "n_digit": -0.125,
}


class LinearQualityClassifier:
    """Actor-pool stage: appends ``logit`` (float64) and ``keep``
    (bool, logit > 0) to each batch.

    Use as ``ds.map_batches(LinearQualityClassifier, concurrency=N,
    batch_size=B)`` — construction cost (the model "load") is paid once
    per actor, never per batch.
    """

    def __init__(self, weights: dict | None = None,
                 text_col: str = "text"):
        w = dict(DEFAULT_WEIGHTS if weights is None else weights)
        self.bias = float(w.pop("bias", 0.0))
        # fixed feature order = fixed summation order = reproducible logit
        self.features = sorted(w)
        self.weights = np.array([w[f] for f in self.features], np.float64)
        self.text_col = text_col

    def _feature_table(self, batch: pa.Table) -> pa.Table:
        t = add_text_counts(batch, self.text_col)
        if "stopword_tokens" in self.features:
            t = add_stopword_stats(t, self.text_col)
        return t

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return (batch.append_column("logit", pa.array([], pa.float64()))
                         .append_column("keep", pa.array([], pa.bool_())))
        t = self._feature_table(batch)
        # left-to-right accumulation in feature order; null text gives a
        # null feature -> NaN logit -> keep False (SQL: NULL comparison
        # is filtered the same way)
        z = np.full(batch.num_rows, self.bias, np.float64)
        valid = np.ones(batch.num_rows, bool)
        for f, w in zip(self.features, self.weights):
            col = t.column(f)
            valid &= ~np.asarray(col.is_null())
            fv = col.to_numpy(zero_copy_only=False).astype(np.float64)
            z = z + w * np.where(valid, fv, 0.0)
        z = np.where(valid, z, np.nan)
        keep = np.where(valid, z > 0.0, False)
        return (batch.append_column("logit", pa.array(z, pa.float64()))
                     .append_column("keep", pa.array(keep, pa.bool_())))


def classify_quality(ds, weights: dict | None = None,
                     text_col: str = "text", concurrency=(2, 16),
                     batch_size: int | None = None):
    """Score a corpus with :class:`LinearQualityClassifier` behind an
    actor pool (model built once per actor)."""
    kwargs = {"concurrency": concurrency}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    return ds.map_batches(
        LinearQualityClassifier,
        fn_constructor_kwargs={"weights": weights, "text_col": text_col},
        batch_format="pyarrow", **kwargs)
