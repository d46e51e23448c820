"""Accuracy-vs-exact-oracle suite — port of test/sql/basic.sql.

For each deterministic distribution family (FIXTURES.md F2) and compression
in {10, 100, 1000}, quantile estimates at p in {.01,.05,.1,.9,.95,.99} must
be within the reference's regression tolerance of the exact quantile
(basic.sql:119,148,177 / :392,421,450 / :665,694,723 / :848,877,906), and a
99-point quantile sweep must be monotonically non-decreasing."""

import numpy as np
import pytest

from tdigest_ray.sketches.tdigest import TDigest
from tdigest_ray.sources.synthetic import distribution_families

NROWS = 100_000
PERCENTILES = [0.01, 0.05, 0.1, 0.9, 0.95, 0.99]

# family -> {compression: tolerance}, straight from basic.sql
TOLERANCES = {
    "asc": {10: 0.01, 100: 0.01, 1000: 0.001},
    "desc": {10: 0.01, 100: 0.01, 1000: 0.001},
    "shuffled": {10: 0.1, 100: 0.01, 1000: 0.001},
    "uniform": {10: 0.1, 100: 0.01, 1000: 0.001},
    "sqrt": {10: 0.1, 100: 0.01, 1000: 0.001},
    "sqrtsqrt": {10: 0.1, 100: 0.01, 1000: 0.001},
    "pow2": {10: 0.1, 100: 0.005, 1000: 0.001},
    "pow4": {10: 0.1, 100: 0.01, 1000: 0.001},
    "normal4": {10: 0.025, 100: 0.01, 1000: 0.001},
}


@pytest.fixture(scope="module")
def families():
    return distribution_families(NROWS)


@pytest.mark.parametrize("family", sorted(TOLERANCES))
@pytest.mark.parametrize("compression", [10, 100, 1000])
def test_quantile_accuracy(families, family, compression):
    values = families[family]
    d = TDigest(compression)
    d.add_many(values)
    exact = np.quantile(values, PERCENTILES)  # percentile_cont semantics
    est = d.quantile(PERCENTILES)
    tol = TOLERANCES[family][compression]
    err = np.abs(est - exact)
    assert (err < tol).all(), (
        f"{family} comp={compression}: errors {err} exceed {tol}"
    )


@pytest.mark.parametrize("family", ["asc", "uniform", "pow2", "normal4"])
@pytest.mark.parametrize("compression", [10, 100, 1000])
def test_quantile_monotonic(families, family, compression):
    d = TDigest(compression)
    d.add_many(families[family])
    qs = d.quantile(np.arange(1, 100) / 100.0)
    assert (np.diff(qs) >= 0).all()


@pytest.mark.parametrize("compression", [10, 100, 1000])
def test_percentile_of_accuracy(families, compression):
    # inverse-CDF accuracy: rank estimates within the same tolerances
    values = families["uniform"]
    d = TDigest(compression)
    d.add_many(values)
    probe = np.quantile(values, PERCENTILES)
    est_ranks = d.cdf(probe)
    tol = TOLERANCES["uniform"][compression]
    err = np.abs(est_ranks - np.asarray(PERCENTILES))
    assert (err < tol).all(), f"comp={compression}: rank errors {err} > {tol}"


def test_merge_preserves_accuracy(families):
    # split into 16 shards, digest each, merge — the distributed path must
    # stay within the single-digest tolerance envelope
    values = families["uniform"]
    shards = np.array_split(values, 16)
    merged = TDigest(100)
    for s in shards:
        part = TDigest(100)
        part.add_many(s)
        part.compress()
        merged.merge_digest(part)
    exact = np.quantile(values, PERCENTILES)
    est = merged.quantile(PERCENTILES)
    assert (np.abs(est - exact) < 0.02).all()
