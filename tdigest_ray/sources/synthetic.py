"""Deterministic synthetic data generators.

Re-derivations of the reference regression suite's seeded generators
(``test/sql/basic.sql:19-81``): a Lehmer LCG and a Marsaglia-polar normal
sampler, used to build the accuracy-test distribution families (FIXTURES.md
F2) plus the deterministic Common-Crawl-style ``pages`` table (F1).
"""

from __future__ import annotations

import numpy as np

LCG_N = 2147483647
LCG_P1 = 16807
DEFAULT_SEED = 23982


def lcg(nrows: int, seed: int = DEFAULT_SEED, p1: int = LCG_P1, p2: int = 0,
        n: int = LCG_N) -> np.ndarray:
    """Lehmer LCG stream in [0, 1) (basic.sql:19-31)."""
    out = np.empty(nrows, dtype=np.float64)
    val = seed
    for i in range(nrows):
        val = (val * p1 + p2) % n
        out[i] = val / n
    return out


def random_normal(nrows: int, mean: float = 0.5, stddev: float = 0.1,
                  minval: float = 0.0, maxval: float = 1.0,
                  seed: int = DEFAULT_SEED, p1: int = LCG_P1, p2: int = 0,
                  n: int = LCG_N) -> np.ndarray:
    """Truncated normal via Marsaglia polar method over the same LCG
    (basic.sql:33-81)."""
    import math

    out = np.empty(nrows, dtype=np.float64)
    got = 0
    v = seed
    fn = float(n)
    while True:
        v = (v * p1 + p2) % n
        x = 2 * v / fn - 1.0
        v = (v * p1 + p2) % n
        y = 2 * v / fn - 1.0
        s = x * x + y * y
        if s != 0.0 and s < 1.0:
            s = math.sqrt(-2 * math.log(s) / s)
            x = mean + stddev * s * x
            if minval <= x <= maxval:
                out[got] = x
                got += 1
            if got == nrows:
                break
            y = mean + stddev * s * y
            if minval <= y <= maxval:
                out[got] = y
                got += 1
            if got == nrows:
                break
    return out


def distribution_families(nrows: int = 100_000) -> dict[str, np.ndarray]:
    """The reference accuracy suite's distribution families (basic.sql /
    FIXTURES.md F2), as deterministic float64 arrays.

    Keys map to (family, per-compression tolerance) in the accuracy tests.
    """
    u = lcg(nrows)
    shuffle_key = lcg(nrows, seed=49979693)
    evenly = np.arange(1, nrows + 1, dtype=np.float64) / nrows
    families = {
        "asc": evenly,
        "desc": evenly[::-1].copy(),
        "shuffled": evenly[np.argsort(shuffle_key, kind="stable")],
        "uniform": u,
        "sqrt": np.sqrt(u),
        "sqrtsqrt": np.sqrt(np.sqrt(u)),
        "pow2": u**2,
        "pow4": u**4,
        "normal4": random_normal(nrows) ** 4,
    }
    return families
