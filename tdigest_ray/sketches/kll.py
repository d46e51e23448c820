"""KLL quantile sketch.

From-scratch implementation of Karnin, Lang, Liberty, "Optimal quantile
approximation in streams" (FOCS 2016): a stack of compactors where level h
holds items of weight 2^h; compaction sorts a level and promotes every other
item. Level capacities decay geometrically (c = 2/3) from the top capacity
``k``; normalized rank error is O(1/k).

Determinism note: the published algorithm flips a random coin per compaction
to pick odd/even survivors. For reproducible distributed runs this
implementation derives the coin from a SplitMix64-mixed compaction counter —
deterministic given insertion order, unbiased across compactions. Ray-side
results are therefore a pure function of block content + merge order, which
makes task retries safe.

Merge concatenates levels then compacts down to capacity — associative up to
the same order-sensitivity the t-digest documents (README.md:782-786).
"""

from __future__ import annotations

import numpy as np

C_DECAY = 2.0 / 3.0


def _level_capacity(k: int, depth_below_top: int) -> int:
    return max(int(np.ceil(k * C_DECAY**depth_below_top)), 2)


class KLL:
    __slots__ = ("k", "levels", "n", "_ncompactions")

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError(f"KLL k must be >= 8, got {k}")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0  # total items represented (exact)
        self._ncompactions = 0

    # -------------------------------------------------------------- #

    def _capacity(self, level: int) -> int:
        return _level_capacity(self.k, len(self.levels) - 1 - level)

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.levels)))

    def _coin(self) -> int:
        # deterministic unbiased coin from the compaction counter
        x = np.uint64(self._ncompactions)
        with np.errstate(over="ignore"):
            x = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
        self._ncompactions += 1
        return int((x >> np.uint64(13)) & np.uint64(1))

    def _compact(self) -> None:
        while sum(len(lv) for lv in self.levels) > self._total_capacity():
            # find the lowest level over its capacity
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._capacity(h):
                    break
            else:
                break
            lv = np.sort(self.levels[h])
            # odd length: one unpaired item stays at level h so total weight
            # is preserved exactly (sum of 2^h weights always equals n)
            if len(lv) % 2 == 1:
                keep, body = lv[:1], lv[1:]
            else:
                keep, body = lv[:0], lv
            promoted = body[self._coin() :: 2]
            if h + 1 == len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h] = keep
            self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    def update(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64).ravel()
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self.n += len(vals)
        self._compact()

    def merge(self, other: "KLL") -> "KLL":
        if other.n == 0:
            return self
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lv in enumerate(other.levels):
            if len(lv):
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self._ncompactions += other._ncompactions
        self._compact()
        return self

    # -------------------------------------------------------------- #

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items = []
        weights = []
        for h, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 1 << h, dtype=np.int64))
        if not items:
            return np.empty(0), np.empty(0, dtype=np.int64)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, qs):
        scalar = np.isscalar(qs)
        ps = np.asarray(qs, dtype=np.float64).ravel()
        if self.n == 0:
            out = np.full(ps.shape, np.nan)
            return float(out[0]) if scalar else out
        items, weights = self._weighted_items()
        cum = np.cumsum(weights)
        total = cum[-1]
        goals = np.clip(ps, 0, 1) * total
        idx = np.minimum(
            np.searchsorted(cum, goals, side="left"), len(items) - 1
        )
        out = items[idx]
        return float(out[0]) if scalar else out

    def rank(self, values):
        """Normalized rank estimate(s) of hypothetical value(s)."""
        scalar = np.isscalar(values)
        vs = np.asarray(values, dtype=np.float64).ravel()
        if self.n == 0:
            out = np.full(vs.shape, np.nan)
            return float(out[0]) if scalar else out
        items, weights = self._weighted_items()
        cum = np.concatenate([[0], np.cumsum(weights)])
        pos = np.searchsorted(items, vs, side="left")
        out = cum[pos] / cum[-1]
        return float(out[0]) if scalar else out

    def __eq__(self, other):
        return (
            isinstance(other, KLL)
            and self.k == other.k
            and self.n == other.n
            and len(self.levels) == len(other.levels)
            and all(
                np.array_equal(a, b) for a, b in zip(self.levels, other.levels)
            )
        )

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps(
            (1, self.k, self.n, self._ncompactions,
             [lv.tobytes() for lv in self.levels])
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLL":
        import pickle

        ver, k, n, ncomp, level_bytes = pickle.loads(b)
        if ver != 1:
            raise ValueError("unsupported KLL serialization version")
        s = cls(k)
        s.n = n
        s._ncompactions = ncomp
        s.levels = [np.frombuffer(lb, dtype=np.float64).copy() for lb in level_bytes]
        return s
