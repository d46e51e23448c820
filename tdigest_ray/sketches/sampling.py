"""Bottom-k hash sampling — deterministic, mergeable uniform sampling.

Keep the k items with the smallest deterministic 64-bit hash. Because the
hash order is a fixed random permutation of the value universe, the kept
set is a uniform sample WITHOUT replacement of the *distinct* values
(classic bottom-k / KMV sketch, Cohen & Kaplan 2007, public), and the merge
(union + truncate to k) is associative, commutative and idempotent — safe
under any Ray execution order and task retries, unlike RNG-based reservoir
sampling.

The k-th smallest hash also yields a distinct-count estimate
(KMV: (k-1) / h_k with h in [0,1)), cross-checkable against HLL.
"""

from __future__ import annotations

import pickle

import numpy as np

from tdigest_ray.sketches.hashing import hash64


class BottomKSample:
    __slots__ = ("k", "_hashes", "_values")

    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("sample size k must be positive")
        self.k = int(k)
        self._hashes = np.empty(0, dtype=np.uint64)
        self._values = np.empty(0, dtype=object)

    def update(self, values) -> None:
        arr = np.asarray(values)
        if arr.dtype.kind in "US":
            arr = arr.astype(object)
        h = hash64(arr)
        # block-local dedup keeps the state tiny before the global merge
        h, idx = np.unique(h, return_index=True)
        arr = arr[idx]
        self._absorb(h, arr)

    def _absorb(self, h: np.ndarray, vals: np.ndarray) -> None:
        allh = np.concatenate([self._hashes, h])
        allv = np.concatenate([self._values, np.asarray(vals, dtype=object)])
        allh, idx = np.unique(allh, return_index=True)
        allv = allv[idx]
        if len(allh) > self.k:
            keep = np.argpartition(allh, self.k - 1)[: self.k]
            keep.sort()
            allh, allv = allh[keep], allv[keep]
        order = np.argsort(allh)
        self._hashes = allh[order]
        self._values = allv[order]

    def merge(self, other: "BottomKSample") -> "BottomKSample":
        if other.k != self.k:
            raise ValueError("cannot merge bottom-k samples of different k")
        self._absorb(other._hashes, other._values)
        return self

    def sample(self) -> list:
        return list(self._values)

    def distinct_estimate(self) -> float:
        """KMV estimator: (k-1)/h_k; exact len() when undersaturated."""
        n = len(self._hashes)
        if n < self.k:
            return float(n)
        hk = float(self._hashes[-1]) / float(1 << 64)
        return (self.k - 1) / hk if hk > 0 else float(n)

    # -------------------------------------------------------------- #
    # KMV set operations (corpus-overlap estimation)
    # -------------------------------------------------------------- #

    def union_estimate(self, other: "BottomKSample") -> float:
        """Distinct count of the union (KMV over merged sketches)."""
        merged = BottomKSample(self.k)
        merged._absorb(self._hashes, self._values)
        merged._absorb(other._hashes, other._values)
        return merged.distinct_estimate()

    def intersection_estimate(self, other: "BottomKSample") -> float:
        """Distinct count of the intersection (Beyer et al., SIGMOD 2007):
        among the union's bottom-k hashes, the fraction present in both
        sketches estimates the Jaccard similarity; scale by the union
        estimate."""
        if other.k != self.k:
            raise ValueError("sketches must share k")
        merged = BottomKSample(self.k)
        merged._absorb(self._hashes, self._values)
        merged._absorb(other._hashes, other._values)
        mh = merged._hashes
        common = np.intersect1d(self._hashes, other._hashes,
                                assume_unique=True)
        in_both = np.isin(mh, common).sum()
        if len(mh) == 0:
            return 0.0
        jaccard = in_both / len(mh)
        return jaccard * merged.distinct_estimate()

    def jaccard_estimate(self, other: "BottomKSample") -> float:
        u = self.union_estimate(other)
        if u == 0:
            return 1.0
        return self.intersection_estimate(other) / u

    def __eq__(self, other):
        return (
            isinstance(other, BottomKSample)
            and self.k == other.k
            and bool(np.array_equal(self._hashes, other._hashes))
        )

    def to_bytes(self) -> bytes:
        return pickle.dumps((1, self.k, self._hashes.tobytes(),
                             list(self._values)))

    @classmethod
    def from_bytes(cls, b: bytes) -> "BottomKSample":
        ver, k, hb, vals = pickle.loads(b)
        if ver != 1:
            raise ValueError("unsupported bottom-k serialization version")
        s = cls(k)
        s._hashes = np.frombuffer(hb, dtype=np.uint64).copy()
        s._values = np.asarray(vals, dtype=object)
        return s
