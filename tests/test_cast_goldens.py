"""cast.sql golden parity: tdigest(i/1000.0, comp) over i=1..1000 must
reproduce the reference's exact centroid layout (test/expected/cast.out) —
this pins the full multi-compaction pipeline (buffer boundaries, direction
alternation, k2 merge criterion) against the C implementation bit-for-bit
at the centroid-count level and to print precision on means."""

import json

import numpy as np

from tdigest_ray.functions import serde
from tdigest_ray.sketches.tdigest import TDigest

VALUES = np.arange(1, 1001, dtype=np.float64) / 1000.0

# (compression, means, counts) from test/expected/cast.out
GOLDENS = [
    (
        10,
        [0.001, 0.002, 0.0045, 0.013, 0.0405, 0.135, 0.464, 0.793, 0.916,
         0.9795, 0.996, 0.999, 1],
        [1, 1, 4, 13, 42, 147, 511, 147, 99, 28, 5, 1, 1],
    ),
    (
        25,
        [0.001, 0.002, 0.003, 0.0055, 0.012, 0.0265, 0.0575, 0.115, 0.232,
         0.472, 0.727, 0.8775, 0.949, 0.9765, 0.9915, 0.997, 0.999, 1],
        [1, 1, 1, 4, 9, 20, 42, 73, 161, 319, 191, 110, 33, 22, 8, 3, 1, 1],
    ),
    (
        100,
        [0.001, 0.002, 0.003, 0.004, 0.005, 0.006, 0.0075, 0.01, 0.0135,
         0.018, 0.0245, 0.034, 0.047, 0.065, 0.09, 0.1245, 0.171, 0.2315,
         0.3075, 0.3985, 0.501, 0.6035, 0.6945, 0.7705, 0.831, 0.8775,
         0.912, 0.937, 0.955, 0.968, 0.9775, 0.984, 0.9885, 0.992, 0.9945,
         0.996, 0.997, 0.998, 0.999, 1],
        [1, 1, 1, 1, 1, 1, 2, 3, 4, 5, 8, 11, 15, 21, 29, 40, 53, 68, 84,
         98, 107, 98, 84, 68, 53, 40, 29, 21, 15, 11, 8, 5, 4, 3, 2, 1, 1,
         1, 1, 1],
    ),
]


def build(comp: int) -> TDigest:
    d = TDigest(comp)
    d.add_many(VALUES)
    d.compress()
    return d


class TestCastGoldens:
    def test_centroid_counts_exact(self):
        for comp, _means, counts in GOLDENS:
            d = build(comp)
            assert d.centroids()[1].tolist() == counts, comp

    def test_centroid_means_to_print_precision(self):
        for comp, means, _counts in GOLDENS:
            d = build(comp)
            got = d.centroids()[0]
            np.testing.assert_allclose(got, means, atol=5e-5)

    def test_json_cast_matches_golden_structure(self):
        comp, means, counts = GOLDENS[0]
        js = json.loads(serde.to_json(build(comp)))
        assert js["flags"] == 1
        assert js["compression"] == 10
        assert js["centroids"] == 13
        assert js["count"] == counts  # python json keeps last "count" key
        np.testing.assert_allclose(js["mean"], means, atol=5e-5)

    def test_array_cast_matches_golden_layout(self):
        comp, means, counts = GOLDENS[0]
        arr = serde.to_array(build(comp))
        assert list(arr[:4]) == [1.0, 1000.0, 10.0, 13.0]
        np.testing.assert_allclose(arr[4::2], means, atol=5e-5)
        assert arr[5::2].astype(int).tolist() == counts
