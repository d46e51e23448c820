"""The reference's 50-row <value,count> fixture (value_count_api.sql:30-81):
counts up to 47 billion exercise the int64 paths and the tdigest_generate
fast path end-to-end; the reference's own answer for p95 is 33.345213
(value_count_api.out:83)."""

import numpy as np
import pyarrow as pa
import ray

from tdigest_ray.aggregates import TDigestWeightedPercentile
from tdigest_ray.sketches.tdigest import TDigest

# (count, value) exactly as in the reference fixture
FIXTURE = [
    (47325940488, 1), (15457695432, 2), (6889790700, 3), (4188763788, 4),
    (2882932224, 5), (2114815860, 6), (1615194324, 7), (2342114568, 9),
    (1626471924, 11), (1660755408, 14), (1143728292, 17), (1082582424, 21),
    (911488284, 26), (728863908, 32), (654898692, 40), (530198076, 50),
    (417883440, 62), (341452344, 77), (274579584, 95), (231921120, 118),
    (184091820, 146), (152469828, 181), (125634972, 224), (107059704, 278),
    (88746120, 345), (73135668, 428), (61035756, 531), (50683320, 658),
    (42331824, 816), (35234400, 1012), (29341356, 1255), (24290928, 1556),
    (20284668, 1929), (17215908, 2391), (14737488, 2964), (12692772, 3674),
    (11220732, 4555), (9787584, 5647), (8148420, 7000), (6918612, 8678),
    (6015000, 10758), (5480316, 13336), (5443356, 16532), (4535616, 20494),
    (3962316, 25406), (3914484, 31495), (3828108, 39043), (3583536, 48400),
    (4104120, 60000), (166024740, 2147483647),
]
REFERENCE_P95 = 33.3452131657954  # value_count_api.out:83
TOTAL = sum(c for c, _ in FIXTURE)


def exact_weighted_quantile(p: float) -> float:
    pairs = sorted((v, c) for c, v in FIXTURE)
    goal = p * TOTAL
    acc = 0
    for v, c in pairs:
        acc += c
        if acc >= goal:
            return float(v)
    return float(pairs[-1][0])


class TestWeightedFixture:
    def test_core_matches_reference_answer(self):
        d = TDigest(100)
        for c, v in FIXTURE:
            d.add(float(v), int(c))
        assert d.count == TOTAL  # int64 count conservation at ~83 billion
        p95 = d.quantile(0.95)
        # same algorithm as the reference -> near-identical answer
        assert abs(p95 - REFERENCE_P95) / REFERENCE_P95 < 0.05, p95
        # value-space comparison is meaningless on gappy discrete data;
        # the proper metric is rank error of the estimate, and it is tiny
        rank = sum(c for c, v in FIXTURE if v <= p95) / TOTAL
        assert abs(rank - 0.95) < 0.011
        # extremes exact, tails tight
        assert d.quantile(0.0) == 1.0
        assert d.quantile(1.0) == 2147483647.0
        qs = d.quantile(np.arange(1, 100) / 100.0)
        assert (np.diff(qs) >= 0).all()

    def test_distributed_weighted_agg(self):
        tbl = pa.table(
            {
                "v": pa.array([float(v) for c, v in FIXTURE]),
                "c": pa.array([int(c) for c, v in FIXTURE], pa.int64()),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(5)
        out = ds.aggregate(
            TDigestWeightedPercentile("v", "c", 0.95, 100, alias_name="p95"))
        assert abs(out["p95"] - REFERENCE_P95) / REFERENCE_P95 < 0.2

    def test_cdf_on_weighted(self):
        d = TDigest(100)
        for c, v in FIXTURE:
            d.add(float(v), int(c))
        # ~56% of all weight sits at value 1 -> rank of 1.0 is its midpoint
        w1 = FIXTURE[0][0] / TOTAL
        assert abs(d.cdf(1.0) - w1 / 2) < 0.05
        assert d.cdf(3e9) == 1.0
