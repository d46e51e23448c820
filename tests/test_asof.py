"""As-of backward join (stages/asof.py) vs a brute-force reference."""
import numpy as np
import pyarrow as pa
import pytest
import ray

from tdigest_ray.stages.asof import asof_join

# left: (eid, key, ts)
LEFT = [
    (0, 1, 100), (1, 1, 200), (2, 1, 50),
    (3, 2, 100), (4, 2, 300),
    (5, 3, 100),              # key with no right rows
    (6, 1, 150),
]
# right: (key, ts, val)
RIGHT = [
    (1, 100, "a"),            # ties left eid=0 exactly -> inclusive match
    (1, 140, "b"),
    (2, 100, "c"), (2, 100, "d"),  # tied right rows: last-in-order wins
    (2, 250, "e"),
]


def _l():
    return ray.data.from_arrow(pa.table({
        "eid": pa.array([r[0] for r in LEFT], pa.int64()),
        "k": pa.array([r[1] for r in LEFT], pa.int64()),
        "ts": pa.array([r[2] for r in LEFT], pa.int64()),
    }))


def _r():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([r[0] for r in RIGHT], pa.int64()),
        "ts": pa.array([r[1] for r in RIGHT], pa.int64()),
        "val": pa.array([r[2] for r in RIGHT]),
    }))


def _ref():
    out = {}
    for eid, k, t in LEFT:
        best = None
        for rk, rt, rv in RIGHT:  # input order; later ties overwrite
            if rk == k and rt <= t and (best is None or rt >= best[0]):
                best = (rt, rv)
        out[eid] = best
    return out


class TestAsofJoin:
    def test_matches_reference(self):
        df = asof_join(_l(), _r(), "k", "ts",
                       ["val"]).to_pandas().set_index("eid")
        ref = _ref()
        assert len(df) == len(LEFT)
        for eid, best in ref.items():
            row = df.loc[eid]
            if best is None:
                assert row.isna()["val_r"] and row.isna()["ts_r"]
            else:
                assert (row["ts_r"], row["val_r"]) == best, (eid, best)

    def test_inclusive_tie_and_right_tie_winner(self):
        df = asof_join(_l(), _r(), "k", "ts",
                       ["val"]).to_pandas().set_index("eid")
        assert df.loc[0]["val_r"] == "a"      # ts == ts -> matches
        assert df.loc[3]["val_r"] == "d"      # tied rights: last wins
        assert df.loc[2].isna()["val_r"]      # before any right row

    def test_suffix_collision_raises(self):
        left = _l()
        bad = left.map_batches(
            lambda b: b.append_column("val_r", b.column("eid")),
            batch_format="pyarrow")
        with pytest.raises(ValueError, match="collide"):
            asof_join(bad, _r(), "k", "ts", ["val"])

    def test_block_layout_invariance(self):
        lt = pa.table({
            "eid": pa.array([r[0] for r in LEFT], pa.int64()),
            "k": pa.array([r[1] for r in LEFT], pa.int64()),
            "ts": pa.array([r[2] for r in LEFT], pa.int64())})
        parts = [lt.slice(0, 0), lt.slice(0, 3), lt.slice(3, 4)]
        a = asof_join(ray.data.from_arrow(parts), _r(), "k", "ts",
                      ["val"]).to_pandas().sort_values("eid").reset_index(
            drop=True)
        b = asof_join(_l(), _r(), "k", "ts",
                      ["val"]).to_pandas().sort_values("eid").reset_index(
            drop=True)
        assert a.equals(b)


def test_ts_in_value_cols_raises():
    """The matched timestamp is always ts_col+suffix (int64 us); asking
    for the right ts as a value column would be silently overwritten
    (reported by review) — raise instead."""
    with pytest.raises(ValueError, match="value_cols must not contain"):
        asof_join(_l(), _r(), "k", "ts", ["ts", "val"])
