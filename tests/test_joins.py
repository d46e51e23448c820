"""Broadcast map-side join (stages/joins.py)."""
import pyarrow as pa
import pytest
import ray

from tdigest_ray.stages.joins import broadcast_join


def _fact():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 2, 99, None], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 40.0, 50.0, 60.0]),
    }))


DIM = pa.table({
    "k": pa.array([1, 2, 3], pa.int64()),
    "name": pa.array(["a", "b", "c"]),
    "extra": pa.array([100, 200, 300], pa.int64()),
})


class TestBroadcastJoin:
    def test_inner(self):
        df = broadcast_join(_fact(), DIM, "k").to_pandas().sort_values(
            ["k", "v"]).reset_index(drop=True)
        assert df["k"].tolist() == [1, 2, 2, 3]
        assert df["name"].tolist() == ["a", "b", "b", "c"]
        assert df["extra"].tolist() == [100, 200, 200, 300]

    def test_left_keeps_unmatched_with_nulls(self):
        df = broadcast_join(_fact(), DIM, "k", how="left").to_pandas()
        assert len(df) == 6
        miss = df[~df["k"].isin([1, 2, 3])]
        assert miss["name"].isna().all()

    def test_column_selection_and_key_rename(self):
        dim = DIM.rename_columns(["dk", "name", "extra"])
        df = broadcast_join(_fact(), dim, "k", "dk",
                            columns=["name"]).to_pandas()
        assert "extra" not in df.columns and "name" in df.columns

    def test_dataset_dimension_side(self):
        df = broadcast_join(_fact(), ray.data.from_arrow(DIM),
                            "k").to_pandas()
        assert len(df) == 4

    def test_nonunique_key_raises(self):
        bad = pa.table({"k": pa.array([1, 1], pa.int64()),
                        "name": pa.array(["x", "y"])})
        with pytest.raises(ValueError, match="not unique"):
            broadcast_join(_fact(), bad, "k")

    def test_missing_column_raises(self):
        with pytest.raises(ValueError, match="lacks columns"):
            broadcast_join(_fact(), DIM, "k", columns=["nope"])

    def test_chained(self):
        d2 = pa.table({"name": pa.array(["a", "b", "c"]),
                       "upper": pa.array(["A", "B", "C"])})
        out = broadcast_join(
            broadcast_join(_fact(), DIM, "k"), d2, "name").to_pandas()
        assert sorted(out["upper"]) == ["A", "B", "B", "C"]
