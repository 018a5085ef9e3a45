"""Unit tests for the large-large shuffle join and the repair fold."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from etl_ray.stages.joins import shuffle_join
from etl_ray.stages.repair import repair_hold_last


def test_shuffle_join_matches_pandas(ray_session):
    rng = np.random.default_rng(11)
    left = pd.DataFrame({"k": rng.integers(0, 50, 400), "lv": rng.normal(size=400)})
    right = pd.DataFrame({"k": np.arange(0, 60), "rv": np.arange(0, 60) * 10})
    got = (
        shuffle_join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", n_buckets=8
        )
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    want = left.merge(right, on="k", how="inner").sort_values(["k", "lv"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert np.allclose(got["lv"], want["lv"])
    assert np.allclose(got["rv"], want["rv"])


def test_shuffle_join_left_keeps_unmatched(ray_session):
    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"k": [2], "rv": ["x"]})
    got = (
        shuffle_join(rd.from_pandas(left), rd.from_pandas(right), on="k", how="left")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert len(got) == 3
    assert got.loc[got["k"] == 2, "rv"].iloc[0] == "x"
    assert got.loc[got["k"] == 1, "rv"].isna().all()


def test_shuffle_join_rejects_collisions_and_missing_key(ray_session):
    a = rd.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
    b = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    with pytest.raises(ValueError, match="collision"):
        shuffle_join(a, b, on="k")
    with pytest.raises(ValueError, match="missing"):
        shuffle_join(a, b, on="nope")


def test_repair_hold_last_sequential_semantics():
    # repaired value feeds the NEXT comparison (mutation during scan):
    # [0, 200, 210, 5] with jump 100: 200 repaired->0; 210 vs 0 -> 0;
    # 5 vs 0 ok -> last good becomes 5
    v = np.array([0.0, 200.0, 210.0, 5.0])
    rep = repair_hold_last(v, np.array([0]), np.array([4]), max_jump=100.0)
    assert rep.tolist() == [0.0, 0.0, 0.0, 5.0]


def test_repair_clean_key_fast_path_is_zero_copy_equal():
    v = np.array([0.0, 10.0, 20.0, 25.0])
    rep = repair_hold_last(v, np.array([0]), np.array([4]), max_jump=100.0)
    assert rep.tolist() == v.tolist()


def test_repair_multiple_segments_isolated():
    # two keys: second key's first value never compared with first key's
    v = np.array([0.0, 500.0, 1000.0, 1010.0])
    rep = repair_hold_last(v, np.array([0, 2]), np.array([2, 4]), max_jump=100.0)
    assert rep.tolist() == [0.0, 0.0, 1000.0, 1010.0]


def test_shuffle_join_outer_keeps_both_sides(ray_session):
    """Full outer: unmatched rows survive from BOTH sides, matched keys
    pair exactly once, integers stay exact (nullable Int64)."""
    left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64),
                         "lv": np.array([10, 20, 30], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([2, 4], dtype=np.int64),
                          "rv": np.array([200, 400], dtype=np.int64)})
    got = (
        shuffle_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="k", how="outer", n_buckets=4)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    assert got["k"].tolist() == [1, 2, 3, 4]
    assert got.loc[got["k"] == 2, "lv"].iloc[0] == 20
    assert got.loc[got["k"] == 2, "rv"].iloc[0] == 200
    assert got.loc[got["k"] == 4, "lv"].isna().all()
    assert got.loc[got["k"] == 1, "rv"].isna().all()
    # declared integer dtypes restored (not float64-widened)
    assert str(got["lv"].dtype) == "Int64"
    assert str(got["rv"].dtype) == "Int64"


def test_shuffle_join_outer_rejects_salting(ray_session):
    left = pd.DataFrame({"k": [1], "lv": [1]})
    right = pd.DataFrame({"k": [1], "rv": [2]})
    with pytest.raises(ValueError, match="salt_threshold"):
        shuffle_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="k", how="outer", salt_threshold=10)
