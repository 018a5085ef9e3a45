"""Column profiler (functions/profile.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.functions.profile import profile_columns


def test_profile_counts_nulls_empties_lengths(ray_session):
    df = pd.DataFrame({
        "a": ["xy", None, "", "abcd", None, "z"],
        "b": [None] * 6,
    })
    got = profile_columns(rd.from_pandas(df).repartition(3), ["a", "b"])
    a = got[got["column"] == "a"].iloc[0]
    assert (a["n_rows"], a["n_nulls"], a["n_empty"]) == (6, 2, 1)
    assert (a["min_len"], a["max_len"], a["sum_len"]) == (0, 4, 7)
    assert abs(a["avg_len"] - 7 / 4) < 1e-12
    b = got[got["column"] == "b"].iloc[0]
    assert (b["n_nulls"], b["min_len"], b["max_len"], b["avg_len"]) == (6, 0, 0, 0.0)


def test_profile_min_ignores_allnull_blocks(ray_session):
    # one block entirely null must not force min_len to 0
    df = pd.DataFrame({"a": ["abc", "defg"]})
    nulls = pd.DataFrame({"a": pd.array([None, None], dtype="string")})
    ds = rd.from_pandas(df).union(rd.from_pandas(nulls))
    got = profile_columns(ds, ["a"])
    row = got.iloc[0]
    assert (row["n_rows"], row["n_nulls"]) == (4, 2)
    assert (row["min_len"], row["max_len"]) == (3, 4)
