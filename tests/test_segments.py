"""Golden-fixture test for the segment-materialization operator — the
analog of the reference's trajectory-construction golden test
(``tests/trajectory_construction_test.py:118-136``: a known ferry stream
→ exactly 1 moving + 2 stopped segments with pinned attributes)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.segments import ModeSpec, materialize_segments


def _stream():
    """One user, 9 events forming exactly 3 segments:

    seg 0: t=0,5,10 min    values 1.0, 1.0, 2.0   types a, b, b
    seg 1: t=60,65 min     values 3.5, 3.5        types a, a   (gap 50')
    seg 2: t=200 min       value  -1.25           type  c      (gap 135')
    """
    base = pd.Timestamp("2024-01-01")
    mins = [0, 5, 10, 60, 65, 200]
    vals = [1.0, 1.0, 2.0, 3.5, 3.5, -1.25]
    types = ["a", "b", "b", "a", "a", "c"]
    t = pa.table(
        {
            "user_id": pa.array([7] * 6, pa.int64()),
            "ts": pa.array([base + pd.Timedelta(minutes=m) for m in mins],
                           pa.timestamp("us")),
            "event_id": pa.array(list(range(6)), pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "vbin": pa.array([0.0, np.nan, 2.0, 3.0, np.nan, 1.0], pa.float64()),
        }
    )
    return t


def test_segments_golden_fixture(ray_session):
    ds = rd.from_arrow(_stream())
    out = (
        materialize_segments(
            ds,
            key_col="user_id",
            ts_col="ts",
            order_cols=["ts", "event_id"],
            gap=pd.Timedelta(minutes=30),
            value_col="value",
            mode_specs=[
                ModeSpec("event_type", "mode_event_type", "exclude"),
                ModeSpec("vbin", "mode_vbin_excl", "exclude"),
                ModeSpec("vbin", "mode_vbin_incl", "sentinel", sentinel=-1.0),
            ],
        )
        .to_pandas()
        .sort_values("seg")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert out["n_events"].tolist() == [3, 2, 1]
    base = pd.Timestamp("2024-01-01")
    assert out["start_ts"].tolist() == [base, base + pd.Timedelta(minutes=60),
                                        base + pd.Timedelta(minutes=200)]
    assert out["end_ts"].tolist() == [base + pd.Timedelta(minutes=10),
                                      base + pd.Timedelta(minutes=65),
                                      base + pd.Timedelta(minutes=200)]
    # mode ties broken by smallest value; NA policies differ per column
    assert out["mode_event_type"].tolist() == ["b", "a", "c"]
    # seg0 vbin non-null {0.0, 2.0} -> tie -> 0.0; incl-NA has one NaN->-1
    assert out["mode_vbin_excl"].tolist() == [0.0, 3.0, 1.0]
    assert out["mode_vbin_incl"].tolist() == [-1.0, -1.0, 1.0]
    # compressed sequences: consecutive dups dropped, v as millis@epoch_us
    e = lambda m: int((base + pd.Timedelta(minutes=m)).value // 1000)
    assert out["value_seq"].tolist() == [
        f"1000@{e(0)}|2000@{e(10)}",
        f"3500@{e(60)}",
        f"-1250@{e(200)}",
    ]


def test_segments_multi_user_bucketing(ray_session):
    """Many keys across buckets: per-key segment ordinals restart at 0 and
    no key leaks across buckets."""
    rng = np.random.default_rng(3)
    n_users, per = 40, 6
    base = pd.Timestamp("2024-06-01")
    rows = {
        "user_id": np.repeat(np.arange(n_users), per),
        "ts": [base + pd.Timedelta(minutes=int(m))
               for u in range(n_users)
               for m in np.cumsum(rng.choice([5, 45], size=per))],
        "event_id": np.arange(n_users * per),
        "event_type": np.tile(["x", "y", "x", "z", "y", "x"], n_users),
        "value": rng.normal(size=n_users * per).round(3),
        "vbin": np.tile([1.0, 2.0, np.nan, 1.0, 3.0, 2.0], n_users),
    }
    t = pa.table({k: pa.array(v) for k, v in rows.items()})
    out = materialize_segments(
        rd.from_arrow(t), "user_id", "ts", ["ts", "event_id"],
        pd.Timedelta(minutes=30), "value",
        [ModeSpec("event_type", "mode_event_type", "exclude")],
        n_buckets=8,
    ).to_pandas()
    # every user present; ordinals contiguous from 0; events conserved
    assert set(out["user_id"]) == set(range(n_users))
    for u, g in out.groupby("user_id"):
        assert sorted(g["seg"]) == list(range(len(g)))
    assert out["n_events"].sum() == n_users * per
