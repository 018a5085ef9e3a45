"""Interval (range) join — stages/interval.py vs brute-force oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.interval import interval_agg_join, interval_join


def _brute_pairs(pts: pd.DataFrame, ivs: pd.DataFrame, pc_, sc, ec):
    out = []
    for _, iv in ivs.iterrows():
        m = pts[(pts[pc_] >= iv[sc]) & (pts[pc_] < iv[ec])]
        for _, p in m.iterrows():
            out.append({**p.to_dict(), **iv.to_dict()})
    return pd.DataFrame(out)


def _case(seed: int, n_pts: int, n_ivs: int, span: int):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame(
        {
            "v": rng.integers(0, span, n_pts).astype(np.int64),
            "pid": np.arange(n_pts, dtype=np.int64),
            "val": rng.integers(-50, 50, n_pts).astype(np.int64),
        }
    )
    s = rng.integers(0, span, n_ivs).astype(np.int64)
    # mix of short, long (multi-bucket) and empty (e <= s) intervals
    length = rng.choice([0, 3, 17, span // 2], n_ivs)
    ivs = pd.DataFrame(
        {
            "s": s,
            "e": s + length,
            "iid": np.arange(n_ivs, dtype=np.int64),
        }
    )
    return pts, ivs


def test_pairs_match_brute_force(ray_session):
    pts, ivs = _case(7, 400, 60, 200)
    got = (
        interval_join(
            rd.from_pandas(pts),
            rd.from_pandas(ivs),
            point_col="v",
            start_col="s",
            end_col="e",
            width=16,
            n_buckets=8,
            schemas=(
                pa.Schema.from_pandas(pts),
                pa.Schema.from_pandas(ivs),
            ),
        )
        .to_pandas()
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )
    want = (
        _brute_pairs(pts, ivs, "v", "s", "e")[got.columns]
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
        .astype({c: "int64" for c in got.columns})
    )
    pd.testing.assert_frame_equal(got, want)


def test_agg_matches_brute_force(ray_session):
    pts, ivs = _case(11, 600, 40, 150)
    got = (
        interval_agg_join(
            rd.from_pandas(pts),
            rd.from_pandas(ivs),
            point_col="v",
            start_col="s",
            end_col="e",
            id_cols=["iid"],
            sum_cols=["val"],
            width=8,
            n_buckets=8,
            schemas=(
                pa.Schema.from_pandas(pts),
                pa.Schema.from_pandas(ivs),
            ),
        )
        .sort_values("iid")
        .reset_index(drop=True)
    )
    bp = _brute_pairs(pts, ivs, "v", "s", "e")
    want = (
        bp.groupby("iid", as_index=False)
        .agg(n_points=("pid", "size"), sum_val=("val", "sum"))
        .astype("int64")
        .sort_values("iid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["iid", "n_points", "sum_val"]], want)


def test_no_matches_keeps_schema(ray_session):
    pts = pd.DataFrame({"v": np.array([5, 6], dtype=np.int64),
                        "pid": np.array([0, 1], dtype=np.int64)})
    ivs = pd.DataFrame({"s": np.array([100], dtype=np.int64),
                        "e": np.array([110], dtype=np.int64),
                        "iid": np.array([0], dtype=np.int64)})
    schemas = (pa.Schema.from_pandas(pts), pa.Schema.from_pandas(ivs))
    pairs_ds = interval_join(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        point_col="v", start_col="s", end_col="e",
        width=8, n_buckets=4, schemas=schemas,
    )
    # Dataset.to_pandas() drops columns on an EMPTY dataset (keyed.py
    # note) — the schema is where the typed-empty guarantee lives
    assert pairs_ds.count() == 0
    assert pairs_ds.schema().names == ["v", "pid", "s", "e", "iid"]
    agg = interval_agg_join(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        point_col="v", start_col="s", end_col="e",
        id_cols=["iid"], width=8, n_buckets=4, schemas=schemas,
    )
    assert len(agg) == 0
    assert set(agg.columns) == {"iid", "n_points"}


def test_domain_spanning_interval_dedupes_replicas(ray_session):
    """An interval covering every bucket (replication capped at B) still
    counts each point exactly once."""
    pts = pd.DataFrame({"v": np.arange(100, dtype=np.int64),
                        "pid": np.arange(100, dtype=np.int64)})
    ivs = pd.DataFrame({"s": np.array([0], dtype=np.int64),
                        "e": np.array([100], dtype=np.int64),
                        "iid": np.array([7], dtype=np.int64)})
    agg = interval_agg_join(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        point_col="v", start_col="s", end_col="e",
        id_cols=["iid"], width=4, n_buckets=4,
        schemas=(pa.Schema.from_pandas(pts), pa.Schema.from_pandas(ivs)),
    )
    assert agg["n_points"].tolist() == [100]


def test_negative_domain_and_origin(ray_session):
    pts = pd.DataFrame({"v": np.array([-10, -3, 0, 4], dtype=np.int64),
                        "pid": np.arange(4, dtype=np.int64)})
    ivs = pd.DataFrame({"s": np.array([-5, -20], dtype=np.int64),
                        "e": np.array([5, -8], dtype=np.int64),
                        "iid": np.array([0, 1], dtype=np.int64)})
    pairs = interval_join(
        rd.from_pandas(pts), rd.from_pandas(ivs),
        point_col="v", start_col="s", end_col="e",
        width=6, origin=-24, n_buckets=4,
        schemas=(pa.Schema.from_pandas(pts), pa.Schema.from_pandas(ivs)),
    ).to_pandas()
    got = set(zip(pairs["pid"], pairs["iid"]))
    assert got == {(1, 0), (2, 0), (3, 0), (0, 1)}
