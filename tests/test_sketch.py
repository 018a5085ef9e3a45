"""Sketch operators: KMV estimate accuracy, quantile exactness."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from etl_ray.functions.sketch import histogram_quantiles, kmv_distinct


def test_kmv_estimate_within_relative_error(ray_session):
    true_distinct = 5000
    rng = np.random.default_rng(3)
    keys = rng.choice(
        np.arange(10_000, 10_000 + true_distinct, dtype=np.int64),
        size=40_000,
    )
    ds = rd.from_arrow(pa.table({"uid": pa.array(keys)})).repartition(8)
    out = kmv_distinct(ds, "uid", k=256)
    est = float(out["est_distinct"].iloc[0])
    # KMV relative stderr ≈ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est - true_distinct) / true_distinct < 0.25
    assert int(out["k_used"].iloc[0]) == 256


def test_kmv_small_domain_is_exact(ray_session):
    keys = np.arange(20, dtype=np.int64).repeat(30)
    ds = rd.from_arrow(pa.table({"uid": pa.array(keys)})).repartition(4)
    out = kmv_distinct(ds, "uid", k=64)
    # fewer distinct hashes than k → exact count (modulo hash collisions,
    # none in a 20-key domain)
    assert int(out["k_used"].iloc[0]) == 20
    assert float(out["est_distinct"].iloc[0]) == 20.0


def test_histogram_quantiles_match_numpy_disc(ray_session):
    rng = np.random.default_rng(9)
    v = rng.normal(50, 10, size=20_000)
    ds = rd.from_arrow(pa.table({"value": pa.array(v)})).repartition(6)
    out = histogram_quantiles(ds, "value")
    mv = np.sign(v * 1000.0) * np.floor(np.abs(v * 1000.0) + 0.5)
    mv = np.sort(mv.astype(np.int64))
    for _, row in out.iterrows():
        rank = int(np.ceil(row["q"] * len(mv)))
        assert int(row["mv_q"]) == int(mv[rank - 1]), row["q"]


def test_cm_sketch_upper_bound_and_exactness(ray_session):
    """CM estimate is an upper bound on the true count, exact when the
    key's cells are collision-free (guaranteed here: domain ≪ width)."""
    from etl_ray.functions.sketch import cm_build, cm_estimate

    rng = np.random.default_rng(5)
    keys = rng.integers(0, 40, 5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(keys)})).repartition(6)
    sk = cm_build(ds, "k", depth=4, width=2048)
    probes = np.arange(40, dtype=np.int64)
    est = cm_estimate(sk, probes)
    true = np.bincount(keys, minlength=40)
    assert (est >= true).all()
    # 40 keys into 4 independent rows of 2048 cells: min across rows is
    # exact unless a key collides in EVERY row (p ≈ (40/2048)^4)
    assert (est == true).all()
    # total mass per row equals the event count
    assert (sk.sum(axis=1) == len(keys)).all()


def test_grouped_kmv_exact_below_k(ray_session):
    """Groups with < k distinct values report exact counts."""
    import pandas as pd

    from etl_ray.functions.sketch import grouped_kmv_distinct

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.choice(["x", "y"], 4000),
        "v": rng.integers(0, 30, 4000).astype(np.int64),
    })
    got = grouped_kmv_distinct(
        rd.from_pandas(df).repartition(5), "g", "v", k=64
    ).sort_values("g").reset_index(drop=True)
    want = df.groupby("g")["v"].nunique()
    assert got["k_used"].tolist() == [want["x"], want["y"]]
    assert got["est_distinct"].tolist() == [float(want["x"]), float(want["y"])]

def test_hll_estimate_within_relative_error(ray_session):
    from etl_ray.functions.sketch import hll_distinct

    true_distinct = 20_000
    rng = np.random.default_rng(11)
    keys = rng.choice(
        np.arange(5, 5 + true_distinct, dtype=np.int64), size=80_000
    )
    ds = rd.from_arrow(pa.table({"uid": pa.array(keys)})).repartition(8)
    out = hll_distinct(ds, "uid")
    est = float(out["est_distinct"].iloc[0])
    # p=9 → stderr ≈ 1.04/sqrt(512) ≈ 4.6%; allow 4 sigma
    assert abs(est - true_distinct) / true_distinct < 0.2
    assert int(out["m"].iloc[0]) == 512


def test_hll_partition_invariance_and_linear_counting(ray_session):
    """The register fold is associative: the sketch is identical at any
    partition count, and a tiny domain lands in the linear-counting
    branch with a near-exact estimate."""
    from etl_ray.functions.sketch import hll_distinct

    keys = np.arange(50, dtype=np.int64).repeat(40)
    ds1 = rd.from_arrow(pa.table({"uid": pa.array(keys)})).repartition(1)
    ds7 = rd.from_arrow(pa.table({"uid": pa.array(keys)})).repartition(7)
    a, b = hll_distinct(ds1, "uid"), hll_distinct(ds7, "uid")
    assert a["n_zero"].iloc[0] == b["n_zero"].iloc[0]
    assert a["est_distinct"].iloc[0] == b["est_distinct"].iloc[0]
    assert abs(float(a["est_distinct"].iloc[0]) - 50) < 5
