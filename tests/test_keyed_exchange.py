"""Unit parity of direct_bucket_groups vs Ray's groupby().map_groups."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.keyed import bucketed_groups, direct_bucket_groups


def _mkds(n=5000, keys=137, blocks=7):
    rng = np.random.default_rng(11)
    t = pa.table(
        {
            "k": pa.array(rng.integers(0, keys, size=n).astype(np.int64)),
            "v": pa.array(rng.normal(size=n)),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def _make_sum_per_key():
    """Factory: nested functions pickle BY VALUE, so workers need not
    import this (unimportable) test module."""

    def _sum_per_key(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("k", as_index=False).agg(
            s=("v", "sum"), n=("v", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return _sum_per_key


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["s"] = df["s"].round(9)
    return df.sort_values("k").reset_index(drop=True)


def test_direct_matches_alltoall_path(ray_session, monkeypatch):
    ds = _mkds()
    monkeypatch.setenv("ETL_RAY_GROUP_EXCHANGE", "direct")
    got = _norm(bucketed_groups(ds, "k", _make_sum_per_key()).to_pandas())
    monkeypatch.setenv("ETL_RAY_GROUP_EXCHANGE", "sort")
    want = _norm(bucketed_groups(_mkds(), "k", _make_sum_per_key()).to_pandas())
    pd.testing.assert_frame_equal(got[["k", "s", "n"]], want[["k", "s", "n"]])


def test_one_call_per_bucket_and_no_bucket_leak(ray_session):
    """group_fn must see whole single buckets without the _bucket col —
    identical to map_groups semantics."""
    ds = _mkds(n=800, keys=50, blocks=5)

    sum_per_key = _make_sum_per_key()

    def check(t: pa.Table) -> pa.Table:
        assert "_bucket" not in t.column_names
        # all rows of any key present in this call are complete: verified
        # downstream by summing counts to the global per-key counts
        return sum_per_key(t)

    out = bucketed_groups(ds, "k", check).to_pandas()
    # a key must appear exactly ONCE across all calls (whole-group routing)
    assert not out["k"].duplicated().any()
    assert int(out["n"].sum()) == 800


def test_direct_exchange_pandas_fn_output(ray_session):
    """group_fns may return pandas frames (map_groups tolerated that)."""
    ds = _mkds(n=300, keys=10, blocks=3)

    def fn(t: pa.Table):
        return t.to_pandas().groupby("k", as_index=False).agg(n=("v", "size"))

    out = bucketed_groups(ds, "k", fn).to_pandas()
    assert int(out["n"].sum()) == 300


def test_direct_exchange_empty_dataset(ray_session):
    ds = rd.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.float64())})
    )
    out = bucketed_groups(ds, "k", _make_sum_per_key()).to_pandas()
    assert len(out) == 0


def test_direct_exchange_pandas_blocks(ray_session):
    """Upstream pandas-format blocks are converted, not crashed on."""
    ds = _mkds(n=400, keys=20, blocks=4).map_batches(
        lambda df: df, batch_format="pandas"
    )

    def add_bucket_pd(df):  # keep the block pandas-typed into the exchange
        df = df.copy()
        df["_bucket"] = (df["k"] % 8).astype("int32")
        return df

    mapped = ds.map_batches(add_bucket_pd, batch_format="pandas")
    out = direct_bucket_groups(mapped, "_bucket", 8, _make_sum_per_key()).to_pandas()
    assert int(out["n"].sum()) == 400
