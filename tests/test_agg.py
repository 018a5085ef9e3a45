"""grouped_sum / bucketed_groups_multi (stages/agg.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.agg import bucketed_groups_multi, grouped_sum


def _partials(df: pd.DataFrame, keys: list[str], empty: pa.Table):
    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        g = t.to_pandas().groupby(keys, sort=False, as_index=False).sum()
        for c in empty.column_names:
            if c not in keys and pa.types.is_integer(empty.schema.field(c).type):
                g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g[empty.column_names], preserve_index=False)

    return rd.from_pandas(df).map_batches(partial, batch_format="pyarrow")


def test_grouped_sum_single_key(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 7, 500).astype(np.int64),
                       "v": rng.normal(size=500),
                       "n": np.ones(500, dtype=np.int64)})
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "v": pa.array([], pa.float64()),
                      "n": pa.array([], pa.int64())})
    got = grouped_sum(_partials(df, ["k"], empty), ["k"], empty, n_buckets=4)
    want = df.groupby("k", as_index=False).sum()
    got = got.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    assert (got["k"] == want["k"]).all()
    assert np.allclose(got["v"], want["v"])
    assert (got["n"] == want["n"]).all()
    assert str(got["n"].dtype) == "int64"


def test_grouped_sum_composite_key(ray_session):
    rng = np.random.default_rng(4)
    df = pd.DataFrame({"a": rng.choice(["x", "y", "z"], 300),
                       "b": rng.integers(0, 4, 300).astype(np.int64),
                       "v": rng.normal(size=300)})
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.int64()),
                      "v": pa.array([], pa.float64())})
    got = grouped_sum(_partials(df, ["a", "b"], empty), ["a", "b"], empty,
                      n_buckets=4)
    want = df.groupby(["a", "b"], as_index=False).sum()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    want = want.sort_values(["a", "b"]).reset_index(drop=True)
    assert (got["a"] == want["a"]).all() and (got["b"] == want["b"]).all()
    assert np.allclose(got["v"], want["v"])


def test_grouped_sum_all_empty_partials_keeps_schema(ray_session):
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "v": pa.array([], pa.float64())})
    ds = rd.from_arrow(empty)
    got = grouped_sum(ds, ["k"], empty, n_buckets=4)
    assert list(got.columns) == ["k", "v"]
    assert len(got) == 0


def test_bucketed_groups_multi_colocates_full_key_tuple(ray_session):
    df = pd.DataFrame({"a": ["x"] * 4 + ["y"] * 4,
                       "b": [1, 1, 2, 2] * 2,
                       "v": range(8)})
    def check(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # empty is the INPUT layout by contract
            return pa.table({"n": pa.array([], pa.int64())})
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    out = bucketed_groups_multi(
        rd.from_pandas(df), ["a", "b"], check, n_buckets=3,
        empty=pa.table({"a": pa.array([], pa.string()),
                        "b": pa.array([], pa.int64()),
                        "v": pa.array([], pa.int64())}),
    ).to_pandas()
    # every row accounted for, regardless of how tuples spread buckets
    assert out["n"].sum() == 8


def test_pivot_counts_matches_crosstab(ray_session):
    rng = np.random.default_rng(12)
    df = pd.DataFrame({
        "k": rng.integers(0, 9, 800).astype(np.int64),
        "t": rng.choice(["a", "b", "c"], 800),
    })
    from etl_ray.stages.agg import pivot_counts

    got = (
        pivot_counts(rd.from_pandas(df).repartition(5), "k", "t", ["a", "b", "c"])
        .sort_values("k").reset_index(drop=True)
    )
    want = (
        pd.crosstab(df["k"], df["t"]).reindex(columns=["a", "b", "c"], fill_value=0)
    )
    want.columns = ["n_a", "n_b", "n_c"]
    want = want.reset_index().astype("int64").sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_pivot_counts_ignores_unlisted_values(ray_session):
    df = pd.DataFrame({"k": np.array([1, 1, 2], dtype=np.int64),
                       "t": ["a", "zz", "a"]})
    from etl_ray.stages.agg import pivot_counts

    got = pivot_counts(rd.from_pandas(df), "k", "t", ["a"]).sort_values(
        "k").reset_index(drop=True)
    assert got["n_a"].tolist() == [1, 1]


def test_rolling_range_counts_tie_peers(ray_session, tmp_path):
    """RANGE window semantics: rows with EQUAL ts are peers — each
    counts all of them, including later event_ids."""
    import pyarrow.parquet as pq

    from etl_ray.pipelines.queries import rolling_user_counts

    ts = pd.to_datetime([
        "2024-01-01 00:00:00", "2024-01-01 00:30:00",
        "2024-01-01 00:30:00",  # tie with the previous row
        "2024-01-01 02:00:00",
    ])
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "ts": ts,
        "user_id": np.zeros(4, dtype=np.int64),
        "event_type": ["view"] * 4,
        "value": np.ones(4),
        "props": ["{}"] * 4,
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(sf / "events.parquet"))
    got = rolling_user_counts(str(sf))
    # row0: itself. rows 1+2: row0 + both peers = 3 EACH. row3: itself.
    assert got["n_last_hour"].tolist() == [1, 3, 3, 1]


def test_late_events_matches_sequential_scan(ray_session, tmp_path):
    """The distributed prefix-scan watermark classification equals a
    single-threaded arrival-order scan, at any bucket geometry (the
    crafted stream has heavy, bounded disorder)."""
    import pyarrow.parquet as pq

    from etl_ray.functions.sketch import _fmix32
    from etl_ray.pipelines.queries import _JITTER_SLOTS, _LATE_US, late_events

    n = 500
    rng = np.random.default_rng(4)
    base = pd.Timestamp("2024-01-01").value // 1000
    # event time mostly increasing with occasional multi-hour setbacks
    steps = rng.integers(0, 3_600_000_000, n)
    setbacks = np.where(rng.random(n) < 0.05,
                        -rng.integers(1, 40, n) * 3_600_000_000, 0)
    tsu = base + np.maximum.accumulate(np.cumsum(steps)) + setbacks
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(tsu, unit="us"),
        "user_id": rng.integers(0, 9, n).astype(np.int64),
        "event_type": ["view"] * n,
        "value": np.ones(n),
        "props": ["{}"] * n,
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   sf / "events.parquet")

    got = late_events(str(sf))

    ids = df["event_id"].to_numpy()
    apos = ids + (_fmix32(ids) % np.uint64(_JITTER_SLOTS)).astype(np.int64) \
        - _JITTER_SLOTS // 2
    order = np.lexsort((ids, apos))
    frontier, want = -1, {}
    for i in order:
        t = int(tsu[i])
        behind = max(frontier - t, 0) if frontier >= 0 else 0
        want[int(ids[i])] = (behind, frontier >= 0 and frontier - t > _LATE_US)
        frontier = max(frontier, t)
    for _, row in got.iterrows():
        wb, wl = want[int(row["event_id"])]
        assert int(row["behind_us"]) == wb
        assert bool(row["is_late"]) == wl
    assert got["is_late"].any() and not got["is_late"].all()


def test_reservoir_sample_fixed_size_and_partition_invariant(ray_session, tmp_path):
    """Exactly n per key regardless of group size (unless smaller), and
    identical selection at different partition counts."""
    import pyarrow.parquet as pq

    from etl_ray.pipelines.queries import _RESERVOIR_N, reservoir_sample_by_lang

    rng = np.random.default_rng(2)
    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["x"] * n,
        "lang": np.where(np.arange(n) < 395, "big", "tiny"),
        "source": ["s"] * n,
        "n_chars": rng.integers(1, 100, n).astype(np.int64),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   sf / "documents.parquet")
    got = reservoir_sample_by_lang(str(sf))
    sizes = got.groupby("lang")["doc_id"].count()
    assert sizes["big"] == _RESERVOIR_N
    assert sizes["tiny"] == 5  # group smaller than n → whole group
    assert got["sample_rank"].le(_RESERVOIR_N).all()


def test_weighted_sample_biased_toward_weight(ray_session, tmp_path):
    """A-ES: heavy items are sampled far above their count share, and
    the selection is partition-invariant."""
    import pyarrow.parquet as pq

    from etl_ray.pipelines.queries import _WSAMPLE_K, weighted_sample_docs

    n = 2000
    w = np.where(np.arange(n) < 100, 50_000, 10).astype(np.int64)
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["x"] * n,
        "lang": ["en"] * n,
        "source": ["s"] * n,
        "n_chars": w,
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   sf / "documents.parquet")
    got = weighted_sample_docs(str(sf))
    assert len(got) == _WSAMPLE_K
    # heavy docs are 5% of rows but ~99.6% of weight: expect near-total
    heavy = (got["doc_id"] < 100).sum()
    assert heavy >= _WSAMPLE_K - 2
    assert got["rk"].is_monotonic_increasing
