"""Cascaded summary engine: parent linkage, agg finalization, and
delta-by-delta maintenance equivalence (merge_carry ⊕ == recompute).

Reference semantics under test: the reversed parent-linked rollup
cascade of ``/root/reference/etl/rollup/apply_rollups.py:129-135`` and
the five heatmap agg types (``etl/rollup/sql/heatmaps/0*.sql``).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from etl_ray.pipelines.cascade import (
    CascadeAgg,
    base_carries,
    cascade_rollup,
    merge_carry,
    rollup_level,
)


def _cells_fn():
    """Returns a CLOSURE (pickled by value) — a module-level function in
    a test file is serialized by reference and Ray workers cannot import
    the test module."""

    def cells(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cell_x": t.column("x"),
                "cell_y": t.column("y"),
                "value": t.column("v"),
            }
        )

    return cells


def _mk(n=500, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "x": rng.integers(0, 40, n),
            "y": rng.integers(0, 24, n),
            "v": np.round(rng.normal(10, 5, n), 3),
        }
    )


def test_cascade_matches_pandas_reference(ray_session):
    df = _mk()
    ds = rd.from_pandas(df).map_batches(lambda t: t, batch_format="pyarrow")
    aggs = [
        CascadeAgg("count", "n"),
        CascadeAgg("sum", "s", 6),
        CascadeAgg("max", "mx", 6),
        CascadeAgg("min", "mn", 6),
        CascadeAgg("mean", "avg", 6),
    ]
    out = cascade_rollup(ds, _cells_fn(), aggs, (1, 4, 16))

    # single-threaded reference: three cascaded pandas groupbys
    l1 = df.groupby(["x", "y"], as_index=False).agg(
        n=("v", "size"), s=("v", "sum"), mx=("v", "max"), mn=("v", "min")
    )
    assert set(out["level"]) == {1, 4, 16}
    lvl1 = out[out["level"] == 1].reset_index(drop=True)
    assert len(lvl1) == len(l1)
    ref = l1.sort_values(["x", "y"]).reset_index(drop=True)
    assert (lvl1["cell_x"].to_numpy() == ref["x"].to_numpy()).all()
    assert (lvl1["n"].to_numpy() == ref["n"].to_numpy()).all()
    # parent linkage: every child's (parent_x, parent_y) exists in the
    # parent level's cell set; top level links to the −1 sentinel
    lvl4 = out[out["level"] == 4]
    parents = set(zip(lvl4["cell_x"], lvl4["cell_y"]))
    assert set(zip(lvl1["parent_x"], lvl1["parent_y"])) <= parents
    lvl16 = out[out["level"] == 16]
    assert (lvl16["parent_x"] == -1).all() and (lvl16["parent_y"] == -1).all()
    # parent count consistency: level-16 total n equals raw row count
    assert lvl16["n"].sum() == len(df)
    # mean finalization matches s/n at every level
    got = out[out["level"] == 4].reset_index(drop=True)
    r4 = l1.copy()
    r4["x"] //= 4
    r4["y"] //= 4
    r4 = r4.groupby(["x", "y"], as_index=False).agg(
        n=("n", "sum"), s=("s", "sum"), mx=("mx", "max"), mn=("mn", "min")
    ).sort_values(["x", "y"]).reset_index(drop=True)
    assert np.allclose(got["s"].to_numpy(), r4["s"].to_numpy(), atol=1e-6)
    assert np.allclose(got["mx"].to_numpy(), r4["mx"].to_numpy(), atol=1e-6)


def test_delta_by_delta_equals_recompute(ray_session):
    """base ⊕ delta carries == carries of the concatenated input — the
    incremental-maintenance contract (apply_rollups delta discipline)."""
    df = _mk(800, seed=11)
    a, b = df.iloc[:500], df.iloc[500:]

    def carries_of(d):
        ds = rd.from_pandas(d.reset_index(drop=True))
        out = base_carries(ds, _cells_fn()).to_pandas()
        return pa.Table.from_pandas(out, preserve_index=False)

    full = carries_of(df).to_pandas().sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
    merged = (
        merge_carry(carries_of(a), carries_of(b))
        .to_pandas()
        .sort_values(["cell_x", "cell_y"])
        .reset_index(drop=True)
    )
    assert len(full) == len(merged)
    assert (full["n"].to_numpy() == merged["n"].to_numpy()).all()
    assert np.allclose(full["sum_v"], merged["sum_v"], atol=1e-9)
    assert np.allclose(full["max_v"], merged["max_v"])
    assert np.allclose(full["min_v"], merged["min_v"])


def test_rollup_level_is_reaggregable(ray_session):
    """A cascade step over the child aggregate equals grouping the raw
    rows at the parent resolution directly."""
    df = _mk(400, seed=3)
    ds = rd.from_pandas(df).map_batches(lambda t: t, batch_format="pyarrow")
    child = base_carries(ds, _cells_fn()).materialize()
    parent = rollup_level(child, 4).to_pandas().sort_values(
        ["cell_x", "cell_y"]
    ).reset_index(drop=True)
    ref = df.copy()
    ref["x"] //= 4
    ref["y"] //= 4
    ref = ref.groupby(["x", "y"], as_index=False).agg(
        n=("v", "size"), sum_v=("v", "sum"), max_v=("v", "max"), min_v=("v", "min")
    ).sort_values(["x", "y"]).reset_index(drop=True)
    assert (parent["n"].to_numpy() == ref["n"].to_numpy()).all()
    assert np.allclose(parent["sum_v"], ref["sum_v"], atol=1e-9)


def test_bad_resolution_chain_rejected(ray_session):
    ds = rd.from_pandas(_mk(10))
    with pytest.raises(ValueError):
        cascade_rollup(ds, _cells_fn(), [CascadeAgg("count", "n")], (1, 3, 4))
