"""Declarative cascaded summary engine — N resolution levels × M agg
types, child level feeding the parent (never recomputed from raw).

Reference semantics: DIPAAL maintains FIVE heatmap aggregate types
(count, delta_cog, delta_heading, max_draught, time —
``etl/rollup/sql/heatmaps/01_count.sql`` … ``05_time.sql``) at FOUR cell
resolutions in a *reversed parent-linked cascade*
(``etl/rollup/apply_rollups.py:129-135``: the finest cells are built
first and each coarser level re-groups its child level), with
``parent_x/parent_y`` linkage columns on every cell row
(``etl/init/sql/14_dim_cell.sql:2-28``). This module is the Ray-Data
rebuild of that engine, configured as data:

- a :class:`CascadeAgg` list declares the agg types (key cols + agg
  exprs, the SURVEY §2.11 "summary tables defined declaratively"
  promise);
- ``resolutions`` declares the level chain; level *i+1* is computed
  from level *i*'s ALREADY-AGGREGATED output (a shuffle over ≤ #cells
  rows, not over raw events);
- every level row carries ``parent_x/parent_y`` linking to the next
  coarser level (−1 sentinel at the top, the reference's sentinel
  discipline).

Scale shape: the raw pass is a per-batch combiner (partial carries per
cell) followed by ONE bucketed groupby; each cascade step shuffles only
the previous level's aggregate. Non-decomposable aggregates (mean) are
carried as (sum, count) partials and finalized per level — the partial
/ combiner discipline that makes the cascade valid at any depth.

Delta-by-delta maintenance: :func:`merge_carry` folds a delta's carry
table into an existing base (sum/sum/max/min are all re-aggregable), so
an incremental ingest updates each level from the delta's finest-level
carries without touching history — mirrored from the reference's
per-day delta rollups (``apply_rollups.py:59-107``).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.keyed import bucketed_groups

#: internal carry columns — sufficient statistics for every agg kind
_CARRY_COLS = ["n", "sum_v", "max_v", "min_v"]


@dataclass(frozen=True)
class CascadeAgg:
    """One declared aggregate type (the heatmap-type analog).

    kind: count | sum | max | min | mean — ``mean`` is finalized from
    the (sum, n) carries; the others project a carry directly.
    """

    kind: str
    out: str
    round_to: int | None = None


def _finalize(df: pd.DataFrame, aggs: list[CascadeAgg]) -> pd.DataFrame:
    """Project the declared agg columns from the carry columns."""
    from etl_ray.functions.rounding import round_half_away

    out = df[["cell_x", "cell_y", "parent_x", "parent_y"]].copy()
    for a in aggs:
        if a.kind == "count":
            out[a.out] = df["n"].astype("int64")
        elif a.kind == "sum":
            out[a.out] = df["sum_v"]
        elif a.kind == "max":
            out[a.out] = df["max_v"]
        elif a.kind == "min":
            out[a.out] = df["min_v"]
        elif a.kind == "mean":
            # pre-round the sum so both engines divide IDENTICAL
            # numerators — raw partial-sum order differs by ~1 ulp across
            # engines, which flips round-half boundaries of the quotient
            out[a.out] = (
                round_half_away(df["sum_v"].to_numpy(np.float64), 6) / df["n"]
            )
        else:
            raise ValueError(f"unknown agg kind {a.kind!r}")
        if a.round_to is not None:
            out[a.out] = round_half_away(out[a.out].to_numpy(np.float64), a.round_to)
    return out


def _merge_carry_df(df: pd.DataFrame) -> pd.DataFrame:
    """Combine partial carries that share a cell (vectorized pandas)."""
    return df.groupby(["cell_x", "cell_y"], sort=False, as_index=False).agg(
        n=("n", "sum"), sum_v=("sum_v", "sum"),
        max_v=("max_v", "max"), min_v=("min_v", "min"),
    )


def merge_carry(base: pa.Table, delta: pa.Table) -> pa.Table:
    """Fold a delta carry table into a base carry table (delta-by-delta
    maintenance: all carries are re-aggregable, so base ⊕ delta ==
    recompute-from-scratch — tested in tests/test_cascade.py)."""
    df = pd.concat([base.to_pandas(), delta.to_pandas()], ignore_index=True)
    return pa.Table.from_pandas(_merge_carry_df(df), preserve_index=False)


def _cell_key(t: pa.Table) -> pa.Array:
    cx = t.column("cell_x").to_numpy(zero_copy_only=False).astype(np.int64)
    cy = t.column("cell_y").to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.array(cx * np.int64(1_000_003) + cy)


def _carry_table(df: pd.DataFrame) -> pa.Table:
    return pa.table(
        {
            "cell_x": pa.array(df["cell_x"].to_numpy().astype(np.int64)),
            "cell_y": pa.array(df["cell_y"].to_numpy().astype(np.int64)),
            "n": pa.array(df["n"].to_numpy().astype(np.int64)),
            "sum_v": pa.array(df["sum_v"].to_numpy(dtype=np.float64)),
            "max_v": pa.array(df["max_v"].to_numpy(dtype=np.float64)),
            "min_v": pa.array(df["min_v"].to_numpy(dtype=np.float64)),
        }
    )


def base_carries(ds: rd.Dataset, cell_fn) -> rd.Dataset:
    """Finest-level carry table from raw rows.

    ``cell_fn(pa.Table) -> pa.Table`` with columns (cell_x, cell_y,
    value). Per-batch partial carries (the combiner) cut the shuffle to
    ≤ one row per (cell, batch); ONE bucketed groupby merges them.
    """

    empty = _carry_table(
        pd.DataFrame({c: [] for c in ["cell_x", "cell_y", *_CARRY_COLS]})
    )
    empty = empty.append_column("_ckey", _cell_key(empty))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # Ray Data can emit columnless empty blocks
            return empty
        c = cell_fn(t).to_pandas()
        g = c.groupby(["cell_x", "cell_y"], sort=False, as_index=False).agg(
            n=("value", "size"), sum_v=("value", "sum"),
            max_v=("value", "max"), min_v=("value", "min"),
        )
        ct = _carry_table(g)
        return ct.append_column("_ckey", _cell_key(ct))

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge_partition(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["_ckey"]).to_pandas()
        return _carry_table(_merge_carry_df(df))

    return bucketed_groups(partials, "_ckey", merge_partition)


def rollup_level(child: rd.Dataset, divisor: int) -> rd.Dataset:
    """One cascade step: re-key the CHILD level's carries by integer
    division (the reference's ``cell_x/(parent/child)`` parent key,
    ``lazy_load_cells_from_cell_facts.sql:1-10``) and re-aggregate.
    Input is the child's aggregate — never the raw rows."""

    def rekey(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            e = _carry_table(pd.DataFrame(
                {c: [] for c in ["cell_x", "cell_y", *_CARRY_COLS]}))
            return e.append_column("_ckey", _cell_key(e))
        df = t.to_pandas()
        df["cell_x"] = df["cell_x"].to_numpy() // divisor
        df["cell_y"] = df["cell_y"].to_numpy() // divisor
        out = _carry_table(_merge_carry_df(df))
        return out.append_column("_ckey", _cell_key(out))

    rekeyed = child.map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True)

    def merge_partition(t: pa.Table) -> pa.Table:
        df = t.drop_columns(["_ckey"]).to_pandas()
        return _carry_table(_merge_carry_df(df))

    return bucketed_groups(rekeyed, "_ckey", merge_partition)


def cascade_rollup(
    ds: rd.Dataset,
    cell_fn,
    aggs: list[CascadeAgg],
    resolutions: tuple[int, ...] = (1, 4, 16),
) -> pd.DataFrame:
    """Full cascade: finest carries from raw, then each coarser level
    from its child; returns the union of all levels with a ``level``
    column (= the resolution) and parent linkage per row.

    The per-level results are cell aggregates (≪ raw rows), so the
    final union/finalize runs on small tables; every shuffle upstream
    is bucketed and carries only partial carries.
    """
    if resolutions[0] != 1:
        # base_carries emits raw cell_fn cells undivided — labeling them
        # with a coarser resolution would silently mislabel every level
        raise ValueError(
            f"resolutions must start at 1 (got {resolutions[0]}): level 0 "
            "is the identity resolution of cell_fn's cells"
        )
    if any(b % a for a, b in zip(resolutions, resolutions[1:])):
        raise ValueError("each resolution must divide the next")
    import ray as _ray

    def _collect(d: rd.Dataset) -> pa.Table:
        # aggregates only — bounded by cell counts, never raw rows; drop
        # Ray's columnless empty blocks before concat (engine-wide rule)
        blocks = [b for b in _ray.get(d.to_arrow_refs()) if b.num_rows]
        if not blocks:
            return _carry_table(
                pd.DataFrame({c: [] for c in ["cell_x", "cell_y", *_CARRY_COLS]})
            )
        return pa.concat_tables(blocks)

    levels: list[tuple[int, pa.Table]] = []
    # each level is a DISTRIBUTED bucketed shuffle over the child's
    # aggregate; materialize() pins each level so the chain never
    # re-executes the raw pass, and the driver only ever receives the
    # per-level cell aggregates for the final projection
    cur_ds = base_carries(ds, cell_fn).materialize()
    prev_res = resolutions[0]
    levels.append((prev_res, _collect(cur_ds)))
    for res in resolutions[1:]:
        cur_ds = rollup_level(cur_ds, res // prev_res).materialize()
        levels.append((res, _collect(cur_ds)))
        prev_res = res
    # finalize with parent linkage: parent divisor = next level ratio;
    # top level links to the sentinel parent (−1, −1)
    outs = []
    for i, (res, tab) in enumerate(levels):
        df = tab.to_pandas()
        if i + 1 < len(levels):
            div = levels[i + 1][0] // res
            df["parent_x"] = df["cell_x"].to_numpy() // div
            df["parent_y"] = df["cell_y"].to_numpy() // div
        else:
            df["parent_x"] = np.int64(-1)
            df["parent_y"] = np.int64(-1)
        fin = _finalize(df, aggs)
        fin.insert(0, "level", np.int64(res))
        outs.append(fin)
    out = pd.concat(outs, ignore_index=True).sort_values(
        ["level", "cell_x", "cell_y"], ignore_index=True
    )
    return out
