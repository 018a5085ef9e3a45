"""Combiner + known-boundary merge for small-cardinality grouped sums.

Ray Data's ``Aggregate`` operator pre-aggregates per block too, but its
AllToAll exchange (a) pays boundary-sampling machinery for aggregates
whose result is a handful of rows and (b) emits trailing COLUMNLESS
empty RefBundles ("Operator produced a RefBundle with a different
schema" warnings in the execution log). For group-bys whose distinct-key
count is small and bounded (pricing flags, nations, languages — the
reference's dashboard rollups, ``etl/rollup/apply_rollups.py:59-107``),
this helper does the scale-correct thing explicitly:

- the CALLER's vectorized per-batch combiner shrinks every block to
  ≤ n_groups partial rows (shuffle bytes O(blocks × groups), independent
  of row count),
- ONE direct-exchange round (stages/keyed.py) merges the partials with a
  single C-implemented pandas groupby-sum per bucket.

Every value column must be SUM-mergeable; express means as (sum, count)
partials and divide after the merge (pipelines/cascade.py discipline).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.keyed import (
    _HASH_KEY,
    bucket_ids,
    default_buckets,
    grouped_by_bucket,
    to_pandas_typed,
)


def _multi_bucket_ids(t: pa.Table, key_cols: list[str], b: int) -> pa.Array:
    """Deterministic bucket hash over a composite key tuple."""
    if len(key_cols) == 1:
        return bucket_ids(t.column(key_cols[0]), b)
    h = pd.util.hash_pandas_object(
        t.select(key_cols).to_pandas(), index=False, hash_key=_HASH_KEY
    ).to_numpy()
    return pa.array((h % b).astype(np.int32))


def bucketed_groups_multi(
    ds: rd.Dataset,
    key_cols: list[str],
    partition_fn,
    n_buckets: int | None = None,
    empty: pa.Table | None = None,
) -> rd.Dataset:
    """:func:`etl_ray.stages.keyed.bucketed_groups` for COMPOSITE keys —
    rows sharing the full key tuple land in one partition task.
    ``empty``: typed zero-row table in the INPUT-block layout; it is
    emitted (bucketed) for empty/columnless input blocks so every block
    leaving ``add_bucket`` shares one schema, and ``partition_fn(empty)``
    supplies the typed OUTPUT empty for an all-empty result —
    ``partition_fn`` must therefore handle a zero-row input."""
    b = n_buckets or default_buckets()

    empty_bucketed = (
        empty.append_column("_bucket", pa.array([], pa.int32()))
        if empty is not None
        else None
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        # typed 0-row output keeps the bundle schema (a generator
        # yielding nothing emits a SCHEMALESS bundle); the downstream
        # raw-task exchange drops empty slices anyway
        if t.num_rows == 0 or not t.column_names:
            if empty_bucketed is not None:
                return empty_bucketed
            return t
        return t.append_column("_bucket", _multi_bucket_ids(t, key_cols, b))

    def run(t: pa.Table) -> pa.Table:
        return partition_fn(t.drop_columns(["_bucket"]))

    mapped = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_by_bucket(
        mapped, "_bucket", b, run,
        empty_table=partition_fn(empty) if empty is not None else None,
    )


def grouped_sum(
    partials: rd.Dataset,
    keys: list[str],
    empty: pa.Table,
    n_buckets: int = 8,
) -> pd.DataFrame:
    """Merge a dataset of per-batch PARTIAL rows: one groupby-sum over
    every non-key column, typed per ``empty``'s schema. Returns pandas —
    the result is small by contract (bounded group count)."""
    value_cols = [c for c in empty.column_names if c not in keys]
    int_cols = [
        c for c in value_cols if pa.types.is_integer(empty.schema.field(c).type)
    ]

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not t.column_names:
            return empty
        df = (
            t.select([*keys, *value_cols])
            .to_pandas()
            .groupby(keys, sort=False, as_index=False)[value_cols]
            .sum()
        )
        for c in int_cols:
            df[c] = df[c].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    merged = bucketed_groups_multi(
        partials, keys, merge, n_buckets=n_buckets, empty=empty
    )
    return to_pandas_typed(merged, empty)



def grouped_max(
    partials: rd.Dataset,
    keys: list[str],
    empty: pa.Table,
    n_buckets: int = 8,
) -> pd.DataFrame:
    """Merge per-batch PARTIAL rows with max (set-membership flags,
    running maxima): one groupby-max over every non-key column, typed
    per ``empty``'s schema. Small-result contract like grouped_sum."""
    value_cols = [c for c in empty.column_names if c not in keys]
    int_cols = [
        c for c in value_cols if pa.types.is_integer(empty.schema.field(c).type)
    ]

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not t.column_names:
            return empty
        df = (
            t.select([*keys, *value_cols])
            .to_pandas()
            .groupby(keys, sort=False, as_index=False)[value_cols]
            .max()
        )
        for c in int_cols:
            df[c] = df[c].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    merged = bucketed_groups_multi(
        partials, keys, merge, n_buckets=n_buckets, empty=empty
    )
    return to_pandas_typed(merged, empty)


def pivot_counts(
    ds: rd.Dataset,
    key_col: str,
    pivot_col: str,
    values: list[str],
    key_type: pa.DataType | None = None,
    n_buckets: int | None = None,
) -> pd.DataFrame:
    """Pivot (long → wide): one row per key, one ``n_<value>`` count
    column per pivot value — the reference's per-type rollup family
    (etl/rollup/apply_rollups.py:59-107, one aggregate per type) turned
    into columns. ``values`` is the explicit (small, caller-known)
    column set; rows with other pivot values are ignored.

    Scale shape: per-batch combiner shrinks every block to ≤ distinct
    keys × 1 wide row (vectorized crosstab via groupby-size unstack);
    ONE grouped-sum exchange merges the partials. Counts only — pivot
    sums compose the same way via a value column per cell.
    """
    kt = key_type or pa.int64()
    out_cols = [f"n_{v}" for v in values]
    empty = pa.table(
        {key_col: pa.array([], kt),
         **{c: pa.array([], pa.int64()) for c in out_cols}}
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        df = t.select([key_col, pivot_col]).to_pandas()
        df = df[df[pivot_col].isin(values)]
        if not len(df):
            return empty
        wide = (
            df.groupby([key_col, pivot_col], sort=False)
            .size()
            .unstack(fill_value=0)
            .reindex(columns=values, fill_value=0)
        )
        wide.columns = out_cols
        wide = wide.reset_index()
        for c in out_cols:
            wide[c] = wide[c].astype("int64")
        return pa.Table.from_pandas(wide, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_sum(parts, [key_col], empty, n_buckets=n_buckets or 8)
