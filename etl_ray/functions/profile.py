"""Column profiler — per-column data-quality statistics in one pass.

The data-profiling step every large-scale ingest runs before committing
a source (the reference's per-load audit counts,
``etl/audit/logger.py:81-103``, generalized from rows to columns): for
each profiled column, row/null/empty counts and length extrema+sum in a
SINGLE streaming scan.

Scale shape: every batch shrinks to ≤ one partial row PER COLUMN (pure
combiner — counts, mins, maxes and sums are all associative), so the
driver folds blocks × columns tiny rows regardless of input size; no
shuffle at all. Distinct counts are deliberately NOT here — they need a
key exchange or a sketch; compose with
:func:`etl_ray.functions.sketch.grouped_kmv_distinct` for that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_PARTIAL = pa.schema(
    [
        ("column", pa.string()),
        ("n_rows", pa.int64()),
        ("n_nulls", pa.int64()),
        ("n_empty", pa.int64()),
        ("min_len", pa.int64()),
        ("max_len", pa.int64()),
        ("sum_len", pa.int64()),
    ]
)


def _i(x) -> int:
    v = x.as_py() if hasattr(x, "as_py") else x
    return int(v) if v is not None else 0


def profile_columns(ds: rd.Dataset, columns: list[str]) -> pd.DataFrame:
    """Profile string columns: one result row per column with
    (n_rows, n_nulls, n_empty, min_len, max_len, sum_len) where lengths
    are BYTE lengths of non-null values (empty string counts as len 0;
    min/max are 0 when a column is entirely null)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not t.column_names:
            return _PARTIAL.empty_table()
        rows = []
        for c in columns:
            col = t.column(c)
            nulls = _i(col.null_count)
            valid = col.drop_null()
            n_valid = len(valid)
            # an all-null pandas column arrives as Arrow null type —
            # there is nothing to measure
            lens = (
                pc.binary_length(valid)
                if n_valid and not pa.types.is_null(col.type)
                else pa.array([], pa.int32())
            )
            n_valid = len(lens)
            rows.append(
                {
                    "column": c,
                    "n_rows": t.num_rows,
                    "n_nulls": nulls,
                    "n_empty": _i(pc.sum(pc.cast(pc.equal(lens, 0), pa.int64())))
                    if n_valid
                    else 0,
                    "min_len": _i(pc.min(lens)) if n_valid else 0,
                    "max_len": _i(pc.max(lens)) if n_valid else 0,
                    "sum_len": _i(pc.sum(pc.cast(lens, pa.int64())))
                    if n_valid
                    else 0,
                }
            )
        return pa.Table.from_pylist(rows, schema=_PARTIAL)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    blocks = [t for t in parts.to_arrow_refs()]
    import ray

    tables = [t for t in ray.get(blocks) if t.num_rows]
    if not tables:
        return _PARTIAL.empty_table().to_pandas()
    df = pa.concat_tables(tables).to_pandas()
    # all-null blocks report min_len 0 which would wrongly win the min —
    # merge mins over blocks that actually saw values
    has_vals = (df["n_rows"] - df["n_nulls"]) > 0
    merged = df.groupby("column", sort=False).agg(
        n_rows=("n_rows", "sum"),
        n_nulls=("n_nulls", "sum"),
        n_empty=("n_empty", "sum"),
        max_len=("max_len", "max"),
        sum_len=("sum_len", "sum"),
    )
    mins = (
        df[has_vals]
        .groupby("column", sort=False)["min_len"]
        .min()
        .reindex(merged.index, fill_value=0)
    )
    merged["min_len"] = mins.astype("int64")
    merged = merged.reset_index()
    order = {c: i for i, c in enumerate(columns)}
    merged["avg_len"] = np.where(
        (merged["n_rows"] - merged["n_nulls"]) > 0,
        merged["sum_len"] / (merged["n_rows"] - merged["n_nulls"]).clip(lower=1),
        0.0,
    )
    merged = merged.sort_values("column", key=lambda s: s.map(order))
    cols = ["column", "n_rows", "n_nulls", "n_empty", "min_len", "max_len",
            "sum_len", "avg_len"]
    return merged[cols].reset_index(drop=True)
