"""Large-large shuffle join — hash-partition BOTH sides, merge per bucket.

Every other join in the engine is broadcast-dict (small side) or
co-partitioned-by-construction (prior ⋈ delta inside one merge task).
This operator covers the remaining case — fact ⋈ wide-dimension where
NEITHER side fits in memory — the reference's Citus co-located join
(``etl/rollup/sql/staging_split_trajectories.sql:28``).

Shape: both sides are tagged into one union stream with a shared bucket
key ``hash(join key) % B`` (ONE all-to-all exchange), then each bucket
partition runs a single C-implemented pandas merge. Rows of a given key
land in exactly one bucket, so the merge is complete by construction.
Skew note: a pathologically hot key concentrates in one bucket — salt
the key upstream (append ``key_salt = hash(row) % S`` to both sides and
join on (key, salt) after replicating the smaller side S×) when a single
key's rows exceed a worker's heap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.keyed import bucket_ids, default_buckets


def _arrow_type(t) -> pa.DataType:
    """Normalize Dataset.schema() types — pandas-backed datasets report
    numpy/python types instead of Arrow DataTypes."""
    if isinstance(t, pa.DataType):
        return t
    if t in (object, str):
        return pa.string()
    return pa.from_numpy_dtype(np.dtype(t))


def shuffle_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    how: str = "inner",
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Distributed hash join of two large Datasets on column ``on``.

    ``how``: "inner" or "left". Non-key column names must be disjoint.
    Schemas are read from dataset metadata once to build the unified
    tagged layout (null-filled columns for the other side).

    Dtype note: the tagged union makes every non-key column nullable;
    integer columns transiently widen to float64 in the per-bucket pandas
    frame and are cast BACK to their declared integer types (nullable
    Int64 where a LEFT join introduced real nulls) before the output
    block is emitted — exact-integer joins are safe.
    """
    b = n_buckets or default_buckets()
    ls, rs = left.schema(), right.schema()
    l_fields = {n: _arrow_type(t) for n, t in zip(ls.names, ls.types)}
    r_fields = {n: _arrow_type(t) for n, t in zip(rs.names, rs.types)}
    if on not in l_fields or on not in r_fields:
        raise ValueError(f"join key {on!r} missing from a side")
    l_rest = [n for n in ls.names if n != on]
    r_rest = [n for n in rs.names if n != on]
    overlap = set(l_rest) & set(r_rest)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    # identical column ORDER on both tagged streams (union requirement)
    order = [on, *l_rest, *r_rest, "_side", "_jbucket"]
    all_fields = {**l_fields, **r_fields,
                  "_side": pa.bool_(), "_jbucket": pa.int32()}
    empty_tagged = pa.table({c: pa.array([], all_fields[c]) for c in order})

    def tag(side_rest, other_rest, other_fields, is_right: bool):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:  # Ray Data can emit COLUMNLESS empty blocks —
                return empty_tagged  # pin the declared union schema
            out = {on: t.column(on)}
            for c in side_rest:
                out[c] = t.column(c)
            for c in other_rest:
                out[c] = pa.nulls(n, other_fields[c])
            out["_side"] = pa.nulls(n, pa.bool_()).fill_null(is_right)
            out["_jbucket"] = bucket_ids(t.column(on), b)
            return pa.table(out)

        return fn

    def reorder(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_tagged
        return t.select(order)

    tagged = (
        left.map_batches(tag(l_rest, r_rest, r_fields, False),
                         batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(reorder, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            right.map_batches(tag(r_rest, l_rest, l_fields, True),
                              batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(reorder, batch_format="pyarrow", zero_copy_batch=True)
        )
    )

    def merge_partition(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        is_r = df["_side"].to_numpy()
        ldf = df[~is_r][[on, *l_rest]]
        rdf = df[is_r][[on, *r_rest]]
        out = ldf.merge(rdf, on=on, how=how)
        # the tagged union null-fills widened integer columns to float64
        # in pandas — restore the declared integer types here (nullable
        # Int64 handles the genuine nulls a LEFT join introduces), so
        # callers get exact integers back instead of the documented
        # widening footgun
        for c in out.columns:
            want = all_fields.get(c)
            if (
                want is not None
                and pa.types.is_integer(want)
                and out[c].dtype.kind == "f"
            ):
                out[c] = out[c].astype("Int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    return tagged.groupby("_jbucket").map_groups(
        merge_partition, batch_format="pyarrow"
    )
