"""Bucketed per-key processing — bound task count, vectorize per partition.

The round-1 lesson (commit 52c98d2, BASELINE.md): Ray's
``groupby(raw_key).map_groups`` dispatches one Python call PER KEY
(~0.5-1 ms each) — at millions of keys that is the whole runtime. The fix
proven on MinHash-LSH (76 s → 5 s) is to group by a *hashed bucket* of
the key instead, so each shuffle partition holds many whole key-groups,
then run ONE vectorized pass (lexsort + run-boundary detection, or a
C-implemented pandas groupby) over the entire partition.

Reference analog: the per-ship fan-out of the trajectory builder is
bounded the same way — tasks per partition, not per key
(``etl/trajectory/builder.py:41-78``; SURVEY §4 "bound task count").

Scale notes:

- ``n_buckets`` defaults to ``4 × cluster CPUs`` (min 16) so each merge
  task gets a meaningful slab while all cores stay busy; at cluster
  scale pass an explicit count ≈ 2-4× total cores.
- Keys are co-located by construction (hash of the full key), so any
  per-key fold inside the partition sees every row of its keys.
- Skew: a single pathological hot key still lands in one bucket — the
  per-partition pass stays vectorized, so a hot bucket degrades to one
  big array op, not a Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_HASH_KEY = "0123456789abcdef"  # fixed → deterministic routing


def default_buckets(factor: int = 4, floor: int = 16) -> int:
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(floor, factor * cpus)


def pool_size() -> int:
    """Actor-pool concurrency for stateful map_batches stages: half the
    cluster CPUs, and STRICTLY fewer than all of them — an actor pool
    holding every core starves the producer stages feeding it and
    deadlocks the pipeline (observed live: a 2-actor pool on a 2-CPU
    cluster hung the KNN query indefinitely)."""
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    return max(1, min(cpus - 1, cpus // 2))


def bucket_ids(col: pa.ChunkedArray | pa.Array, n_buckets: int) -> pa.Array:
    """Deterministic vectorized key → bucket hash (ints and strings)."""
    if pa.types.is_integer(col.type):
        v = (
            col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
            * np.uint64(0x9E3779B97F4A7C15)
        )
        return pa.array(((v >> np.uint64(33)) % n_buckets).astype(np.int32))
    arr = col.to_pandas().to_numpy(dtype=object)
    h = pd.util.hash_array(arr, hash_key=_HASH_KEY)
    return pa.array((h % n_buckets).astype(np.int32))


def direct_bucket_groups(
    ds: rd.Dataset,
    bucket_col: str,
    n_buckets: int,
    group_fn,
    n_ranges: int | None = None,
    empty_table: pa.Table | None = None,
) -> rd.Dataset:
    """Known-boundary group exchange: apply ``group_fn`` once per bucket
    without Ray Data's AllToAll.

    ``bucket_col`` must hold a dense int in [0, n_buckets) — OUR own
    precomputed hash bucket — so the reduce ranges are known a priori
    (``range(bucket) = bucket * S // B``, contiguous). Ray's sort-based
    ``groupby().map_groups`` pays a boundary-sampling pass plus a full
    sort for exactly this routing; raw 2-round map/reduce tasks skip
    both (the replay engine's exchange, ``replay._direct_exchange``,
    generalized — measured there: the Sort operator spent 9.8 s span
    for 4.3 s compute on one window).

    Scale shape: split tasks start as upstream blocks materialize
    (streaming via ``iter_internal_ref_bundles``); each reduce task
    buffers only its range (~data/S); the driver touches REFS plus one
    tiny has-rows flag per range, never row data — results stream into
    the output Dataset via ``from_arrow_refs``. Semantics are identical
    to ``groupby(bucket).map_groups``: ``group_fn`` sees every row of
    exactly one bucket per call.

    Ray-core tasks also sidestep the Data-block-path saturation this VM
    exhibits (BASELINE.md) — core scheduling scales ~1.0 to 32 CPUs.
    ``ETL_RAY_GROUP_EXCHANGE=sort`` restores the AllToAll path
    engine-wide (A/B lever; the multi-node network-shuffle shape).
    """
    S = n_ranges or max(1, min(n_buckets, cluster_parallelism()))

    @ray.remote(num_returns=S)
    def split(t):
        if not isinstance(t, pa.Table):  # pandas-format upstream block
            from ray.data.block import BlockAccessor

            t = BlockAccessor.for_block(t).to_arrow()
        if t.num_rows == 0:
            return [None] * S if S > 1 else None
        bucket = (
            t.column(bucket_col).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        if len(bucket) and (bucket.min() < 0 or bucket.max() >= n_buckets):
            # loud failure beats silent row loss: an out-of-range bucket
            # would fall outside every reduce range and simply vanish
            raise ValueError(
                f"bucket column {bucket_col!r} outside [0, {n_buckets}): "
                f"min={bucket.min()} max={bucket.max()}"
            )
        rng = bucket * S // n_buckets
        order = np.argsort(rng, kind="stable")
        st = t.take(pa.array(order))
        bounds = np.searchsorted(rng[order], np.arange(S + 1))
        out = [st.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(S)]
        out = [o if o.num_rows else None for o in out]
        return out if S > 1 else out[0]

    @ray.remote(num_returns=2)
    def apply_range(*slices):
        ts = [s for s in slices if s is not None and s.num_rows]
        if not ts:
            return False, pa.table({})
        t = pa.concat_tables(ts, promote_options="default")
        bucket = t.column(bucket_col).to_numpy(zero_copy_only=False)
        order = np.argsort(bucket, kind="stable")
        t = t.take(pa.array(order))
        bs = bucket[order]
        starts = np.flatnonzero(np.concatenate(([True], bs[1:] != bs[:-1])))
        ends = np.append(starts[1:], len(bs))
        outs, empty_proto = [], None
        for s, e in zip(starts, ends):
            r = group_fn(t.slice(s, e - s))
            if isinstance(r, pd.DataFrame):  # map_groups tolerated pandas
                r = pa.Table.from_pandas(r, preserve_index=False)
            if r.num_rows:
                outs.append(r)
            elif empty_proto is None:
                empty_proto = r  # schema-bearing empty output
        if outs:
            return 2, pa.concat_tables(outs, promote_options="default")
        if empty_proto is not None:
            # flag 1: a schema-bearing EMPTY proto. Kept only when NO
            # range produced rows (the driver then emits exactly one,
            # so downstream column access still works) — a 0-row block
            # mixed among row-bearing ones makes every downstream map
            # operator emit a schemaless RefBundle (Ray skips the UDF
            # on empty input blocks), the "RefBundle with a different
            # schema" warning class
            return 1, empty_proto.slice(0, 0)
        return 0, pa.table({})

    #: zero-input results: a caller-supplied typed empty beats a
    #: zero-column dataset (Ray's to_pandas() drops ALL columns from an
    #: empty dataset, so downstream column access would crash)
    degenerate = empty_table if empty_table is not None else pa.table({})
    slice_refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            r = split.remote(block_ref)
            slice_refs.append([r] if S == 1 else r)
    if not slice_refs:
        return rd.from_arrow(degenerate)
    flag_refs, table_refs = [], []
    for i in range(S):
        f, t = apply_range.remote(*[row[i] for row in slice_refs])
        flag_refs.append(f)
        table_refs.append(t)
    # only the 1-byte flags come to the driver; row data stays in plasma
    flags = ray.get(flag_refs)
    keep = [t for t, f in zip(table_refs, flags) if f == 2]
    if not keep:
        # no range produced rows: one schema-bearing empty proto (if any
        # group_fn ran) beats the caller degenerate, which beats nothing
        protos = [t for t, f in zip(table_refs, flags) if f == 1]
        if protos:
            return rd.from_arrow_refs(protos[:1])
        return rd.from_arrow(degenerate)
    return rd.from_arrow_refs(keep)


def cluster_parallelism() -> int:
    """Reduce-task fan for raw-task exchanges: all advertised CPUs (the
    Ray-CORE path scales to the full node, unlike the Data block path —
    the saturation cap applies only to Dataset execution)."""
    cpus = 8
    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    return cpus


def grouped_by_bucket(
    ds: rd.Dataset, bucket_col: str, n_buckets: int, group_fn,
    empty_table: pa.Table | None = None,
) -> rd.Dataset:
    """THE exchange selector for dense-int-bucket groupbys: the
    known-boundary direct exchange by default, Ray Data's AllToAll under
    ``ETL_RAY_GROUP_EXCHANGE=sort``. Every caller (bucketed_groups, the
    shuffle join, the dedup pipelines, the sketches) routes through here
    so the A/B lever has one owner. ``empty_table``: a typed empty to
    return when the input has no rows at all (see direct_bucket_groups).
    """
    import os

    if os.environ.get("ETL_RAY_GROUP_EXCHANGE", "direct") == "direct":
        return direct_bucket_groups(
            ds, bucket_col, n_buckets, group_fn, empty_table=empty_table
        )
    return ds.groupby(bucket_col).map_groups(group_fn, batch_format="pyarrow")


def bucketed_groups(
    ds: rd.Dataset,
    key_col: str,
    partition_fn,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """``groupby(hash(key) % B).map_groups(partition_fn)`` — B total tasks.

    ``partition_fn(table) -> table`` receives one bucket's rows (many
    whole key-groups, pyarrow) and must be fully vectorized inside.
    The ``_bucket`` column is added here and NOT passed to
    ``partition_fn``. Exchange selection: :func:`grouped_by_bucket`.
    """
    b = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # typed 0-row output keeps the bundle schema (a generator
            # yielding nothing emits a SCHEMALESS bundle — the
            # "RefBundle with a different schema" warning class); the
            # downstream raw-task exchange drops empty slices anyway
            if key_col in t.column_names:
                return t.append_column("_bucket", pa.array([], pa.int32()))
            return t
        return t.append_column("_bucket", bucket_ids(t.column(key_col), b))

    def run(t: pa.Table) -> pa.Table:
        return partition_fn(t.drop_columns(["_bucket"]))

    mapped = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_by_bucket(mapped, "_bucket", b, run)


def to_pandas_typed(ds: rd.Dataset, empty_like: pa.Table) -> pd.DataFrame:
    """``ds.to_pandas()`` that survives empty results: Ray drops ALL
    columns from an empty dataset's frame (even when the blocks carry a
    schema), so downstream column access crashes — substitute the typed
    empty frame instead."""
    df = ds.to_pandas()
    if df.empty and not set(empty_like.column_names) <= set(df.columns):
        return empty_like.to_pandas()
    return df


def sorted_pandas(t: pa.Table, sort_cols: list[str]) -> pd.DataFrame:
    """One Arrow→pandas conversion + one C lexsort for a whole partition."""
    df = t.to_pandas()
    return df.sort_values(sort_cols, kind="stable", ignore_index=True)
