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
    ``partition_fn``.
    """
    b = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("_bucket", bucket_ids(t.column(key_col), b))

    def run(t: pa.Table) -> pa.Table:
        return partition_fn(t.drop_columns(["_bucket"]))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("_bucket")
        .map_groups(run, batch_format="pyarrow")
    )


def sorted_pandas(t: pa.Table, sort_cols: list[str]) -> pd.DataFrame:
    """One Arrow→pandas conversion + one C lexsort for a whole partition."""
    df = t.to_pandas()
    return df.sort_values(sort_cols, kind="stable", ignore_index=True)
