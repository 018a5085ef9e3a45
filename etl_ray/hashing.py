"""Stable, vectorized hashing for partitioning and content integrity.

Partition assignment mirrors the reference's Citus hash distribution
(``etl/init/sql/50_citus_distribution.sql:15-26``): every key hashes to
exactly one partition, the partition id is stable across processes and
runs (NOT Python's randomized ``hash``), and the same ``part`` column is
reused by every stage so the pipeline shuffles once.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: 16-byte key for pandas' SipHash — fixed so partition assignment is
#: deterministic across processes (resume reads the same lake layout).
_HASH_KEY = "etl_ray_cdc_0001"

#: Separator that cannot appear inside repo/path; prevents
#: ("a", "b/c") colliding with ("a/b", "c").
_KEY_SEP = "\x00"


def key_strings(repo: pa.Array | pa.ChunkedArray, path: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Combine (repo, path) into one key string column (nulls → '')."""
    repo = pc.fill_null(repo, "")
    path = pc.fill_null(path, "")
    return pc.binary_join_element_wise(repo, path, _KEY_SEP)


def stable_hash64(strings: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic uint64 hash of a string column (vectorized SipHash)."""
    obj = np.asarray(strings.to_pandas(), dtype=object)
    return pd.util.hash_array(obj, hash_key=_HASH_KEY, categorize=False)


def partition_ids(
    repo: pa.Array | pa.ChunkedArray,
    path: pa.Array | pa.ChunkedArray,
    num_partitions: int,
) -> pa.Array:
    """``part = stable_hash(repo, path) % P`` as an int32 Arrow array."""
    h = stable_hash64(key_strings(repo, path))
    return pa.array((h % np.uint64(num_partitions)).astype(np.int32))


def sha256_hex(contents: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Per-row sha256 hex of a string column — the per-row invariant column
    required by BASELINE.json (reference analog: absent; see SURVEY.md F10).

    hashlib releases the GIL per call and is C-speed; this loop runs only
    over LWW *winners* inside the merge stage, never over the raw event
    stream, so its cost is O(final state), not O(events).
    """
    vals = contents.to_pandas()
    out = [
        None if v is None else hashlib.sha256(v.encode("utf-8")).hexdigest()
        for v in vals
    ]
    return pa.array(out, type=pa.string())
