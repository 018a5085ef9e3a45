"""Order-dependent repair fold (SURVEY K3) — mutation-during-scan.

Reference analog: the sequential SOG repair of
``etl/trajectory/builder.py:460-524`` — the scan walks each key's rows
in time order and overwrites implausible values IN PLACE, so later
comparisons see the REPAIRED value, not the raw one. This is the one
semantics class the LWW merge does not cover: the fold's state is the
mutated output itself.

The sequential dependency is irreducible (each step reads the previous
step's repaired value), so the kernel walks rows — but only for keys
that actually contain a violation (vectorized pre-screen); clean keys
take the zero-copy fast path. Distribution is the usual bucketed
whole-partition pattern: parallel across hash buckets, sequential only
inside a key, exactly like the reference's per-ship scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.keyed import bucketed_groups, sorted_pandas


def repair_hold_last(
    values: np.ndarray, starts: np.ndarray, ends: np.ndarray, max_jump: float
) -> np.ndarray:
    """Per-segment hold-last-good repair: a value jumping more than
    ``max_jump`` from the last GOOD value is replaced by it (and the good
    value holds). Returns the repaired copy."""
    rep = values.copy()
    for s, e in zip(starts, ends):
        seg = values[s:e]
        if len(seg) < 2:
            continue
        # vectorized pre-screen: keys whose raw consecutive diffs never
        # exceed the jump can never trigger a repair (a repair can only
        # raise later diffs if a raw diff already exceeded the bound)
        if np.abs(np.diff(seg)).max() <= max_jump:
            continue
        last = seg[0]
        out = rep[s:e]
        for i in range(1, len(seg)):
            if abs(seg[i] - last) <= max_jump:
                last = seg[i]
            else:
                out[i] = last
    return rep


def repair_fold(
    ds: rd.Dataset,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    max_jump: float,
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Dataset-level repair fold: per key, ordered, hold-last-good.

    Emits the input rows plus ``{value_col}_repaired`` and a boolean
    ``was_repaired``.
    """

    def run(t: pa.Table) -> pa.Table:
        df = sorted_pandas(t, [key_col, *order_cols])
        keys = df[key_col].to_numpy()
        first = np.ones(len(df), dtype=bool)
        first[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(df))
        v = df[value_col].to_numpy()
        rep = repair_hold_last(v, starts, ends, max_jump)
        df[f"{value_col}_repaired"] = rep
        df["was_repaired"] = rep != v
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed_groups(ds, key_col, run, n_buckets=n_buckets)
