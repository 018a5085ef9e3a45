"""Segment materialization — one output row PER gap-split segment.

The reference's core builder semantics (``etl/trajectory/builder.py``):

- per-key ordered scan, split into segments where the time gap exceeds a
  threshold (``builder.py:102-115`` gap split, K5/K6),
- one row per segment with start/end, event count (K7 finalize,
  ``builder.py:181-306``),
- MULTI-COLUMN mode with a per-column NA policy (``builder.py:204-273``:
  13 mode columns, include-/exclude-NA variants, sentinel fallbacks),
- a consecutive-duplicate-compressed value sequence per segment
  (``builder.py:346-375`` tfloat compression, K9/K10).

Ray-Data-first shape: hash-bucket the key (stages/keyed.py) so whole
keys co-locate, then ONE vectorized pass per partition — Arrow sort,
run-boundary masks, ``np.add.reduceat`` per-segment folds, and C-grouped
pandas for the modes. Task count is bounded by buckets, never by key or
segment cardinality.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.keyed import bucketed_groups, sorted_pandas


@dataclass
class ModeSpec:
    """One mode column: ``src`` input column → ``out`` mode column.

    na_policy:
      - ``"exclude"``: nulls never win; all-null segment → null mode.
      - ``"sentinel"``: nulls participate as ``sentinel`` (the
        reference's sentinel-fallback include-NA variant).
    """

    src: str
    out: str
    na_policy: str = "exclude"
    sentinel: object = None


def _mode_per_segment(
    df: pd.DataFrame, seg: np.ndarray, spec: ModeSpec, n_segments: int
) -> pd.Series:
    """Vectorized mode (ties → smallest value) per segment id."""
    col = df[spec.src]
    if spec.na_policy == "sentinel":
        col = col.fillna(spec.sentinel)
    frame = pd.DataFrame({"seg": seg, "v": col})
    if spec.na_policy == "exclude":
        frame = frame.dropna(subset=["v"])
    c = frame.groupby(["seg", "v"], sort=False, as_index=False).size()
    c = c.sort_values(["seg", "size", "v"], ascending=[True, False, True],
                      kind="stable", ignore_index=True)
    win = c.drop_duplicates("seg").set_index("seg")["v"]
    return win.reindex(range(n_segments))


def segment_partition_fn(
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    gap: pd.Timedelta,
    value_col: str,
    mode_specs: list[ModeSpec],
):
    """Build the whole-partition segment materializer (pyarrow → pyarrow)."""

    def run(t: pa.Table) -> pa.Table:
        df = sorted_pandas(t, [key_col, *order_cols])
        n = len(df)
        if n == 0:
            return _empty_result(key_col, ts_col, mode_specs)
        keys = df[key_col].to_numpy()
        ts = df[ts_col].to_numpy()
        first_of_key = np.ones(n, dtype=bool)
        first_of_key[1:] = keys[1:] != keys[:-1]
        gap_break = np.zeros(n, dtype=bool)
        if n > 1:
            gap_break[1:] = (ts[1:] - ts[:-1]) > np.timedelta64(gap.to_timedelta64())
        new_seg = first_of_key | gap_break
        seg = np.cumsum(new_seg) - 1  # global segment id within partition
        starts = np.flatnonzero(new_seg)
        ends = np.append(starts[1:], n)
        n_segments = len(starts)

        # per-key ordinal of each segment (seg_index restarts at 0 per key)
        key_row = np.cumsum(first_of_key) - 1
        seg_at_key_start = seg[np.flatnonzero(first_of_key)]
        seg_ord = (seg - seg_at_key_start[key_row])[starts]

        # compressed (value, ts) sequence: keep first-of-segment rows and
        # rows whose value changed (K9 consecutive-dup compression);
        # serialized "v_milli@epoch_us|..." for engine-agnostic comparison
        from etl_ray.functions.rounding import round_half_away

        vals = df[value_col].to_numpy()
        keep = new_seg.copy()
        if n > 1:
            keep[1:] |= vals[1:] != vals[:-1]
        # integer millis via half-away rounding of v*1000 directly —
        # round(v,3)*1000 would reintroduce float error before the cast
        v_int = round_half_away(vals * 1000.0, 0).astype(np.int64)
        epoch = ts.astype("datetime64[us]").astype(np.int64)
        pieces = np.char.add(
            np.char.add(v_int.astype(str), "@"), epoch.astype(str)
        )
        kept_idx = np.flatnonzero(keep)
        kept_seg = seg[kept_idx]
        kept_pieces = pieces[kept_idx]
        bounds = np.searchsorted(kept_seg, np.arange(n_segments))
        bounds = np.append(bounds, len(kept_idx))
        seqs = [
            "|".join(kept_pieces[bounds[i]:bounds[i + 1]])
            for i in range(n_segments)
        ]

        out = {
            key_col: keys[starts],
            "seg": seg_ord.astype(np.int64),
            "start_ts": ts[starts],
            "end_ts": ts[ends - 1],
            "n_events": (ends - starts).astype(np.int64),
        }
        for spec in mode_specs:
            out[spec.out] = _mode_per_segment(df, seg, spec, n_segments).to_numpy()
        out["value_seq"] = np.asarray(seqs, dtype=object)
        return pa.Table.from_pandas(pd.DataFrame(out), preserve_index=False)

    return run


def _empty_result(key_col, ts_col, mode_specs) -> pa.Table:
    cols = {
        key_col: pa.array([], pa.int64()),
        "seg": pa.array([], pa.int64()),
        "start_ts": pa.array([], pa.timestamp("us")),
        "end_ts": pa.array([], pa.timestamp("us")),
        "n_events": pa.array([], pa.int64()),
    }
    for spec in mode_specs:
        cols[spec.out] = pa.array([], pa.string())
    cols["value_seq"] = pa.array([], pa.string())
    return pa.table(cols)


def materialize_segments(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    order_cols: list[str],
    gap: pd.Timedelta,
    value_col: str,
    mode_specs: list[ModeSpec],
    n_buckets: int | None = None,
) -> rd.Dataset:
    """Gap-split ``ds`` per key and emit one row per segment.

    Partitioning assumption: whole keys co-locate (hash-bucket groupby) —
    a key's full ordered history is visible to one task.
    """
    fn = segment_partition_fn(key_col, ts_col, order_cols, gap, value_col, mode_specs)
    return bucketed_groups(ds, key_col, fn, n_buckets=n_buckets)
