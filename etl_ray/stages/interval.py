"""Interval (range) join — points matched to [start, end) intervals.

The non-equi join the Dataset API has no native operator for: every
point row joins every interval row whose half-open range contains it
(``p >= start AND p < end``), with arbitrarily OVERLAPPING intervals.
Reference analog: the temporal containment probes of the benchmark
windows (``benchmarks/runners/cell_benchmark_runner.py:69-93`` picks
{1, 30, 90}-day ranges that each trajectory's span is tested against);
the general pattern (events-in-maintenance-window, trade-in-quote-band)
is a core training-data/analytics op the build brief names explicitly.

Partitioning assumption (documented per the custom-operator rule): the
domain is split into fixed-width time buckets ``tb = (v - origin) //
width``; a point belongs to exactly ONE bucket, an interval is
REPLICATED to every bucket it overlaps (capped at n_buckets — congruent
replicas mod B are deduped at tag time, so a pair can only ever form in
the point's bucket and exactly once). One exchange total, the same
known-boundary direct path as every other bucketed op (stages/keyed.py).
Pick ``width`` ≈ the typical interval length so the replication factor
stays O(1); a pathological interval spanning the whole domain replicates
to at most n_buckets partitions (bounded fan by construction).

Inside each partition the match is ONE vectorized pass, never a Python
loop and never a cartesian product: points are sorted once, each
interval's matches are the ``np.searchsorted`` slice [lo, hi), and

- ``interval_join`` emits the pairs by a repeat/gather (output bytes =
  true join cardinality, nothing more);
- ``interval_agg_join`` never materializes pairs at all — per-interval
  counts are ``hi - lo`` and sums are prefix-sum differences (exact on
  int64), shrinking each partition to ≤ its interval count before the
  tiny grouped-sum merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages import agg as F_agg
from etl_ray.stages.keyed import default_buckets, grouped_by_bucket


def _tagged_union(
    points: rd.Dataset,
    intervals: rd.Dataset,
    point_col: str,
    start_col: str,
    end_col: str,
    width: int,
    origin: int,
    b: int,
    schemas: tuple[pa.Schema, pa.Schema],
) -> tuple[rd.Dataset, pa.Table, list[str], list[str]]:
    """Bucket-tag both sides into one union stream with a shared layout.

    Returns (tagged dataset, typed empty table in the tagged layout,
    point payload columns, interval payload columns).
    """
    ps, ivs = schemas
    p_fields = dict(zip(ps.names, ps.types))
    i_fields = dict(zip(ivs.names, ivs.types))
    for c in (start_col, end_col):
        if c not in i_fields:
            raise ValueError(f"interval column {c!r} missing")
    if point_col not in p_fields:
        raise ValueError(f"point column {point_col!r} missing")
    p_rest = [c for c in ps.names if c != point_col]
    i_rest = [c for c in ivs.names if c not in (start_col, end_col)]
    overlap = (set(p_rest) | {point_col}) & (set(i_rest) | {start_col, end_col})
    if overlap:
        raise ValueError(f"column collision across sides: {sorted(overlap)}")

    order = [point_col, *p_rest, start_col, end_col, *i_rest, "_side", "_ibucket"]
    all_fields = {
        **p_fields,
        **i_fields,
        "_side": pa.bool_(),
        "_ibucket": pa.int32(),
    }
    empty_tagged = pa.table({c: pa.array([], all_fields[c]) for c in order})

    def tag_points(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0 or not t.column_names:
            return empty_tagged
        v = t.column(point_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tb = (v - origin) // width
        out = {point_col: t.column(point_col)}
        for c in p_rest:
            out[c] = t.column(c)
        for c in (start_col, end_col, *i_rest):
            out[c] = pa.nulls(n, i_fields[c])
        out["_side"] = pa.nulls(n, pa.bool_()).fill_null(False)
        out["_ibucket"] = pa.array((tb % b).astype(np.int32))
        return pa.table(out).select(order)

    def tag_intervals(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0 or not t.column_names:
            return empty_tagged
        s = t.column(start_col).to_numpy(zero_copy_only=False).astype(np.int64)
        e = t.column(end_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tb_lo = (s - origin) // width
        # half-open [s, e): the last occupied bucket holds e-1; empty
        # intervals (e <= s) still emit one replica so LEFT-ish callers
        # could see them — they simply never match
        tb_hi = (np.maximum(e, s + 1) - 1 - origin) // width
        ways = np.minimum(tb_hi - tb_lo + 1, b).astype(np.int64)
        idx = np.repeat(np.arange(n), ways)
        off = np.arange(len(idx)) - np.repeat(np.cumsum(ways) - ways, ways)
        bucket = ((np.repeat(tb_lo, ways) + off) % b).astype(np.int32)
        t = t.take(pa.array(idx))
        m = t.num_rows
        out = {point_col: pa.nulls(m, p_fields[point_col])}
        for c in p_rest:
            out[c] = pa.nulls(m, p_fields[c])
        for c in (start_col, end_col, *i_rest):
            out[c] = t.column(c)
        out["_side"] = pa.nulls(m, pa.bool_()).fill_null(True)
        out["_ibucket"] = pa.array(bucket)
        return pa.table(out).select(order)

    tagged = points.map_batches(
        tag_points, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        intervals.map_batches(
            tag_intervals, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    return tagged, empty_tagged, p_rest, i_rest


def _split_sides(
    t: pa.Table, point_col: str
) -> tuple[pd.DataFrame, pd.DataFrame, np.ndarray]:
    """Partition rows back into (points sorted by value, intervals,
    sorted point values). Split happens in ARROW so each side's columns
    convert to pandas without the other side's nulls (no int64 → float64
    widening on the key columns)."""
    import pyarrow.compute as pc

    is_iv = t.column("_side")
    pts_t = t.filter(pc.invert(is_iv))
    ivs_t = t.filter(is_iv)
    pts = pts_t.to_pandas()
    ivs = ivs_t.to_pandas()
    p = pts[point_col].to_numpy().astype(np.int64)
    sort = np.argsort(p, kind="stable")
    return pts.iloc[sort], ivs, p[sort]


def _match_slices(
    p_sorted: np.ndarray, ivs: pd.DataFrame, start_col: str, end_col: str
) -> tuple[np.ndarray, np.ndarray]:
    s = ivs[start_col].to_numpy().astype(np.int64)
    e = ivs[end_col].to_numpy().astype(np.int64)
    lo = np.searchsorted(p_sorted, s, side="left")
    hi = np.searchsorted(p_sorted, e, side="left")
    return lo, np.maximum(hi, lo)


def interval_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    width: int,
    origin: int = 0,
    n_buckets: int | None = None,
    schemas: tuple[pa.Schema, pa.Schema],
) -> rd.Dataset:
    """Inner range join: one output row per (point, containing interval)
    pair, columns = point columns + interval columns. ``point_col``,
    ``start_col`` and ``end_col`` must be integer-valued (cast
    timestamps to epoch integers upstream)."""
    b = n_buckets or default_buckets()
    tagged, empty_tagged, p_rest, i_rest = _tagged_union(
        points, intervals, point_col, start_col, end_col, width, origin, b, schemas
    )

    # the per-bucket merge already emits exactly the output layout —
    # no trailing map_batches (Ray skips UDFs on empty blocks, which
    # would turn a typed 0-row result schemaless)
    def merge_partition(t: pa.Table) -> pa.Table:
        pts, ivs, p = _split_sides(t.drop_columns(["_ibucket"]), point_col)
        lo, hi = _match_slices(p, ivs, start_col, end_col)
        cnt = hi - lo
        iv_idx = np.repeat(np.arange(len(ivs)), cnt)
        off = np.concatenate(([0], np.cumsum(cnt)))
        pt_idx = (
            np.arange(off[-1]) - np.repeat(off[:-1], cnt) + np.repeat(lo, cnt)
        )
        left = pts.iloc[pt_idx][[point_col, *p_rest]].reset_index(drop=True)
        right = ivs.iloc[iv_idx][[start_col, end_col, *i_rest]].reset_index(
            drop=True
        )
        out = pd.concat([left, right], axis=1)
        return pa.Table.from_pandas(out, preserve_index=False)

    return grouped_by_bucket(
        tagged,
        "_ibucket",
        b,
        merge_partition,
        empty_table=merge_partition(empty_tagged),
    )


def interval_agg_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    id_cols: list[str],
    sum_cols: list[str] | None = None,
    width: int,
    origin: int = 0,
    n_buckets: int | None = None,
    schemas: tuple[pa.Schema, pa.Schema],
) -> pd.DataFrame:
    """Aggregated range join, never materializing pairs: per interval
    (identified by ``id_cols``, which must be unique per interval row),
    the count of contained points (``n_points``) plus exact int64 sums
    of each point column in ``sum_cols`` (``sum_<col>``). Intervals with
    zero matches are dropped (inner semantics). Result is small by
    contract (one row per matched interval) and returned as pandas."""
    b = n_buckets or default_buckets()
    sum_cols = sum_cols or []
    tagged, empty_tagged, _p_rest, i_rest = _tagged_union(
        points, intervals, point_col, start_col, end_col, width, origin, b, schemas
    )
    for c in id_cols:
        if c not in (start_col, end_col, *i_rest):
            raise ValueError(f"id column {c!r} is not an interval column")
    out_names = [f"sum_{c}" for c in sum_cols]

    iv_schema = schemas[1]
    id_types = {c: iv_schema.field(c).type for c in id_cols}

    def partials(t: pa.Table) -> pa.Table:
        pts, ivs, p = _split_sides(t.drop_columns(["_ibucket"]), point_col)
        lo, hi = _match_slices(p, ivs, start_col, end_col)
        cnt = hi - lo
        keep = cnt > 0
        # explicit types: an all-empty partition must still emit the
        # declared schema (empty object arrays would infer pa.null())
        out = {
            c: pa.array(ivs[c].to_numpy()[keep], type=id_types[c])
            for c in id_cols
        }
        out["n_points"] = pa.array(cnt[keep].astype(np.int64))
        for c, name in zip(sum_cols, out_names):
            v = pts[c].to_numpy().astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(v)))
            out[name] = pa.array((csum[hi] - csum[lo])[keep])
        return pa.table(out)

    empty = partials(empty_tagged)
    part_ds = grouped_by_bucket(
        tagged, "_ibucket", b, partials, empty_table=empty
    )
    # an interval spanning multiple buckets contributed one partial per
    # bucket — sum-merge on the interval identity (tiny by contract)
    return F_agg.grouped_sum(part_ds, id_cols, empty)
