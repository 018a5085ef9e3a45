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

Skew: pass ``salt_threshold=R`` and keys whose LEFT-side row count
reaches R are SALTED — each hot left row gets a salt in [0, S) with
S = ceil(count/R), each hot RIGHT row is replicated S× (once per salt),
and the bucket key becomes hash(key, salt); a hot key's rows then spread
over ≥ min(S, B) merge tasks, bounding per-task memory at ~R left rows.
Detection is a per-batch combiner + one small (key, count) aggregate with
the hot set (≤ |left|/R keys by construction) filtered IN-cluster before
it reaches the driver — the Ray analog of the reference's density-based
KD-tree partition rebalancing
(``etl/partition_builder/02_kd_tree_construction.sql:36-60``,
``03_best_split_horizontal.sql:1-40``).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from etl_ray.stages.keyed import bucket_ids, default_buckets

_SALT_MIX = np.uint64(0x9E3779B97F4A7C15)


def _arrow_type(t) -> pa.DataType:
    """Normalize Dataset.schema() types — pandas-backed datasets report
    numpy/python types instead of Arrow DataTypes."""
    if isinstance(t, pa.DataType):
        return t
    if t in (object, str):
        return pa.string()
    return pa.from_numpy_dtype(np.dtype(t))


def detect_hot_keys(
    ds: rd.Dataset, on: str, threshold: int, key_type: pa.DataType | None = None
) -> dict:
    """Keys of ``ds`` with ≥ ``threshold`` rows → {key: salt_ways}.

    Per-batch partial counts (combiner) → one small groupby over (key,
    partial) rows → in-cluster filter to the hot set before take_all —
    the driver sees ≤ total_rows/threshold keys, never the histogram.
    """
    from ray.data.aggregate import Sum

    kt = key_type or pa.int64()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({on: pa.array([], kt),
                             "_hn": pa.array([], pa.int64())})
        g = t.select([on]).to_pandas().groupby(on, as_index=False).size()
        return pa.table({on: pa.array(g[on].to_numpy()),
                         "_hn": pa.array(g["size"].to_numpy().astype(np.int64))})

    totals = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(on)
        .aggregate(Sum("_hn", alias_name="_hn"))
        .map_batches(
            lambda t: (
                t
                if t.num_rows == 0  # columnless empty blocks: engine rule
                else t.filter(pc.greater_equal(t.column("_hn"), threshold))
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )
    return {r[on]: math.ceil(r["_hn"] / threshold) for r in totals}


def _hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Full-width uint64 key hash (pre-modulus, for salt mixing)."""
    from etl_ray.stages.keyed import _HASH_KEY

    if pa.types.is_integer(col.type):
        with np.errstate(over="ignore"):
            return (
                col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
                * _SALT_MIX
            ) >> np.uint64(33)
    arr = col.to_pandas().to_numpy(dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY)


def _salted_buckets(col, salt: np.ndarray, b: int) -> pa.Array:
    h = _hash64(col)
    with np.errstate(over="ignore"):
        h = h + salt.astype(np.uint64) * _SALT_MIX
    return pa.array((h % b).astype(np.int32))


def _salt_ways(keys: np.ndarray, hot: dict) -> np.ndarray:
    """Per-row salt fan (1 for cold keys) — vectorized dict lookup."""
    return (
        pd.Series(keys).map(hot).fillna(1).astype(np.int64).to_numpy()
    )


def shuffle_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    how: str = "inner",
    n_buckets: int | None = None,
    salt_threshold: int | None = None,
    schemas: tuple[pa.Schema, pa.Schema] | None = None,
) -> rd.Dataset:
    """Distributed hash join of two large Datasets on column ``on``.

    ``how``: "inner", "left", "outer" (full), "semi" or "anti". Non-key
    column names must be disjoint. Schemas are read from dataset metadata
    once to build the unified tagged layout (null-filled columns for the
    other side).
    "outer" emits unmatched rows of BOTH sides (the reconciliation /
    snapshot-diff shape) — per-bucket correctness holds because a key's
    rows land in exactly one bucket on both sides; salting breaks that
    invariant for unmatched rows, so outer + salt_threshold is rejected.

    "semi" keeps left rows whose key appears on the right; "anti" keeps
    left rows whose key does NOT (the reference's NOT-IN backfill scans,
    ``etl/insert/bulk_inserter.py:59-113`` ensure discipline). For both,
    the right side is pruned to the key column BEFORE the exchange —
    membership needs no payload, so the shuffle carries left bytes +
    right keys only, and the output schema is exactly the left schema.

    Dtype note: the tagged union makes every non-key column nullable;
    integer columns transiently widen to float64 in the per-bucket pandas
    frame and are cast BACK to their declared integer types (nullable
    Int64 where a LEFT join introduced real nulls) before the output
    block is emitted — exact-integer joins are safe.

    ``salt_threshold``: when set, LEFT-side keys with ≥ that many rows
    are salted S = ceil(count/threshold) ways and the matching RIGHT rows
    replicated S× (module docstring). Pick it as the per-merge-task row
    budget (heap_bytes / avg_row_bytes). The big/probe side must be
    ``left``; swap the call if the right side is the skewed one.
    """
    b = n_buckets or default_buckets()
    if how not in ("inner", "left", "outer", "semi", "anti"):
        raise ValueError(f"unsupported how={how!r}")
    if how == "outer" and salt_threshold is not None:
        # salting replicates hot right rows across salt buckets; an outer
        # merge would emit the replicas in salt buckets with no left rows
        # as phantom unmatched rows (and the matched copy elsewhere)
        raise ValueError("salt_threshold is not supported with how='outer'")
    # .schema() on a transformed Dataset forces a limit(1) partial
    # execution (~0.5-1.5 s each on this VM) — callers that know their
    # schemas pass them explicitly
    ls, rs = schemas if schemas is not None else (left.schema(), right.schema())
    hot: dict = {}
    if salt_threshold is not None:
        kt = _arrow_type(dict(zip(ls.names, ls.types))[on])
        hot = detect_hot_keys(left, on, salt_threshold, kt)
        # cap the fan at n_buckets: salts s1 != s2 collide into the same
        # bucket exactly when s1 ≡ s2 (mod b), so fans beyond b replicate
        # right rows into buckets that ALREADY hold a congruent replica —
        # duplicated join output. Spread cannot exceed b anyway.
        hot = {k: min(s, b) for k, s in hot.items() if s > 1}
    l_fields = {n: _arrow_type(t) for n, t in zip(ls.names, ls.types)}
    r_fields = {n: _arrow_type(t) for n, t in zip(rs.names, rs.types)}
    if on not in l_fields or on not in r_fields:
        raise ValueError(f"join key {on!r} missing from a side")
    if how in ("semi", "anti"):
        # membership-only join: ship right KEYS, nothing else
        right = right.select_columns([on])
        r_fields = {on: r_fields[on]}
        rs = pa.schema([pa.field(on, r_fields[on])])
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

    # hot-key set shipped ONCE via ray.put (bounded ≤ |left|/threshold
    # keys), fetched from plasma per task — never re-shipped per batch
    hot_ref = None
    if hot:
        import ray as _ray

        hot_ref = _ray.put(
            {"fan": hot, "keys": np.array(list(hot.keys()))}
        )

    def tag(side_rest, other_rest, other_fields, is_right: bool):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            if n == 0:  # Ray Data can emit COLUMNLESS empty blocks —
                return empty_tagged  # pin the declared union schema
            if hot_ref is not None:
                import ray as _ray

                h = _ray.get(hot_ref)
                keys = t.column(on).to_pandas().to_numpy()
                hot_mask = np.isin(keys, h["keys"])
                if not hot_mask.any():
                    # cold batch: keep the SALTED bucket formula (salt 0)
                    # so co-location with salted batches holds, but skip
                    # the per-row dict map and the full-batch take()
                    salt = np.zeros(n, dtype=np.int64)
                else:
                    ways = _salt_ways(keys, h["fan"])
                    if is_right:
                        # replicate hot rows S× — one copy per salt value,
                        # so every salted left bucket sees the full right
                        # side
                        idx = np.repeat(np.arange(n), ways)
                        salt = np.arange(len(idx)) - np.repeat(
                            np.cumsum(ways) - ways, ways
                        )
                        t = t.take(pa.array(idx))
                    else:
                        # spread hot left rows by their PER-KEY arrival
                        # index (cumcount), not the global batch position
                        # — a periodic layout (hot key on every 2nd row)
                        # would otherwise map every hot row to one salt
                        # and defeat the memory bound
                        salt = np.zeros(n, dtype=np.int64)
                        hk = pd.Series(keys[hot_mask])
                        within = hk.groupby(hk, sort=False).cumcount().to_numpy()
                        salt[hot_mask] = within % ways[hot_mask]
                n = t.num_rows
            out = {on: t.column(on)}
            for c in side_rest:
                out[c] = t.column(c)
            for c in other_rest:
                out[c] = pa.nulls(n, other_fields[c])
            out["_side"] = pa.nulls(n, pa.bool_()).fill_null(is_right)
            out["_jbucket"] = (
                _salted_buckets(t.column(on), salt, b)
                if hot_ref is not None
                else bucket_ids(t.column(on), b)
            )
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
        if how in ("semi", "anti"):
            # vectorized membership — never a cartesian merge; duplicate
            # right keys (or salt replicas) cannot duplicate left rows
            member = ldf[on].isin(rdf[on].to_numpy())
            out = ldf[member if how == "semi" else ~member].copy()
        else:
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

    from etl_ray.stages.keyed import grouped_by_bucket

    # known-boundary exchange on our dense _jbucket (stages/keyed.py);
    # ETL_RAY_GROUP_EXCHANGE=sort selects the AllToAll path. The typed
    # empty (merge of the empty tagged layout) keeps a zero-match join's
    # output schema intact for downstream groupby/select.
    return grouped_by_bucket(
        tagged, "_jbucket", b, merge_partition,
        empty_table=merge_partition(empty_tagged),
    )
