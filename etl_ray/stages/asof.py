"""Distributed as-of join (temporal backward lookup).

The streaming-enrichment primitive Ray Data lacks natively: every left
row is matched to the single most recent right row with the same key
whose time is <= the left row's time (``direction="backward"``,
inclusive — the SCD2 / "latest configuration at event time" lookup).
Reference analog: the per-key latest-state probes of
etl/rollup (SURVEY §2 K2/J8) generalized to a two-sided operator.

Shape: both sides are tagged into one schema and co-partitioned with
ONE hash exchange on the key column (``grouped_by_bucket``); inside
each bucket the match is pandas ``merge_asof`` over (key, time) pairs
only — a vectorized double-sorted merge, O(n log n) per bucket, never a
pair explosion — and the matched right ROWS are gathered with Arrow
``take`` so value columns keep their exact types (no int→float64 NaN
upcast, no >2^53 precision loss). The partitioning assumption: every
row of one key lands in one bucket, so a backward match never crosses
buckets; skew costs what the key's row count costs (linear after sort).

Right-side ties (same key, same time): pass ``tiebreak=<right col>``
to deterministically pick the max-tiebreak row (the ``arg_max(...,
tiebreak)`` SQL dedup, replayed exactly); without it the winner depends
on block arrival order here and is engine-arbitrary in SQL, so tie
dedup upstream is the caller's contract for engine/oracle parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.keyed import bucket_ids, default_buckets, grouped_by_bucket


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    by: str,
    on: str,
    n_buckets: int | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> rd.Dataset:
    """As-of join of two Datasets (backward- or forward-inclusive).

    ``direction="backward"`` (default) matches the most recent right
    row with ``on`` <= the left row's; ``"forward"`` matches the
    EARLIEST right row with ``on`` >= the left row's (the "next event
    after" lookup — attribution windows, next-purchase joins). With a
    ``tiebreak``, equal-``on`` right rows resolve to the max tiebreak in
    both directions (numeric tiebreak required for forward).

    ``by``: equality key column (both sides); ``on``: never-null
    orderable column (both sides; int64 epoch-us recommended). All
    other columns pass through; right-side column names must not
    collide with left-side names (rename upstream). Unmatched left
    rows carry nulls in the right columns.
    """
    b = n_buckets or default_buckets()
    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = list(lschema.names)
    rcols = [c for c in rschema.names if c not in (by, on)]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"right-side columns collide with left: {sorted(clash)}")
    if tiebreak is not None and tiebreak not in rcols:
        raise ValueError(f"tiebreak {tiebreak!r} must be a right value column")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if direction == "forward" and tiebreak is not None:
        tb_type = rschema.field(tiebreak).type
        if not (pa.types.is_signed_integer(tb_type)
                or pa.types.is_floating(tb_type)):
            # forward tiebreak sorts by NEGATED values: unsigned ints wrap
            # modulo 2^64 and non-numerics TypeError deep inside numpy —
            # fail loudly at the API boundary instead
            raise ValueError(
                f"forward tiebreak needs a signed numeric column, got "
                f"{tb_type} for {tiebreak!r}")

    out_fields = [(c, lschema.field(c).type) for c in lcols]
    out_fields += [(c, rschema.field(c).type) for c in rcols]
    empty = pa.table({c: pa.array([], t) for c, t in out_fields})

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for c, typ in out_fields:
                cols[c] = (
                    t.column(c).cast(typ) if c in t.column_names
                    else pa.nulls(n, typ)
                )
            cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
            cols["_bucket"] = (
                pa.array([], pa.int32()) if n == 0
                else bucket_ids(t.column(by), b)
            )
            return pa.table(cols)

        return fn

    tagged = left.map_batches(
        tag(0), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True)
    )

    def bucket_asof(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_bucket"])
        if t.num_rows == 0 or not t.column_names:
            return empty
        side = t.column("_side").to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(lcols)
        if lt.num_rows == 0:
            return empty
        rt = t.filter(pa.array(side == 1)).select([by, on] + rcols)

        # merge_asof wants both frames globally sorted by `on`
        l_on = lt.column(on).to_numpy(zero_copy_only=False)
        lorder = np.argsort(l_on, kind="stable")
        lt = lt.take(pa.array(lorder))

        if rt.num_rows == 0:
            matched = {c: pa.nulls(lt.num_rows, typ)
                       for c, typ in out_fields if c in rcols}
            return pa.table(
                {c: lt.column(c) for c in lcols} | matched)

        r_on = rt.column(on).to_numpy(zero_copy_only=False)
        if tiebreak is not None:
            tb = rt.column(tiebreak).to_numpy(zero_copy_only=False)
            # backward picks the LAST row <= (max tb with asc sort);
            # forward picks the FIRST row >= (max tb needs desc sort)
            rorder = np.lexsort((tb if direction == "backward" else -tb, r_on))
        else:
            rorder = np.argsort(r_on, kind="stable")
        rt = rt.take(pa.array(rorder))

        # keys+positions only through pandas; values gathered in Arrow
        m = pd.merge_asof(
            pd.DataFrame({by: lt.column(by).to_numpy(zero_copy_only=False),
                          on: l_on[lorder]}),
            pd.DataFrame({by: rt.column(by).to_numpy(zero_copy_only=False),
                          on: r_on[rorder],
                          "_ridx": np.arange(rt.num_rows, dtype=np.int64)}),
            on=on, by=by, direction=direction,
        )
        ridx = m["_ridx"].to_numpy(np.float64)
        miss = np.isnan(ridx)
        idx = pa.array(np.where(miss, 0, ridx).astype(np.int64), mask=miss)
        gathered = rt.select(rcols).take(idx)
        return pa.table(
            {c: lt.column(c) for c in lcols}
            | {c: gathered.column(c) for c in rcols})

    return grouped_by_bucket(tagged, "_bucket", b, bucket_asof,
                             empty_table=empty)
