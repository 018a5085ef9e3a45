"""Mergeable sketch operators: KMV distinct-count, histogram quantiles.

Both are built from ASSOCIATIVE partials so they compose with any
exchange tree (the same property the replay's cascaded fold exploits):

- **KMV (k minimum values)**: per-batch partial = the k smallest
  distinct 32-bit key hashes; merging two partials = union → k smallest
  — order-free. The estimator ``(k-1) * 2^32 / kth_min`` is the classic
  KMV distinct-count (Bar-Yossef et al.). The hash is a Knuth
  multiplicative ``(key * 2654435761) mod 2^32`` — deliberately
  SQL-replicable, so the DuckDB oracle recomputes the *identical sketch*
  constant-for-constant and the driver hash-gates the full pipeline,
  not just row counts.
- **Histogram quantiles**: values are quantized to an integer grid
  (milli-units, matching SQL ``round(value*1000, 0)`` half-away), then
  (grid value → count) partials fold by value hash — ONE bounded-size
  histogram per distinct grid value regardless of row count. Discrete
  lower quantile: smallest grid value whose cumulative count reaches
  ``ceil(q * total)``.

Scale shape: per-batch partials are tiny (≤ k rows for KMV, ≤ distinct
grid values per batch for the histogram); the exchange carries partials
only; the final reduce sees ≤ k × ranges (KMV) / ≤ |grid domain| rows
(quantiles — domain-bounded by construction, NOT row-bounded).
Reference analog: the audit/statistics aggregates the warehouse keeps
per load (``etl/audit/logger.py:81-103``) generalized to mergeable
sketches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from etl_ray.functions.rounding import round_half_away
from etl_ray.stages.keyed import bucketed_groups, grouped_by_bucket

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)


def _kmv_hashes(keys: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (keys.astype(np.uint64) * _KNUTH) % _MOD32


def kmv_distinct(ds: rd.Dataset, key_col: str, k: int = 64):
    """KMV distinct-count sketch over a NON-NEGATIVE integer key column
    (the SQL replica's HUGEINT modulus matches uint64 wrap only for
    keys ≥ 0).

    Returns ONE row: (k_used, kth_min, est_distinct). When fewer than
    ``k`` distinct hashes exist the estimate degrades gracefully to the
    exact distinct-hash count (both engines apply the same rule).
    """

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"hv": pa.array([], pa.int64())})
        hv = np.unique(
            _kmv_hashes(t.column(key_col).to_numpy(zero_copy_only=False))
        )
        if len(hv) > k:
            hv = np.partition(hv, k - 1)[:k]
        return pa.table({"hv": pa.array(hv.astype(np.int64))})

    def combine(t: pa.Table) -> pa.Table:
        # per-bucket k-min keep: the global k smallest are a subset of
        # the union of per-bucket k smallest, so this fold is lossless
        # and bounds the final reduce at k × n_buckets rows
        hv = np.unique(t.column("hv").to_numpy(zero_copy_only=False))
        if len(hv) > k:
            hv = np.partition(hv, k - 1)[:k]
        return pa.table(
            {
                "hv": pa.array(hv.astype(np.int64)),
                "_sb": pa.array(np.zeros(len(hv), np.int32)),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        hv = np.unique(t.column("hv").to_numpy(zero_copy_only=False))
        hv = np.sort(hv)[:k]
        k_used = len(hv)
        if k_used == 0:
            return pa.table(
                {"k_used": pa.array([0], pa.int64()),
                 "kth_min": pa.array([0], pa.int64()),
                 "est_distinct": pa.array([0.0], pa.float64())}
            )
        kth = int(hv[-1])
        if k_used < k:
            est = float(k_used)  # saw every distinct hash: exact
        else:
            est = (k - 1) * float(_MOD32) / kth
        return pa.table(
            {
                "k_used": pa.array([k_used], pa.int64()),
                "kth_min": pa.array([kth], pa.int64()),
                "est_distinct": pa.array(
                    [float(round_half_away(np.array([est]), 6)[0])], pa.float64()
                ),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    combined = bucketed_groups(partials, "hv", combine)
    return grouped_by_bucket(combined, "_sb", 1, final).to_pandas()


def kmv_sql(table: str, key_col: str, k: int = 64) -> str:
    """The DuckDB replica of :func:`kmv_distinct` (HUGEINT arithmetic)."""
    return f"""
WITH h AS (
  SELECT DISTINCT CAST((CAST({key_col} AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS hv
  FROM {table}
), kmin AS (
  SELECT hv FROM h ORDER BY hv LIMIT {k}
)
SELECT CAST(count(*) AS BIGINT) AS k_used,
       CAST(max(hv) AS BIGINT) AS kth_min,
       round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                  ELSE ({k} - 1) * 4294967296.0 / max(hv) END, 6) AS est_distinct
FROM kmin
"""


def histogram_quantiles(
    ds: rd.Dataset,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> pa.Table:
    """Discrete lower quantiles of ``round(value*1000)`` milli-units.

    Two-round fold: per-batch (grid value → count) partials → bucketed
    sum per grid value (bounded by the value DOMAIN, not the row count)
    → one final cumsum task. Returns (q, mv_q) rows sorted by q.
    """

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mv": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        mv = round_half_away(v * 1000.0, 0).astype(np.int64)
        uniq, cnt = np.unique(mv, return_counts=True)
        return pa.table({"mv": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))})

    def fold(t: pa.Table) -> pa.Table:
        mv = t.column("mv").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(mv, kind="stable")
        mv, n = mv[order], n[order]
        starts = np.flatnonzero(np.concatenate(([True], mv[1:] != mv[:-1])))
        sums = np.add.reduceat(n, starts)
        out = pa.table(
            {
                "mv": pa.array(mv[starts].astype(np.int64)),
                "n": pa.array(sums.astype(np.int64)),
                "_sb": pa.array(np.zeros(len(starts), np.int32)),
            }
        )
        return out

    def final(t: pa.Table) -> pa.Table:
        mv = t.column("mv").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(mv, kind="stable")
        mv, n = mv[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        out_q, out_v = [], []
        for q in qs:
            rank = int(np.ceil(q * total))
            idx = int(np.searchsorted(cum, rank, side="left"))
            out_q.append(float(q))
            out_v.append(int(mv[idx]))
        return pa.table(
            {"q": pa.array(out_q, pa.float64()), "mv_q": pa.array(out_v, pa.int64())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    hist = bucketed_groups(partials, "mv", fold)
    res = grouped_by_bucket(hist, "_sb", 1, final).to_pandas()
    return res.sort_values("q").reset_index(drop=True)


def histogram_quantiles_sql(table: str, value_col: str) -> str:
    return f"""
WITH h AS (
  SELECT CAST(round({value_col} * 1000, 0) AS BIGINT) AS mv, count(*) AS n
  FROM {table} GROUP BY 1
), o AS (
  SELECT mv, sum(n) OVER (ORDER BY mv) AS cum, sum(n) OVER () AS total FROM h
)
SELECT CAST(q AS DOUBLE) AS q,
       CAST(min(CASE WHEN cum >= CAST(ceil(q * total) AS BIGINT) THEN mv END) AS BIGINT) AS mv_q
FROM o CROSS JOIN (VALUES (0.25), (0.50), (0.75), (0.90)) qs(q)
GROUP BY q
ORDER BY q
"""


def grouped_histogram_quantiles(
    ds: rd.Dataset,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    n_buckets: int | None = None,
):
    """Per-KEY discrete lower quantiles of ``round(value*1000)`` —
    :func:`histogram_quantiles` with a composite (key, grid-value) fold.

    Shape: per-batch (key, mv, n) partials (≤ keys × grid values per
    batch) → composite-key bucketed sum (bucketed_groups_multi — bounded
    by keys × |grid domain|, never rows) → ONE per-key pass computing
    every requested quantile with cython cumsum/first (no per-key Python
    dispatch). Returns (key, q, mv_q) rows.
    """
    import pandas as pd

    from etl_ray.stages.agg import bucketed_groups_multi
    from etl_ray.stages.keyed import to_pandas_typed

    empty_h = pa.table({key_col: pa.array([], pa.string()),
                        "mv": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_h
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame(
            {key_col: t.column(key_col).to_pandas().to_numpy(),
             "mv": round_half_away(v * 1000.0, 0).astype(np.int64)}
        )
        g = df.groupby([key_col, "mv"], sort=False, as_index=False).size()
        return pa.table({key_col: pa.array(g[key_col].to_numpy()),
                         "mv": pa.array(g["mv"].to_numpy()),
                         "n": pa.array(g["size"].to_numpy().astype(np.int64))})

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty_h
        g = t.to_pandas().groupby([key_col, "mv"], sort=False, as_index=False)["n"].sum()
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({key_col: pa.array([], pa.string()),
                             "q": pa.array([], pa.float64()),
                             "mv_q": pa.array([], pa.int64())})
        df = t.to_pandas().sort_values([key_col, "mv"], kind="stable")
        df["cum"] = df.groupby(key_col, sort=False)["n"].cumsum()
        df["total"] = df.groupby(key_col, sort=False)["n"].transform("sum")
        outs = []
        for q in qs:  # loops over the CONSTANT quantile list, not keys
            sel = (
                df[df["cum"] >= np.ceil(q * df["total"])]
                .groupby(key_col, sort=False, as_index=False)
                .first()[[key_col, "mv"]]
                .rename(columns={"mv": "mv_q"})
            )
            sel["q"] = float(q)
            outs.append(sel)
        out = pd.concat(outs, ignore_index=True)[[key_col, "q", "mv_q"]]
        out["mv_q"] = out["mv_q"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    hist = bucketed_groups_multi(partials, [key_col, "mv"], fold,
                                 n_buckets=n_buckets, empty=empty_h)
    res = to_pandas_typed(
        bucketed_groups(hist, key_col, final, n_buckets=n_buckets),
        final(empty_h),
    )
    return res.sort_values([key_col, "q"]).reset_index(drop=True)


def grouped_histogram_quantiles_sql(table: str, key_col: str, value_col: str) -> str:
    return f"""
WITH h AS (
  SELECT {key_col}, CAST(round({value_col} * 1000, 0) AS BIGINT) AS mv,
         count(*) AS n
  FROM {table} GROUP BY 1, 2
), o AS (
  SELECT {key_col}, mv,
         sum(n) OVER (PARTITION BY {key_col} ORDER BY mv) AS cum,
         sum(n) OVER (PARTITION BY {key_col}) AS total
  FROM h
)
SELECT {key_col}, CAST(q AS DOUBLE) AS q,
       CAST(min(CASE WHEN cum >= CAST(ceil(q * total) AS BIGINT) THEN mv END) AS BIGINT) AS mv_q
FROM o CROSS JOIN (VALUES (0.25), (0.50), (0.75), (0.90)) qs(q)
GROUP BY {key_col}, q
ORDER BY {key_col}, q
"""


_BLOOM_H1 = np.uint64(2654435761)
_BLOOM_H2 = np.uint64(2246822519)


def _bloom_positions(keys: np.ndarray, m_bits: int):
    with np.errstate(over="ignore"):
        h1 = (keys.astype(np.uint64) * _BLOOM_H1) % _MOD32 % np.uint64(m_bits)
        h2 = (keys.astype(np.uint64) * _BLOOM_H2) % _MOD32 % np.uint64(m_bits)
    return h1.astype(np.int64), h2.astype(np.int64)


def bloom_build(ds: rd.Dataset, key_col: str, m_bits: int = 1 << 16,
                n_buckets: int | None = None) -> np.ndarray:
    """Bloom bitmap over a non-negative integer key column.

    Per-batch partial = the batch's bit positions (two Knuth-style
    hashes, deliberately SQL-replicable); the fold is a bitwise OR —
    fully associative, so partials merge in any exchange tree. The
    driver receives ONE m_bits/8-byte bitmap (8 KB at the default),
    never keys. Reference analog: the ensure-scan membership pre-filter
    (etl/insert/bulk_inserter.py NOT-IN discipline) made approximate +
    constant-size for broadcast.
    """

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"pos": pa.array([], pa.int64())})
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        h1, h2 = _bloom_positions(k, m_bits)
        return pa.table({"pos": pa.array(np.unique(np.concatenate([h1, h2])))})

    def fold(t: pa.Table) -> pa.Table:
        pos = np.unique(t.column("pos").to_numpy(zero_copy_only=False))
        return pa.table({"pos": pa.array(pos),
                         "_sb": pa.array(np.zeros(len(pos), np.int32))})

    def final(t: pa.Table) -> pa.Table:
        pos = np.unique(t.column("pos").to_numpy(zero_copy_only=False))
        return pa.table({"pos": pa.array(pos.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # the position domain is m_bits (8 KB default): a handful of fold
    # buckets suffices regardless of input rows — CPU-derived widths
    # only add per-task dispatch on a domain-bounded sketch
    folded = bucketed_groups(parts, "pos", fold, n_buckets=n_buckets or 8)
    pos_t = grouped_by_bucket(folded, "_sb", 1, final)
    bitmap = np.zeros(m_bits, dtype=bool)
    for block in pos_t.iter_batches(batch_format="pyarrow"):
        if block.num_rows and "pos" in block.column_names:
            bitmap[block.column("pos").to_numpy(zero_copy_only=False)] = True
    return bitmap


def bloom_contains(bitmap: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership mask (true ⇒ maybe-member; false ⇒ not)."""
    h1, h2 = _bloom_positions(keys, len(bitmap))
    return bitmap[h1] & bitmap[h2]


# --- count-min sketch (heavy-hitter estimation) -------------------------------

def _cm_positions(keys: np.ndarray, row: int, width: int) -> np.ndarray:
    """Row ``row``'s counter position per key — Knuth multiplicative with
    a per-row odd multiplier (2654435761 + 2r), mod 2^32 then mod width.
    Deliberately SQL-replicable (HUGEINT arithmetic, see cm_sql)."""
    mult = _KNUTH + np.uint64(2 * row)
    with np.errstate(over="ignore"):
        return (((keys.astype(np.uint64) * mult) % _MOD32)
                % np.uint64(width)).astype(np.int64)


def cm_build(ds: rd.Dataset, key_col: str, depth: int = 4,
             width: int = 1024) -> np.ndarray:
    """Count-min sketch over a non-negative integer key column.

    Per-batch partial = bincounts of each row's positions, emitted as
    (cell = row*width + pos, cnt) pairs — ≤ depth×width rows per batch
    regardless of batch size. The fold is a grouped SUM (associative,
    any exchange tree); the driver receives ONE depth×width counter
    matrix (32 KB at the defaults), never keys. Point estimate =
    column-min across rows (classic Cormode-Muthukrishnan upper bound).
    """
    from etl_ray.stages.agg import grouped_sum

    empty = pa.table({"cell": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        cells, counts = [], []
        for r in range(depth):
            pos = _cm_positions(k, r, width)
            c = np.bincount(pos, minlength=width)
            nz = np.flatnonzero(c)
            cells.append(nz + r * width)
            counts.append(c[nz])
        return pa.table({"cell": pa.array(np.concatenate(cells)),
                         "cnt": pa.array(np.concatenate(counts).astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # domain-bounded (depth×width cells): a few fold buckets suffice
    merged = grouped_sum(parts, ["cell"], empty, n_buckets=8)
    sk = np.zeros(depth * width, dtype=np.int64)
    if len(merged):
        sk[merged["cell"].to_numpy()] = merged["cnt"].to_numpy()
    return sk.reshape(depth, width)


def cm_estimate(sketch: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Point-estimate counts for ``keys``: min across sketch rows."""
    depth, width = sketch.shape
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(depth):
        est = np.minimum(est, sketch[r, _cm_positions(keys, r, width)])
    return est


def cm_sql(table: str, key_col: str, probe_filter: str,
           depth: int = 4, width: int = 1024) -> str:
    """DuckDB replica of cm_build + cm_estimate for probes selected by
    ``probe_filter`` (a WHERE fragment over ``table``)."""
    return f"""
WITH cells AS (
  SELECT t.r,
         CAST((CAST({key_col} AS HUGEINT) * (2654435761 + 2 * t.r))
              % 4294967296 AS BIGINT) % {width} AS pos,
         CAST(count(*) AS BIGINT) AS cnt
  FROM {table}, range({depth}) t(r)
  GROUP BY 1, 2
), probes AS (
  SELECT DISTINCT {key_col} FROM {table} WHERE {probe_filter}
)
SELECT p.{key_col},
       CAST(min(c.cnt) AS BIGINT) AS cm_est
FROM probes p
CROSS JOIN range({depth}) t(r)
JOIN cells c
  ON c.r = t.r
 AND c.pos = CAST((CAST(p.{key_col} AS HUGEINT) * (2654435761 + 2 * t.r))
                  % 4294967296 AS BIGINT) % {width}
GROUP BY 1 ORDER BY 1
"""


def grouped_kmv_distinct(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    k: int = 64,
    key_type: pa.DataType | None = None,
    n_buckets: int | None = None,
):
    """Per-key KMV distinct-count: one (k_used, kth_min, est_distinct)
    row per group key — the grouped composition of :func:`kmv_distinct`.

    Per-batch partial = each key's k smallest distinct value hashes
    (≤ keys_in_batch × k rows); ONE key exchange; per-partition fold =
    one lexsort + duplicate-drop + per-key head(k). Associative and
    order-free, so any exchange tree merges partials correctly.
    """
    from etl_ray.stages.keyed import bucketed_groups

    kt = key_type or pa.string()
    empty_part = pa.table({key_col: pa.array([], kt),
                           "hv": pa.array([], pa.int64())})

    def _kmin(df):
        df = df.drop_duplicates([key_col, "hv"]).sort_values(
            [key_col, "hv"], kind="stable")
        return df.groupby(key_col, sort=False).head(k)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return empty_part
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            key_col: t.column(key_col).to_pandas(),
            "hv": _kmv_hashes(v).astype(np.int64),
        })
        return pa.Table.from_pandas(_kmin(df), preserve_index=False)

    def fold(t: pa.Table) -> pa.Table:
        df = _kmin(t.to_pandas())
        g = df.groupby(key_col, sort=False)["hv"].agg(["size", "max"])
        out = g.reset_index().rename(columns={"size": "k_used",
                                              "max": "kth_min"})
        out["k_used"] = out["k_used"].astype("int64")
        out["kth_min"] = out["kth_min"].astype("int64")
        est = np.where(
            out["k_used"] < k,
            out["k_used"].astype(float),
            (k - 1) * 4294967296.0 / out["kth_min"].to_numpy(),
        )
        out["est_distinct"] = round_half_away(est, 6)
        return pa.Table.from_pandas(out, preserve_index=False)

    res = bucketed_groups(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        key_col, fold, n_buckets=n_buckets or 8,
    )
    from etl_ray.stages.keyed import to_pandas_typed

    proto = fold(empty_part)
    return to_pandas_typed(res, proto)


def grouped_kmv_sql(table: str, key_col: str, val_col: str, k: int = 64) -> str:
    """DuckDB replica of :func:`grouped_kmv_distinct`."""
    return f"""
WITH h AS (
  SELECT DISTINCT {key_col},
         CAST((CAST({val_col} AS HUGEINT) * 2654435761) % 4294967296 AS BIGINT) AS hv
  FROM {table}
), r AS (
  SELECT {key_col}, hv,
         ROW_NUMBER() OVER (PARTITION BY {key_col} ORDER BY hv) AS rn
  FROM h
), kmin AS (
  SELECT {key_col}, hv FROM r WHERE rn <= {k}
)
SELECT {key_col},
       CAST(count(*) AS BIGINT) AS k_used,
       CAST(max(hv) AS BIGINT) AS kth_min,
       round(CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                  ELSE ({k} - 1) * 4294967296.0 / max(hv) END, 6)
         AS est_distinct
FROM kmin GROUP BY {key_col} ORDER BY {key_col}
"""


# --- HyperLogLog distinct-count ----------------------------------------------

_HLL_P = 9                      # 2^9 = 512 registers
_HLL_M = 1 << _HLL_P
_HLL_WBITS = 32 - _HLL_P        # 23 suffix bits feed the rank


def _fmix32(keys: np.ndarray) -> np.ndarray:
    """Murmur3 fmix32 finalizer over non-negative integer keys — full
    avalanche, which HLL needs (the Knuth multiplicative hash KMV uses
    leaves sequential keys' register/rank bits correlated: measured 44%
    estimate bias at 20k distinct). Still SQL-replicable: xor + integer
    div-by-power-of-two + HUGEINT multiply mod 2^32."""
    h = keys.astype(np.uint64) % _MOD32
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(16)
        h = (h * np.uint64(0x85EBCA6B)) % _MOD32
        h ^= h >> np.uint64(13)
        h = (h * np.uint64(0xC2B2AE35)) % _MOD32
        h ^= h >> np.uint64(16)
    return h


def _hll_partial_pairs(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) pairs for a key batch, already max-folded
    per index. Rank = leading-zero count of the 23-bit suffix + 1,
    computed exactly via ``np.frexp`` (frexp's exponent IS bit_length
    for positive integers — no float-log rounding hazards)."""
    hv = _fmix32(keys)                          # 32-bit avalanche, SQL-replicable
    idx = (hv >> np.uint64(_HLL_WBITS)).astype(np.int64)
    w = (hv & np.uint64((1 << _HLL_WBITS) - 1)).astype(np.int64)
    bl = np.frexp(w.astype(np.float64))[1]      # bit_length; 0 for w == 0
    rho = np.where(w > 0, _HLL_WBITS - bl + 1, _HLL_WBITS + 1).astype(np.int64)
    reg = np.zeros(_HLL_M, dtype=np.int64)
    np.maximum.at(reg, idx, rho)
    nz = np.flatnonzero(reg)
    return nz, reg[nz]


def _hll_estimate(reg: np.ndarray) -> tuple[int, float]:
    """(n_zero_registers, rounded estimate) from a dense register array.

    The indicator sum Σ 2^-reg is a sum of ≤ m dyadic rationals ≥ 2^-24,
    so it is EXACT in float64 in any summation order — the engine's
    cascaded fold and the oracle's single pass agree bit-for-bit; the
    only float ops left (divide, ln) are IEEE-rounded identically.
    """
    m = _HLL_M
    alpha = 0.7213 / (1.0 + 1.079 / m)
    sp = float(np.sum(np.power(2.0, -reg.astype(np.float64))))
    e_raw = alpha * m * m / sp
    v = int(np.count_nonzero(reg == 0))
    if e_raw <= 2.5 * m and v > 0:
        est = m * float(np.log(m / v))          # linear counting regime
    else:
        est = e_raw
    return v, float(round_half_away(np.array([est]), 6)[0])


def hll_distinct(ds: rd.Dataset, key_col: str):
    """HyperLogLog distinct-count over a non-negative integer key column
    (Flajolet et al. 2007), p=9 (512 registers, ~4.6% standard error).

    Mergeable-by-max partials: per-batch (idx → max rank) pairs, folded
    per bucket by ``np.maximum.at``, final merge over ≤ m × n_buckets
    rows. Returns ONE row (m, n_zero, est_distinct); the DuckDB oracle
    (:func:`hll_sql`) replays hash, register split, rank and estimator
    constant-for-constant, so the driver hash-gates the sketch itself.
    Complements :func:`kmv_distinct`: HLL registers are O(m) forever
    (KMV keeps k full hashes), the natural per-partition cardinality
    sidecar for the replay lake's summaries.
    """

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"idx": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        nz, rho = _hll_partial_pairs(keys)
        return pa.table({"idx": pa.array(nz), "rho": pa.array(rho)})

    def combine(t: pa.Table) -> pa.Table:
        reg = np.zeros(_HLL_M, dtype=np.int64)
        if t.num_rows:
            np.maximum.at(reg,
                          t.column("idx").to_numpy(zero_copy_only=False),
                          t.column("rho").to_numpy(zero_copy_only=False))
        nz = np.flatnonzero(reg)
        return pa.table({"idx": pa.array(nz), "rho": pa.array(reg[nz]),
                         "_sb": pa.array(np.zeros(len(nz), np.int32))})

    def final(t: pa.Table) -> pa.Table:
        reg = np.zeros(_HLL_M, dtype=np.int64)
        if t.num_rows:
            np.maximum.at(reg,
                          t.column("idx").to_numpy(zero_copy_only=False),
                          t.column("rho").to_numpy(zero_copy_only=False))
        v, est = _hll_estimate(reg)
        return pa.table({"m": pa.array([_HLL_M], pa.int64()),
                         "n_zero": pa.array([v], pa.int64()),
                         "est_distinct": pa.array([est], pa.float64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    combined = bucketed_groups(partials, "idx", combine)
    return grouped_by_bucket(combined, "_sb", 1, final).to_pandas()


def fmix32_sql(inner: str, cols: list[str]) -> str:
    """SQL replica of :func:`_fmix32` over subquery ``inner``, which must
    yield the carried columns ``cols`` plus ``h0`` (= key % 4294967296,
    non-negative). Returns a SELECT producing cols + ``hv``. ONE owner
    for the xor/multiply constants — every fmix32-based oracle (HLL,
    late events, reservoir sample) composes this builder, so the chain
    can never drift from the engine's constants."""
    pre = (", ".join(cols) + ", ") if cols else ""
    return f"""SELECT {pre}CAST(xor(h4, h4 // 65536) AS BIGINT) AS hv FROM (
    SELECT {pre}CAST((CAST(xor(h2, h2 // 8192) AS HUGEINT) * 3266489909)
                % 4294967296 AS BIGINT) AS h4 FROM (
      SELECT {pre}CAST((CAST(xor(h0, h0 // 65536) AS HUGEINT) * 2246822507)
                  % 4294967296 AS BIGINT) AS h2 FROM ({inner})))"""


def hll_sql(table: str, key_col: str) -> str:
    """DuckDB replica of :func:`hll_distinct` — identical hash, register
    split (integer div/mod = shift/mask for power-of-two), exact
    bit_length via ``length(bin(w))``, same estimator and linear-counting
    correction, rounded to the same 6 decimals."""
    m, wbits = _HLL_M, _HLL_WBITS
    wmod = 1 << wbits
    alpha = 0.7213 / (1.0 + 1.079 / m)
    fm = fmix32_sql(
        f"SELECT DISTINCT {key_col} % 4294967296 AS h0 FROM {table}", [])
    return f"""
WITH h AS (
  SELECT DISTINCT hv FROM ({fm})
), reg AS (
  SELECT hv // {wmod} AS idx,
         max(CASE WHEN hv % {wmod} = 0 THEN {wbits} + 1
                  ELSE {wbits} - length(bin(hv % {wmod})) + 1 END) AS rho
  FROM h GROUP BY 1
), s AS (
  SELECT sum(power(2.0, -rho)) AS sp, count(*) AS nonzero FROM reg
), est AS (
  SELECT {m} - nonzero AS v,
         CAST({alpha!r} AS DOUBLE) * {m} * {m}
           / (sp + ({m} - nonzero) * 1.0) AS e_raw
  FROM s
)
SELECT CAST({m} AS BIGINT) AS m, CAST(v AS BIGINT) AS n_zero,
       round(CASE WHEN e_raw <= 2.5 * {m} AND v > 0
                  THEN {m} * ln({m} / v) ELSE e_raw END, 6) AS est_distinct
FROM est
"""
