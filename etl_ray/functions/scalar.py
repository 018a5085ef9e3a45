"""Scalar function library — Ray/Arrow ports of the reference's SQL UDFs.

Reference: ``/root/reference/etl/init/single_statement_sql/`` (SURVEY.md
§2.8). All functions are vectorized numpy/pyarrow kernels intended for
use inside ``map_batches`` / ``map_groups`` — no Python row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def calculate_delta(values: np.ndarray, signed: bool = False) -> float:
    """Σ|xᵢ−xᵢ₋₁| (or signed Σ) over an ordered array.

    Reference: ``calculate_delta.sql:1-20`` (F1).
    """
    if len(values) < 2:
        return 0.0
    d = np.diff(np.asarray(values, dtype=np.float64))
    return float(d.sum() if signed else np.abs(d).sum())


def calculate_delta_upperbounded(values: np.ndarray, upper: float = 360.0) -> float:
    """Angular total variation: per step min((a−b) mod U, (b−a) mod U).

    Reference: ``calculate_delta_upperbounded.sql:1-27`` (F2) — used for
    delta_heading in the cell-fact rollup.
    """
    v = np.asarray(values, dtype=np.float64)
    if len(v) < 2:
        return 0.0
    a, b = v[:-1], v[1:]
    fwd = np.mod(a - b + upper, upper)
    bwd = np.mod(b - a + upper, upper)
    return float(np.minimum(fwd, bwd).sum())


def dpmod(x: np.ndarray, d: float) -> np.ndarray:
    """Float modulo ``x − floor(x/d)·d`` (reference ``dpmod.sql:1-5``, F3)."""
    x = np.asarray(x, dtype=np.float64)
    return x - np.floor(x / d) * d


def smart_date_id(ts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """timestamp → YYYYMMDD int64 smart key; null → −1.

    Reference: ``etl/helper_functions.py:167-176`` (M9). The smart integer
    key is a total order on dates that doubles as a range-partition key.
    """
    y = pc.cast(pc.year(ts), pa.int64())
    m = pc.cast(pc.month(ts), pa.int64())
    d = pc.cast(pc.day(ts), pa.int64())
    key = pc.add(pc.add(pc.multiply(y, 10000), pc.multiply(m, 100)), d)
    return pc.fill_null(key, -1)


def smart_time_id(ts: pa.Array | pa.ChunkedArray) -> pa.Array:
    """timestamp → HHMMSS int64 smart key; null → −1.

    Reference: ``etl/helper_functions.py:189-198`` (M9).
    """
    h = pc.cast(pc.hour(ts), pa.int64())
    m = pc.cast(pc.minute(ts), pa.int64())
    s = pc.cast(pc.second(ts), pa.int64())
    key = pc.add(pc.add(pc.multiply(h, 10000), pc.multiply(m, 100)), s)
    return pc.fill_null(key, -1)


def timestamp_from_date_time_id(date_id: int, time_id: int):
    """(YYYYMMDD, HHMMSS) → datetime; inverse of the smart keys.

    Reference: ``01_smart_date_time_id.sql:1-11`` (F5).
    """
    import datetime as _dt

    if date_id < 0:
        return None
    y, rem = divmod(date_id, 10000)
    mo, d = divmod(rem, 100)
    h, rem = divmod(max(time_id, 0), 10000)
    mi, s = divmod(rem, 100)
    return _dt.datetime(y, mo, d, h, mi, s)


def consecutive_change_count(values: np.ndarray) -> int:
    """Number of values surviving consecutive-duplicate compression —
    the tfloat dedup (reference ``builder.py:346-375``, D3/K9)."""
    v = np.asarray(values)
    if len(v) == 0:
        return 0
    if len(v) == 1:
        return 1
    neq = v[1:] != v[:-1]
    # NaN != NaN is True; treat consecutive NaNs as duplicates
    both_nan = np.zeros(len(v) - 1, dtype=bool)
    if v.dtype.kind == "f":
        both_nan = np.isnan(v[1:]) & np.isnan(v[:-1])
    return int(1 + np.sum(neq & ~both_nan))
