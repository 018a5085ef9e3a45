"""Geometry kernels: Douglas-Peucker polyline simplification.

Reference analog: the 10 m trajectory simplification of
``etl/rollup/sql/simplify_trajectories.sql:2`` (F9). Implemented as an
iterative stack-based numpy kernel (no recursion limit, no Python
per-point math in the inner distance computation).
"""

from __future__ import annotations

import numpy as np


def douglas_peucker_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    """Boolean keep-mask of the Douglas-Peucker simplification of the
    polyline (x, y) with tolerance ``eps`` (perpendicular distance).

    Endpoints are always kept. Ties on the max-deviation point resolve to
    the FIRST index (deterministic). O(n log n) typical; the per-segment
    distance computation is vectorized.
    """
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        xs = x[i0 + 1:i1]
        ys = y[i0 + 1:i1]
        dx = x[i1] - x[i0]
        dy = y[i1] - y[i0]
        # sqrt(dx²+dy²), NOT np.hypot: hypot's overflow-safe algorithm can
        # differ from sqrt by an ulp, and the DuckDB oracle replays this
        # exact IEEE expression (multiply/add/sqrt are all correctly
        # rounded, so both engines see bit-identical distances — argmax
        # ties and the eps comparison can never diverge)
        seg_len = np.sqrt(dx * dx + dy * dy)
        if seg_len == 0.0:
            d = np.sqrt((xs - x[i0]) ** 2 + (ys - y[i0]) ** 2)
        else:
            # perpendicular distance to the chord
            d = np.abs(dy * (xs - x[i0]) - dx * (ys - y[i0])) / seg_len
        j = int(np.argmax(d))
        if d[j] > eps:
            split = i0 + 1 + j
            keep[split] = True
            stack.append((i0, split))
            stack.append((split, i1))
    return keep


def simplify_polyline(x: np.ndarray, y: np.ndarray, eps: float):
    """(x, y) arrays of the simplified polyline."""
    m = douglas_peucker_mask(np.asarray(x, float), np.asarray(y, float), eps)
    return np.asarray(x)[m], np.asarray(y)[m]


def point_in_polygon(px: np.ndarray, py: np.ndarray,
                     poly_x: np.ndarray, poly_y: np.ndarray) -> np.ndarray:
    """Vectorized ray-casting point-in-polygon test (odd crossing rule).

    Reference analog: the ``sjoin(points, boundary, within)`` cleaning
    filter (etl/cleaning/clean_data.py:62-67). Works for non-convex
    polygons. One (n_points × n_edges) broadcast — the polygon is the
    broadcast small side, points stream through in batches.

    Edge rule is the classic strict half-open test: edge (v1, v2)
    crosses the rightward ray from p iff ``(y1 > py) != (y2 > py)`` and
    ``px < (x2-x1)·(py-y1)/(y2-y1) + x1``. Every comparison and the
    intersection arithmetic are single correctly-rounded IEEE ops, so a
    SQL oracle evaluating the same expression agrees bit-for-bit —
    including points exactly on vertex latitudes. Polygons with
    horizontal edges are fine (the parity test masks them out), but the
    SQL twin evaluates the division eagerly, so callers gating against
    DuckDB should use polygons with no zero-height edges.
    """
    px = np.asarray(px, np.float64)[:, None]
    py = np.asarray(py, np.float64)[:, None]
    x1 = np.asarray(poly_x, np.float64)[None, :]
    y1 = np.asarray(poly_y, np.float64)[None, :]
    x2 = np.roll(poly_x, -1).astype(np.float64)[None, :]
    y2 = np.roll(poly_y, -1).astype(np.float64)[None, :]
    straddles = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossings = (straddles & (px < xint)).sum(axis=1)
    return (crossings % 2 == 1)
