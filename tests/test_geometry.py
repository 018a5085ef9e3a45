"""Golden-fixture tests for the Douglas-Peucker kernel (the reference's
10 m simplify, simplify_trajectories.sql:2) — deterministic expected
outputs computed by hand."""

from __future__ import annotations

import numpy as np

from etl_ray.functions.geometry import douglas_peucker_mask, simplify_polyline


def test_collinear_collapses_to_endpoints():
    x = np.arange(10, dtype=float)
    y = 2.0 * x + 1.0
    m = douglas_peucker_mask(x, y, eps=0.01)
    assert m.tolist() == [True] + [False] * 8 + [True]


def test_zigzag_keeps_corners():
    # square wave: corners deviate 1.0 from the chord; eps below keeps them
    x = np.arange(7, dtype=float)
    y = np.array([0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0])
    m = douglas_peucker_mask(x, y, eps=0.5)
    assert m.all()  # every point is a corner at this tolerance
    m2 = douglas_peucker_mask(x, y, eps=2.0)
    assert m2.tolist() == [True, False, False, False, False, False, True]


def test_single_spike():
    x = np.arange(5, dtype=float)
    y = np.array([0.0, 0.0, 10.0, 0.0, 0.0])
    sx, sy = simplify_polyline(x, y, eps=1.0)
    assert sx.tolist() == [0.0, 2.0, 4.0]
    assert sy.tolist() == [0.0, 10.0, 0.0]


def test_degenerate_inputs():
    assert douglas_peucker_mask(np.array([]), np.array([]), 1.0).tolist() == []
    assert douglas_peucker_mask(np.array([1.0]), np.array([2.0]), 1.0).tolist() == [True]
    assert douglas_peucker_mask(np.array([1.0, 1.0]), np.array([2.0, 2.0]), 1.0).tolist() == [True, True]
    # zero-length chord (identical endpoints): distance falls back to
    # point distance from the (coincident) endpoints
    x = np.array([0.0, 3.0, 0.0])
    y = np.array([0.0, 0.0, 0.0])
    m = douglas_peucker_mask(x, y, eps=1.0)
    assert m.tolist() == [True, True, True]
