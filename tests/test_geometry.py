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


def test_point_in_polygon_square():
    import numpy as np

    from etl_ray.functions.geometry import point_in_polygon

    # unit square, slightly tilted so no edge is horizontal (SQL-parity rule)
    qx = np.array([0.0, 10.0, 10.2, 0.2])
    qy = np.array([0.0, 0.2, 10.2, 10.0])
    px = np.array([5.0, 15.0, -1.0, 5.0, 5.0])
    py = np.array([5.0, 5.0, 5.0, -2.0, 11.0])
    assert point_in_polygon(px, py, qx, qy).tolist() == [
        True, False, False, False, False]


def test_point_in_polygon_nonconvex_notch():
    import numpy as np

    from etl_ray.functions.geometry import point_in_polygon

    # arrowhead: (5, 4) sits inside the bounding box but inside the notch
    qx = np.array([0.0, 10.0, 5.0])
    qy = np.array([0.0, 1.0, 6.0])
    notch_x = np.array([0.0, 10.0, 5.0, 5.0])
    notch_y = np.array([0.0, 1.0, 2.0, 6.0])
    inside_tri = point_in_polygon(np.array([5.0]), np.array([3.0]), qx, qy)
    inside_notch = point_in_polygon(np.array([5.01]), np.array([3.0]),
                                    notch_x, notch_y)
    assert inside_tri.tolist() == [True]
    assert inside_notch.tolist() == [False]  # carved out by the notch


def test_point_in_polygon_deterministic_on_vertex_latitude():
    import numpy as np

    from etl_ray.functions.geometry import point_in_polygon

    qx = np.array([0.0, 10.0, 10.0, 0.0])
    qy = np.array([0.0, 1.0, 11.0, 10.0])
    # point exactly at a vertex latitude: strict (y1 > py) != (y2 > py)
    # rule must give the same answer on repeated evaluation
    m1 = point_in_polygon(np.array([5.0]), np.array([1.0]), qx, qy)
    m2 = point_in_polygon(np.array([5.0]), np.array([1.0]), qx, qy)
    assert m1.tolist() == m2.tolist()
