"""WKB / PIP / STRtree / dateline geometry kernels."""

import numpy as np

from dggrid4py_ray.geometry import (PolygonSet, STRtree, box, parse_wkb,
                                    ring_crosses_dateline, split_ring_at_dateline,
                                    wkb_point, wkb_points, wkb_polygon)


def test_wkb_point_roundtrip():
    t, (lon, lat) = parse_wkb(wkb_point(12.5, -33.25))
    assert t == "Point" and lon == 12.5 and lat == -33.25
    pts = wkb_points(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
    assert parse_wkb(pts[1])[1] == (2.0, 4.0)


def test_wkb_polygon_roundtrip():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    t, rings = parse_wkb(wkb_polygon([ring]))
    assert t == "Polygon"
    assert np.allclose(rings[0], ring)


def test_pip_box():
    ps = box(27.2, 57.5, 29.3, 59.2)  # the reference conformance clip box
    lon = np.array([28.0, 27.0, 29.3001, 28.5])
    lat = np.array([58.0, 58.0, 58.0, 59.3])
    assert ps.contains(lon, lat).tolist() == [True, False, False, False]


def test_pip_with_hole():
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=float)
    ps = PolygonSet([[outer, hole]])
    assert ps.contains(np.array([2.0]), np.array([2.0]))[0]
    assert not ps.contains(np.array([5.0]), np.array([5.0]))[0]


def test_pip_antimeridian():
    ring = np.array([[170, -10], [-170, -10], [-170, 10], [170, 10], [170, -10]], dtype=float)
    ps = PolygonSet([[ring]])
    assert ps.wrapped
    assert ps.contains(np.array([179.0, -179.0, 0.0]), np.array([0.0, 0.0, 0.0])).tolist() == [True, True, False]


def test_intersects_ring():
    ps = box(0, 0, 10, 10)
    assert ps.intersects_ring(np.array([[5, 5], [6, 5], [6, 6], [5, 5]], dtype=float))
    assert ps.intersects_ring(np.array([[9, 9], [12, 9], [12, 12], [9, 9]], dtype=float))
    assert not ps.intersects_ring(np.array([[20, 20], [21, 20], [21, 21], [20, 20]], dtype=float))
    # ring fully containing the box
    assert ps.intersects_ring(np.array([[-5, -5], [15, -5], [15, 15], [-5, 15], [-5, -5]], dtype=float))


def test_strtree():
    rng = np.random.default_rng(0)
    centers = rng.uniform(0, 100, (500, 2))
    bb = np.column_stack([centers - 0.5, centers + 0.5])
    tree = STRtree(bb)
    hits = tree.query_bbox(10, 10, 20, 20)
    expected = np.nonzero((bb[:, 0] <= 20) & (bb[:, 2] >= 10) & (bb[:, 1] <= 20) & (bb[:, 3] >= 10))[0]
    assert set(hits.tolist()) == set(expected.tolist())
    pi, ii = tree.query_points(centers[:50, 0], centers[:50, 1])
    assert set(zip(pi.tolist(), ii.tolist())) >= {(i, i) for i in range(50)}


def test_dateline_split():
    # reference interrupt.py semantics: crossing ring -> east + west parts
    ring = np.array([[179, 0], [-179, 0], [-179, 2], [179, 2], [179, 0]], dtype=float)
    assert ring_crosses_dateline(ring)
    parts = split_ring_at_dateline(ring)
    assert len(parts) == 2
    east = [p for p in parts if p[:, 0].max() <= 180 and p[:, 0].min() >= 0]
    west = [p for p in parts if p[:, 0].max() <= -178]
    assert east and west
    ok = np.array([[10, 0], [11, 0], [11, 1], [10, 0]], dtype=float)
    assert len(split_ring_at_dateline(ok)) == 1
