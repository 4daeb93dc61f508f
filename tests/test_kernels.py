"""Geometry kernel unit tests — the engine's exact-refine layer."""

import numpy as np

from geoio_jl_spark.functions import geomkernels as K
from geoio_jl_spark.functions import wkb as W


def test_point_in_triangle_matches_sign_test():
    # kernel must agree with the integer sign test used in oracle SQL
    tri = W.polygon([(0, 0), (10, 0), (5, 8), (0, 0)])
    rng = np.random.RandomState(42)
    px = rng.randint(-2, 13, 500).astype(float)
    py = rng.randint(-2, 10, 500).astype(float)
    got = K.points_in_geom(px, py, tri)
    ax, ay, bx, by, cx, cy = 0, 0, 10, 0, 5, 8
    exp = (
        ((bx - ax) * (py - ay) - (by - ay) * (px - ax) >= 0)
        & ((cx - bx) * (py - by) - (cy - by) * (px - bx) >= 0)
        & ((ax - cx) * (py - cy) - (ay - cy) * (px - cx) >= 0)
    )
    np.testing.assert_array_equal(got, exp)


def test_boundary_inclusive():
    tri = W.polygon([(0, 0), (10, 0), (5, 8), (0, 0)])
    px = np.array([0.0, 10.0, 5.0, 5.0])  # vertices + edge midpoint
    py = np.array([0.0, 0.0, 8.0, 0.0])
    assert K.points_in_geom(px, py, tri).all()


def test_hole_excluded_but_hole_boundary_included():
    g = W.polygon([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)],
                  holes=[[(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]])
    px = np.array([5.0, 4.0, 1.0])
    py = np.array([5.0, 5.0, 1.0])
    got = K.points_in_geom(px, py, g)
    np.testing.assert_array_equal(got, [False, True, True])


def test_multipolygon_union_semantics():
    mp = W.multipolygon([
        W.polygon([(0, 0), (2, 0), (1, 2), (0, 0)]),
        W.polygon([(10, 10), (12, 10), (11, 12), (10, 10)]),
    ])
    px = np.array([1.0, 11.0, 5.0])
    py = np.array([0.5, 10.5, 5.0])
    np.testing.assert_array_equal(K.points_in_geom(px, py, mp), [True, True, False])


def test_collection_containment():
    coll = W.Geom(W.GEOMETRYCOLLECTION, 2, np.empty((0, 2)), geoms=[
        W.point(50.0, 50.0),
        W.polygon([(0, 0), (4, 0), (2, 4), (0, 0)]),
    ])
    got = K.points_in_geom(np.array([2.0]), np.array([1.0]), coll)
    assert got[0]


def test_points_in_wkb_batch():
    tri = W.encode_wkb(W.polygon([(0, 0), (10, 0), (5, 8), (0, 0)]))
    got = K.points_in_wkb_batch([5.0, 20.0], [2.0, 2.0], tri)
    np.testing.assert_array_equal(got, [True, False])


def test_triangle_normal():
    n = K.triangle_normal(np.array([0.0, 0, 0]), np.array([1.0, 0, 0]),
                          np.array([0.0, 1, 0]))
    np.testing.assert_allclose(n, [0, 0, 1])


def test_affine_recovery():
    # geotiff.jl:152-199 closed form
    A = np.array([[0.5, 0.1], [0.0, -0.25]])
    b = np.array([100.0, 200.0])
    def v(i, j):
        return A @ np.array([i, j]) + b
    A2, b2 = K.affine_from_grid(v(0, 0), v(1, 0), v(0, 1))
    np.testing.assert_allclose(A2, A)
    np.testing.assert_allclose(b2, b)
