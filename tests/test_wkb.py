"""WKB codec round-trip + invariant tests (reference parity:
src/conversion/wkb.jl semantics; test model from test/io/geopackage.jl)."""

import struct

import numpy as np
import pytest

from geoio_jl_spark.functions import wkb as W


def rt(g):
    b = W.encode_wkb(g)
    g2 = W.decode_wkb(b)
    assert W.encode_wkb(g2) == b  # byte-identical round trip
    return g2


def test_point_roundtrip():
    g = rt(W.point(1.5, -2.25))
    assert g.kind == W.POINT and g.dim == 2
    np.testing.assert_array_equal(g.coords, [[1.5, -2.25]])


def test_point_3d_iso_offset():
    b = W.encode_wkb(W.point(1.0, 2.0, 3.0))
    assert struct.unpack_from("<I", b, 1)[0] == 1001  # +1000 for Z (wkb.jl:104)
    g = W.decode_wkb(b)
    assert g.dim == 3


def test_linestring_roundtrip():
    g = rt(W.linestring([(0, 0), (1, 1), (2, 0)]))
    assert g.kind == W.LINESTRING
    assert len(g.coords) == 3


def test_polygon_hole_roundtrip():
    g = rt(W.polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                     holes=[[(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]]))
    assert g.kind == W.POLYGON
    assert len(g.rings) - 1 == 2


def test_polygon_open_ring_is_reclosed_on_write():
    # write re-closes rings (wkb.jl:158-173)
    g = W.polygon([(0, 0), (4, 0), (4, 4), (0, 4)])  # open
    b = W.encode_wkb(g)
    g2 = W.decode_wkb(b)
    ring = g2.coords[g2.rings[0]:g2.rings[1]]
    assert np.array_equal(ring[0], ring[-1])  # closed on disk
    assert len(ring) == 5


def test_multipolygon_roundtrip():
    mp = W.multipolygon([
        W.polygon([(0, 0), (1, 0), (0, 1), (0, 0)]),
        W.polygon([(5, 5), (6, 5), (5, 6), (5, 5)]),
    ])
    g = rt(mp)
    assert g.kind == W.MULTIPOLYGON
    assert len(g.parts) - 1 == 2


def test_heterogeneous_collection():
    # gpkg.jl:550 / test io/geopackage.jl:76-108: mixed collections allowed
    coll = W.Geom(W.GEOMETRYCOLLECTION, 2, np.empty((0, 2)), geoms=[
        W.point(1.0, 2.0),
        W.linestring([(0, 0), (1, 1)]),
        W.polygon([(0, 0), (1, 0), (0, 1), (0, 0)]),
    ])
    g = rt(coll)
    assert g.kind == W.GEOMETRYCOLLECTION
    assert [c.kind for c in g.geoms] == [W.POINT, W.LINESTRING, W.POLYGON]


def test_big_endian_decode():
    # byte order flag 0 = big endian (wkb.jl:12-16)
    b = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 3.0, 4.0)
    g = W.decode_wkb(b)
    np.testing.assert_array_equal(g.coords, [[3.0, 4.0]])


def test_ewkb_z_flag():
    # EWKB 0x80000000 Z flag normalizes to dim=3 (wkb.jl:24-42)
    b = b"\x01" + struct.pack("<I", 0x80000001) + struct.pack("<3d", 1, 2, 3)
    g = W.decode_wkb(b)
    assert g.kind == W.POINT and g.dim == 3


def test_ewkb_srid_skipped():
    b = (b"\x01" + struct.pack("<I", 0x20000001) + struct.pack("<I", 4326)
         + struct.pack("<2d", 1, 2))
    g = W.decode_wkb(b)
    np.testing.assert_array_equal(g.coords, [[1.0, 2.0]])


def test_chain_normalization_invariants():
    # wkb2chain semantics (wkb.jl:62-73; test io/geopackage.jl:133-142)
    c, closed = W.normalize_chain(np.array([[0, 0], [1, 0], [1, 1], [0, 0]]))
    assert closed and len(c) == 3  # first==last => Ring, dup dropped
    c, closed = W.normalize_chain(np.array([[0, 0], [1, 0], [1, 1], [1, 1]]))
    assert not closed and len(c) == 4  # open chain kept intact (only
    # trailing points equal to the FIRST are popped, wkb.jl:65-68)
    c, closed = W.normalize_chain(np.array([[2, 2], [2, 2]]))
    assert closed and len(c) == 1  # degenerate [A,A] => Ring of one
    c, closed = W.normalize_chain(np.array([[0, 0], [1, 0], [0, 0], [0, 0]]))
    assert closed and len(c) == 2  # pops all trailing first-dups


def test_lat_clamp():
    # gi.jl:82
    out = W.clamp_lat(np.array([-90.0001, -45.0, 90.0001]))
    np.testing.assert_array_equal(out, [-90.0, -45.0, 90.0])


def test_bounds_and_centroid_batch():
    wkbs = [
        W.encode_wkb(W.point(1.0, 2.0)),
        W.encode_wkb(W.polygon([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])),
        None,
    ]
    b = W.wkb_bounds_batch(wkbs)
    np.testing.assert_array_equal(b[0], [1, 2, 1, 2])
    np.testing.assert_array_equal(b[1], [0, 0, 4, 4])
    assert np.isnan(b[2]).all()
    c = W.wkb_centroid_batch(wkbs[:1])
    np.testing.assert_array_equal(c[0], [1.0, 2.0])


def test_kind_names():
    assert W.point(0, 0).kind_name == "POINT"
    assert W.polygon([(0, 0), (1, 0), (0, 1), (0, 0)]).kind_name == "POLYGON"
