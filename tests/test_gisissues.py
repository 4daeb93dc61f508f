"""Mirror of the reference's "Known GIS issues" testset
(test/gisissues.jl): the SAME five points / rings / polygons with
float/int/string attributes must survive save→load through Shapefile,
GeoJSON and GeoPackage, including the ecosystem quirk that Shapefile
promotes chains/polygons to Multi* (test/testutils.jl isequalshp)."""

import numpy as np
import pandas as pd
import pytest

from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.sources import geojson, gpkg, shapefile

# reference data (gisissues.jl:2-14): LatLon(i, i) → lon=i, lat=i
_ATTRS = dict(float=[0.07, 0.34, 0.69, 0.62, 0.91],
              int=[1, 2, 3, 4, 5],
              string=["word1", "word2", "word3", "word4", "word5"])
_POINTS = [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)]
_RINGS = [
    [(0, 0), (1, 1), (2, 2)],
    [(0, 0), (-2, -2), (-1, -1)],
    [(0, 0), (-1, 1), (-2, 2)],
    [(0, 0), (2, -2), (1, -1)],
    [(0, 0), (1, 1), (-2, -2)],
]


def _point_wkb(lonlat):
    return W.encode_wkb(W.Geom(1, 2, np.array([lonlat], float), [0, 1]))


def _chain_wkb(pts):
    closed = pts + [pts[0]]  # Ring auto-closes in the reference
    return W.encode_wkb(W.Geom(2, 2, np.array(closed, float),
                               [0, len(closed)]))


def _poly_wkb(pts):
    closed = pts + [pts[0]]
    return W.encode_wkb(W.Geom(3, 2, np.array(closed, float),
                               [0, len(closed)], parts=[0, 1]))


def _df(spark, wkbs):
    return spark.createDataFrame(pd.DataFrame({**_ATTRS, "geometry": wkbs}))


def _coords(blob, unwrap_multi):
    g = W.decode_wkb(bytes(blob))
    if unwrap_multi and g.kind in (4, 5, 6):
        assert g.kind in (5, 6)
    return g.kind, [tuple(c) for c in g.coords]


def _cycle_canon(pts):
    """Closed-ring canonical form: drop the closing vertex, minimize
    over rotations of both orientations (the shapefile spec reorients
    outer rings clockwise — same geometry, different vertex order)."""
    body = list(pts[:-1]) if pts[0] == pts[-1] else list(pts)
    cands = []
    for seq in (body, body[::-1]):
        for s in range(len(seq)):
            cands.append(tuple(seq[s:] + seq[:s]))
    return min(cands)


def _roundtrip(spark, tmp_path, writer, reader, path, wkbs,
               unwrap_multi=False, cyclic=False):
    df = _df(spark, wkbs)
    writer(df, str(tmp_path / path))
    back = reader(spark, str(tmp_path / path))
    rows = sorted(back.collect(), key=lambda r: r["int"])
    assert [r["float"] for r in rows] == pytest.approx(_ATTRS["float"])
    assert [r["int"] for r in rows] == _ATTRS["int"]
    assert [r["string"] for r in rows] == _ATTRS["string"]
    got = [_coords(r["geometry"], unwrap_multi)[1] for r in rows]
    want = [_coords(b, False)[1] for b in wkbs]
    if cyclic:
        got = [_cycle_canon(g) for g in got]
        want = [_cycle_canon(w) for w in want]
    assert got == want
    return [_coords(r["geometry"], unwrap_multi)[0] for r in rows]


@pytest.mark.parametrize("fmt,writer,reader,unwrap", [
    ("shp", shapefile.write, shapefile.read, True),
    ("geojson", geojson.write, geojson.read, False),
    ("gpkg", lambda df, p: gpkg.write(df, p), gpkg.read, False),
])
def test_gis_points(spark, tmp_path, fmt, writer, reader, unwrap):
    kinds = _roundtrip(spark, tmp_path, writer, reader, f"gis-points.{fmt}",
                       [_point_wkb(p) for p in _POINTS], unwrap)
    assert set(kinds) == {1}


@pytest.mark.parametrize("fmt,writer,reader,unwrap", [
    ("shp", shapefile.write, shapefile.read, True),
    ("geojson", geojson.write, geojson.read, False),
    ("gpkg", lambda df, p: gpkg.write(df, p), gpkg.read, False),
])
def test_gis_rings(spark, tmp_path, fmt, writer, reader, unwrap):
    kinds = _roundtrip(spark, tmp_path, writer, reader, f"gis-rings.{fmt}",
                       [_chain_wkb(r) for r in _RINGS], unwrap)
    if fmt == "shp":  # "Shapefile saves Chain as MultiChain"
        assert set(kinds) == {5}
    else:
        assert set(kinds) == {2}


@pytest.mark.parametrize("fmt,writer,reader,unwrap", [
    ("shp", shapefile.write, shapefile.read, True),
    ("geojson", geojson.write, geojson.read, False),
    ("gpkg", lambda df, p: gpkg.write(df, p), gpkg.read, False),
])
def test_gis_polys(spark, tmp_path, fmt, writer, reader, unwrap):
    kinds = _roundtrip(spark, tmp_path, writer, reader, f"gis-polys.{fmt}",
                       [_poly_wkb(r) for r in _RINGS], unwrap, cyclic=True)
    if fmt == "shp":  # "Shapefile saves PolyArea as MultiPolyArea"
        assert set(kinds) == {6}
    else:
        assert set(kinds) == {3}
