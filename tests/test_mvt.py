"""MVT codec + tile sink tests.

Spec anchors: the MVT 2.1 specification's own worked examples pin the
command-integer encoding (point (25,17) -> [9, 50, 34]; multipoint and
polygon examples likewise), so encode is checked against published
constants, not just our own decoder."""

import numpy as np
import pytest

from geoio_jl_spark.sources import mvt


def test_spec_worked_example_point():
    # spec §4.3.5.1: point (25, 17) encodes as [9, 50, 34]
    assert mvt.encode_geometry(mvt.POINT, [[(25, 17)]]) == [9, 50, 34]


def test_spec_worked_example_multipoint():
    # spec §4.3.5.2: points (5,7), (3,2) -> [17, 10, 14, 3, 9]
    assert (mvt.encode_geometry(mvt.POINT, [[(5, 7), (3, 2)]])
            == [17, 10, 14, 3, 9])


def test_spec_worked_example_polygon():
    # spec §4.3.5.5: ring (3,6) (8,12) (20,34) ->
    # [9, 6, 12, 18, 10, 12, 24, 44, 15]
    assert (mvt.encode_geometry(mvt.POLYGON, [[(3, 6), (8, 12), (20, 34)]])
            == [9, 6, 12, 18, 10, 12, 24, 44, 15])


def test_geometry_roundtrip_all_types():
    rng = np.random.default_rng(4)
    pts = [[tuple(map(int, p)) for p in rng.integers(0, 4096, (7, 2))]]
    lines = [[tuple(map(int, p)) for p in rng.integers(0, 4096, (5, 2))],
             [tuple(map(int, p)) for p in rng.integers(0, 4096, (3, 2))]]
    rings = [[(0, 0), (100, 0), (100, 100), (0, 100)],
             [(20, 20), (20, 40), (40, 40)]]
    for gtype, parts in ((mvt.POINT, pts), (mvt.LINESTRING, lines),
                         (mvt.POLYGON, rings)):
        enc = mvt.encode_geometry(gtype, parts)
        assert mvt.decode_geometry(gtype, enc) == parts


def test_tile_roundtrip_with_typed_props():
    feats = [
        {"id": 1, "type": mvt.POINT, "parts": [[(10, 20)]],
         "props": {"name": "a", "rank": 3, "score": 0.5, "neg": -7,
                   "ok": True}},
        {"id": 2, "type": mvt.POINT, "parts": [[(30, 40)]],
         "props": {"name": "b", "rank": 3}},      # 'rank': 3 dedups
    ]
    buf = mvt.encode_tile({"pois": {"extent": 4096, "features": feats}})
    out = mvt.decode_tile(buf)
    assert list(out) == ["pois"]
    layer = out["pois"]
    assert layer["extent"] == 4096
    got = layer["features"]
    assert got[0]["props"] == feats[0]["props"]
    assert got[1]["props"] == feats[1]["props"]
    assert got[0]["parts"] == [[(10, 20)]]
    assert got[1]["id"] == 2


def test_value_table_dedup():
    feats = [{"id": i, "type": mvt.POINT, "parts": [[(i, i)]],
              "props": {"k": "same"}} for i in range(1, 6)]
    buf = mvt.encode_tile({"l": {"features": feats}})
    # the string 'same' must appear exactly once in the blob
    assert buf.count(b"same") == 1


def test_multilayer_tile():
    buf = mvt.encode_tile({
        "a": {"features": [{"id": 1, "type": mvt.POINT,
                            "parts": [[(1, 1)]], "props": {}}]},
        "b": {"extent": 256,
              "features": [{"id": 1, "type": mvt.LINESTRING,
                            "parts": [[(0, 0), (10, 10)]], "props": {}}]},
    })
    out = mvt.decode_tile(buf)
    assert set(out) == {"a", "b"}
    assert out["b"]["extent"] == 256
    assert out["b"]["features"][0]["parts"] == [[(0, 0), (10, 10)]]


def test_polygon_needs_three_vertices():
    with pytest.raises(ValueError, match="ring"):
        mvt.encode_geometry(mvt.POLYGON, [[(0, 0), (1, 1)]])


def test_points_to_mvt_spark(spark):
    """End-to-end: point table -> tile archive -> decode every tile and
    reconstruct exact per-tile point sets + props vs direct numpy."""
    from geoio_jl_spark.sources.mvt import decode_tile, points_to_mvt

    rng = np.random.default_rng(6)
    n = 400
    xs = rng.integers(0, 256, n)              # 4x4 tiles at base_tile=64
    ys = rng.integers(0, 256, n)
    cat = [f"c{int(v)}" for v in rng.integers(0, 3, n)]
    df = spark.createDataFrame(
        [(int(x), int(y), c) for x, y, c in zip(xs, ys, cat)],
        ["x", "y", "cat"])
    tiles = points_to_mvt(df, "x", "y", zoom=2, base_tile=64,
                          extent=4096, prop_cols=["cat"]).collect()
    # expected per-tile multisets
    exp = {}
    for x, y, c in zip(xs, ys, cat):
        key = (int(x) // 64, int(y) // 64)
        px, py = int(x) % 64 * 4096 // 64, int(y) % 64 * 4096 // 64
        exp.setdefault(key, []).append((px, py, c))
    got = {}
    for row in tiles:
        assert row["zoom"] == 2
        layers = decode_tile(bytes(row["mvt"]))
        feats = layers["points"]["features"]
        got[(row["tx"], row["ty"])] = [
            (f["parts"][0][0][0], f["parts"][0][0][1], f["props"]["cat"])
            for f in feats]
    assert set(got) == set(exp)
    for k in exp:
        assert sorted(got[k]) == sorted(exp[k])


def test_save_mvt_dir(spark, tmp_path):
    from geoio_jl_spark.sources.mvt import points_to_mvt, save_mvt_dir
    df = spark.createDataFrame([(i, i) for i in range(10)], ["x", "y"])
    tiles = points_to_mvt(df, "x", "y", zoom=0, base_tile=64)
    n = save_mvt_dir(tiles, str(tmp_path / "tiles"))
    assert n == 1
    p = tmp_path / "tiles" / "0" / "0" / "0.mvt"
    assert p.exists()
    out = mvt.decode_tile(p.read_bytes())
    assert len(out["points"]["features"]) == 10


def test_save_mvt_dir_guard(spark):
    from geoio_jl_spark.sources.mvt import points_to_mvt, save_mvt_dir
    df = spark.createDataFrame([(i * 64, 0) for i in range(5)], ["x", "y"])
    tiles = points_to_mvt(df, "x", "y", zoom=1, base_tile=64)
    with pytest.raises(ValueError, match="exceed the driver-export guard"):
        save_mvt_dir(tiles, "/tmp/never", max_tiles=2)

# ---------------------------------------------------------------------------
# polygon layers: Sutherland-Hodgman rect clip + per-tile polygon encode
# ---------------------------------------------------------------------------

def test_clip_ring_identity_and_outside():
    from geoio_jl_spark.functions.geomkernels import clip_ring_rect
    sq = np.array([(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)])
    np.testing.assert_array_equal(
        clip_ring_rect(sq, 0, 0, 10, 10), sq)            # fully inside
    assert len(clip_ring_rect(sq, 20, 20, 30, 30)) == 0  # fully outside


def test_clip_ring_known_intersection():
    from geoio_jl_spark.functions.geomkernels import (clip_ring_rect,
                                                      ring_area)
    # unit-ish triangle clipped to the left half
    tri = np.array([(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)])
    out = clip_ring_rect(tri, 0, 0, 5, 10)
    # clipped shape: trapezoid (0,0) (5,0) (5,5) (0,10) — area 37.5
    assert abs(abs(ring_area(out)) - 37.5) < 1e-9
    # area never grows, and clipping by a superset is the identity
    assert abs(ring_area(clip_ring_rect(tri, -1, -1, 11, 11))) == \
        abs(ring_area(tri))


def test_polygons_to_mvt_spans_tiles(spark):
    """A 100x40 rectangle over a 64-unit tile grid lands in tiles
    (0,0) and (1,0); per-tile clipped areas (decoded from the MVT
    geometry, shoelace in tile units) must sum to the original area."""
    from geoio_jl_spark.functions.geomkernels import ring_area
    from geoio_jl_spark.sources.mvt import decode_tile, polygons_to_mvt

    ring = [(10.0, 10.0), (110.0, 10.0), (110.0, 50.0), (10.0, 50.0)]
    df = spark.createDataFrame(
        [(7, [{"x": x, "y": y} for x, y in ring], "parkland")],
        "poly_id bigint, ring array<struct<x:double,y:double>>, kind string")
    tiles = {(r["tx"], r["ty"]): bytes(r["mvt"])
             for r in polygons_to_mvt(
                 df, zoom=3, base_tile=64, extent=4096,
                 prop_cols=["kind"]).collect()}
    assert set(tiles) == {(0, 0), (1, 0)}
    scale = 64.0 / 4096.0                     # tile units -> world units
    total = 0.0
    for (tx, ty), blob in tiles.items():
        layer = decode_tile(blob)["polygons"]
        (feat,) = layer["features"]
        assert feat["id"] == 7
        assert feat["props"] == {"kind": "parkland"}
        a = abs(ring_area(np.array(feat["parts"][0], float)))
        total += a * scale * scale
    assert abs(total - 100.0 * 40.0) < 2.0    # snapping tolerance


def test_polygons_to_mvt_drops_bbox_only_tiles(spark):
    """A thin diagonal triangle whose bbox covers 4 tiles but whose
    geometry misses one: the untouched tile must produce NO feature."""
    from geoio_jl_spark.sources.mvt import decode_tile, polygons_to_mvt

    # triangle hugging the diagonal of a 2x2 tile block (tile=64):
    # misses the (1,0) tile corner region entirely? use a sliver along
    # the lower-left -> upper-right diagonal but nudged to skip (1,0)
    ring = [(5.0, 5.0), (10.0, 5.0), (123.0, 123.0)]
    df = spark.createDataFrame(
        [(1, [{"x": x, "y": y} for x, y in ring])],
        "poly_id bigint, ring array<struct<x:double,y:double>>")
    tiles = {(r["tx"], r["ty"]) for r in
             polygons_to_mvt(df, zoom=1, base_tile=64).collect()}
    # bbox covers (0,0) (1,0) (0,1) (1,1); the sliver never enters (0,1)
    assert (0, 0) in tiles and (1, 1) in tiles
    assert (0, 1) not in tiles


def test_clip_line_split_and_reenter():
    from geoio_jl_spark.functions.geomkernels import clip_line_rect
    # W-shaped path that dips below the rect twice
    line = np.array([(0.0, 5.0), (2.0, -5.0), (4.0, 5.0),
                     (6.0, -5.0), (8.0, 5.0)])
    parts = clip_line_rect(line, 0, 0, 10, 10)
    assert len(parts) == 3                    # enter, middle, exit runs
    for part in parts:
        assert (part[:, 1] >= -1e-9).all()
    # continuous path fully inside returns one part equal to the input
    inside = np.array([(1.0, 1.0), (2.0, 2.0), (3.0, 1.0)])
    (single,) = clip_line_rect(inside, 0, 0, 10, 10)
    np.testing.assert_allclose(single, inside)


def test_lines_to_mvt_multipart(spark):
    from geoio_jl_spark.sources.mvt import decode_tile, lines_to_mvt

    # diagonal road crossing two tiles (tile=64): split at x=64
    path = [(10.0, 10.0), (120.0, 55.0)]
    df = spark.createDataFrame(
        [(3, [{"x": x, "y": y} for x, y in path], "motorway")],
        "line_id bigint, path array<struct<x:double,y:double>>, road string")
    tiles = {(r["tx"], r["ty"]): bytes(r["mvt"])
             for r in lines_to_mvt(df, zoom=4, base_tile=64,
                                   prop_cols=["road"]).collect()}
    assert set(tiles) == {(0, 0), (1, 0)}
    for key, blob in tiles.items():
        (feat,) = decode_tile(blob)["lines"]["features"]
        assert feat["id"] == 3 and feat["props"] == {"road": "motorway"}
        assert len(feat["parts"]) == 1
        assert len(feat["parts"][0]) == 2
    # tile (0,0): segment from (10,10) to the x=64 boundary
    p00 = decode_tile(tiles[(0, 0)])["lines"]["features"][0]["parts"][0]
    assert p00[-1][0] == 4096                  # exits at the right edge


def test_pyramid_to_mvt_compose(spark):
    """Tile pyramid -> MVT heat layer: counts survive the encode and
    every (zoom, tx, ty) from the pyramid appears exactly once."""
    from geoio_jl_spark.operators.pyramid import tile_pyramid
    from geoio_jl_spark.sources.mvt import decode_tile, pyramid_to_mvt

    pts = spark.createDataFrame(
        [(i % 250, (i * 7) % 250) for i in range(300)], ["x", "y"])
    pyr = tile_pyramid(pts, "x", "y", max_zoom=2, base_tile=64)
    exp = {(r["zoom"], r["tx"], r["ty"]): r["n"] for r in pyr.collect()}
    got = {}
    for r in pyramid_to_mvt(pyr, base_tile=64).collect():
        layers = decode_tile(bytes(r["mvt"]))
        (feat,) = layers["density"]["features"]
        got[(r["zoom"], r["tx"], r["ty"])] = feat["props"]["n"]
        assert feat["props"]["zoom"] == r["zoom"]
    assert got == exp


def test_simplify_dp_invariants():
    from geoio_jl_spark.functions.geomkernels import simplify_dp

    # textbook case: a near-collinear midpoint drops, a real corner stays
    line = np.array([(0.0, 0.0), (5.0, 0.01), (10.0, 0.0),
                     (10.0, 10.0)])
    out = simplify_dp(line, tol=0.1)
    np.testing.assert_array_equal(
        out, np.array([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0)]))
    # endpoints always kept; tol=0 is identity
    np.testing.assert_array_equal(simplify_dp(line, 0.0), line)
    # every dropped vertex is within tol of the simplified chain
    rng = np.random.default_rng(81)
    wav = np.cumsum(rng.normal(0, 1, (80, 2)), axis=0)
    tol = 1.5
    simp = simplify_dp(wav, tol)
    assert (simp[0] == wav[0]).all() and (simp[-1] == wav[-1]).all()
    # brute-force max deviation of the original from the simplified chain
    def seg_dist(p, a, b):
        d = b - a
        t = 0.0 if (d == 0).all() else np.clip(
            np.dot(p - a, d) / np.dot(d, d), 0, 1)
        return np.hypot(*(p - (a + t * d)))
    for p in wav:
        dmin = min(seg_dist(p, simp[k], simp[k + 1])
                   for k in range(len(simp) - 1))
        assert dmin <= tol + 1e-9


def test_lines_to_mvt_simplify_reduces_vertices(spark):
    from geoio_jl_spark.sources.mvt import decode_tile, lines_to_mvt

    # noisy path within one tile
    rng = np.random.default_rng(82)
    xs = np.linspace(2, 60, 40)
    ys = 30 + rng.normal(0, 0.05, 40)
    path = [{"x": float(x), "y": float(y)} for x, y in zip(xs, ys)]
    df = spark.createDataFrame(
        [(1, path)], "line_id bigint, path array<struct<x:double,y:double>>")
    raw = lines_to_mvt(df, zoom=0, base_tile=64).collect()
    simp = lines_to_mvt(df, zoom=0, base_tile=64,
                        simplify_tol=0.5).collect()
    n_raw = len(decode_tile(bytes(raw[0]["mvt"]))
                ["lines"]["features"][0]["parts"][0])
    n_simp = len(decode_tile(bytes(simp[0]["mvt"]))
                 ["lines"]["features"][0]["parts"][0])
    assert n_simp == 2 and n_raw > 10          # noise collapses to a segment


def test_polygons_to_mvt_normalizes_winding(spark):
    """MVT 2.1 §4.3.3.3: exterior rings must have positive surveyor
    area in tile coordinates regardless of input orientation — strict
    renderers read a negative ring as a hole (ADVICE r7).  Encode the
    same square both ways; both must decode with positive area."""
    from geoio_jl_spark.functions.geomkernels import ring_area
    from geoio_jl_spark.sources.mvt import decode_tile, polygons_to_mvt

    ccw = [(10.0, 10.0), (50.0, 10.0), (50.0, 50.0), (10.0, 50.0)]
    cw = list(reversed(ccw))
    df = spark.createDataFrame(
        [(1, [{"x": x, "y": y} for x, y in ccw]),
         (2, [{"x": x, "y": y} for x, y in cw])],
        "poly_id bigint, ring array<struct<x:double,y:double>>")
    rows = polygons_to_mvt(df, zoom=3, base_tile=64, extent=4096).collect()
    assert len(rows) == 1
    layer = decode_tile(bytes(rows[0]["mvt"]))["polygons"]
    assert len(layer["features"]) == 2
    for feat in layer["features"]:
        a = ring_area(np.array(feat["parts"][0], float))
        assert a > 0, (feat["id"], a)
