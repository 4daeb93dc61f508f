"""GeoJSON geometry dict ↔ Geom converters — the engine's analog of the
reference's trait-dispatched `geom2meshes` (gi.jl:111-132): same shapes
(Point/LineString/Polygon/Multi*/GeometryCollection), different input
representation (parsed JSON instead of GeoInterface objects).
"""

from __future__ import annotations

import numpy as np

from geoio_jl_spark.functions import wkb as W


def geojson_to_geom(g: dict) -> W.Geom:
    t = g["type"]
    c = g.get("coordinates")
    if t == "Point":
        return W.point(*c)
    if t == "LineString":
        return W.linestring(c)
    if t == "Polygon":
        return W.polygon(c[0], holes=c[1:])
    if t == "MultiPoint":
        geoms = [W.point(*p) for p in c]
        return _multi(W.MULTIPOINT, geoms)
    if t == "MultiLineString":
        geoms = [W.linestring(ls) for ls in c]
        return _multi(W.MULTILINESTRING, geoms)
    if t == "MultiPolygon":
        return W.multipolygon([W.polygon(p[0], holes=p[1:]) for p in c])
    if t == "GeometryCollection":
        children = [geojson_to_geom(x) for x in g["geometries"]]
        dim = children[0].dim if children else 2
        return W.Geom(W.GEOMETRYCOLLECTION, dim, np.empty((0, dim)), geoms=children)
    raise ValueError(f"unsupported GeoJSON geometry type: {t}")


def _multi(kind: int, geoms: list[W.Geom]) -> W.Geom:
    coords, rings, parts = [], [0], [0]
    for p in geoms:
        offset = int(rings[-1])
        for ri in range(len(p.rings) - 1):
            rings.append(offset + p.rings[ri + 1])
        coords.append(p.coords)
        parts.append(len(rings) - 1)
    allc = np.concatenate(coords) if coords else np.empty((0, geoms[0].dim if geoms else 2))
    return W.Geom(kind, geoms[0].dim if geoms else 2, allc, rings=rings,
                  parts=parts, geoms=geoms)


def geom_to_geojson(g: W.Geom) -> dict:
    if g.kind == W.POINT:
        return {"type": "Point", "coordinates": g.coords[0].tolist()}
    if g.kind == W.LINESTRING:
        return {"type": "LineString", "coordinates": g.coords.tolist()}
    if g.kind == W.POLYGON:
        rings = [
            _closed(g.coords[g.rings[i]:g.rings[i + 1]])
            for i in range(len(g.rings) - 1)
        ]
        return {"type": "Polygon", "coordinates": rings}
    if g.kind in (W.MULTIPOINT, W.MULTILINESTRING, W.MULTIPOLYGON):
        children = g.geoms if g.geoms else W._split_multi(g)
        name = {W.MULTIPOINT: "MultiPoint", W.MULTILINESTRING: "MultiLineString",
                W.MULTIPOLYGON: "MultiPolygon"}[g.kind]
        return {"type": name,
                "coordinates": [geom_to_geojson(c)["coordinates"] for c in children]}
    if g.kind == W.GEOMETRYCOLLECTION:
        return {"type": "GeometryCollection",
                "geometries": [geom_to_geojson(c) for c in g.geoms]}
    raise ValueError(f"unsupported kind {g.kind}")


def _closed(ring: np.ndarray) -> list:
    out = ring.tolist()
    if out and out[0] != out[-1]:
        out.append(out[0])
    return out
