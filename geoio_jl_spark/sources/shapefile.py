"""Shapefile source/sink (reference S3/K3, gis.jl:14-27,52-53) —
from-scratch .shp/.shx/.dbf/.prj codec (numpy/struct; no pyshp).

Read: .shp record scan (Point/MultiPoint/PolyLine/Polygon, Z variants) →
WKB; rings regrouped by orientation (shapefile exteriors are CW, holes
CCW) into MultiPolygon; .dbf (dBase III) attributes; .prj passthrough to
GeoSchema.crs.  Matching the reference's ecosystem quirk, polygon /
polyline shapes surface as Multi* (test/testutils.jl:1-10 isequalshp).

Write: emits .shp + .shx + .dbf (+ .prj) and the reference's deprecation
warning pointing at switchfromshapefile.org (gis.jl:14-27).
"""

from __future__ import annotations

import os
import struct
import warnings

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.geoschema import GeoSchema, with_geo_metadata

SHP_NULL, SHP_POINT, SHP_POLYLINE, SHP_POLYGON, SHP_MULTIPOINT = 0, 1, 3, 5, 8
SHP_POINTZ, SHP_POLYLINEZ, SHP_POLYGONZ = 11, 13, 15

_WGS84_WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]'
)


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _rings_to_multipolygon(rings: list[np.ndarray]) -> W.Geom:
    """Shapefile ring soup → MultiPolygon: CW ring starts a polygon,
    CCW rings are holes of the current one."""
    polys: list[list[np.ndarray]] = []
    for ring in rings:
        if _signed_area(ring) <= 0:  # CW → exterior
            polys.append([ring])
        elif polys:
            polys[-1].append(ring)
        else:  # degenerate: CCW first — treat as exterior
            polys.append([ring])
    return W.multipolygon([W.polygon(p[0], holes=p[1:]) for p in polys])


# ---------------------------------------------------------------------------
# .shp read
# ---------------------------------------------------------------------------

def _read_shp(path: str) -> list[bytes | None]:
    with open(path, "rb") as f:
        buf = f.read()
    if struct.unpack_from(">i", buf, 0)[0] != 9994:
        raise ValueError("not a shapefile (.shp magic != 9994)")
    out: list[bytes | None] = []
    pos = 100
    while pos < len(buf):
        _recno, nwords = struct.unpack_from(">ii", buf, pos)
        pos += 8
        content = buf[pos:pos + nwords * 2]
        pos += nwords * 2
        out.append(_shape_to_wkb(content))
    return out


def _shape_to_wkb(content: bytes) -> bytes | None:
    stype = struct.unpack_from("<i", content, 0)[0]
    if stype == SHP_NULL:
        return None
    if stype in (SHP_POINT, SHP_POINTZ):
        x, y = struct.unpack_from("<2d", content, 4)
        if stype == SHP_POINTZ:
            z = struct.unpack_from("<d", content, 20)[0]
            return W.encode_wkb(W.point(x, y, z))
        return W.encode_wkb(W.point(x, y))
    if stype in (SHP_MULTIPOINT,):
        n = struct.unpack_from("<i", content, 36)[0]
        pts = np.frombuffer(content, "<f8", n * 2, 40).reshape(n, 2)
        geoms = [W.point(*p) for p in pts]
        from geoio_jl_spark.functions.geojson_geom import _multi
        return W.encode_wkb(_multi(W.MULTIPOINT, geoms))
    if stype in (SHP_POLYLINE, SHP_POLYGON, SHP_POLYLINEZ, SHP_POLYGONZ):
        nparts, npoints = struct.unpack_from("<2i", content, 36)
        parts = np.frombuffer(content, "<i4", nparts, 44)
        pts = np.frombuffer(content, "<f8", npoints * 2,
                            44 + 4 * nparts).reshape(npoints, 2)
        bounds = list(parts) + [npoints]
        pieces = [np.asarray(pts[bounds[i]:bounds[i + 1]], dtype=np.float64)
                  for i in range(nparts)]
        if stype in (SHP_POLYGON, SHP_POLYGONZ):
            return W.encode_wkb(_rings_to_multipolygon(pieces))
        from geoio_jl_spark.functions.geojson_geom import _multi
        return W.encode_wkb(_multi(W.MULTILINESTRING,
                                   [W.linestring(p) for p in pieces]))
    raise ValueError(f"unsupported shape type {stype}")


# ---------------------------------------------------------------------------
# .dbf read/write (dBase III)
# ---------------------------------------------------------------------------

def _read_dbf(path: str) -> pd.DataFrame:
    with open(path, "rb") as f:
        buf = f.read()
    nrec = struct.unpack_from("<I", buf, 4)[0]
    hdr_size, rec_size = struct.unpack_from("<2H", buf, 8)
    fields = []
    pos = 32
    while buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    rows = []
    # some writers record header_size without the 0x0D terminator
    # (fixture points.dbf): records then start one byte later
    pos = max(hdr_size, pos + 1)
    for _ in range(nrec):
        rec = buf[pos:pos + rec_size]
        pos += rec_size
        if rec[0:1] == b"*":  # deleted
            continue
        vals, off = [], 1
        for name, ftype, flen, fdec in fields:
            raw = rec[off:off + flen].decode("ascii", "replace").strip()
            off += flen
            if ftype == "N" or ftype == "F":
                if raw == "":
                    vals.append(None)
                elif fdec > 0 or ftype == "F" or "." in raw:
                    vals.append(float(raw))
                else:
                    vals.append(int(raw))
            elif ftype == "L":
                vals.append(raw in ("Y", "y", "T", "t"))
            else:
                vals.append(raw if raw else None)
        rows.append(vals)
    return pd.DataFrame(rows, columns=[f[0] for f in fields])


def _write_dbf(path: str, pdf: pd.DataFrame) -> None:
    fields = []
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_integer_dtype(s):
            fields.append((c[:10], "N", 18, 0))
        elif pd.api.types.is_float_dtype(s):
            fields.append((c[:10], "N", 24, 10))
        else:
            width = max([len(str(v)) for v in s.fillna("")] + [1])
            fields.append((c[:10], "C", min(max(width, 1), 254), 0))
    hdr_size = 32 + 32 * len(fields) + 1
    rec_size = 1 + sum(f[2] for f in fields)
    with open(path, "wb") as f:
        f.write(struct.pack("<B3BIHH20x", 3, 26, 1, 1, len(pdf), hdr_size, rec_size))
        for name, ftype, flen, fdec in fields:
            f.write(struct.pack("<11sc4xBB14x", name.encode("ascii"),
                                ftype.encode("ascii"), flen, fdec))
        f.write(b"\x0d")
        for _, row in pdf.iterrows():
            f.write(b" ")
            for (name, ftype, flen, fdec), c in zip(fields, pdf.columns):
                v = row[c]
                if ftype == "N":
                    txt = "" if pd.isna(v) else (
                        f"{v:.{fdec}f}" if fdec else str(int(v)))
                    f.write(txt.rjust(flen)[:flen].encode("ascii"))
                else:
                    txt = "" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v)
                    f.write(txt.ljust(flen)[:flen].encode("ascii", "replace"))
        f.write(b"\x1a")


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def read(spark: SparkSession, path: str) -> DataFrame:
    wkbs = _read_shp(path)
    base = os.path.splitext(path)[0]
    dbf = base + ".dbf"
    pdf = _read_dbf(dbf) if os.path.exists(dbf) else pd.DataFrame(
        index=range(len(wkbs)))
    pdf = pdf.iloc[:len(wkbs)].copy()
    pdf["geometry"] = wkbs
    crs = "EPSG:4326"
    prj = base + ".prj"
    if os.path.exists(prj):
        with open(prj) as f:
            crs = f.read().strip() or crs
    df = spark.createDataFrame(pdf)
    return with_geo_metadata(df, GeoSchema(crs=crs))


def _wkb_to_shape(blob: bytes | None) -> tuple[int, bytes]:
    if blob is None:
        return SHP_NULL, struct.pack("<i", SHP_NULL)
    g = W.decode_wkb(bytes(blob))
    if g.kind == W.POINT:
        x, y = g.coords[0][:2]
        return SHP_POINT, struct.pack("<i2d", SHP_POINT, x, y)
    if g.kind in (W.POLYGON, W.MULTIPOLYGON, W.LINESTRING, W.MULTILINESTRING):
        is_poly = g.kind in (W.POLYGON, W.MULTIPOLYGON)
        rings = []
        geoms = [g] if g.kind in (W.POLYGON, W.LINESTRING) else (
            g.geoms or W._split_multi(g))
        for child in geoms:
            for ri in range(len(child.rings) - 1):
                ring = child.coords[child.rings[ri]:child.rings[ri + 1], :2]
                if is_poly:
                    closed = np.vstack([ring, ring[:1]]) if not np.array_equal(
                        ring[0], ring[-1]) else ring
                    # shapefile: exterior CW, holes CCW
                    want_cw = ri == 0
                    if (_signed_area(closed) < 0) != want_cw:
                        closed = closed[::-1]
                    rings.append(closed)
                else:
                    rings.append(ring)
        allpts = np.vstack(rings)
        parts, acc = [], 0
        for r in rings:
            parts.append(acc)
            acc += len(r)
        stype = SHP_POLYGON if is_poly else SHP_POLYLINE
        content = struct.pack("<i", stype)
        content += struct.pack("<4d", allpts[:, 0].min(), allpts[:, 1].min(),
                               allpts[:, 0].max(), allpts[:, 1].max())
        content += struct.pack("<2i", len(rings), len(allpts))
        content += np.asarray(parts, "<i4").tobytes()
        content += np.ascontiguousarray(allpts, "<f8").tobytes()
        return stype, content
    raise ValueError(f"cannot write kind {g.kind_name} to shapefile")


def write(df: DataFrame, path: str, geometry_column: str | None = None) -> None:
    warnings.warn(
        "shapefile is a legacy format with known limitations — see "
        "http://switchfromshapefile.org (reference warning, gis.jl:14-27)")
    schema = GeoSchema.from_df(df, geometry_column)
    gcol = schema.geometry_column
    pdf = df.toPandas()
    shapes = [_wkb_to_shape(b) for b in pdf[gcol]]
    base = os.path.splitext(path)[0]
    records, offsets, pos = [], [], 50  # in 16-bit words
    for i, (stype, content) in enumerate(shapes, start=1):
        nwords = len(content) // 2
        records.append(struct.pack(">2i", i, nwords) + content)
        offsets.append((pos, nwords))
        pos += 4 + nwords
    bbox = W.wkb_bounds_batch([None if b is None else bytes(b)
                               for b in pdf[gcol]])
    finite = bbox[~np.isnan(bbox[:, 0])]
    mnx, mny, mxx, mxy = (
        (finite[:, 0].min(), finite[:, 1].min(),
         finite[:, 2].max(), finite[:, 3].max()) if len(finite) else (0, 0, 0, 0))
    main_type = next((s for s, _ in shapes if s != SHP_NULL), SHP_NULL)

    def header(total_words: int) -> bytes:
        h = struct.pack(">i20xi", 9994, total_words)
        h += struct.pack("<2i", 1000, main_type)
        h += struct.pack("<8d", mnx, mny, mxx, mxy, 0, 0, 0, 0)
        return h

    with open(base + ".shp", "wb") as f:
        f.write(header(pos))
        for r in records:
            f.write(r)
    with open(base + ".shx", "wb") as f:
        f.write(header(50 + 4 * len(records)))
        for off, nw in offsets:
            f.write(struct.pack(">2i", off, nw))
    _write_dbf(base + ".dbf", pdf.drop(columns=[gcol]))
    with open(base + ".prj", "w") as f:
        f.write(_WGS84_WKT if schema.crs in ("EPSG:4326", "OGC:CRS84")
                else schema.crs)
