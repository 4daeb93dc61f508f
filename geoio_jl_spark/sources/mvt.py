"""Mapbox Vector Tile (MVT) codec + Spark tile sink — from scratch on
the public Mapbox Vector Tile Specification 2.1 (protobuf wire format
hand-rolled; no protobuf library in this container).

This turns the engine's tile machinery (``operators/pyramid.py``,
``raster_to_vector_tiles``) into the artifact a map stack actually
serves: per-tile protobuf blobs with layers, typed feature properties
(key/value dedup tables), and command-encoded geometry (MoveTo/LineTo/
ClosePath with zigzag delta parameters).

Reference parity note: GeoIO.jl stops at format adapters and has no tile
sink; this module is the engine-addition analog of its K-side writers
for the web-tiling role the brief's north rule names ("raster-to-vector
tile assignments").

Scale shape: ``points_to_mvt`` assigns (tile, local-coord) pairs with
pure built-ins — ONE shuffle on the tile key — then encodes each tile
group in an ``applyInPandas`` Arrow batch; output is a DataFrame
``(zoom, tx, ty, mvt binary)``, i.e. a tile ARCHIVE TABLE that writes as
ordinary partitioned parquet (queryable, resumable) rather than millions
of tiny files; ``save_mvt_dir`` exports small archives to a z/x/y
directory for a tile server.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MOVE_TO, LINE_TO, CLOSE_PATH = 1, 2, 7
POINT, LINESTRING, POLYGON = 1, 2, 3
_GEOM_NAMES = {1: "point", 2: "linestring", 3: "polygon"}


# ---------------------------------------------------------------------------
# protobuf wire primitives (hand-rolled; wire types 0=varint, 2=len, 5=i32)
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    if n < 0:
        n += 1 << 64                         # uint64 two's complement
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    val, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint overflow")


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _packed(field: int, values: list[int]) -> bytes:
    return _len_field(field, b"".join(_varint(v) for v in values))


# ---------------------------------------------------------------------------
# Value message (spec §4.1: exactly one typed field)
# ---------------------------------------------------------------------------

def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _key(7, 0) + _varint(1 if v else 0)
    if isinstance(v, (int, np.integer)):
        v = int(v)
        if v >= 0:
            return _key(4, 0) + _varint(v)   # int_value
        return _key(6, 0) + _varint(_zigzag(v))  # sint_value
    if isinstance(v, (float, np.floating)):
        return _key(3, 1) + struct.pack("<d", float(v))  # double_value
    if isinstance(v, str):
        return _len_field(1, v.encode("utf-8"))
    raise TypeError(f"unsupported MVT property type {type(v).__name__}")


def _decode_value(buf: bytes):
    pos = 0
    tag, pos = _read_varint(buf, pos)
    field, wire = tag >> 3, tag & 7
    if field == 1:
        ln, pos = _read_varint(buf, pos)
        return buf[pos:pos + ln].decode("utf-8")
    if field == 2:
        return struct.unpack_from("<f", buf, pos)[0]
    if field == 3:
        return struct.unpack_from("<d", buf, pos)[0]
    if field in (4, 5):
        v, _ = _read_varint(buf, pos)
        return v if field == 5 or v < (1 << 63) else v - (1 << 64)
    if field == 6:
        v, _ = _read_varint(buf, pos)
        return _unzigzag(v)
    if field == 7:
        v, _ = _read_varint(buf, pos)
        return bool(v)
    raise ValueError(f"unknown Value field {field}")


# ---------------------------------------------------------------------------
# geometry command stream (spec §4.3)
# ---------------------------------------------------------------------------

def _cmd(cmd_id: int, count: int) -> int:
    return (cmd_id & 0x7) | (count << 3)


def encode_geometry(gtype: int, parts: list[list[tuple[int, int]]]
                    ) -> list[int]:
    """parts: for POINT one list of points; for LINESTRING one list per
    line; for POLYGON one list per ring (already closed logically —
    do NOT repeat the first vertex; ClosePath is emitted).  Integer tile
    coordinates; deltas are from the previous emitted vertex across
    parts (cursor persists, per spec)."""
    out: list[int] = []
    cx = cy = 0
    if gtype == POINT:
        pts = parts[0]
        out.append(_cmd(MOVE_TO, len(pts)))
        for x, y in pts:
            out += [_zigzag(x - cx), _zigzag(y - cy)]
            cx, cy = x, y
        return out
    for part in parts:
        if gtype == POLYGON and len(part) < 3:
            raise ValueError("polygon ring needs >= 3 vertices")
        if gtype == LINESTRING and len(part) < 2:
            raise ValueError("linestring needs >= 2 vertices")
        x0, y0 = part[0]
        out += [_cmd(MOVE_TO, 1), _zigzag(x0 - cx), _zigzag(y0 - cy)]
        cx, cy = x0, y0
        out.append(_cmd(LINE_TO, len(part) - 1))
        for x, y in part[1:]:
            out += [_zigzag(x - cx), _zigzag(y - cy)]
            cx, cy = x, y
        if gtype == POLYGON:
            out.append(_cmd(CLOSE_PATH, 1))
    return out


def decode_geometry(gtype: int, geom: list[int]
                    ) -> list[list[tuple[int, int]]]:
    parts, cur = [], []
    cx = cy = 0
    i = 0
    while i < len(geom):
        cmd_id, count = geom[i] & 0x7, geom[i] >> 3
        i += 1
        if cmd_id == MOVE_TO:
            if cur:
                parts.append(cur)
            cur = []
            for _ in range(count):
                cx += _unzigzag(geom[i])
                cy += _unzigzag(geom[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd_id == LINE_TO:
            for _ in range(count):
                cx += _unzigzag(geom[i])
                cy += _unzigzag(geom[i + 1])
                i += 2
                cur.append((cx, cy))
        elif cmd_id == CLOSE_PATH:
            parts.append(cur)
            cur = []
        else:
            raise ValueError(f"unknown geometry command {cmd_id}")
    if cur:
        parts.append(cur)
    return parts


# ---------------------------------------------------------------------------
# tile encode / decode
# ---------------------------------------------------------------------------

def encode_tile(layers: dict[str, dict]) -> bytes:
    """layers: {name: {"extent": 4096, "features": [
        {"id": int, "type": 1|2|3,
         "parts": [[(x, y), ...], ...],
         "props": {key: str|int|float|bool}}, ...]}} -> MVT bytes.

    Keys/values dedup into the layer tables in first-seen order (the
    spec's required encoding)."""
    out = bytearray()
    for name, spec in layers.items():
        keys: list[str] = []
        vals: list = []
        kidx: dict[str, int] = {}
        vidx: dict = {}
        body = bytearray()
        body += _key(15, 0) + _varint(2)                 # version = 2
        body += _len_field(1, name.encode("utf-8"))
        feat_blobs = []
        for f in spec.get("features", []):
            tags: list[int] = []
            for k, v in (f.get("props") or {}).items():
                if k not in kidx:
                    kidx[k] = len(keys)
                    keys.append(k)
                vk = (type(v).__name__, v)
                if vk not in vidx:
                    vidx[vk] = len(vals)
                    vals.append(v)
                tags += [kidx[k], vidx[vk]]
            fb = bytearray()
            if f.get("id") is not None:
                fb += _key(1, 0) + _varint(int(f["id"]))
            if tags:
                fb += _packed(2, tags)
            fb += _key(3, 0) + _varint(f["type"])
            fb += _packed(4, encode_geometry(f["type"], f["parts"]))
            feat_blobs.append(bytes(fb))
        for fb in feat_blobs:
            body += _len_field(2, fb)
        for k in keys:
            body += _len_field(3, k.encode("utf-8"))
        for v in vals:
            body += _len_field(4, _encode_value(v))
        body += _key(5, 0) + _varint(spec.get("extent", 4096))
        out += _len_field(3, bytes(body))
    return bytes(out)


def decode_tile(buf: bytes) -> dict[str, dict]:
    layers: dict[str, dict] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        if tag >> 3 != 3 or (tag & 7) != 2:
            raise ValueError(f"unexpected Tile field {tag >> 3}")
        ln, pos = _read_varint(buf, pos)
        layer = _decode_layer(buf[pos:pos + ln])
        pos += ln
        layers[layer.pop("name")] = layer
    return layers


def _decode_layer(buf: bytes) -> dict:
    name, version, extent = None, None, 4096
    feats_raw, keys, vals = [], [], []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 2:
            ln, pos = _read_varint(buf, pos)
            payload = buf[pos:pos + ln]
            pos += ln
            if field == 1:
                name = payload.decode("utf-8")
            elif field == 2:
                feats_raw.append(payload)
            elif field == 3:
                keys.append(payload.decode("utf-8"))
            elif field == 4:
                vals.append(_decode_value(payload))
        else:
            v, pos = _read_varint(buf, pos)
            if field == 15:
                version = v
            elif field == 5:
                extent = v
    if version != 2:
        raise ValueError(f"MVT layer version {version} (expected 2)")
    feats = []
    for fb in feats_raw:
        f = {"id": None, "type": None, "parts": None, "props": {}}
        tags: list[int] = []
        geom: list[int] = []
        p = 0
        while p < len(fb):
            tag, p = _read_varint(fb, p)
            field, wire = tag >> 3, tag & 7
            if field == 1:
                f["id"], p = _read_varint(fb, p)
            elif field == 2:
                ln, p = _read_varint(fb, p)
                end = p + ln
                while p < end:
                    v, p = _read_varint(fb, p)
                    tags.append(v)
            elif field == 3:
                f["type"], p = _read_varint(fb, p)
            elif field == 4:
                ln, p = _read_varint(fb, p)
                end = p + ln
                while p < end:
                    v, p = _read_varint(fb, p)
                    geom.append(v)
            else:
                raise ValueError(f"unknown Feature field {field}")
        for i in range(0, len(tags), 2):
            f["props"][keys[tags[i]]] = vals[tags[i + 1]]
        f["parts"] = decode_geometry(f["type"], geom)
        feats.append(f)
    return {"name": name, "extent": extent, "features": feats}


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

MVT_SCHEMA = "zoom int, tx bigint, ty bigint, mvt binary"


def points_to_mvt(points: DataFrame, x_col: str, y_col: str,
                  zoom: int, layer: str = "points",
                  base_tile: int = 64, extent: int = 4096,
                  prop_cols: list[str] | None = None) -> DataFrame:
    """Point table -> (zoom, tx, ty, mvt) tile archive.

    Tile assignment + local-coordinate scaling are pure built-ins (the
    only corpus shuffle is the tile groupBy); per-tile protobuf encode
    runs in one Arrow batch per tile via applyInPandas.  Coordinates
    must be non-negative (the pyramid's grid convention); the local
    coordinate is ``floor((v - tile_origin) * extent / tile_size)``."""
    from geoio_jl_spark.shipping import ensure_pyfiles
    ensure_pyfiles(points.sparkSession)
    props = list(prop_cols or [])
    ts = F.lit(base_tile)
    assigned = points.select(
        F.floor(F.col(x_col) / ts).alias("tx"),
        F.floor(F.col(y_col) / ts).alias("ty"),
        F.floor((F.col(x_col) % ts) * extent / ts).cast("int").alias("px"),
        F.floor((F.col(y_col) % ts) * extent / ts).cast("int").alias("py"),
        *props)

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        feats = []
        for i, row in enumerate(pdf.itertuples(index=False)):
            feats.append({
                "id": i + 1, "type": POINT,
                "parts": [[(int(row.px), int(row.py))]],
                "props": {c: getattr(row, c) for c in props
                          if getattr(row, c) is not None},
            })
        blob = encode_tile({layer: {"extent": extent, "features": feats}})
        return pd.DataFrame([{"zoom": zoom, "tx": tx, "ty": ty,
                              "mvt": blob}])

    return assigned.groupBy("tx", "ty").applyInPandas(_encode, MVT_SCHEMA)


def save_mvt_dir(tiles: DataFrame, path: str,
                 max_tiles: int = 100_000) -> int:
    """Export a (zoom, tx, ty, mvt) archive table to a z/x/y.mvt
    directory for a tile server.  Driver-side by design — a z/x/y file
    tree is a SMALL-export format (a 100-TB pipeline keeps tiles in the
    archive table / parquet); the guard makes that contract explicit."""
    n = tiles.count()
    if n > max_tiles:
        raise ValueError(
            f"{n} tiles exceed the driver-export guard ({max_tiles}); "
            "keep large tile sets in the archive table")
    for row in tiles.toLocalIterator():
        d = os.path.join(path, str(row["zoom"]), str(row["tx"]))
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{row['ty']}.mvt"), "wb") as fh:
            fh.write(bytes(row["mvt"]))
    return n


def polygons_to_mvt(polys: DataFrame, zoom: int,
                    layer: str = "polygons",
                    id_col: str = "poly_id", ring_col: str = "ring",
                    base_tile: int = 64, extent: int = 4096,
                    prop_cols: list[str] | None = None) -> DataFrame:
    """Polygon table -> (zoom, tx, ty, mvt) tile archive with per-tile
    Sutherland-Hodgman clipping.

    ``ring_col``: array<struct<x:double, y:double>> outer ring (open).
    Tile COVER is pure built-ins (bbox -> sequence+explode, the same
    shape as the spatial join's polygon tiling — each polygon fans out
    only to tiles its bbox touches); the exact rectangle clip runs in
    the per-tile Arrow batch, so clip cost is O(candidate pairs), and a
    polygon spanning many tiles never ships whole-corpus anywhere.
    Clipped-away candidates (bbox touched, geometry didn't) drop out."""
    from geoio_jl_spark.functions.geomkernels import (clip_ring_rect,
                                                      ring_area)
    from geoio_jl_spark.shipping import ensure_pyfiles
    ensure_pyfiles(polys.sparkSession)
    props = list(prop_cols or [])
    ts = float(base_tile)
    xs = F.transform(F.col(ring_col), lambda p: p.getField("x"))
    ys = F.transform(F.col(ring_col), lambda p: p.getField("y"))
    d = (polys
         .withColumn("_tx0", F.floor(F.array_min(xs) / ts).cast("bigint"))
         .withColumn("_tx1", F.floor(F.array_max(xs) / ts).cast("bigint"))
         .withColumn("_ty0", F.floor(F.array_min(ys) / ts).cast("bigint"))
         .withColumn("_ty1", F.floor(F.array_max(ys) / ts).cast("bigint"))
         .withColumn("tx", F.explode(F.sequence("_tx0", "_tx1"))))
    d = (d.withColumn("ty", F.explode(F.sequence("_ty0", "_ty1")))
         .select("tx", "ty", id_col, ring_col, *props))

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        x0, y0 = tx * ts, ty * ts
        feats = []
        for row in pdf.itertuples(index=False):
            ring = np.array([(p["x"], p["y"]) for p in getattr(row, ring_col)],
                            np.float64)
            clipped = clip_ring_rect(ring, x0, y0, x0 + ts, y0 + ts)
            if len(clipped) < 3:
                continue                      # bbox touched, polygon didn't
            local = np.floor((clipped - (x0, y0)) * extent / ts + 0.5)
            local = np.clip(local, 0, extent).astype(int)
            # drop consecutive duplicates introduced by snapping
            keep = np.ones(len(local), bool)
            keep[1:] = (local[1:] != local[:-1]).any(axis=1)
            local = local[keep]
            if len(local) >= 2 and (local[0] == local[-1]).all():
                local = local[:-1]
            if len(local) < 3:
                continue
            # MVT 2.1 §4.3.3.3: an exterior ring must have positive
            # area under the surveyor's formula over tile coordinates —
            # strict decoders read a negative ring as a hole and drop
            # the feature.  Clipping preserves input orientation, so
            # normalize here (ADVICE r7).
            if ring_area(local.astype(np.float64)) < 0:
                local = local[::-1]
            feats.append({
                "id": int(getattr(row, id_col)), "type": POLYGON,
                "parts": [[(int(x), int(y)) for x, y in local]],
                "props": {c: getattr(row, c) for c in props
                          if getattr(row, c) is not None},
            })
        if not feats:
            return pd.DataFrame(
                columns=["zoom", "tx", "ty", "mvt"]).astype(
                {"zoom": "int32", "tx": "int64", "ty": "int64"})
        blob = encode_tile({layer: {"extent": extent, "features": feats}})
        return pd.DataFrame([{"zoom": zoom, "tx": tx, "ty": ty,
                              "mvt": blob}])

    return d.groupBy("tx", "ty").applyInPandas(_encode, MVT_SCHEMA)


def lines_to_mvt(lines: DataFrame, zoom: int,
                 layer: str = "lines",
                 id_col: str = "line_id", path_col: str = "path",
                 base_tile: int = 64, extent: int = 4096,
                 prop_cols: list[str] | None = None,
                 simplify_tol: float = 0.0) -> DataFrame:
    """Polyline table -> (zoom, tx, ty, mvt) tile archive with per-tile
    Liang-Barsky clipping (a line leaving and re-entering a tile
    becomes a multi-linestring feature).  Same fan-out shape as
    polygons_to_mvt: bbox cover via sequence+explode, exact clip in the
    per-tile Arrow batch."""
    from geoio_jl_spark.functions.geomkernels import (clip_line_rect,
                                                      simplify_dp)
    from geoio_jl_spark.shipping import ensure_pyfiles
    ensure_pyfiles(lines.sparkSession)
    props = list(prop_cols or [])
    ts = float(base_tile)
    xs = F.transform(F.col(path_col), lambda p: p.getField("x"))
    ys = F.transform(F.col(path_col), lambda p: p.getField("y"))
    d = (lines
         .withColumn("_tx0", F.floor(F.array_min(xs) / ts).cast("bigint"))
         .withColumn("_tx1", F.floor(F.array_max(xs) / ts).cast("bigint"))
         .withColumn("_ty0", F.floor(F.array_min(ys) / ts).cast("bigint"))
         .withColumn("_ty1", F.floor(F.array_max(ys) / ts).cast("bigint"))
         .withColumn("tx", F.explode(F.sequence("_tx0", "_tx1"))))
    d = (d.withColumn("ty", F.explode(F.sequence("_ty0", "_ty1")))
         .select("tx", "ty", id_col, path_col, *props))

    def _snap(parts, x0, y0):
        out = []
        for part in parts:
            local = np.floor((part - (x0, y0)) * extent / ts + 0.5)
            local = np.clip(local, 0, extent).astype(int)
            keep = np.ones(len(local), bool)
            keep[1:] = (local[1:] != local[:-1]).any(axis=1)
            local = local[keep]
            if len(local) >= 2:
                out.append([(int(x), int(y)) for x, y in local])
        return out

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(pdf["tx"].iloc[0]), int(pdf["ty"].iloc[0])
        x0, y0 = tx * ts, ty * ts
        feats = []
        for row in pdf.itertuples(index=False):
            path = np.array([(p["x"], p["y"])
                             for p in getattr(row, path_col)], np.float64)
            if simplify_tol > 0:
                # Douglas-Peucker BEFORE clipping: per-zoom detail
                # reduction (pass ~ tile_size/extent for sub-pixel)
                path = simplify_dp(path, simplify_tol)
            parts = _snap(clip_line_rect(path, x0, y0, x0 + ts, y0 + ts),
                          x0, y0)
            if not parts:
                continue
            feats.append({
                "id": int(getattr(row, id_col)), "type": LINESTRING,
                "parts": parts,
                "props": {c: getattr(row, c) for c in props
                          if getattr(row, c) is not None},
            })
        if not feats:
            return pd.DataFrame(
                columns=["zoom", "tx", "ty", "mvt"]).astype(
                {"zoom": "int32", "tx": "int64", "ty": "int64"})
        blob = encode_tile({layer: {"extent": extent, "features": feats}})
        return pd.DataFrame([{"zoom": zoom, "tx": tx, "ty": ty,
                              "mvt": blob}])

    return d.groupBy("tx", "ty").applyInPandas(_encode, MVT_SCHEMA)


def pyramid_to_mvt(pyramid: DataFrame, base_tile: int = 64,
                   extent: int = 4096, layer: str = "density",
                   max_zoom: int | None = None) -> DataFrame:
    """Tile-pyramid counts (operators/pyramid.tile_pyramid output:
    zoom, tx, ty, n) -> one MVT per tile with a single center-point
    feature carrying the count — the heat-density layer a map serves
    at every zoom.  Row-local encode (one tiny feature per row), no
    extra shuffle: the pyramid already IS tile-keyed."""
    from geoio_jl_spark.shipping import ensure_pyfiles
    ensure_pyfiles(pyramid.sparkSession)
    src = pyramid
    if max_zoom is not None:
        src = src.filter(F.col("zoom") <= max_zoom)

    def _encode(batches):
        c = extent // 2
        for pdf in batches:
            rows = []
            for z, tx, ty, n in zip(pdf["zoom"], pdf["tx"], pdf["ty"],
                                    pdf["n"]):
                blob = encode_tile({layer: {"extent": extent, "features": [
                    {"id": 1, "type": POINT, "parts": [[(c, c)]],
                     "props": {"n": int(n), "zoom": int(z)}}]}})
                rows.append({"zoom": int(z), "tx": int(tx),
                             "ty": int(ty), "mvt": blob})
            yield pd.DataFrame(
                rows, columns=["zoom", "tx", "ty", "mvt"])

    return src.select("zoom", "tx", "ty", "n").mapInPandas(
        _encode, MVT_SCHEMA)
