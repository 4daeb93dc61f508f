"""Minimal from-scratch GRIB2 reader (S9's GRIB half, src/extra/cdm.jl
_gribdataset — the reference delegates to GRIBDatasets/eccodes, absent
here; fixture test/data/regular_gg_ml.grib).

Scope: edition-2 messages, grid templates 3.0 (regular lat/lon) and
3.40 (regular Gaussian — latitudes from Legendre roots via
numpy.polynomial.legendre.leggauss), data representation template 5.0
(simple packing), optional bitmap, multi-message files. Values decode as
(R + 2^E · X) · 10^-D per the spec (decimal scale divides R too).

Output: the engine's long-form grid table (cell_id, i, j, x, y,
<one column per message: discipline/category/number name + level>).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# (discipline, category, number) → short name, WMO code table 4.2 subset
_PARAM = {
    (0, 0, 0): "t", (0, 1, 0): "q", (0, 2, 2): "u", (0, 2, 3): "v",
    (0, 3, 0): "pres", (0, 3, 5): "z",
}


def _i(b: bytes, lo: int, n: int) -> int:
    return int.from_bytes(b[lo:lo + n], "big")


def _sm(v: int, bits: int) -> int:
    """GRIB sign-magnitude: high bit set → negative magnitude."""
    sign_bit = 1 << (bits - 1)
    return -(v & (sign_bit - 1)) if v & sign_bit else v


def _gaussian_lats(n_half: int) -> np.ndarray:
    """Latitudes of a regular Gaussian grid with N=n_half parallels per
    hemisphere: arcsin of the 2N Legendre-Gauss nodes, north → south."""
    nodes, _ = np.polynomial.legendre.leggauss(2 * n_half)
    return np.degrees(np.arcsin(np.sort(nodes)[::-1]))


def read_raw(path: str) -> list[dict]:
    """→ one dict per message: {lons, lats, values (nj, ni), name,
    level, scan} (values in grid scan order, bitmap applied as NaN)."""
    with open(path, "rb") as f:
        buf = f.read()
    out = []
    pos = 0
    while pos < len(buf) - 4:
        if buf[pos:pos + 4] != b"GRIB":
            pos += 1
            continue
        edition = buf[pos + 7]
        if edition != 2:
            raise ValueError(f"only GRIB edition 2 supported, got {edition}")
        discipline = buf[pos + 6]
        msg_len = _i(buf, pos + 8, 8)
        out.append(_decode_message(buf[pos:pos + msg_len], discipline))
        pos += msg_len
    return out


def _earth_ellipsoid(s: bytes):
    """Section-3 shape-of-earth octets → Ellipsoid (code table 3.2)."""
    from geoio_jl_spark.functions.crs import Ellipsoid
    shape = s[14]
    if shape == 0:
        return Ellipsoid(6367470.0, 0.0)
    if shape == 6:
        return Ellipsoid(6371229.0, 0.0)     # NCEP operational sphere
    if shape == 1:                            # custom scaled sphere
        return Ellipsoid(_i(s, 16, 4) / 10.0 ** s[15], 0.0)
    if shape == 4:
        return Ellipsoid(6378137.0, 298.257222101)   # GRS80
    if shape == 5:
        return Ellipsoid(6378137.0, 298.257223563)   # WGS84
    raise ValueError(f"earth shape code {shape} unsupported")


def _decode_lambert_grid(s: bytes) -> dict:
    """Grid template 3.30 (Lambert conformal — the NCEP HRRR/NAM/RAP
    grids): the grid is REGULAR in projection space (x1 + i·Dx), so the
    axes stay 1-D and per-cell lon/lat come from the engine's own
    inverse LCC (functions/crs.py, EPSG 9802 closed form; sphere via
    e = 0).  The reference reaches these grids through eccodes
    (src/extra/cdm.jl:5)."""
    from geoio_jl_spark.functions.crs import lcc_projection
    ell = _earth_ellipsoid(s)
    ni, nj = _i(s, 30, 4), _i(s, 34, 4)
    la1 = _sm(_i(s, 38, 4), 32) / 1e6
    lo1 = _i(s, 42, 4) / 1e6
    lad = _sm(_i(s, 47, 4), 32) / 1e6
    lov = _i(s, 51, 4) / 1e6
    dx = _i(s, 55, 4) / 1e3                  # 10^-3 m → m
    dy = _i(s, 59, 4) / 1e3
    scan = s[64]
    lat1 = _sm(_i(s, 65, 4), 32) / 1e6
    lat2 = _sm(_i(s, 69, 4), 32) / 1e6
    fwd, inv = lcc_projection(lat1, lat2, lad, lov, 0.0, 0.0, ell)
    meta = {"method": "lambert_conformal_conic",
            "lat1": lat1, "lat2": lat2, "lad": lad, "lov": lov,
            "a": ell.a, "invf": (1.0 / ell.f if ell.f else 0.0)}
    return _proj_mesh(ni, nj, la1, lo1, dx, dy, scan, fwd, inv, meta)


def _decode_polar_grid(s: bytes) -> dict:
    """Grid template 3.20 (polar stereographic — NCEP Alaska / polar
    grids): regular in projection space like 3.30; per-cell lon/lat via
    the engine's Polar Stereographic variant B (EPSG 9829; LaD is the
    standard parallel, the projection-centre flag picks the aspect)."""
    from geoio_jl_spark.functions.crs import polar_stereographic
    ell = _earth_ellipsoid(s)
    ni, nj = _i(s, 30, 4), _i(s, 34, 4)
    la1 = _sm(_i(s, 38, 4), 32) / 1e6
    lo1 = _i(s, 42, 4) / 1e6
    lad = _sm(_i(s, 47, 4), 32) / 1e6
    lov = _i(s, 51, 4) / 1e6
    dx = _i(s, 55, 4) / 1e3
    dy = _i(s, 59, 4) / 1e3
    south = bool(s[63] & 0x80)
    scan = s[64]
    ts = -abs(lad) if south else abs(lad)
    fwd, inv = polar_stereographic("B", ts, lov, 1.0, 0.0, 0.0, ell)
    meta = {"method": "polar_stereographic", "lad": ts, "lov": lov,
            "a": ell.a, "invf": (1.0 / ell.f if ell.f else 0.0)}
    return _proj_mesh(ni, nj, la1, lo1, dx, dy, scan, fwd, inv, meta)


def _decode_mercator_grid(s: bytes) -> dict:
    """Grid template 3.10 (Mercator — NCEP marine/wave grids): regular
    in projection space; lon/lat via the engine's ellipsoidal Mercator
    with variant-B scale from LaD (k0 = m(lat_ts), EPSG 9805)."""
    from geoio_jl_spark.functions.crs import _m_fn, mercator_projection
    ell = _earth_ellipsoid(s)
    ni, nj = _i(s, 30, 4), _i(s, 34, 4)
    la1 = _sm(_i(s, 38, 4), 32) / 1e6
    lo1 = _i(s, 42, 4) / 1e6
    lad = _sm(_i(s, 47, 4), 32) / 1e6
    scan = s[59]
    dx = _i(s, 64, 4) / 1e3
    dy = _i(s, 68, 4) / 1e3
    k0 = float(_m_fn(np.radians(lad), ell))
    fwd, inv = mercator_projection(0.0, k0, 0.0, 0.0, ell)
    meta = {"method": "mercator", "lad": lad,
            "a": ell.a, "invf": (1.0 / ell.f if ell.f else 0.0)}
    return _proj_mesh(ni, nj, la1, lo1, dx, dy, scan, fwd, inv, meta)


def _proj_mesh(ni, nj, la1, lo1, dx, dy, scan, fwd, inv, meta) -> dict:
    """Shared projected-grid mesh: anchor the regular x/y axes at the
    first grid point, inverse-project the mesh to per-cell lon/lat."""
    x1, y1 = (float(v) for v in fwd(lo1, la1))
    sx = -1.0 if scan & 0x80 else 1.0
    sy = 1.0 if scan & 0x40 else -1.0
    xs = x1 + sx * dx * np.arange(ni)
    ys = y1 + sy * dy * np.arange(nj)
    gx, gy = np.meshgrid(xs, ys)
    lon2d, lat2d = inv(gx, gy)
    lon2d = np.mod(lon2d, 360.0)             # GRIB longitudes 0..360
    return {"ni": ni, "nj": nj, "scan": scan, "lons": xs, "lats": ys,
            "proj": {"lon2d": lon2d, "lat2d": lat2d, **meta}}


def _decode_message(msg: bytes, discipline: int) -> dict:
    i = 16
    grid = None
    prod = None
    pack = None
    bitmap = None
    while i < len(msg) - 4:
        if msg[i:i + 4] == b"7777":
            break
        ln = _i(msg, i, 4)
        sec = msg[i + 4]
        s = msg[i:i + ln]
        if sec == 3:
            tmpl = _i(s, 12, 2)
            if tmpl not in (0, 10, 20, 30, 40):
                raise ValueError(f"unsupported grid template 3.{tmpl}")
            if tmpl == 30:
                grid = _decode_lambert_grid(s)
            elif tmpl == 20:
                grid = _decode_polar_grid(s)
            elif tmpl == 10:
                grid = _decode_mercator_grid(s)
            else:
                ni = _i(s, 30, 4)
                nj = _i(s, 34, 4)
                la1 = _sm(_i(s, 46, 4), 32) / 1e6
                lo1 = _i(s, 50, 4) / 1e6
                la2 = _sm(_i(s, 55, 4), 32) / 1e6
                lo2 = _i(s, 59, 4) / 1e6
                di = _i(s, 63, 4) / 1e6
                scan = s[71]
                if tmpl == 40:
                    n_half = _i(s, 67, 4)
                    lats = _gaussian_lats(n_half)
                else:
                    lats = np.linspace(la1, la2, nj)
                lons = (lo1 + di * np.arange(ni)) if di and di < 1e3 else \
                    np.linspace(lo1, lo2 if lo2 > lo1 else lo2 + 360.0, ni)
                grid = {"ni": ni, "nj": nj, "lats": lats, "lons": lons,
                        "scan": scan}
        elif sec == 4:
            cat, num = s[9], s[10]
            lvl_type = s[22]
            lvl_scale = s[23]
            lvl_val = _i(s, 24, 4)
            if lvl_scale == 0xFF or lvl_val == 0xFFFFFFFF:  # missing
                level = float("nan")
            else:  # scale is sign-magnitude: scale -1 → multiply by 10
                level = lvl_val * 10.0 ** -_sm(lvl_scale, 8)
            prod = {"cat": cat, "num": num, "level_type": lvl_type,
                    "level": level}
        elif sec == 5:
            tmpl = _i(s, 9, 2)
            if tmpl not in (0, 2, 3, 40, 41):
                raise ValueError(f"unsupported packing template 5.{tmpl}")
            pack = {
                "tmpl": tmpl,
                "n": _i(s, 5, 4),
                "R": struct.unpack_from(">f", s, 11)[0],
                "E": _sm(_i(s, 15, 2), 16),
                "D": _sm(_i(s, 17, 2), 16),
                "nbits": s[19],
            }
            if tmpl in (2, 3):  # complex packing (group split)
                if s[22] != 0:
                    raise ValueError(
                        "complex packing with missing-value management "
                        f"{s[22]} unsupported (only 0 = none)")
                pack.update({
                    "ng": _i(s, 31, 4),
                    "width_ref": s[35], "width_bits": s[36],
                    "len_ref": _i(s, 37, 4), "len_inc": s[41],
                    "last_len": _i(s, 42, 4), "len_bits": s[46],
                })
            if tmpl == 3:       # + spatial differencing
                pack["order"] = s[47]
                pack["extra_octets"] = s[48]
                if pack["order"] not in (1, 2):
                    raise ValueError(
                        f"spatial differencing order {pack['order']}")
            if tmpl == 40:      # JPEG 2000 code-stream packing
                if s[21] != 0:  # 0 = lossless, 1 = lossy (9/7 wavelet)
                    raise ValueError(
                        f"template 5.40 compression type {s[21]} "
                        "unsupported (only 0 = lossless)")
        elif sec == 6:
            if s[5] == 0:  # bitmap present in this section
                bits = np.unpackbits(
                    np.frombuffer(s, np.uint8, ln - 6, 6))
                bitmap = bits.astype(bool)
        elif sec == 7:
            data = s[5:]
            if pack["tmpl"] == 0:
                vals = _unpack_simple(data, pack)
            elif pack["tmpl"] == 40:
                vals = _unpack_j2k(data, pack)
            elif pack["tmpl"] == 41:
                vals = _unpack_png(data, pack)
            else:
                vals = _unpack_complex(data, pack)
            if bitmap is not None:
                full = np.full(len(bitmap), np.nan)
                full[bitmap[:len(full)]] = vals
                vals = full[:grid["ni"] * grid["nj"]]
            name = _PARAM.get((discipline, prod["cat"], prod["num"]),
                              f"var{discipline}_{prod['cat']}_{prod['num']}")
            arr = vals.reshape(grid["nj"], grid["ni"])
            out = {"values": arr, "name": name,
                   "level_type": prod["level_type"],
                   "level": prod["level"]}
            if "proj" in grid:
                # projected grid: axes/coords already in scan order
                out.update({"lons": grid["lons"], "lats": grid["lats"],
                            "proj": grid["proj"]})
                return out
            lats = grid["lats"]
            # Flip only when the stored lats run north→south while the
            # scan order runs south→north (+j, 0x40). Template 3.0 lats
            # are linspace(la1, la2) in scan order, so they already match
            # the data rows; Gaussian lats are built north→south
            # regardless of scan, so a +j scan needs the flip.
            if (grid["scan"] & 0x40) and len(lats) > 1 and lats[0] > lats[-1]:
                arr = arr[::-1]
            out.update({"lons": grid["lons"], "lats": grid["lats"]})
            return out
        i += ln
    raise ValueError("GRIB message missing data section")


def _bit_fields(bits: np.ndarray, pos: int, n: int, width: int):
    """n big-endian fields of `width` bits starting at bit `pos` →
    (int64 array, new pos). Vectorized reshape, no per-field loop."""
    if width == 0:
        return np.zeros(n, np.int64), pos
    f = bits[pos:pos + n * width].reshape(n, width).astype(np.int64)
    return (f * (1 << np.arange(width - 1, -1, -1))).sum(axis=1), \
        pos + n * width


def _align(pos: int) -> int:
    return (pos + 7) & ~7


def _unpack_complex(data: bytes, pack: dict) -> np.ndarray:
    """Complex packing (template 5.2) and complex packing with spatial
    differencing (5.3): per-group references/widths/lengths, each array
    byte-aligned, then the per-group packed values; 5.3 prepends the
    `order` initial field values + overall minimum (sign-magnitude,
    extra_octets each) and reconstructs by prefix-sum integration.
    WMO FM 92 GRIB-2 regulations 7.2/7.3 (public spec; the reference
    delegates to eccodes for the same decode)."""
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    pos = 0
    n = pack["n"]
    od = pack.get("order", 0)
    ivals, gmin = [], 0
    if pack["tmpl"] == 3:
        eo8 = pack["extra_octets"] * 8
        for _ in range(od):
            v, pos = _bit_fields(bits, pos, 1, eo8)
            ivals.append(_sm(int(v[0]), eo8))
        v, pos = _bit_fields(bits, pos, 1, eo8)
        gmin = _sm(int(v[0]), eo8)
    ng = pack["ng"]
    refs, pos = _bit_fields(bits, pos, ng, pack["nbits"])
    pos = _align(pos)
    widths, pos = _bit_fields(bits, pos, ng, pack["width_bits"])
    widths = widths + pack["width_ref"]
    pos = _align(pos)
    slens, pos = _bit_fields(bits, pos, ng, pack["len_bits"])
    lens = pack["len_ref"] + pack["len_inc"] * slens
    pos = _align(pos)
    if ng:
        lens[-1] = pack["last_len"]
    out = np.empty(n, np.int64)
    at = 0
    for g in range(ng):
        length = int(lens[g])
        w = int(widths[g])
        if w == 0:
            out[at:at + length] = refs[g]
        else:
            v, pos = _bit_fields(bits, pos, length, w)
            out[at:at + length] = refs[g] + v
        at += length
    if at != n:
        raise ValueError(f"complex packing group lengths sum {at} != {n}")
    if pack["tmpl"] == 3:
        # first `od` values come from the header; the rest are offset
        # differences — integrate (g2 spec: X[n] += gmin, then prefix sums)
        d = out.copy()
        d[od:] += gmin
        if od == 1:
            d[0] = ivals[0]
            x = np.cumsum(d)
        else:
            if n < 2:
                raise ValueError(
                    "GRIB2 template 5.3 order-2 spatial differencing "
                    f"requires >= 2 data values, message has n={n}")
            f = np.empty(n, np.int64)  # first differences
            f[0] = 0
            f[1] = ivals[1] - ivals[0]
            f[2:] = d[2:]
            f[1:] = np.cumsum(f[1:])
            x = ivals[0] + np.concatenate(([0], np.cumsum(f[1:])))
            x[0] = ivals[0]
            if n > 1:
                x[1] = ivals[1]
        out = x
    return (pack["R"] + out * (2.0 ** pack["E"])) * (10.0 ** -pack["D"])


def _unpack_j2k(data: bytes, pack: dict) -> np.ndarray:
    """JPEG 2000 packing (template 5.40, the other packing NCEP archives
    use besides PNG 5.41): section 7 carries a raw lossless JPEG 2000
    codestream of the scaled integers X (g2clib ``jpcpack``), decoded
    with the repo's own minimal Part-1 decoder (sources/j2k.py).  The
    image shape is encoder-chosen, so values are consumed in raster
    order and checked against the header count.  The reference reaches
    this template through eccodes (src/extra/cdm.jl:5)."""
    n, nbits = pack["n"], pack["nbits"]
    if nbits == 0 or not data:
        x = np.zeros(n, dtype=np.int64)
    else:
        from geoio_jl_spark.sources.j2k import decode_j2k
        img, _info = decode_j2k(bytes(data))
        x = img.ravel()
        if len(x) != n:
            raise ValueError(
                f"template 5.40 codestream carries {len(x)} values, "
                f"header says {n}")
    # WMO: Y × 10^D = R + X × 2^E  (the decimal scale divides R too)
    return (pack["R"] + x * (2.0 ** pack["E"])) * (10.0 ** -pack["D"])


def _unpack_png(data: bytes, pack: dict) -> np.ndarray:
    """PNG packing (template 5.41, NCEP archives): section 7 carries a
    PNG stream of the scaled integers X — 8/16-bit grayscale for depths
    <= 16, RGB(A) with X spread big-endian across channels for 24/32
    (reusing the repo's own PNG codec, sources/img.py).  The reference
    reaches this template through eccodes (src/extra/cdm.jl:5)."""
    from geoio_jl_spark.sources.img import decode_png
    img = decode_png(data)
    h, w, ch = img.shape
    nbits = pack["nbits"]
    if nbits <= 16:
        if ch != 1:
            raise ValueError(
                f"template 5.41 with {nbits} bits expects grayscale PNG, "
                f"got {ch} channels")
        x = img[:, :, 0].astype(np.int64)
    elif nbits <= 24:
        if ch != 3:
            raise ValueError("template 5.41 with 24 bits expects RGB PNG")
        a = img.astype(np.int64)
        x = (a[:, :, 0] << 16) | (a[:, :, 1] << 8) | a[:, :, 2]
    else:
        if ch != 4:
            raise ValueError("template 5.41 with 32 bits expects RGBA PNG")
        a = img.astype(np.int64)
        x = ((a[:, :, 0] << 24) | (a[:, :, 1] << 16)
             | (a[:, :, 2] << 8) | a[:, :, 3])
    x = x.ravel()
    if len(x) != pack["n"]:
        raise ValueError(
            f"template 5.41 PNG carries {len(x)} values, header says "
            f"{pack['n']}")
    # WMO: Y × 10^D = R + X × 2^E  (the decimal scale divides R too)
    return (pack["R"] + x * (2.0 ** pack["E"])) * (10.0 ** -pack["D"])


def _unpack_simple(data: bytes, pack: dict) -> np.ndarray:
    n, nbits = pack["n"], pack["nbits"]
    if nbits == 0:
        x = np.zeros(n)
    else:
        bits = np.unpackbits(np.frombuffer(data, np.uint8))
        need = n * nbits
        bits = bits[:need].reshape(n, nbits).astype(np.int64)
        x = (bits * (1 << np.arange(nbits - 1, -1, -1))).sum(axis=1)
    # WMO: Y × 10^D = R + X × 2^E  (the decimal scale divides R too)
    return (pack["R"] + x * (2.0 ** pack["E"])) * (10.0 ** -pack["D"])


def proj_projjson(msg: dict) -> dict:
    """ProjectedCRS PROJJSON document for a projected-grid message, so
    the grid's CRS flows into the engine's CRS stack (crs_input
    dispatch → the same closed forms that built the grid, GeoParquet
    spec footers, warps)."""
    pr = msg.get("proj")
    if pr is None:
        raise ValueError("message is not on a projected grid")
    if pr["invf"]:
        ellipsoid = {"name": "GRIB ellipsoid",
                     "semi_major_axis": pr["a"],
                     "inverse_flattening": pr["invf"]}
    else:
        ellipsoid = {"name": "GRIB sphere", "radius": pr["a"]}
    if pr["method"] == "lambert_conformal_conic":
        method = "Lambert Conic Conformal (2SP)"
        params = [("Latitude of false origin", pr["lad"]),
                  ("Longitude of false origin", pr["lov"]),
                  ("Latitude of 1st standard parallel", pr["lat1"]),
                  ("Latitude of 2nd standard parallel", pr["lat2"])]
    elif pr["method"] == "polar_stereographic":
        method = "Polar Stereographic (variant B)"
        params = [("Latitude of standard parallel", pr["lad"]),
                  ("Longitude of origin", pr["lov"])]
    else:
        method = "Mercator (variant B)"
        params = [("Latitude of 1st standard parallel", pr["lad"]),
                  ("Longitude of natural origin", 0.0)]
    return {
        "type": "ProjectedCRS",
        "name": f"GRIB {pr['method']}",
        "base_crs": {
            "name": "GRIB geographic",
            "datum": {"type": "GeodeticReferenceFrame",
                      "name": "GRIB earth", "ellipsoid": ellipsoid},
        },
        "conversion": {
            "name": pr["method"],
            "method": {"name": method},
            "parameters": [
                {"name": n, "value": v, "unit": "degree"}
                for n, v in params
            ] + [{"name": "False easting", "value": 0.0, "unit": "metre"},
                 {"name": "False northing", "value": 0.0,
                  "unit": "metre"}],
        },
    }


def read(spark: SparkSession, path: str) -> DataFrame:
    """→ long-form cell table; one column per message, suffixed with the
    level when a (name, level_type) repeats across messages."""
    msgs = read_raw(path)
    g0 = msgs[0]
    for m in msgs[1:]:
        if (m["values"].shape != g0["values"].shape
                or not np.allclose(m["lats"], g0["lats"])
                or not np.allclose(m["lons"], g0["lons"])):
            raise ValueError("GRIB messages on different grids in one "
                             "file — load them separately")
    lons, lats = g0["lons"], g0["lats"]
    ni, nj = len(lons), len(lats)
    cell = np.arange(ni * nj, dtype=np.int64)
    ii = cell % ni
    jj = cell // ni
    pdf = pd.DataFrame({
        "cell_id": cell, "i": ii, "j": jj,
        "x": lons[ii], "y": lats[jj]})
    if "proj" in g0:
        # projected grid: x/y are projection metres; add geographic cols
        pdf["lon"] = g0["proj"]["lon2d"][jj, ii]
        pdf["lat"] = g0["proj"]["lat2d"][jj, ii]
    names = [m["name"] for m in msgs]
    for m in msgs:
        col = m["name"]
        if names.count(col) > 1:
            col = f"{col}_l{m['level']:g}"
        pdf[col] = m["values"][jj, ii]
    return spark.createDataFrame(pdf)
