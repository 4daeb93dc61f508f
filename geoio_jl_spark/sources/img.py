"""PNG image source/sink — from-scratch codec on stdlib zlib (no PIL),
implementing the reference's image semantics (S8/K8, src/extra/img.jl):

pixels become a ``color`` (r,g,b[,a]) long table over a grid oriented by
``Translate(-nx, 0) ∘ Rotate(-π/2)`` (img.jl:22-23) — i.e. image
row-major (row, col) maps to grid (x, y) = (col, nrows-1-row), which here
is closed-form index arithmetic on (i, j).

Supports 8-bit RGB/RGBA/greyscale, all five PNG filters on read, filter 0
on write.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a, b, c):
    p = a.astype(np.int16) + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(buf: bytes) -> np.ndarray:
    """→ (h, w, ch) uint8, or uint16 for 16-bit-depth images (GRIB2
    template 5.41 packs 9-16-bit fields as 16-bit grayscale PNG).
    PNG filters operate on BYTES with the `left` neighbor one PIXEL
    (bpp bytes) back, so the same defilter loops serve both depths."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG file")
    pos, idat, meta = 8, b"", None
    while pos < len(buf):
        ln, ctype = struct.unpack_from(">I4s", buf, pos)
        data = buf[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, _inter = struct.unpack(
                ">IIBBBBB", data)
            if depth not in (8, 16):
                raise ValueError("only 8/16-bit PNG supported")
            meta = (w, h, _CHANNELS[color], depth)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    w, h, ch, depth = meta
    bpp = ch * (depth // 8)
    raw = zlib.decompress(idat)
    stride = w * bpp
    img = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for row in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).copy()
        pos += 1 + stride
        prev = img[row - 1] if row else np.zeros(stride, np.uint8)
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ft == 2:  # Up
            line = (line + prev) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else np.uint8(0)
                ul = prev[i - bpp] if i >= bpp else np.uint8(0)
                line[i] = (int(line[i]) + int(_paeth(
                    np.array(left), np.array(prev[i]), np.array(ul)))) & 0xFF
        img[row] = line
    if depth == 16:
        return img.view(">u2").astype(np.uint16).reshape(h, w, ch)
    return img.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 input → 8-bit PNG; uint16 input → 16-bit (big-endian)."""
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if arr.dtype == np.uint16:
        depth = 16
        raw = b"".join(b"\x00" + arr[r].astype(">u2").tobytes()
                       for r in range(h))
    else:
        depth = 8
        raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + ctype + data
        return c + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)

    out = _SIG
    out += chunk(b"IHDR",
                 struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0))
    out += chunk(b"IDAT", zlib.compress(raw))
    out += chunk(b"IEND", b"")
    return out


def read(spark: SparkSession, path: str) -> DataFrame:
    """→ (cell_id, i, j, x, y, r, g, b[, a]) with the reference's
    translate+rotate orientation (img.jl:22-23). Dispatches on magic:
    PNG, JPEG (baseline/progressive), GIF, or BMP (reference IMGEXTS,
    GeoIO.jl:66 — GeoIO routes every raster image through ImageIO)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"\xff\xd8":
        from geoio_jl_spark.sources import jpeg
        arr = jpeg.decode(buf)
    elif buf[:4] == b"GIF8":
        from geoio_jl_spark.sources import gif
        arr = gif.decode(buf)
    elif buf[:2] == b"BM":
        from geoio_jl_spark.sources import bmp
        arr = bmp.decode(buf)
    elif buf[:4] == b"\x00\x00\x01\x00":
        from geoio_jl_spark.sources import bmp
        arr = bmp.decode_ico(buf)
    else:
        arr = decode_png(buf)
    h, w, ch = arr.shape
    cell = np.arange(w * h, dtype=np.int64)
    col = cell % w
    row = cell // w
    pdf = pd.DataFrame({
        "cell_id": cell, "i": col.astype(np.int64), "j": row.astype(np.int64),
        # grid coords: x = col, y = nrows-1-row (rotate -pi/2 + translate)
        "x": col.astype(np.float64), "y": (h - 1 - row).astype(np.float64),
    })
    names = ["r", "g", "b", "a"][:ch] if ch != 1 else ["gray"]
    for c, nm in enumerate(names):
        pdf[nm] = arr[row, col, c].astype(np.int64)
    return spark.createDataFrame(pdf)


def write(df: DataFrame, path: str,
          channels: tuple[str, ...] = ("r", "g", "b"),
          quality: int = 90) -> None:
    pdf = df.toPandas()
    w = int(pdf["i"].max()) + 1
    h = int(pdf["j"].max()) + 1
    if len(pdf) != w * h:
        raise ValueError("image write requires a complete image grid")
    arr = np.zeros((h, w, len(channels)), dtype=np.uint8)
    jj = pdf["j"].to_numpy()
    ii = pdf["i"].to_numpy()
    for c, nm in enumerate(channels):
        arr[jj, ii, c] = pdf[nm].to_numpy().astype(np.uint8)
    ext = path.rsplit(".", 1)[-1].lower()
    with open(path, "wb") as f:
        if ext in ("jpg", "jpeg"):
            from geoio_jl_spark.sources import jpeg
            f.write(jpeg.encode(arr, quality=quality))
        else:
            f.write(encode_png(arr))
