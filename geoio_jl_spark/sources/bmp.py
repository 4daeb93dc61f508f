"""BMP (Windows DIB) codec — from scratch on the public BITMAPFILEHEADER
/ BITMAPINFOHEADER layout: uncompressed (BI_RGB) 8-bit paletted, 24-bit
BGR, and 32-bit BGRA, bottom-up or top-down rows, 4-byte row padding.

BMP still appears in web crawls (old sites, favicons, screenshots);
this closes it for the multimodal pipeline the same way sources/gif.py
closed GIF.  RLE4/RLE8 compression raises a named error (rare on the
web; add on demand)."""

from __future__ import annotations

import struct

import numpy as np


def decode(buf: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3|4) uint8 RGB(A)."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} unsupported (OS/2)")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    comp = struct.unpack_from("<I", buf, 30)[0]
    clr_used = struct.unpack_from("<I", buf, 46)[0]
    if comp not in (0, 3):      # BI_RGB / BI_BITFIELDS (default masks)
        raise ValueError(f"BMP compression {comp} unsupported (RLE)")
    top_down = h < 0
    h = abs(h)
    if bpp == 8:
        n_pal = clr_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(buf, np.uint8, count=4 * n_pal,
                            offset=pal_off).reshape(n_pal, 4)
        stride = (w + 3) & ~3
        raw = np.frombuffer(buf, np.uint8, count=stride * h,
                            offset=data_off).reshape(h, stride)[:, :w]
        img = pal[raw][:, :, [2, 1, 0]]          # BGRX palette -> RGB
    elif bpp in (24, 32):
        ch = bpp // 8
        stride = (w * ch + 3) & ~3
        raw = np.frombuffer(buf, np.uint8, count=stride * h,
                            offset=data_off).reshape(h, stride)
        px = raw[:, : w * ch].reshape(h, w, ch)
        img = px[:, :, [2, 1, 0]] if ch == 3 else px[:, :, [2, 1, 0, 3]]
    else:
        raise ValueError(f"BMP bit depth {bpp} unsupported")
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode(arr: np.ndarray) -> bytes:
    """(h, w, 1|3|4) uint8 -> 24/32-bit BI_RGB BMP (bottom-up)."""
    a = np.asarray(arr, np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch == 1:
        a = np.repeat(a, 3, axis=2)
        ch = 3
    if ch == 3:
        bgr = a[:, :, [2, 1, 0]]
    elif ch == 4:
        bgr = a[:, :, [2, 1, 0, 3]]
    else:
        raise ValueError(f"cannot encode {ch}-channel BMP")
    stride = (w * ch + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * ch] = bgr.reshape(h, w * ch)
    body = rows[::-1].tobytes()                 # bottom-up
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, ch * 8, 0,
                       len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + info + body

# ---------------------------------------------------------------------------
# ICO (favicon) — icon directory wrapping PNG or DIB entries; decode
# reuses this module's DIB path and sources/img.decode_png.  Web crawls
# meet favicons constantly, so the multimodal dispatch covers them.
# ---------------------------------------------------------------------------

def decode_ico(buf: bytes, entry: int | None = None) -> "np.ndarray":
    """ICO bytes -> (h, w, c) uint8 of the chosen entry (default: the
    largest image).  PNG-compressed entries route to the engine's PNG
    decoder; DIB entries reuse the BMP pixel path (height is doubled in
    the header for the AND mask, which 32-bit entries ignore)."""
    if len(buf) < 6 or buf[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO file")
    n = struct.unpack_from("<H", buf, 4)[0]
    if n == 0:
        raise ValueError("ICO: no images")
    entries = []
    for i in range(n):
        w, h, _ncol, _r, _planes, _bpp, size, off = struct.unpack_from(
            "<BBBBHHII", buf, 6 + 16 * i)
        entries.append((w or 256, h or 256, size, off))
    idx = (entry if entry is not None
           else max(range(n), key=lambda i: entries[i][0] * entries[i][1]))
    w, h, size, off = entries[idx]
    data = buf[off: off + size]
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from geoio_jl_spark.sources.img import decode_png
        a = decode_png(data)
        return a if a.ndim == 3 else a[:, :, None]
    # DIB entry: BITMAPINFOHEADER with doubled height; build a BMP in
    # memory and reuse decode()
    hdr_size = struct.unpack_from("<I", data, 0)[0]
    if hdr_size < 40:
        raise ValueError("ICO: unsupported DIB header")
    dib = bytearray(data)
    real_h = struct.unpack_from("<i", dib, 8)[0] // 2
    struct.pack_into("<i", dib, 8, real_h)
    bpp = struct.unpack_from("<H", dib, 14)[0]
    if bpp not in (8, 24, 32):
        raise ValueError(f"ICO: DIB bit depth {bpp} unsupported")
    clr_used = struct.unpack_from("<I", dib, 32)[0]
    n_pal = (clr_used or 256) if bpp == 8 else 0
    data_off = 14 + hdr_size + 4 * n_pal
    fake = (b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0, data_off)
            + bytes(dib))
    img = decode(fake)
    return img[:real_h] if img.shape[0] > real_h else img
