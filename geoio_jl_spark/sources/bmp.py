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