"""GIF codec — from scratch on the public GIF87a/GIF89a specification
(CompuServe, 1990-07-31) and the LZW variable-code-width scheme it
mandates.  No PIL/imageio in this container, so decode AND encode are
hand-rolled, like the repo's PNG/JPEG/J2K codecs.

Reference parity note: GeoIO.jl reaches GIF via the ImageIO.jl stack
(src/extra/img.jl:5-26 routes any raster image through FileIO); this
module plays that role for the multimodal pipeline
(operators/multimodal.py dispatches on the ``GIF8`` magic).

Decode supports: global/local color tables, interlacing (the 4-pass row
permutation), GIF89a graphic-control extensions (transparency + disposal
methods 0/1 "keep", 2 "restore to background", 3 "restore to previous"),
animation (multiple image descriptors), deferred-clear LZW streams.
Encode emits real LZW (variable widths 3..12, clear-code resets), an
optional NETSCAPE2.0 loop block, per-frame GCE, and optional interlace —
enough to build differential fixtures that exercise every decode path.

Frames composite onto an RGB canvas exactly as a browser would; the
per-frame output is the *composited* canvas (what a viewer shows), not
the raw sub-rectangle.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------------------
# LZW (GIF flavor: LSB-first bit packing, variable 3..12-bit codes)
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """Concatenated image sub-block bytes -> uint8 index array.

    Implements deferred clear: when the table is full (4096) and the
    stream does not send a clear code, code width stays at 12 and only
    existing entries may appear (spec appendix F note)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # table: list of byte strings; first 2**min_code_size are roots
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    acc = 0          # bit accumulator, LSB-first
    nbits = 0
    pos = 0
    prev: bytes | None = None
    data_len = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= data_len:
                # truncated stream: tolerate, zero-pad to full size
                out += b"\x00" * (n_pixels - len(out))
                return np.frombuffer(bytes(out[:n_pixels]), np.uint8)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):          # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return np.frombuffer(bytes(out[:n_pixels]), np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 index array -> GIF LZW byte stream (without sub-blocking)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    prev = b""
    for b in indices.tobytes():
        cur = prev + bytes((b,))
        if cur in table:
            prev = cur
            continue
        emit(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:               # table full: reset
            emit(clear, width)
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes((b,))
    if prev:
        emit(table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(payload: bytes) -> bytes:
    """Split a byte stream into <=255-byte GIF data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(buf):
            raise ValueError("GIF: truncated sub-block chain")
        n = buf[pos]
        pos += 1
        if n == 0:
            break
        parts.append(buf[pos:pos + n])
        pos += n
    return b"".join(parts), pos


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Undo the GIF 4-pass interlace row permutation."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        n = len(range(start, h, step))
        out[start::step] = rows[src:src + n]
        src += n
    return out


def decode_frames(buf: bytes) -> list[tuple[np.ndarray, int]]:
    """GIF bytes -> [(composited RGB frame (h, w, 3) uint8, delay_cs)].

    Frames are full-canvas composites following GIF89a disposal
    semantics, i.e. what a viewer displays at each step."""
    if buf[:4] != b"GIF8" or buf[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF file")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    global_pal = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = np.frombuffer(
            buf, np.uint8, count=3 * n, offset=pos).reshape(n, 3).copy()
        pos += 3 * n
    if global_pal is not None and bg_idx < len(global_pal):
        canvas = np.tile(global_pal[bg_idx], (h, w, 1)).astype(np.uint8)
        bg_rgb = global_pal[bg_idx]
    else:
        canvas = np.zeros((h, w, 3), np.uint8)
        bg_rgb = np.zeros(3, np.uint8)
    frames: list[tuple[np.ndarray, int]] = []
    # pending graphic-control state for the NEXT image descriptor
    transparent: int | None = None
    disposal = 0
    delay_cs = 0
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:                                   # trailer
            break
        if block == 0x21:                                   # extension
            label = buf[pos]
            pos += 1
            data, pos = _read_subblocks(buf, pos)
            if label == 0xF9 and len(data) >= 4:            # GCE
                gp, delay_cs, tidx = struct.unpack_from("<BHB", data, 0)
                disposal = (gp >> 2) & 0x07
                transparent = tidx if (gp & 0x01) else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", buf, pos)
        pos += 9
        pal = global_pal
        if fpacked & 0x80:                                  # local table
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(
                buf, np.uint8, count=3 * n, offset=pos).reshape(n, 3).copy()
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: image has no color table")
        min_code = buf[pos]
        pos += 1
        data, pos = _read_subblocks(buf, pos)
        idx = _lzw_decode(data, min_code, fw * fh).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        saved = canvas.copy() if disposal == 3 else None
        rect = canvas[top:top + fh, left:left + fw]
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            rect[:] = np.where(mask, rgb, rect)
        else:
            rect[:] = rgb
        frames.append((canvas.copy(), delay_cs))
        if disposal == 2:                                   # restore to bg
            canvas[top:top + fh, left:left + fw] = bg_rgb
        elif disposal == 3 and saved is not None:           # restore prev
            canvas = saved
        transparent, disposal, delay_cs = None, 0, 0
    return frames


def decode(buf: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 (the still-image view)."""
    frames = decode_frames(buf)
    if not frames:
        raise ValueError("GIF: no image data")
    return frames[0][0]


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode(frames: list[np.ndarray], palette: np.ndarray,
           delays_cs: list[int] | None = None,
           transparent: int | None = None,
           disposal: int = 1, loop: bool = True,
           interlace: bool = False,
           offsets: list[tuple[int, int]] | None = None,
           canvas_size: tuple[int, int] | None = None) -> bytes:
    """Palette-indexed frames -> GIF89a bytes.

    ``frames``: list of (h, w) uint8 index arrays (may be sub-rectangles
    when ``offsets``/``canvas_size`` are given).  ``palette``: (n, 3)
    uint8, n <= 256.  Real LZW compression, optional interlace, GCE per
    frame when animated/transparent."""
    palette = np.asarray(palette, np.uint8)
    n_col = len(palette)
    pal_bits = max(1, int(np.ceil(np.log2(max(2, n_col)))))
    pal_size = 1 << pal_bits
    if canvas_size is None:
        ch, cw = frames[0].shape
    else:
        ch, cw = canvas_size
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", cw, ch, 0x80 | (pal_bits - 1), 0, 0)
    out += palette.tobytes() + b"\x00\x00\x00" * (pal_size - n_col)
    animated = len(frames) > 1
    if animated and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _subblocks(b"\x01\x00\x00")
    for i, frame in enumerate(frames):
        frame = np.asarray(frame, np.uint8)
        if animated or transparent is not None:
            gp = (disposal & 0x07) << 2
            if transparent is not None:
                gp |= 0x01
            delay = (delays_cs[i] if delays_cs else 4)
            out += b"\x21\xf9" + _subblocks(struct.pack(
                "<BHB", gp, delay, transparent or 0))
        top, left = offsets[i] if offsets else (0, 0)
        fh, fw = frame.shape
        fpacked = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, fpacked)
        rows = frame
        if interlace:
            rows = np.concatenate(
                [frame[s::st] for s, st in _INTERLACE_PASSES], axis=0)
        min_code = max(2, pal_bits)
        out.append(min_code)
        out += _subblocks(_lzw_encode(rows.reshape(-1), min_code))
    out += b"\x3b"
    return bytes(out)


def probe(buf: bytes) -> dict:
    """Structural metadata without any LZW decode: {width, height,
    n_frames} — the sub-block walk reads only length bytes, so cost is
    O(blocks), not O(pixels)."""
    if buf[:4] != b"GIF8" or buf[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF file")
    w, h, packed = struct.unpack_from("<HHB", buf, 6)
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    while pos < len(buf):
        block = buf[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1                                     # label
            pos = _skip_subblocks(buf, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        fpacked = buf[pos + 8]
        pos += 9
        if fpacked & 0x80:
            pos += 3 * (2 << (fpacked & 0x07))
        pos += 1                                         # LZW min code
        pos = _skip_subblocks(buf, pos)
        n_frames += 1
    return {"width": w, "height": h, "n_frames": n_frames}


def _skip_subblocks(buf: bytes, pos: int) -> int:
    while True:
        if pos >= len(buf):
            raise ValueError("GIF: truncated sub-block chain")
        n = buf[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n
