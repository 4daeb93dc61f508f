"""AVI (RIFF) container with MJPEG video — from scratch on the public
Microsoft RIFF/AVI 1.0 specification ("AVI RIFF File Reference", and the
OpenDML AVI extensions for the index semantics).

Motion-JPEG is intra-only: every ``00dc`` chunk is a standalone JPEG
image, so the engine's own from-scratch JPEG codec (sources/jpeg.py)
makes this a REAL video decode path — the honest ``NotImplementedError``
in operators/multimodal.py now applies only to inter-frame codecs
(H.264/VP9/AV1), which genuinely need libav.

Reference parity note: GeoIO.jl has no video axis (src/extra/img.jl stops
at still images); this module serves the brief's LLM-pipeline multimodal
axis (frame sampling for a Common-Crawl-adjacent corpus).

Scale note: ``probe``/``frame_chunks`` walk container structure only —
frame SAMPLING never entropy-decodes unsampled frames, so the Arrow-UDF
cost of ``sample_frames`` is O(sampled), not O(all frames).
"""

from __future__ import annotations

import struct

import numpy as np


def _fourcc(b: bytes) -> bytes:
    return b.ljust(4)[:4]


# ---------------------------------------------------------------------------
# encode (fixture builder + K-side sink primitive)
# ---------------------------------------------------------------------------

def encode_mjpeg(frames: list[np.ndarray], fps: int = 10,
                 quality: int = 90) -> bytes:
    """RGB/gray frames (h, w, 1|3) uint8 -> AVI/MJPEG bytes with a
    standard 'idx1' index (offsets relative to the 'movi' list start,
    per the AVI 1.0 spec)."""
    from geoio_jl_spark.sources import jpeg
    if not frames:
        raise ValueError("AVI: no frames")
    h, w = frames[0].shape[:2]
    blobs = [jpeg.encode(np.asarray(f, np.uint8), quality=quality)
             for f in frames]

    def chunk(cc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return _fourcc(cc) + struct.pack("<I", len(data)) + data + pad

    def lst(cc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", _fourcc(cc) + data)

    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(b) for b in blobs)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, max_bytes * fps, 0,
        0x10,                       # AVIF_HASINDEX
        len(blobs), 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    strh = (_fourcc(b"vids") + _fourcc(b"MJPG")
            + struct.pack("<IHHIIIIIIIIhhhh",
                          0, 0, 0, 0, 1, fps, 0, len(blobs),
                          max_bytes, 0xFFFFFFFF, 0, 0, 0, w, h))
    strf = struct.pack("<IiiHHIIiiII",
                       40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = b"".join(chunk(b"00dc", b) for b in blobs)
    movi = lst(b"movi", movi_chunks)
    # idx1: offsets are to the chunk fourcc, relative to 'movi' fourcc
    idx, off = bytearray(), 4
    for b in blobs:
        idx += (_fourcc(b"00dc") + struct.pack("<III", 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    body = _fourcc(b"AVI ") + hdrl + movi + chunk(b"idx1", bytes(idx))
    return _fourcc(b"RIFF") + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _walk(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a RIFF chunk run."""
    while pos + 8 <= end:
        cc = buf[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        yield cc, pos + 8, ln
        pos += 8 + ln + (ln % 2)


def probe(buf: bytes) -> dict:
    """Container metadata without decoding any frame: {width, height,
    fps, n_frames, codec}."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    meta = {"codec": None, "width": None, "height": None,
            "fps": None, "n_frames": 0}
    for cc, p, ln in _walk(buf, 12, len(buf)):
        if cc != b"LIST":
            continue
        kind = buf[p:p + 4]
        if kind == b"hdrl":
            for cc2, p2, ln2 in _walk(buf, p + 4, p + ln):
                if cc2 == b"avih":
                    v = struct.unpack_from("<IIIIIIIIII", buf, p2)
                    meta["fps"] = round(1_000_000 / v[0]) if v[0] else None
                    meta["n_frames"] = v[4]
                    meta["width"], meta["height"] = v[8], v[9]
                elif cc2 == b"LIST" and buf[p2:p2 + 4] == b"strl":
                    for cc3, p3, _l3 in _walk(buf, p2 + 4, p2 + ln2):
                        if cc3 == b"strh" and buf[p3:p3 + 4] == b"vids":
                            meta["codec"] = buf[p3 + 4:p3 + 8].decode(
                                "ascii", "replace")
    return meta


def frame_chunks(buf: bytes) -> list[tuple[int, int]]:
    """(offset, length) of every video frame payload ('[0-9][0-9]dc'),
    in stream order — pure structure walk, no entropy decode."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    out = []
    for cc, p, ln in _walk(buf, 12, len(buf)):
        if cc == b"LIST" and buf[p:p + 4] == b"movi":
            for cc2, p2, ln2 in _walk(buf, p + 4, p + ln):
                if cc2[2:4] == b"dc" and cc2[:2].isdigit():
                    out.append((p2, ln2))
    return out


def decode_frames(buf: bytes, every_k: int = 1) -> list[np.ndarray]:
    """Every k-th MJPEG frame fully decoded to (h, w, c) uint8 via the
    engine's own JPEG codec; unsampled frames are never decoded."""
    meta = probe(buf)
    if meta["codec"] not in ("MJPG", "mjpg"):
        raise NotImplementedError(
            f"AVI codec {meta['codec']!r}: only intra-only MJPEG decodes "
            "from scratch; inter-frame codecs (H.264/VP9) need libav, "
            "absent from this container")
    from geoio_jl_spark.sources import jpeg
    out = []
    for i, (off, ln) in enumerate(frame_chunks(buf)):
        if i % every_k:
            continue
        a = jpeg.decode(buf[off:off + ln])
        out.append(a if a.ndim == 3 else a[:, :, None])
    return out
