"""BMP codec tests: round-trips through our own encoder, hand-built
paletted/top-down fixtures, and the multimodal dispatch."""

import struct

import numpy as np
import pytest

from geoio_jl_spark.sources import bmp


def test_rgb24_roundtrip_exact():
    rng = np.random.default_rng(41)
    arr = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)  # odd stride
    np.testing.assert_array_equal(bmp.decode(bmp.encode(arr)), arr)


def test_rgba32_roundtrip_exact():
    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, (6, 5, 4), dtype=np.uint8)
    np.testing.assert_array_equal(bmp.decode(bmp.encode(arr)), arr)


def test_gray_encodes_as_rgb():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = bmp.decode(bmp.encode(g))
    np.testing.assert_array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_paletted_8bit_hand_built():
    """2x3 8-bit BMP with a 4-color palette, built byte-by-byte."""
    pal = [(10, 20, 30, 0), (200, 100, 50, 0),
           (0, 0, 255, 0), (255, 255, 255, 0)]     # BGRX entries
    idx = [[0, 1, 2], [3, 2, 1]]                   # (h=2, w=3)
    stride = 4                                     # w=3 padded to 4
    body = b""
    for row in idx[::-1]:                          # bottom-up
        body += bytes(row) + b"\x00" * (stride - 3)
    info = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 8, 0,
                       len(body), 0, 0, 4, 0)
    paldata = b"".join(bytes(e) for e in pal)
    off = 14 + 40 + len(paldata)
    buf = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
           + info + paldata + body)
    out = bmp.decode(buf)
    exp = np.array([[pal[c][:3][::-1] for c in row] for row in idx],
                   np.uint8)                       # BGR -> RGB
    np.testing.assert_array_equal(out, exp)


def test_top_down_negative_height():
    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = bytearray(bmp.encode(arr))
    # flip to top-down: negate height, reverse the stored row order
    h = struct.unpack_from("<i", buf, 22)[0]
    struct.pack_into("<i", buf, 22, -h)
    off = struct.unpack_from("<I", buf, 10)[0]
    stride = (3 * 3 + 3) & ~3
    rows = [bytes(buf[off + i * stride: off + (i + 1) * stride])
            for i in range(h)]
    buf[off:] = b"".join(rows[::-1])
    np.testing.assert_array_equal(bmp.decode(bytes(buf)), arr)


def test_rejects_rle_and_non_bmp():
    arr = np.zeros((2, 2, 3), np.uint8)
    buf = bytearray(bmp.encode(arr))
    struct.pack_into("<I", buf, 30, 1)             # BI_RLE8
    with pytest.raises(ValueError, match="RLE"):
        bmp.decode(bytes(buf))
    with pytest.raises(ValueError, match="not a BMP"):
        bmp.decode(b"PNG?nope")


def test_multimodal_dispatch(spark):
    from geoio_jl_spark.operators import multimodal as M
    rng = np.random.default_rng(43)
    arr = rng.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(bmp.encode(arr)))],
                               ["id", "image"])
    meta = M.decode_images(df).collect()[0]["meta"]
    assert meta["ok"] and (meta["width"], meta["height"]) == (14, 10)
    feats = M.image_features(df).collect()[0]["features"]
    np.testing.assert_allclose(
        feats[:3], arr.reshape(-1, 3).mean(axis=0), rtol=1e-6)

def _ico_wrap(entries):
    """Independent ICO writer for tests: [(w, h, payload_bytes)]."""
    hdr = b"\x00\x00\x01\x00" + struct.pack("<H", len(entries))
    dirs, blobs = b"", b""
    off = 6 + 16 * len(entries)
    for w, h, data in entries:
        dirs += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32,
                            len(data), off)
        blobs += data
        off += len(data)
    return hdr + dirs + blobs


def test_ico_png_entry():
    from geoio_jl_spark.sources.bmp import decode_ico
    from geoio_jl_spark.sources.img import encode_png
    rng = np.random.default_rng(71)
    arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    ico = _ico_wrap([(16, 16, encode_png(arr))])
    np.testing.assert_array_equal(decode_ico(ico), arr)


def test_ico_dib_entry_with_and_mask():
    from geoio_jl_spark.sources.bmp import decode_ico
    rng = np.random.default_rng(72)
    arr = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    # hand-build the DIB: BITMAPINFOHEADER with doubled height, XOR
    # pixels bottom-up BGRA, then an all-zero 1-bit AND mask
    bgra = arr[:, :, [2, 1, 0, 3]][::-1].tobytes()
    and_mask = b"\x00" * (8 * 4)               # 8 rows x 4-byte stride
    info = struct.pack("<IiiHHIIiiII", 40, 8, 16, 1, 32, 0,
                       len(bgra), 0, 0, 0, 0)
    ico = _ico_wrap([(8, 8, info + bgra + and_mask)])
    np.testing.assert_array_equal(decode_ico(ico), arr)


def test_ico_picks_largest_entry():
    from geoio_jl_spark.sources.bmp import decode_ico
    from geoio_jl_spark.sources.img import encode_png
    rng = np.random.default_rng(73)
    small = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (12, 12, 3), dtype=np.uint8)
    ico = _ico_wrap([(4, 4, encode_png(small)), (12, 12, encode_png(big))])
    np.testing.assert_array_equal(decode_ico(ico), big)
    np.testing.assert_array_equal(decode_ico(ico, entry=0), small)


def test_ico_through_multimodal(spark):
    from geoio_jl_spark.operators import multimodal as M
    from geoio_jl_spark.sources.img import encode_png
    rng = np.random.default_rng(74)
    arr = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
    ico = _ico_wrap([(10, 10, encode_png(arr))])
    df = spark.createDataFrame([(1, bytearray(ico))], ["id", "image"])
    meta = M.decode_images(df).collect()[0]["meta"]
    assert meta["ok"] and (meta["width"], meta["height"]) == (10, 10)
