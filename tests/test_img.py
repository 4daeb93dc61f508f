"""PNG codec + image grid orientation (reference test/io/images.jl model)."""

import numpy as np
import zlib
import struct

import pytest

from geoio_jl_spark.sources import img as IMG


def test_png_roundtrip_rgb(spark, tmp_path):
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
    blob = IMG.encode_png(arr)
    back = IMG.decode_png(blob)
    np.testing.assert_array_equal(back, arr)


def test_png_filters_decode():
    # build a PNG with per-row filters 0..4 and check against a reference
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (5, 4, 3), dtype=np.uint8)

    def paeth_scalar(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    stride = 4 * 3
    raw = b""
    for r in range(5):
        ft = r % 5
        line = arr[r].reshape(-1).astype(np.int16)
        prev = arr[r - 1].reshape(-1).astype(np.int16) if r else np.zeros(stride, np.int16)
        enc = np.zeros(stride, np.int16)
        for i in range(stride):
            left = line[i - 3] if i >= 3 else 0
            ul = prev[i - 3] if i >= 3 else 0
            if ft == 0:
                enc[i] = line[i]
            elif ft == 1:
                enc[i] = line[i] - left
            elif ft == 2:
                enc[i] = line[i] - prev[i]
            elif ft == 3:
                enc[i] = line[i] - ((int(left) + int(prev[i])) >> 1)
            else:
                enc[i] = line[i] - paeth_scalar(int(left), int(prev[i]), int(ul))
        raw += bytes([ft]) + (enc & 0xFF).astype(np.uint8).tobytes()

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    blob = IMG._SIG
    blob += chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
    blob += chunk(b"IDAT", zlib.compress(raw))
    blob += chunk(b"IEND", b"")
    np.testing.assert_array_equal(IMG.decode_png(blob), arr)


def test_spark_image_table_orientation(spark, tmp_path):
    arr = np.zeros((3, 2, 3), dtype=np.uint8)
    arr[0, 0] = [255, 0, 0]  # top-left red
    arr[2, 1] = [0, 0, 255]  # bottom-right blue
    path = str(tmp_path / "t.png")
    with open(path, "wb") as f:
        f.write(IMG.encode_png(arr))
    df = IMG.read(spark, path)
    rows = {(r["i"], r["j"]): r for r in df.collect()}
    assert rows[(0, 0)]["r"] == 255
    assert rows[(0, 0)]["y"] == 2.0  # top row -> max y (rotate -pi/2 semantics)
    assert rows[(1, 2)]["b"] == 255
    assert rows[(1, 2)]["y"] == 0.0  # bottom row -> y = 0


def test_image_write_roundtrip(spark, tmp_path):
    arr = np.random.RandomState(3).randint(0, 256, (4, 6, 3), dtype=np.uint8)
    p1 = str(tmp_path / "a.png")
    with open(p1, "wb") as f:
        f.write(IMG.encode_png(arr))
    df = IMG.read(spark, p1)
    p2 = str(tmp_path / "b.png")
    IMG.write(df, p2)
    with open(p2, "rb") as f:
        back = IMG.decode_png(f.read())
    np.testing.assert_array_equal(back, arr)
