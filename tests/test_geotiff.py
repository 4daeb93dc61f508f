"""GeoTIFF codec round trips (reference test/io/geotiff.jl model)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geoio_jl_spark.operators.raster import GridSpec, grid_cells
from geoio_jl_spark.sources import geotiff as GT
from geoio_jl_spark.sources.geotiff import read_overviews as geotiff_read_overviews


def _grid(spark, spec):
    g = grid_cells(spark, spec)
    return g.withColumn("channel_1", (F.col("cell_id") % 97).cast("double")) \
            .withColumn("channel_2", (F.col("cell_id") % 13).cast("double"))


def test_roundtrip_axis_aligned(spark, tmp_path):
    spec = GridSpec(nx=8, ny=5, A=((0.5, 0.0), (0.0, -0.25)), b=(10.0, 52.0))
    df = _grid(spark, spec)
    path = str(tmp_path / "a.tif")
    GT.write(df, path, epsg=4326)
    back = GT.read(spark, path)
    assert back.count() == 40
    o = {(r["i"], r["j"]): r for r in df.collect()}
    b = {(r["i"], r["j"]): r for r in back.collect()}
    for k in o:
        assert b[k]["channel_1"] == o[k]["channel_1"]
        assert b[k]["channel_2"] == o[k]["channel_2"]
        assert abs(b[k]["x"] - o[k]["x"]) < 1e-9
        assert abs(b[k]["y"] - o[k]["y"]) < 1e-9


def test_roundtrip_rotated_affine(spark, tmp_path):
    # non-axis-aligned affine -> ModelTransformation path (geotiff.jl:128-148)
    spec = GridSpec(nx=4, ny=4, A=((0.5, 0.1), (0.2, -0.25)), b=(100.0, 200.0))
    df = _grid(spark, spec)
    path = str(tmp_path / "r.tif")
    GT.write(df, path, epsg=32633)
    arr, A, b, epsg = GT.read_raw(path)
    assert epsg == "EPSG:32633"
    np.testing.assert_allclose(A, [[0.5, 0.1], [0.2, -0.25]])
    np.testing.assert_allclose(b, [100.0, 200.0])
    back = GT.read(spark, path)
    bb = {(r["i"], r["j"]): r for r in back.collect()}
    oo = {(r["i"], r["j"]): r for r in df.collect()}
    for k in oo:
        assert abs(bb[k]["x"] - oo[k]["x"]) < 1e-9


def test_epsg_geokey(spark, tmp_path):
    df = _grid(spark, GridSpec(nx=2, ny=2))
    path = str(tmp_path / "e.tif")
    GT.write(df, path, epsg=4326)
    _arr, _A, _b, epsg = GT.read_raw(path)
    assert epsg == "EPSG:4326"


def test_incomplete_grid_rejected(spark, tmp_path):
    df = _grid(spark, GridSpec(nx=3, ny=3)).filter("cell_id != 4")
    with pytest.raises(ValueError, match="complete 2D grid"):
        GT.write(df, str(tmp_path / "bad.tif"))


def test_tiff_lzw_decode_against_independent_encoder():
    """TIFF LZW (compression 5): the decoder is checked against an
    independent in-test encoder written straight from the published
    TIFF §13 algorithm (MSB-first packing, ClearCode 256, EOI 257,
    early code-width change) — incl. the KwKwK corner case."""
    import numpy as np

    from geoio_jl_spark.sources.geotiff import _unlzw

    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        width = 9
        out = bytearray()
        acc = bits = 0

        def emit(code):
            nonlocal acc, bits
            acc = (acc << width) | code
            bits += width
            while bits >= 8:
                out.append((acc >> (bits - 8)) & 0xFF)
                bits -= 8

        emit(256)  # ClearCode first, per spec
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table:
                w = wc
                continue
            emit(table[w])
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1  # early change: encoder bumps at 510/1022/2046
            w = bytes([ch])
        if w:
            emit(table[w])
        emit(257)  # EOI
        if bits:
            out.append((acc << (8 - bits)) & 0xFF)
        return bytes(out)

    rng = np.random.default_rng(13)
    cases = [
        b"TOBEORNOTTOBEORTOBEORNOT",            # classic vector
        b"aaaaaaaaaaaaaaaaaaaa",                 # KwKwK chains
        bytes(rng.integers(0, 4, 5000).astype(np.uint8)),  # grows table
        bytes(rng.integers(0, 256, 3000).astype(np.uint8)),
    ]
    for data in cases:
        assert _unlzw(lzw_encode(data)) == data


def test_tiled_cog_roundtrip(spark, tmp_path):
    """tiled=N write (Deflate tiles, the COG layout) round-trips through
    the tile-aware reader, including partial edge tiles."""
    import os

    import numpy as np

    from geoio_jl_spark.sources import geotiff

    h, w = 37, 53  # deliberately not multiples of the tile size
    rng = np.random.default_rng(21)
    vals = rng.normal(size=(h, w)).astype(np.float32)
    cell = np.arange(h * w)
    import pandas as pd
    pdf = pd.DataFrame({
        "cell_id": cell, "i": cell % w, "j": cell // w,
        "x": (cell % w) * 0.5 - 10.0, "y": 20.0 - (cell // w) * 0.5,
        "channel_1": vals.reshape(-1)})
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "tiled.tif")
    geotiff.write(df, path, tiled=16)
    arr, A, b, epsg = geotiff.read_raw(path)
    assert arr.shape == (h, w, 1)
    np.testing.assert_allclose(arr[:, :, 0], vals, rtol=1e-6)
    assert abs(A[0][0] - 0.5) < 1e-9 and abs(b[0] + 10.0) < 1e-9
    # and the strip writer still round-trips the same frame
    path2 = str(tmp_path / "strips.tif")
    geotiff.write(df, path2)
    arr2, _, _, _ = geotiff.read_raw(path2)
    np.testing.assert_allclose(arr2[:, :, 0], vals, rtol=1e-6)


# ---------------------------------------------------------------------------
# Compression 7 (new-style JPEG, aerial-imagery COGs) — tiles encoded
# with the engine's own baseline encoder; placement is exact, values
# within JPEG quantization tolerance (constant tiles).


def _strip_tables(stream: bytes):
    """Split a full JPEG stream into (tables, abbreviated stream):
    DQT/DHT segments move to an SOI+tables+EOI stream (the JPEGTables
    tag form), the rest keeps frame+scan."""
    import struct as _s
    i = 2
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    while i < len(stream):
        assert stream[i] == 0xFF
        m = stream[i + 1]
        if m == 0xD9:
            break
        if m == 0xDA:
            rest += stream[i:]
            break
        ln = _s.unpack_from(">H", stream, i + 2)[0]
        seg = stream[i:i + 2 + ln]
        if m in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
        i += 2 + ln
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def _make_jpeg_tiff(tiles, tw, th, w, h, shared_tables):
    """Little-endian tiled TIFF, compression 7; tiles: row-major list of
    (th, tw, 1) uint8 arrays."""
    import struct as _s

    from geoio_jl_spark.sources.jpeg import encode as encode_jpeg

    streams = [encode_jpeg(t, quality=95) for t in tiles]
    jtab = None
    if shared_tables:
        pairs = [_strip_tables(s) for s in streams]
        jtab = pairs[0][0]
        streams = [p[1] for p in pairs]

    header_guess = 8
    ntags = 10 + (1 if jtab else 0)
    ifd_off = header_guess
    data_off = ifd_off + 2 + 12 * ntags + 4
    extra = bytearray()
    offsets, counts = [], []
    pos = data_off
    # tile offset/count arrays (if >1 tile they live out-of-line)
    n = len(streams)
    arr_bytes = 4 * n if n > 1 else 0
    pos += 2 * arr_bytes + (len(jtab) if jtab else 0)
    for s in streams:
        offsets.append(pos)
        counts.append(len(s))
        pos += len(s)

    def entry(tag, typ, cnt, vals, inline_size):
        if inline_size <= 4:
            raw = b"".join(_s.pack("<" + {3: "H", 4: "I"}[typ], v)
                           for v in vals)
            raw = raw.ljust(4, b"\x00")
            return _s.pack("<HHI", tag, typ, cnt) + raw
        return None  # caller handles out-of-line

    out = bytearray()
    out += b"II*\x00" + _s.pack("<I", ifd_off)
    tags = [(256, 4, 1, [w]), (257, 4, 1, [h]), (258, 3, 1, [8]),
            (259, 3, 1, [7]), (262, 3, 1, [1]), (277, 3, 1, [1]),
            (322, 4, 1, [tw]), (323, 4, 1, [th])]
    out += _s.pack("<H", ntags)
    body_off = data_off
    blobs = bytearray()
    if n > 1:
        off_arr_pos = body_off + len(blobs)
        blobs += b"".join(_s.pack("<I", o) for o in offsets)
        cnt_arr_pos = body_off + len(blobs)
        blobs += b"".join(_s.pack("<I", c) for c in counts)
        tags.append((324, 4, n, None))
        tags.append((325, 4, n, None))
    else:
        tags.append((324, 4, 1, offsets))
        tags.append((325, 4, 1, counts))
    if jtab:
        jt_pos = body_off + len(blobs)
        blobs += jtab
        tags.append((347, 7, len(jtab), None))
    tags.sort(key=lambda t: t[0])
    for tag, typ, cnt, vals in tags:
        if vals is not None:
            out += entry(tag, typ, cnt, vals, 4)
        elif tag == 324:
            out += _s.pack("<HHII", 324, 4, n, off_arr_pos)
        elif tag == 325:
            out += _s.pack("<HHII", 325, 4, n, cnt_arr_pos)
        else:
            out += _s.pack("<HHII", 347, 7, len(jtab), jt_pos)
    out += _s.pack("<I", 0)
    assert len(out) == data_off
    out += blobs
    for s in streams:
        out += s
    return bytes(out)


@pytest.mark.parametrize("shared_tables", [False, True])
def test_jpeg_compression_tiled(tmp_path, shared_tables):
    tw = th = 16
    vals = [40, 90, 160, 220]
    tiles = [np.full((th, tw, 1), v, np.uint8) for v in vals]
    p = str(tmp_path / f"jpegtiff_{shared_tables}.tif")
    with open(p, "wb") as f:
        f.write(_make_jpeg_tiff(tiles, tw, th, 32, 32, shared_tables))
    arr, A, b, epsg = GT.read_raw(p)
    assert arr.shape == (32, 32, 1)
    got = [int(arr[8, 8, 0]), int(arr[8, 24, 0]),
           int(arr[24, 8, 0]), int(arr[24, 24, 0])]
    for g, v in zip(got, vals):
        assert abs(g - v) <= 3        # constant tiles: DC quantization only


def test_bigtiff_read(tmp_path):
    """BigTIFF (magic 43): 8-byte offsets, 20-byte entries, LONG8 tags."""
    import struct as _s

    h, w = 4, 5
    data = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    raw = data.tobytes()
    ntags = 8
    ifd_off = 16
    data_off = ifd_off + 8 + 20 * ntags + 8

    def entry(tag, typ, cnt, val):
        fmt = {3: "H", 4: "I", 16: "Q"}[typ]
        packed = _s.pack("<" + fmt, val).ljust(8, b"\x00")
        return _s.pack("<HHQ", tag, typ, cnt) + packed

    out = bytearray()
    out += b"II+\x00" + _s.pack("<HH", 8, 0) + _s.pack("<Q", ifd_off)
    out += _s.pack("<Q", ntags)
    for tag, typ, cnt, val in [
            (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8),
            (259, 3, 1, 1), (262, 3, 1, 1),
            (273, 16, 1, data_off),       # LONG8 strip offset
            (277, 3, 1, 1), (279, 16, 1, len(raw))]:
        out += entry(tag, typ, cnt, val)
    out += _s.pack("<Q", 0)
    assert len(out) == data_off
    out += raw
    p = str(tmp_path / "big.tif")
    with open(p, "wb") as f:
        f.write(bytes(out))
    arr, A, b, epsg = GT.read_raw(p)
    np.testing.assert_array_equal(arr[:, :, 0], data)


def test_cog_overview_levels(tmp_path):
    """Multi-IFD COG: read_overviews returns every level, scaling the
    full-resolution affine onto overview IFDs that carry no geo tags."""
    import struct as _s

    def ifd(entries, base):
        """Build one little-endian classic IFD + its out-of-line data."""
        out = bytearray()
        blob = bytearray()
        out += _s.pack("<H", len(entries))
        data_off = base + 2 + 12 * len(entries) + 4
        patched = []
        for tag, typ, cnt, val in entries:
            if isinstance(val, bytes):
                patched.append((tag, typ, cnt, data_off + len(blob)))
                blob += val
            else:
                patched.append((tag, typ, cnt, val))
        for tag, typ, cnt, val in sorted(patched):
            fmt = {3: "H", 4: "I", 12: "d"}[typ]
            if typ == 12 or cnt > 1:
                out += _s.pack("<HHII", tag, typ, cnt, val)
            else:
                out += _s.pack("<HHI", tag, typ, cnt) \
                    + _s.pack("<" + fmt, val).ljust(4, b"\x00")
        return out, blob, data_off

    full = np.arange(64, dtype=np.uint8).reshape(8, 8)
    ovr = full[::2, ::2].copy()

    # layout: header(8) | ifd0+data | ifd1+data
    pos = 8
    scale = _s.pack("<3d", 2.0, 3.0, 0.0)
    tie = _s.pack("<6d", 0, 0, 0, 100.0, 200.0, 0.0)
    e0 = [(256, 4, 1, 8), (257, 4, 1, 8), (258, 3, 1, 8), (259, 3, 1, 1),
          (262, 3, 1, 1), (273, 4, 1, None), (277, 3, 1, 1),
          (279, 4, 1, 64), (33550, 12, 3, scale), (33922, 12, 6, tie)]
    # two passes to resolve strip offset after data layout
    body0, blob0, doff0 = ifd([(t, ty, c, v if v is not None else 0)
                               for t, ty, c, v in e0], pos)
    strip0 = doff0 + len(blob0)
    body0, blob0, _ = ifd([(t, ty, c, (strip0 if t == 273 else
                                       (v if v is not None else 0)))
                           for t, ty, c, v in e0], pos)
    ifd1_off = strip0 + 64
    e1 = [(256, 4, 1, 4), (257, 4, 1, 4), (258, 3, 1, 8), (259, 3, 1, 1),
          (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (279, 4, 1, 16)]
    body1, blob1, doff1 = ifd(e1, ifd1_off)
    strip1 = doff1 + len(blob1)
    e1 = [(t, ty, c, (strip1 if t == 273 else v)) for t, ty, c, v in e1]
    body1, blob1, _ = ifd(e1, ifd1_off)

    out = bytearray(b"II*\x00" + _s.pack("<I", 8))
    out += body0 + _s.pack("<I", ifd1_off) + blob0 + full.tobytes()
    assert len(out) == ifd1_off
    out += body1 + _s.pack("<I", 0) + blob1 + ovr.tobytes()

    p = str(tmp_path / "cog.tif")
    with open(p, "wb") as f:
        f.write(bytes(out))
    levels = geotiff_read_overviews(p)
    assert len(levels) == 2
    (a0, A0, b0, _), (a1, A1, b1, _) = levels
    np.testing.assert_array_equal(a0[:, :, 0], full)
    np.testing.assert_array_equal(a1[:, :, 0], ovr)
    assert A0 == ((2.0, 0.0), (0.0, -3.0)) and b0 == (100.0, 200.0)
    assert A1 == ((4.0, 0.0), (0.0, -6.0)) and b1 == (100.0, 200.0)


def test_ifd_chain_cycle_guard():
    """A malformed/adversarial next-IFD pointer that loops back must
    fail fast, not spin forever accumulating IFDs (VERDICT r6 item 6)."""
    import struct as _s
    # minimal little-endian classic TIFF: header -> IFD at 8 with one
    # entry and a next-IFD pointer back to itself
    ifd_off = 8
    buf = bytearray(b"II" + _s.pack("<H", 42) + _s.pack("<I", ifd_off))
    buf += _s.pack("<H", 1)                       # 1 entry
    buf += _s.pack("<HHI", 256, 3, 1) + _s.pack("<I", 4)   # ImageWidth=4
    buf += _s.pack("<I", ifd_off)                 # next IFD -> cycle
    with pytest.raises(ValueError, match="cycle"):
        GT._read_ifd_chain(bytes(buf))


def test_warc_tolerant_mode_bad_content_length():
    """sources/warc.py: a non-numeric Content-Length must keep the
    records parsed so far in tolerant mode and raise in strict mode
    (VERDICT r6 item 6)."""
    from geoio_jl_spark.sources import warc
    good = (b"WARC/1.0\r\n"
            b"WARC-Type: resource\r\n"
            b"WARC-Record-ID: <urn:uuid:1>\r\n"
            b"Content-Length: 2\r\n"
            b"\r\nok\r\n\r\n")
    bad = (b"WARC/1.0\r\n"
           b"WARC-Type: resource\r\n"
           b"WARC-Record-ID: <urn:uuid:2>\r\n"
           b"Content-Length: XYZ\r\n"
           b"\r\nzz\r\n\r\n")
    out = warc.parse_warc_bytes(good + bad, "f", strict=False)
    assert len(out) == 1 and out[0]["payload"] == b"ok"
    with pytest.raises(ValueError, match="non-numeric"):
        warc.parse_warc_bytes(good + bad, "f", strict=True)
