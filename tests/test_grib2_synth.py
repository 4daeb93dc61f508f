"""Synthetic GRIB2 messages built byte-by-byte (no eccodes), covering
decode paths the lone reference fixture (regular_gg_ml.grib, Gaussian,
-j scan) cannot reach: template 3.0 with +j scan (lat/row pairing),
sign-magnitude level scale factors, and multi-message grid mismatch.
Reference role: src/extra/cdm.jl _gribdataset (delegates to eccodes)."""

import struct

import numpy as np
import pytest

from geoio_jl_spark.sources import grib2


def _sm_enc(v: int, bits: int) -> int:
    """Encode GRIB sign-magnitude (inverse of grib2._sm)."""
    return (1 << (bits - 1)) | -v if v < 0 else v


def make_message(values_2d, la1, la2, lo1, di, scan,
                 lvl_scale=0, lvl_val=2, discipline=0, cat=0, num=0):
    """One edition-2 message: template 3.0 grid, simple packing 8-bit,
    no bitmap. values_2d rows are in grid scan order (row 0 = first
    transmitted row, i.e. latitude la1)."""
    nj, ni = values_2d.shape

    s3 = bytearray(72)
    struct.pack_into(">I", s3, 0, 72)
    s3[4] = 3
    struct.pack_into(">H", s3, 12, 0)          # grid template 3.0
    struct.pack_into(">I", s3, 30, ni)
    struct.pack_into(">I", s3, 34, nj)
    struct.pack_into(">I", s3, 46, _sm_enc(int(la1 * 1e6), 32))
    struct.pack_into(">I", s3, 50, int(lo1 * 1e6))
    struct.pack_into(">I", s3, 55, _sm_enc(int(la2 * 1e6), 32))
    struct.pack_into(">I", s3, 59, int((lo1 + di * (ni - 1)) * 1e6))
    struct.pack_into(">I", s3, 63, int(di * 1e6))
    s3[71] = scan

    s4 = bytearray(28)
    struct.pack_into(">I", s4, 0, 28)
    s4[4] = 4
    s4[9] = cat
    s4[10] = num
    s4[22] = 103                               # level type
    s4[23] = lvl_scale
    struct.pack_into(">I", s4, 24, lvl_val)

    s5 = bytearray(21)
    struct.pack_into(">I", s5, 0, 21)
    s5[4] = 5
    struct.pack_into(">I", s5, 5, ni * nj)
    struct.pack_into(">H", s5, 9, 0)           # packing template 5.0
    struct.pack_into(">f", s5, 11, 0.0)        # R
    struct.pack_into(">H", s5, 15, 0)          # E
    struct.pack_into(">H", s5, 17, 0)          # D
    s5[19] = 8                                 # nbits

    s6 = bytearray(6)
    struct.pack_into(">I", s6, 0, 6)
    s6[4] = 6
    s6[5] = 255                                # no bitmap

    data = values_2d.astype(np.uint8).ravel().tobytes()
    s7 = bytearray(5) + data
    struct.pack_into(">I", s7, 0, len(s7))
    s7[4] = 7

    body = bytes(s3) + bytes(s4) + bytes(s5) + bytes(s6) + bytes(s7)
    total = 16 + len(body) + 4
    head = bytearray(16)
    head[0:4] = b"GRIB"
    head[6] = discipline
    head[7] = 2
    struct.pack_into(">Q", head, 8, total)
    return bytes(head) + body + b"7777"


def test_plus_j_scan_row_latitude_pairing(tmp_path):
    """Template 3.0 with +j scan (0x40): la1=-10 is the first
    transmitted row AND the first linspace latitude, so no flip —
    the lat=-10 row must return the lat=-10 values (ADVICE r2:
    the old unconditional flip paired every row with the wrong lat)."""
    vals = np.arange(3)[:, None] * 10 + np.zeros((3, 4)) + 100  # row j → 100+10j
    p = str(tmp_path / "pj.grib")
    with open(p, "wb") as f:
        f.write(make_message(vals, la1=-10, la2=10, lo1=0, di=1, scan=0x40))
    m = grib2.read_raw(p)[0]
    assert m["lats"][0] == pytest.approx(-10) and m["lats"][-1] == pytest.approx(10)
    # row paired with lat -10 must be the first transmitted row (100s)
    assert m["values"][0, 0] == 100 and m["values"][2, 0] == 120


def test_minus_j_scan_unchanged(tmp_path):
    """-j scan (north→south): lats linspace(la1=10, la2=-10) descending,
    data rows already match — no flip in either code version."""
    vals = np.arange(12).reshape(3, 4) + 50
    p = str(tmp_path / "mj.grib")
    with open(p, "wb") as f:
        f.write(make_message(vals, la1=10, la2=-10, lo1=0, di=1, scan=0x00))
    m = grib2.read_raw(p)[0]
    assert m["lats"][0] == pytest.approx(10)
    assert m["values"][0, 0] == 50


def test_level_scale_sign_magnitude(tmp_path):
    """Scale byte 0x81 is sign-magnitude -1 → level = val * 10, not
    val / 10^129 (ADVICE r2); 0xFF scale means missing → NaN."""
    vals = np.ones((2, 2))
    p = str(tmp_path / "lvl.grib")
    with open(p, "wb") as f:
        f.write(make_message(vals, la1=0, la2=1, lo1=0, di=1, scan=0x40,
                             lvl_scale=0x81, lvl_val=5))
    assert grib2.read_raw(p)[0]["level"] == pytest.approx(50.0)
    with open(p, "wb") as f:
        f.write(make_message(vals, la1=0, la2=1, lo1=0, di=1, scan=0x40,
                             lvl_scale=2, lvl_val=1500))
    assert grib2.read_raw(p)[0]["level"] == pytest.approx(15.0)
    with open(p, "wb") as f:
        f.write(make_message(vals, la1=0, la2=1, lo1=0, di=1, scan=0x40,
                             lvl_scale=0xFF, lvl_val=5))
    assert np.isnan(grib2.read_raw(p)[0]["level"])


def test_multi_message_grid_mismatch_rejected(spark, tmp_path):
    """Two messages with equal shapes but shifted lon origin must not be
    silently merged onto the first grid (ADVICE r2)."""
    vals = np.ones((2, 2))
    p = str(tmp_path / "mix.grib")
    with open(p, "wb") as f:
        f.write(make_message(vals, la1=0, la2=1, lo1=0, di=1, scan=0x40,
                             cat=0, num=0))
        f.write(make_message(vals, la1=0, la2=1, lo1=90, di=1, scan=0x40,
                             cat=1, num=0))
    with pytest.raises(ValueError, match="different grids"):
        grib2.read(spark, p)


def test_multi_message_same_grid_merges(spark, tmp_path):
    vals = np.full((2, 2), 7)
    p = str(tmp_path / "same.grib")
    with open(p, "wb") as f:
        f.write(make_message(vals, la1=0, la2=1, lo1=0, di=1, scan=0x40,
                             cat=0, num=0))
        f.write(make_message(vals + 1, la1=0, la2=1, lo1=0, di=1,
                             scan=0x40, cat=1, num=0))
    df = grib2.read(spark, p)
    assert df.count() == 4
    assert {"t", "q"} <= set(df.columns)


# ---------------------------------------------------------------------------
# Complex packing (5.2) + spatial differencing (5.3): decode verified
# against an independent in-test encoder of the public WMO spec (same
# differential strategy as the TIFF-LZW codec test).
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, v, n):
        assert v >= 0 and (n == 0 or v < (1 << n)), (v, n)
        self.bits += [(v >> i) & 1 for i in range(n - 1, -1, -1)]

    def write_sm(self, v, n):
        """GRIB sign-magnitude."""
        self.write((1 << (n - 1)) | -v if v < 0 else v, n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self):
        self.align()
        return np.packbits(np.array(self.bits, np.uint8)).tobytes()


def _encode_groups(w, h, group_len):
    """Split h into groups; emit refs/widths/lengths + packed values per
    WMO 7.2 layout. Returns the pack-dict fields."""
    groups = [h[i:i + group_len] for i in range(0, len(h), group_len)]
    refs = [int(g.min()) for g in groups]
    widths = []
    for g, r in zip(groups, refs):
        span = int(g.max()) - r
        widths.append(span.bit_length())
    lens = [len(g) for g in groups]
    nbits = max(max(r.bit_length() for r in refs), 1)
    width_bits = 6
    len_ref = min(lens)
    len_bits = max((max(lens) - len_ref).bit_length(), 1)
    for r in refs:
        w.write(r, nbits)
    w.align()
    for wd in widths:
        w.write(wd, width_bits)
    w.align()
    for ln in lens:
        w.write(ln - len_ref, len_bits)
    w.align()
    for g, r, wd in zip(groups, refs, widths):
        for v in g:
            w.write(int(v) - r, wd)
    return {
        "ng": len(groups), "nbits": nbits,
        "width_ref": 0, "width_bits": width_bits,
        "len_ref": len_ref, "len_inc": 1, "last_len": lens[-1],
        "len_bits": len_bits,
    }


def _encode_complex(x, R, E, D, group_len=7):
    w = _BitWriter()
    pack = {"tmpl": 2, "n": len(x), "R": R, "E": E, "D": D}
    pack.update(_encode_groups(w, x, group_len))
    return w.tobytes(), pack


def _encode_complex_sd(x, R, E, D, order, group_len=7, extra_octets=2):
    w = _BitWriter()
    n = len(x)
    if order == 1:
        d = np.empty(n, np.int64)
        d[0] = 0
        d[1:] = np.diff(x)
        gmin = int(d[1:].min())
        h = d - gmin
        h[0] = 0
        ivals = [int(x[0])]
    else:
        d = np.empty(n, np.int64)
        d[:2] = 0
        d[2:] = x[2:] - 2 * x[1:-1] + x[:-2]
        gmin = int(d[2:].min())
        h = d - gmin
        h[:2] = 0
        ivals = [int(x[0]), int(x[1])]
    eo8 = extra_octets * 8
    for iv in ivals:
        w.write_sm(iv, eo8)
    w.write_sm(gmin, eo8)
    pack = {"tmpl": 3, "n": n, "R": R, "E": E, "D": D,
            "order": order, "extra_octets": extra_octets}
    pack.update(_encode_groups(w, h, group_len))
    return w.tobytes(), pack


def test_complex_packing_roundtrip():
    rng = np.random.default_rng(5)
    x = rng.integers(0, 4000, 53).astype(np.int64)
    data, pack = _encode_complex(x, R=1.5, E=1, D=1)
    got = grib2._unpack_complex(data, pack)
    np.testing.assert_allclose(got, (1.5 + x * 2.0) / 10.0, rtol=1e-12)


def test_complex_packing_constant_groups_zero_width():
    """A constant group encodes with width 0 (values = group ref)."""
    x = np.array([7] * 20 + [9] * 20 + [7, 8, 9, 10], dtype=np.int64)
    data, pack = _encode_complex(x, R=0.0, E=0, D=0, group_len=20)
    got = grib2._unpack_complex(data, pack)
    np.testing.assert_array_equal(got, x.astype(float))


@pytest.mark.parametrize("order", [1, 2])
def test_complex_spatial_differencing_roundtrip(order):
    """5.3: smooth field (where differencing wins) with negative
    differences — exercises sign-magnitude ivals/gmin + integration."""
    t = np.linspace(0, 6 * np.pi, 97)
    x = (1000 * np.sin(t) + 2000).astype(np.int64)  # smooth, non-monotone
    data, pack = _encode_complex_sd(x, R=-5.0, E=0, D=2, order=order)
    got = grib2._unpack_complex(data, pack)
    np.testing.assert_allclose(got, (-5.0 + x) / 100.0, rtol=0, atol=1e-9)


def test_complex_sd_negative_initial_values():
    x = np.array([-300, -250, -180, -120, -90, -60, -10, 5, 80, 140],
                 dtype=np.int64)
    # shift so group h values are nonneg by construction (diffs mixed)
    data, pack = _encode_complex_sd(x, R=0.0, E=0, D=0, order=1)
    got = grib2._unpack_complex(data, pack)
    np.testing.assert_array_equal(got, x.astype(float))


def test_complex_length_mismatch_raises():
    x = np.arange(10, dtype=np.int64)
    data, pack = _encode_complex(x, R=0.0, E=0, D=0)
    pack["n"] = 11
    with pytest.raises(ValueError, match="group lengths"):
        grib2._unpack_complex(data, pack)


def make_complex_message(values_2d, la1, la2, order=None):
    """Full edition-2 message with a REAL section 5.2/5.3 header (WMO
    octet layout) + section 7 stream — exercises _decode_message's
    complex-header parsing, which the unit tests above bypass."""
    nj, ni = values_2d.shape
    x = values_2d.astype(np.int64).ravel()
    if order is None:
        data, pack = _encode_complex(x, R=0.0, E=0, D=0, group_len=5)
    else:
        data, pack = _encode_complex_sd(x, R=0.0, E=0, D=0, order=order,
                                        group_len=5)

    s3 = bytearray(72)
    struct.pack_into(">I", s3, 0, 72)
    s3[4] = 3
    struct.pack_into(">H", s3, 12, 0)
    struct.pack_into(">I", s3, 30, ni)
    struct.pack_into(">I", s3, 34, nj)
    struct.pack_into(">I", s3, 46, _sm_enc(int(la1 * 1e6), 32))
    struct.pack_into(">I", s3, 55, _sm_enc(int(la2 * 1e6), 32))
    struct.pack_into(">I", s3, 63, int(1e6))
    s3[71] = 0x40 if la1 < la2 else 0

    s4 = bytearray(28)
    struct.pack_into(">I", s4, 0, 28)
    s4[4] = 4
    s4[22] = 103

    ln5 = 49 if order is not None else 47
    s5 = bytearray(ln5)
    struct.pack_into(">I", s5, 0, ln5)
    s5[4] = 5
    struct.pack_into(">I", s5, 5, ni * nj)
    struct.pack_into(">H", s5, 9, 3 if order is not None else 2)
    struct.pack_into(">f", s5, 11, pack["R"])
    struct.pack_into(">H", s5, 15, pack["E"])
    struct.pack_into(">H", s5, 17, pack["D"])
    s5[19] = pack["nbits"]
    s5[21] = 1                                  # general group split
    s5[22] = 0                                  # no missing management
    struct.pack_into(">I", s5, 31, pack["ng"])
    s5[35] = pack["width_ref"]
    s5[36] = pack["width_bits"]
    struct.pack_into(">I", s5, 37, pack["len_ref"])
    s5[41] = pack["len_inc"]
    struct.pack_into(">I", s5, 42, pack["last_len"])
    s5[46] = pack["len_bits"]
    if order is not None:
        s5[47] = pack["order"]
        s5[48] = pack["extra_octets"]

    s6 = bytearray(6)
    struct.pack_into(">I", s6, 0, 6)
    s6[4] = 6
    s6[5] = 255

    s7 = bytearray(5) + data
    struct.pack_into(">I", s7, 0, len(s7))
    s7[4] = 7

    body = bytes(s3) + bytes(s4) + bytes(s5) + bytes(s6) + bytes(s7)
    total = 16 + len(body) + 4
    head = bytearray(16)
    head[0:4] = b"GRIB"
    head[7] = 2
    struct.pack_into(">Q", head, 8, total)
    return bytes(head) + body + b"7777"


@pytest.mark.parametrize("order", [None, 1, 2])
def test_complex_full_message_roundtrip(tmp_path, order):
    rng = np.random.default_rng(9)
    base = np.cumsum(rng.integers(0, 9, 48)).reshape(6, 8)
    p = str(tmp_path / f"cx{order}.grib")
    with open(p, "wb") as f:
        f.write(make_complex_message(base, la1=0, la2=5, order=order))
    m = grib2.read_raw(p)[0]
    assert m["values"].shape == (6, 8)
    np.testing.assert_array_equal(m["values"], base.astype(float))


def test_order2_differencing_single_value_raises():
    """Degenerate template-5.3 message (order-2 differencing, n=1) must
    raise a named decode error, not IndexError (ADVICE r3)."""
    import pytest
    from geoio_jl_spark.sources.grib2 import _unpack_complex
    pack = {"tmpl": 3, "n": 1, "order": 2, "extra_octets": 1,
            "R": 0.0, "E": 0, "D": 0, "ng": 1, "nbits": 8,
            "width_bits": 8, "width_ref": 0, "len_bits": 8,
            "len_ref": 0, "len_inc": 1, "last_len": 1}
    with pytest.raises(ValueError, match="order-2 spatial differencing"):
        _unpack_complex(b"\x00" * 16, pack)


# ---------------------------------------------------------------------------
# Template 5.41 (PNG packing) — r3 VERDICT #5.  The PNG stream in the
# test is built by an INDEPENDENT minimal writer (filter-0 rows + zlib),
# not the repo codec, so decode errors cannot self-cancel.
# ---------------------------------------------------------------------------

def _png_independent(x2d: np.ndarray, nbits: int) -> bytes:
    import zlib
    h, w = x2d.shape
    if nbits <= 8:
        depth, color, ch = 8, 0, 1
        pix = x2d.astype(">u1").reshape(h, w, 1)
    elif nbits <= 16:
        depth, color, ch = 16, 0, 1
        pix = x2d.astype(">u2").reshape(h, w, 1)
    else:
        depth, color, ch = 8, 2, 3
        pix = np.stack([(x2d >> 16) & 0xFF, (x2d >> 8) & 0xFF,
                        x2d & 0xFF], axis=2).astype(">u1")
    raw = b"".join(b"\x00" + pix[r].tobytes() for r in range(h))

    def chunk(ctype, data):
        c = struct.pack(">I", len(data)) + ctype + data
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return c + struct.pack(">I", crc)

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                         color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def make_message_png(x2d, R, E, D, nbits, la1=0, la2=2, lo1=0, di=1,
                     scan=0):
    """Edition-2 message with data representation template 5.41."""
    nj, ni = x2d.shape
    base = make_message(np.zeros((nj, ni)), la1, la2, lo1, di, scan)
    # rebuild sections 5 and 7 (base: 16B header + s3(72) + s4(28) + ...)
    off5 = 16 + 72 + 28
    s5 = bytearray(21)
    struct.pack_into(">I", s5, 0, 21)
    s5[4] = 5
    struct.pack_into(">I", s5, 5, ni * nj)
    struct.pack_into(">H", s5, 9, 41)          # packing template 5.41
    struct.pack_into(">f", s5, 11, R)
    struct.pack_into(">H", s5, 15, _sm_enc(E, 16))
    struct.pack_into(">H", s5, 17, _sm_enc(D, 16))
    s5[19] = nbits
    s6 = base[off5 + 21: off5 + 21 + 6]
    png = _png_independent(x2d, nbits)
    s7 = bytearray(5) + png
    struct.pack_into(">I", s7, 0, len(s7))
    s7[4] = 7
    body = base[16:off5] + bytes(s5) + bytes(s6) + bytes(s7)
    total = 16 + len(body) + 4
    head = bytearray(base[:16])
    struct.pack_into(">Q", head, 8, total)
    return bytes(head) + body + b"7777"


@pytest.mark.parametrize("nbits,hi", [(8, 255), (12, 4000), (16, 65000),
                                      (24, 12_000_000)])
def test_png_packing_roundtrip(nbits, hi, tmp_path):
    rng = np.random.default_rng(nbits)
    x = rng.integers(0, hi + 1, (3, 4)).astype(np.int64)
    R, E, D = 1.5, -1, 2
    p = str(tmp_path / f"png{nbits}.grib")
    with open(p, "wb") as f:
        f.write(make_message_png(x, R, E, D, nbits))
    m = grib2.read_raw(p)[0]
    expect = (np.float32(R) + x * 2.0 ** E) * 10.0 ** -D
    np.testing.assert_array_equal(m["values"], expect.reshape(3, 4))


def test_png_packing_channel_mismatch_raises(tmp_path):
    """24-bit header over a grayscale stream must raise, not misread."""
    x = np.arange(12).reshape(3, 4).astype(np.int64)
    msg = bytearray(make_message_png(x, 0.0, 0, 0, 8))
    off5 = 16 + 72 + 28
    msg[off5 + 19] = 24  # lie about the depth
    p = str(tmp_path / "bad.grib")
    with open(p, "wb") as f:
        f.write(bytes(msg))
    with pytest.raises(ValueError, match="expects RGB"):
        grib2.read_raw(p)


def test_png_16bit_codec_roundtrip():
    """The repo PNG codec round-trips 16-bit grayscale (the decode side
    template 5.41 relies on)."""
    from geoio_jl_spark.sources.img import decode_png, encode_png
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, (5, 7, 1)).astype(np.uint16)
    assert (decode_png(encode_png(img)) == img).all()


# ---------------------------------------------------------------------------
# Template 5.40 (JPEG 2000 packing) — r4 VERDICT missing #3.  The
# codestream is built by the independent encoder in tests/j2k_encoder.py,
# not the repo decoder's sibling code, so errors cannot self-cancel.
# ---------------------------------------------------------------------------

def make_message_j2k(x2d, R, E, D, nbits, ctype=0):
    """Edition-2 message with data representation template 5.40."""
    from tests.j2k_encoder import encode_j2k_lossless
    nj, ni = x2d.shape
    base = make_message(np.zeros((nj, ni)), 0, 2, 0, 1, 0)
    off5 = 16 + 72 + 28
    s5 = bytearray(23)
    struct.pack_into(">I", s5, 0, 23)
    s5[4] = 5
    struct.pack_into(">I", s5, 5, ni * nj)
    struct.pack_into(">H", s5, 9, 40)          # packing template 5.40
    struct.pack_into(">f", s5, 11, R)
    struct.pack_into(">H", s5, 15, _sm_enc(E, 16))
    struct.pack_into(">H", s5, 17, _sm_enc(D, 16))
    s5[19] = nbits
    s5[21] = ctype                             # 0 = lossless
    s6 = base[off5 + 21: off5 + 21 + 6]
    cs = encode_j2k_lossless(x2d.astype(np.int64), max(nbits, 2),
                             levels=2, cb_exp=6)
    s7 = bytearray(5) + cs
    struct.pack_into(">I", s7, 0, len(s7))
    s7[4] = 7
    body = base[16:off5] + bytes(s5) + bytes(s6) + bytes(s7)
    total = 16 + len(body) + 4
    head = bytearray(base[:16])
    struct.pack_into(">Q", head, 8, total)
    return bytes(head) + body + b"7777"


@pytest.mark.parametrize("nbits,hi", [(8, 255), (12, 4000), (16, 65000)])
def test_j2k_packing_roundtrip(nbits, hi, tmp_path):
    rng = np.random.default_rng(nbits)
    x = rng.integers(0, hi + 1, (7, 9)).astype(np.int64)
    R, E, D = 1.5, -1, 2
    p = str(tmp_path / f"j2k{nbits}.grib")
    with open(p, "wb") as f:
        f.write(make_message_j2k(x, R, E, D, nbits))
    m = grib2.read_raw(p)[0]
    expect = (np.float32(R) + x * 2.0 ** E) * 10.0 ** -D
    np.testing.assert_array_equal(m["values"], expect.reshape(7, 9))


def test_j2k_lossy_type_rejected(tmp_path):
    x = np.arange(12).reshape(3, 4).astype(np.int64)
    p = str(tmp_path / "lossy.grib")
    with open(p, "wb") as f:
        f.write(make_message_j2k(x, 0.0, 0, 0, 8, ctype=1))
    with pytest.raises(ValueError, match="compression type 1"):
        grib2.read_raw(p)


def test_j2k_count_mismatch_raises(tmp_path):
    """Header count and codestream sample count must agree."""
    x = np.arange(12).reshape(3, 4).astype(np.int64)
    msg = bytearray(make_message_j2k(x, 0.0, 0, 0, 8))
    off5 = 16 + 72 + 28
    struct.pack_into(">I", msg, off5 + 5, 13)  # lie: 13 points
    p = str(tmp_path / "cnt.grib")
    with open(p, "wb") as f:
        f.write(bytes(msg))
    with pytest.raises(ValueError, match="carries 12 values"):
        grib2.read_raw(p)


# ---------------------------------------------------------------------------
# Grid template 3.30 (Lambert conformal — HRRR/NAM/RAP).  Geographic
# coordinates are cross-checked with an INDEPENDENT spherical LCC
# (Snyder 15-1..15-5 written directly here), not the engine's
# ellipsoidal closed form.
# ---------------------------------------------------------------------------

def make_message_lcc(values_2d, la1, lo1, lad, lov, latin1, latin2,
                     dx_m, dy_m, scan=0x40, shape=6):
    nj, ni = values_2d.shape
    s3 = bytearray(81)
    struct.pack_into(">I", s3, 0, 81)
    s3[4] = 3
    struct.pack_into(">H", s3, 12, 30)         # grid template 3.30
    s3[14] = shape
    struct.pack_into(">I", s3, 30, ni)
    struct.pack_into(">I", s3, 34, nj)
    struct.pack_into(">I", s3, 38, _sm_enc(int(la1 * 1e6), 32))
    struct.pack_into(">I", s3, 42, int(lo1 * 1e6))
    struct.pack_into(">I", s3, 47, _sm_enc(int(lad * 1e6), 32))
    struct.pack_into(">I", s3, 51, int(lov * 1e6))
    struct.pack_into(">I", s3, 55, int(dx_m * 1e3))
    struct.pack_into(">I", s3, 59, int(dy_m * 1e3))
    s3[64] = scan
    struct.pack_into(">I", s3, 65, _sm_enc(int(latin1 * 1e6), 32))
    struct.pack_into(">I", s3, 69, _sm_enc(int(latin2 * 1e6), 32))

    base = make_message(values_2d, 0, 2, 0, 1, scan)
    # splice the template-30 section 3 in place of the template-0 one
    body = bytes(s3) + base[16 + 72:-4]
    total = 16 + len(body) + 4
    head = bytearray(base[:16])
    struct.pack_into(">Q", head, 8, total)
    return bytes(head) + body + b"7777"


def _sphere_lcc_fwd(lon, lat, lat1, lat2, lad, lov, R):
    p1, p2, p0 = np.radians([lat1, lat2, lad])
    phi, lam = np.radians(lat), np.radians(lon)
    if abs(lat1 - lat2) < 1e-12:
        n = np.sin(p1)
    else:
        n = (np.log(np.cos(p1) / np.cos(p2))
             / np.log(np.tan(np.pi / 4 + p2 / 2)
                      / np.tan(np.pi / 4 + p1 / 2)))
    Fc = np.cos(p1) * np.tan(np.pi / 4 + p1 / 2) ** n / n
    rho = R * Fc / np.tan(np.pi / 4 + phi / 2) ** n
    rho0 = R * Fc / np.tan(np.pi / 4 + p0 / 2) ** n
    th = n * (lam - np.radians(lov))
    return rho * np.sin(th), rho0 - rho * np.cos(th)


def test_lambert_grid_coordinates(tmp_path):
    """HRRR-like parameters on a small grid: corner pins to (La1, Lo1);
    every cell's (lon, lat) forward-projects onto the regular x/y mesh
    via the independent spherical LCC."""
    vals = np.arange(30, dtype=float).reshape(5, 6)
    la1, lo1 = 21.138123, 237.280472          # HRRR corner
    lad = lov = 38.5
    latin = 38.5
    p = str(tmp_path / "lcc.grib2")
    with open(p, "wb") as f:
        f.write(make_message_lcc(vals, la1, lo1, lad, lov + 224.0 - 224.0,
                                 latin, latin, 3000.0, 3000.0))
    m = grib2.read_raw(p)[0]
    np.testing.assert_array_equal(m["values"], vals)
    pr = m["proj"]
    lon2d, lat2d = pr["lon2d"], pr["lat2d"]
    # corner == first grid point
    assert abs(lat2d[0, 0] - la1) < 1e-9
    assert abs(lon2d[0, 0] - lo1) < 1e-9
    xs, ys = m["lons"], m["lats"]
    assert abs(xs[1] - xs[0] - 3000.0) < 1e-6
    assert abs(ys[1] - ys[0] - 3000.0) < 1e-6
    R = 6371229.0
    x1, y1 = _sphere_lcc_fwd(lo1, la1, latin, latin, lad, lov, R)
    for j in (0, 2, 4):
        for i in (0, 3, 5):
            x, y = _sphere_lcc_fwd(lon2d[j, i], lat2d[j, i],
                                   latin, latin, lad, lov, R)
            assert abs((x - x1) - i * 3000.0) < 1e-3
            assert abs((y - y1) - j * 3000.0) < 1e-3


def test_lambert_grid_spark_table(spark, tmp_path):
    """read() emits projection x/y plus per-cell lon/lat columns."""
    vals = np.arange(12, dtype=float).reshape(3, 4)
    p = str(tmp_path / "lcc2.grib2")
    with open(p, "wb") as f:
        f.write(make_message_lcc(vals, 40.0, 250.0, 45.0, 255.0,
                                 44.0, 46.0, 5000.0, 5000.0))
    df = grib2.read(spark, p)
    assert {"x", "y", "lon", "lat"} <= set(df.columns)
    rows = {(r["i"], r["j"]): r for r in df.collect()}
    assert len(rows) == 12
    assert abs(rows[(0, 0)]["lat"] - 40.0) < 1e-9
    assert abs(rows[(0, 0)]["lon"] - 250.0) < 1e-9
    # x axis regular in projection space
    assert abs((rows[(1, 0)]["x"] - rows[(0, 0)]["x"]) - 5000.0) < 1e-6


def test_unsupported_earth_shape_raises(tmp_path):
    vals = np.zeros((2, 2))
    msg = bytearray(make_message_lcc(vals, 40.0, 250.0, 45.0, 255.0,
                                     44.0, 46.0, 5000.0, 5000.0))
    msg[16 + 14] = 7                           # shape code 7: unsupported
    p = str(tmp_path / "bad_shape.grib2")
    with open(p, "wb") as f:
        f.write(bytes(msg))
    with pytest.raises(ValueError, match="earth shape"):
        grib2.read_raw(p)


# ---------------------------------------------------------------------------
# Grid template 3.20 (polar stereographic — NCEP Alaska / polar grids),
# cross-checked with an independent spherical formula (Snyder 21-1..21-4
# with k0 from the standard parallel).
# ---------------------------------------------------------------------------

def make_message_ps(values_2d, la1, lo1, lad, lov, dx_m, dy_m,
                    scan=0x40, shape=6, south=False):
    nj, ni = values_2d.shape
    s3 = bytearray(65)
    struct.pack_into(">I", s3, 0, 65)
    s3[4] = 3
    struct.pack_into(">H", s3, 12, 20)         # grid template 3.20
    s3[14] = shape
    struct.pack_into(">I", s3, 30, ni)
    struct.pack_into(">I", s3, 34, nj)
    struct.pack_into(">I", s3, 38, _sm_enc(int(la1 * 1e6), 32))
    struct.pack_into(">I", s3, 42, int(lo1 * 1e6))
    struct.pack_into(">I", s3, 47, _sm_enc(int(lad * 1e6), 32))
    struct.pack_into(">I", s3, 51, int(lov * 1e6))
    struct.pack_into(">I", s3, 55, int(dx_m * 1e3))
    struct.pack_into(">I", s3, 59, int(dy_m * 1e3))
    s3[63] = 0x80 if south else 0
    s3[64] = scan
    base = make_message(values_2d, 0, 2, 0, 1, scan)
    body = bytes(s3) + base[16 + 72:-4]
    total = 16 + len(body) + 4
    head = bytearray(base[:16])
    struct.pack_into(">Q", head, 8, total)
    return bytes(head) + body + b"7777"


def _sphere_ps_fwd(lon, lat, lad, lov, R, south=False):
    sgn = -1.0 if south else 1.0
    phi = sgn * np.radians(lat)
    phic = np.radians(abs(lad))
    k = (1 + np.sin(phic)) / 2  # k0·2 with k0 from std parallel
    rho = 2 * R * k * np.tan(np.pi / 4 - phi / 2)
    th = sgn * (np.radians(lon) - np.radians(lov))
    return sgn * rho * np.sin(th), -rho * np.cos(th) * 1.0


def test_polar_grid_coordinates(tmp_path):
    """NCEP Alaska-like polar grid: corner pins to (La1, Lo1); cell
    spacing is exactly Dx/Dy in projection metres via the independent
    spherical forward."""
    vals = np.arange(20, dtype=float).reshape(4, 5)
    la1, lo1, lad, lov = 30.0, 187.0, 60.0, 210.0
    p = str(tmp_path / "ps.grib2")
    with open(p, "wb") as f:
        f.write(make_message_ps(vals, la1, lo1, lad, lov, 10000.0, 10000.0))
    m = grib2.read_raw(p)[0]
    pr = m["proj"]
    assert pr["method"] == "polar_stereographic"
    assert abs(pr["lat2d"][0, 0] - la1) < 1e-9
    assert abs(pr["lon2d"][0, 0] - lo1) < 1e-9
    R = 6371229.0
    xr, yr = _sphere_ps_fwd(pr["lon2d"], pr["lat2d"], lad, lov, R)
    # independent forward reproduces the regular projection mesh
    for j in (0, 3):
        for i in (0, 4):
            assert abs((xr[j, i] - xr[0, 0]) - i * 10000.0) < 1e-3
            assert abs((yr[j, i] - yr[0, 0]) - j * 10000.0) < 1e-3


def test_polar_grid_south_aspect(tmp_path):
    vals = np.zeros((2, 2))
    p = str(tmp_path / "pss.grib2")
    with open(p, "wb") as f:
        f.write(make_message_ps(vals, -30.0, 10.0, -60.0, 0.0,
                                20000.0, 20000.0, south=True))
    m = grib2.read_raw(p)[0]
    pr = m["proj"]
    assert abs(pr["lat2d"][0, 0] - (-30.0)) < 1e-9
    assert abs(pr["lon2d"][0, 0] - 10.0) < 1e-9
    assert (pr["lat2d"] < 0).all()


def make_message_mercator(values_2d, la1, lo1, lad, dx_m, dy_m,
                          scan=0x40, shape=6):
    """Grid template 3.10 (Mercator)."""
    nj, ni = values_2d.shape
    s3 = bytearray(72)
    struct.pack_into(">I", s3, 0, 72)
    s3[4] = 3
    struct.pack_into(">H", s3, 12, 10)
    s3[14] = shape
    struct.pack_into(">I", s3, 30, ni)
    struct.pack_into(">I", s3, 34, nj)
    struct.pack_into(">I", s3, 38, _sm_enc(int(la1 * 1e6), 32))
    struct.pack_into(">I", s3, 42, int(lo1 * 1e6))
    struct.pack_into(">I", s3, 47, _sm_enc(int(lad * 1e6), 32))
    s3[59] = scan
    struct.pack_into(">I", s3, 64, int(dx_m * 1e3))
    struct.pack_into(">I", s3, 68, int(dy_m * 1e3))
    base = make_message(values_2d, 0, 2, 0, 1, scan)
    body = bytes(s3) + base[16 + 72:-4]
    total = 16 + len(body) + 4
    head = bytearray(base[:16])
    struct.pack_into(">Q", head, 8, total)
    return bytes(head) + body + b"7777"


def test_mercator_grid_coordinates(tmp_path):
    """Wave-model-like Mercator grid on the NCEP sphere: corner pins to
    (La1, Lo1); independent spherical Mercator (x = R·cosφ1·Δλ,
    y = R·cosφ1·ln tan(π/4+φ/2)) reproduces the Dx/Dy mesh."""
    vals = np.arange(24, dtype=float).reshape(4, 6)
    la1, lo1, lad = -20.0, 120.0, 20.0
    p = str(tmp_path / "merc.grib2")
    with open(p, "wb") as f:
        f.write(make_message_mercator(vals, la1, lo1, lad,
                                      25000.0, 25000.0))
    m = grib2.read_raw(p)[0]
    pr = m["proj"]
    assert pr["method"] == "mercator"
    assert abs(pr["lat2d"][0, 0] - la1) < 1e-9
    assert abs(pr["lon2d"][0, 0] - lo1) < 1e-9
    R = 6371229.0
    c = R * np.cos(np.radians(lad))
    lam = np.radians(pr["lon2d"])
    phi = np.radians(pr["lat2d"])
    xr = c * lam
    yr = c * np.log(np.tan(np.pi / 4 + phi / 2))
    for j in (0, 3):
        for i in (0, 5):
            assert abs((xr[j, i] - xr[0, 0]) - i * 25000.0) < 1e-3
            assert abs((yr[j, i] - yr[0, 0]) - j * 25000.0) < 1e-3


@pytest.mark.parametrize("maker,kwargs", [
    ("lcc", {}), ("ps", {}), ("merc", {}),
])
def test_proj_projjson_roundtrip(tmp_path, maker, kwargs):
    """The grid's PROJJSON dispatches through crs_input onto the same
    closed forms that built the grid: fwd(lon2d, lat2d) reproduces the
    regular projection mesh to sub-mm."""
    from geoio_jl_spark.functions.crs_input import transform_from_projjson

    vals = np.arange(12, dtype=float).reshape(3, 4)
    if maker == "lcc":
        msg = make_message_lcc(vals, 35.0, 255.0, 38.5, 262.5,
                               38.5, 38.5, 3000.0, 3000.0)
    elif maker == "ps":
        msg = make_message_ps(vals, 30.0, 187.0, 60.0, 210.0,
                              10000.0, 10000.0)
    else:
        msg = make_message_mercator(vals, -20.0, 120.0, 20.0,
                                    25000.0, 25000.0)
    p = str(tmp_path / f"{maker}.grib2")
    with open(p, "wb") as f:
        f.write(msg)
    m = grib2.read_raw(p)[0]
    fwd, inv = transform_from_projjson(grib2.proj_projjson(m))
    pr = m["proj"]
    gx, gy = np.meshgrid(m["lons"], m["lats"])
    # keep the GRIB 0..360 longitude convention (same as LoV): the LCC
    # cone angle θ = n·Δλ is not mod-360 invariant
    x, y = fwd(pr["lon2d"], pr["lat2d"])
    np.testing.assert_allclose(x, gx, atol=1e-4)
    np.testing.assert_allclose(y, gy, atol=1e-4)


def test_lambert_grid_wgs84_ellipsoid(tmp_path):
    """Shape code 5 (WGS84): the ellipsoidal LCC path — corner pins and
    the PROJJSON carries the inverse flattening."""
    vals = np.zeros((3, 4))
    msg = bytearray(make_message_lcc(vals, 33.0, 245.0, 39.0, 265.0,
                                     33.0, 45.0, 40000.0, 40000.0))
    msg[16 + 14] = 5                            # WGS84
    p = str(tmp_path / "lcc84.grib2")
    with open(p, "wb") as f:
        f.write(bytes(msg))
    m = grib2.read_raw(p)[0]
    pr = m["proj"]
    assert abs(pr["lat2d"][0, 0] - 33.0) < 1e-9
    assert abs(pr["lon2d"][0, 0] - 245.0) < 1e-9
    doc = grib2.proj_projjson(m)
    ell = doc["base_crs"]["datum"]["ellipsoid"]
    assert abs(ell["semi_major_axis"] - 6378137.0) < 1e-6
    assert abs(ell["inverse_flattening"] - 298.257223563) < 1e-9
