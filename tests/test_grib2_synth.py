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
