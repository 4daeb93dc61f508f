"""NetCDF-4/HDF5 writer (sources/hdf5write.py): checksum conformance
against the reference fixtures, dict round-trips through the fixture-
validated reader, real-fixture content round-trips, and the
netcdf3.write(fmt="netcdf4") grid path."""

import glob
import struct

import numpy as np
import pytest

from geoio_jl_spark.sources import hdf5nc, netcdf3
from geoio_jl_spark.sources.hdf5write import _lookup3, write_raw

FIXTURES = sorted(glob.glob("/root/reference/test/data/*.nc"))


def test_lookup3_matches_fixture_checksums():
    """The Jenkins lookup3 implementation reproduces every stored
    superblock and OHDR checksum of the reference fixtures."""
    assert FIXTURES
    checked = 0
    for fix in FIXTURES:
        buf = open(fix, "rb").read()
        if buf[8] == 2:                     # superblock v2
            stored = struct.unpack_from("<I", buf, 44)[0]
            assert _lookup3(buf[:44]) == stored
            checked += 1
        start = 0
        while True:
            oh = buf.find(b"OHDR", start)
            if oh < 0:
                break
            start = oh + 4
            flags = buf[oh + 5]
            pos = oh + 6
            if flags & 0x20:
                pos += 16
            if flags & 0x10:
                pos += 4
            szb = 1 << (flags & 3)
            chunk0 = int.from_bytes(buf[pos:pos + szb], "little")
            pos += szb
            stored = struct.unpack_from("<I", buf, pos + chunk0)[0]
            assert _lookup3(buf[oh:pos + chunk0]) == stored
            checked += 1
    assert checked >= 20


def test_write_read_roundtrip(tmp_path):
    dims = [("x", 4), ("y", 3)]
    variables = {
        "x": (["x"], {"units": "m"}, np.arange(4, dtype=np.float64)),
        "y": (["y"], {}, np.arange(3, dtype=np.float32)),
        "temp": (["y", "x"], {"units": "K", "fill": np.float64(-9e9)},
                 np.arange(12, dtype=np.float32).reshape(3, 4) * 1.5),
        "count": (["y", "x"], {}, np.arange(12, np.int64(24),
                                            dtype=np.int32).reshape(3, 4)),
        "flag": ([], {}, np.int8(7)),
    }
    gatts = {"title": "rt", "version": np.int32(7),
             "factors": np.array([1.5, 2.5])}
    p = str(tmp_path / "rt.nc")
    write_raw(p, dims, variables, gatts)
    d = hdf5nc.read_raw(p)
    assert d["dims"] == dims
    assert d["gatts"]["title"] == "rt"
    assert d["gatts"]["version"] == 7
    np.testing.assert_array_equal(d["gatts"]["factors"], [1.5, 2.5])
    for name, (dimnames, atts, arr) in variables.items():
        gd, ga, garr = d["vars"][name]
        if dimnames:
            assert gd == dimnames
        np.testing.assert_array_equal(np.asarray(garr), np.asarray(arr))
        for k, v in atts.items():
            assert np.asarray(ga[k]).item() == np.asarray(v).item() \
                or ga[k] == v
    assert d["vars"]["temp"][2].dtype == np.float32
    assert d["vars"]["count"][2].dtype == np.int32


@pytest.mark.parametrize("fix", FIXTURES)
def test_fixture_content_roundtrip(fix, tmp_path):
    """Read a REAL reference fixture, re-write it with the engine's
    writer, re-read — dims, dimension mapping and every data array
    survive bit-exactly (the reader is fixture-validated, so this pins
    the writer against real-world content, not a twin implementation)."""
    d = hdf5nc.read_raw(fix)
    variables = {n: v for n, v in d["vars"].items() if v[2] is not None}
    p = str(tmp_path / "rew.nc")
    write_raw(p, d["dims"], variables, d["gatts"])
    d2 = hdf5nc.read_raw(p)
    assert d2["dims"] == d["dims"]
    for name, (dimnames, atts, arr) in variables.items():
        gd, ga, garr = d2["vars"][name]
        assert garr is not None
        np.testing.assert_array_equal(np.asarray(garr), np.asarray(arr))
        if len(dimnames) == len(np.asarray(arr).shape):
            assert gd == dimnames


def test_netcdf_write_fmt_netcdf4(spark, tmp_path):
    """The .nc sink's netcdf4 path round-trips through the magic-
    dispatched reader identically to the classic path."""
    from geoio_jl_spark.datagen import geo_points_pdf  # noqa: F401
    import pandas as pd

    ny, nx = 3, 4
    rows = []
    for j in range(ny):
        for i in range(nx):
            rows.append((i, j, 10.0 + i, 20.0 + j, float(i * j)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["i", "j", "x", "y", "temp"]))
    pc = str(tmp_path / "c.nc")
    p4 = str(tmp_path / "n4.nc")
    netcdf3.write(df, pc)
    netcdf3.write(df, p4, fmt="netcdf4")
    assert open(p4, "rb").read(8) == b"\x89HDF\r\n\x1a\n"
    dc = netcdf3.read_raw(pc)
    d4 = netcdf3.read_raw(p4)
    assert [s for _, s in dc["dims"]] == [s for _, s in d4["dims"]]
    np.testing.assert_array_equal(np.asarray(dc["vars"]["temp"][2]),
                                  np.asarray(d4["vars"]["temp"][2]))
    np.testing.assert_array_equal(np.asarray(dc["vars"]["x"][2]),
                                  np.asarray(d4["vars"]["x"][2]))


@pytest.mark.parametrize("fix", FIXTURES)
def test_fixture_roundtrip_compressed(fix, tmp_path):
    """Deflate-chunked output (the fixtures' own storage shape) carries
    the same content."""
    d = hdf5nc.read_raw(fix)
    variables = {n: v for n, v in d["vars"].items() if v[2] is not None}
    p = str(tmp_path / "rewc.nc")
    write_raw(p, d["dims"], variables, d["gatts"], compress=True)
    d2 = hdf5nc.read_raw(p)
    assert d2["dims"] == d["dims"]
    for name, (dimnames, atts, arr) in variables.items():
        np.testing.assert_array_equal(np.asarray(d2["vars"][name][2]),
                                      np.asarray(arr))


def test_compress_shrinks_and_roundtrips(tmp_path):
    dims = [("x", 64), ("y", 64)]
    smooth = np.add.outer(np.arange(64.0), np.arange(64.0)) \
        .astype(np.float32)
    variables = {"z": (["y", "x"], {}, smooth)}
    pu = str(tmp_path / "u.nc")
    pc = str(tmp_path / "c.nc")
    write_raw(pu, dims, variables, {})
    write_raw(pc, dims, variables, {}, compress=True)
    import os
    assert os.path.getsize(pc) < os.path.getsize(pu) / 2
    np.testing.assert_array_equal(
        hdf5nc.read_raw(pc)["vars"]["z"][2], smooth)


def test_scalar_bigendian_attribute_roundtrips(tmp_path):
    p = str(tmp_path / "be.nc")
    write_raw(p, [("x", 2)],
              {"x": (["x"], {"s": np.array(1.5, ">f8")},
                     np.arange(2.0))}, {})
    ga = hdf5nc.read_raw(p)["vars"]["x"][1]
    assert float(np.asarray(ga["s"])) == 1.5


def test_undeclared_dimension_raises(tmp_path):
    with pytest.raises(ValueError, match="undeclared dimension 'x'"):
        write_raw(str(tmp_path / "bad.nc"), [("y", 4)],
                  {"v": (["x"], {}, np.arange(4.0))}, {})


def test_oversize_variable_name_raises(tmp_path):
    with pytest.raises(ValueError, match="255"):
        write_raw(str(tmp_path / "nm.nc"), [],
                  {"v" * 300: ([], {}, np.int32(1))}, {})


def test_gcol_meets_spec_minimum(tmp_path):
    """Collection size includes its 16-byte header and is >= 4096 with a
    terminating free-space object."""
    p = str(tmp_path / "g.nc")
    write_raw(p, [("x", 3)], {"x": (["x"], {}, np.arange(3.0)),
                              "v": (["x"], {}, np.arange(3.0))}, {})
    buf = open(p, "rb").read()
    g = buf.index(b"GCOL")
    size = struct.unpack_from("<Q", buf, g + 8)[0]
    assert size >= 4096
    assert g + size <= len(buf)


def test_unencodable_attrs_warn_with_names(tmp_path):
    """A dropped (unencodable) attribute must be surfaced, not silently
    lost from the round trip (ADVICE r5): one warning naming every
    skipped var:attr / <global>:attr pair, file still written+readable."""
    p = str(tmp_path / "w.nc")
    with pytest.warns(UserWarning, match=r"<global>:gl.*x:bad") as rec:
        write_raw(p, [("x", 2)],
                  {"x": (["x"], {"bad": ["a", "b"], "ok": np.int32(7)},
                         np.arange(2.0))},
                  {"gl": np.array(["u", "v"])})
    assert len(rec) == 1          # deduped across the two build passes
    d = hdf5nc.read_raw(p)
    assert int(np.asarray(d["vars"]["x"][1]["ok"])) == 7
    assert "bad" not in d["vars"]["x"][1]
