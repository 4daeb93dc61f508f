"""Property-based tests (hypothesis) for the pure kernels — the
robustness layer the reference's example-based suite lacks."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geoio_jl_spark.functions import geomkernels as K
from geoio_jl_spark.functions import wkb as W
from geoio_jl_spark.functions.crs import _lonlat_to_webmerc, _webmerc_to_lonlat

finite = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e6, max_value=1e6)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=2, max_size=12))
def test_linestring_wkb_roundtrip(coords):
    g = W.linestring(coords)
    b = W.encode_wkb(g)
    g2 = W.decode_wkb(b)
    assert W.encode_wkb(g2) == b
    np.testing.assert_array_equal(g2.coords, np.asarray(coords, float))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=3, max_size=10))
def test_polygon_wkb_roundtrip_closed_on_disk(ring):
    g = W.polygon(ring)  # open ring; writer must close it
    g2 = W.decode_wkb(W.encode_wkb(g))
    disk_ring = g2.coords[g2.rings[0]:g2.rings[1]]
    assert np.array_equal(disk_ring[0], disk_ring[-1])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=10))
def test_normalize_chain_idempotent(coords):
    arr = np.asarray(coords, float)
    c1, closed1 = W.normalize_chain(arr)
    c2, closed2 = W.normalize_chain(np.vstack([c1, c1[:1]]) if closed1 else c1)
    assert closed1 == closed2
    np.testing.assert_array_equal(c1, c2)


@settings(max_examples=60, deadline=None)
@given(st.floats(min_value=-179.9, max_value=179.9),
       st.floats(min_value=-84.9, max_value=84.9))
def test_webmercator_inverse(lon, lat):
    x, y = _lonlat_to_webmerc(np.array([lon]), np.array([lat]))
    lon2, lat2 = _webmerc_to_lonlat(x, y)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=35999),
       st.integers(min_value=0, max_value=16999),
       st.integers(min_value=0, max_value=5))
def test_cell_cover_contains_point_cell(lon_i, lat_i, res):
    """Any point inside a bbox lands in one of the bbox's covering cells
    (the correctness precondition of every coarse spatial join)."""
    from geoio_jl_spark import dialect as D
    e = D.cell_edge_centideg(res)
    cx, cy = lon_i // e, lat_i // e
    # bbox that contains the point
    minx, maxx = max(lon_i - 37, 0), lon_i + 91
    miny, maxy = max(lat_i - 53, 0), lat_i + 17
    cover = {(x, y)
             for x in range(minx // e, maxx // e + 1)
             for y in range(miny // e, maxy // e + 1)}
    assert (cx, cy) in cover


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 100), st.integers(0, 100)),
                min_size=3, max_size=8),
       st.integers(0, 100), st.integers(0, 100))
def test_containment_matches_matplotlib_free_reference(ring, px, py):
    """Ray casting kernel vs an independent winding-number reference for
    non-degenerate simple polygons (skip self-intersecting rings)."""
    arr = np.asarray(ring, float)
    if len(np.unique(arr, axis=0)) < 3:
        return
    g = W.polygon(ring + [ring[0]])
    got = K.points_in_geom(np.array([float(px)]), np.array([float(py)]), g)[0]
    # reference: exact integer even-odd count implemented independently
    closed = ring + [ring[0]]
    inside = False
    on_edge = False
    for (x1, y1), (x2, y2) in zip(closed[:-1], closed[1:]):
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if (cross == 0 and min(x1, x2) <= px <= max(x1, x2)
                and min(y1, y2) <= py <= max(y1, y2)):
            on_edge = True
        if (y1 <= py) != (y2 <= py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if xint > px:
                inside = not inside
    assert got == (inside or on_edge)


@given(st.lists(st.tuples(st.integers(1, 16), st.integers(0, 2**16 - 1)),
                min_size=1, max_size=400))
@settings(max_examples=50, deadline=None)
def test_jpeg_bitstream_roundtrip(items):
    """JPEG entropy bit writer/reader are exact inverses through byte
    stuffing for arbitrary (length, value) streams."""
    from geoio_jl_spark.sources.jpeg import _BitReader, _BitWriter
    w = _BitWriter()
    vals = [(v & ((1 << n) - 1), n) for n, v in items]
    for v, n in vals:
        w.write(v, n)
    w.flush()
    raw = bytes(w.out)
    data = bytearray()
    i = 0
    while i < len(raw):  # destuff FF00 exactly as the scan decoder does
        data.append(raw[i])
        i += 2 if raw[i] == 0xFF and i + 1 < len(raw) and raw[i+1] == 0 else 1
    r = _BitReader(bytes(data))
    assert [(r.read(n), n) for _v, n in vals] == vals


@given(st.integers(1, 16), st.integers(-30, 30), st.integers(0, 3),
       st.lists(st.integers(0, 2**13 - 1), min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_grib_simple_packing_unpack(nbits, E, D_, xs):
    """GRIB2 simple packing: bit-packed X decode to (R + 2^E X) 10^-D
    (WMO: the decimal scale divides R too) for arbitrary widths,
    against a per-value python reference."""
    import numpy as np

    from geoio_jl_spark.sources.grib2 import _unpack_simple
    xs = [x & ((1 << nbits) - 1) for x in xs]
    bits = "".join(format(x, f"0{nbits}b") for x in xs)
    bits += "0" * (-len(bits) % 8)
    data = int(bits, 2).to_bytes(len(bits) // 8, "big") if bits else b""
    pack = {"n": len(xs), "R": 3.25, "E": E, "D": D_, "nbits": nbits}
    got = _unpack_simple(data, pack)
    want = [(3.25 + x * 2.0**E) * 10.0**-D_ for x in xs]
    np.testing.assert_allclose(got, want, rtol=1e-12)


# ---------------------------------------------------------------------------
# JPEG 2000 codec (round 5): hypothesis round-trips with shrinking —
# the MQ coder and codestream layers have many boundary states (flush
# bits, stuffing, stripe remainders) that random sweeps under-sample.

@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 18), st.integers(0, 1)),
                min_size=1, max_size=600))
def test_mq_coder_roundtrip_property(symbols):
    from tests.j2k_encoder import MQEncoder
    from geoio_jl_spark.sources.j2k import MQDecoder
    enc = MQEncoder()
    for cx, b in symbols:
        enc.encode(cx, b)
    dec = MQDecoder(enc.flush())
    assert [dec.decode(cx) for cx, _ in symbols] == [b for _, b in symbols]


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 33), st.integers(1, 33), st.integers(2, 12),
       st.integers(0, 3), st.integers(2, 6), st.integers(0, 2**32 - 1))
def test_j2k_codestream_roundtrip_property(h, w, depth, levels, cb_exp,
                                           seed):
    from tests.j2k_encoder import encode_j2k_lossless
    from geoio_jl_spark.sources.j2k import decode_j2k
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 1 << depth, (h, w)).astype(np.int64)
    cs = encode_j2k_lossless(img, depth, levels=levels, cb_exp=cb_exp)
    out, info = decode_j2k(cs)
    assert np.array_equal(out, img)


# ---------------------------------------------------------------------------
# round-6 codecs: GIF LZW, IMA ADPCM, MVT protobuf primitives
# ---------------------------------------------------------------------------

@given(st.integers(2, 8),
       st.lists(st.integers(0, 255), min_size=1, max_size=400))
def test_gif_lzw_roundtrip_property(min_code, vals):
    from geoio_jl_spark.sources.gif import _lzw_decode, _lzw_encode
    idx = np.array([v % (1 << min_code) for v in vals], np.uint8)
    enc = _lzw_encode(idx, min_code)
    out = _lzw_decode(enc, min_code, len(idx))
    np.testing.assert_array_equal(out, idx)


@given(st.integers(1, 64), st.integers(1, 64), st.integers(2, 32),
       st.booleans(), st.integers(0, 2**31))
def test_gif_full_roundtrip_property(h, w, ncol, interlace, seed):
    from geoio_jl_spark.sources import gif
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    idx = rng.integers(0, ncol, (h, w), dtype=np.uint8)
    buf = gif.encode([idx], pal, interlace=interlace)
    np.testing.assert_array_equal(gif.decode(buf), pal[idx])


@given(st.integers(1, 2), st.integers(9, 65),
       st.lists(st.integers(-32768, 32767), min_size=4, max_size=600))
def test_adpcm_vector_equals_scalar_property(nch, spb_base, samples):
    """Vectorized decoder == scalar spec transcription for arbitrary
    PCM, channel counts, and block sizes."""
    from geoio_jl_spark.sources import adpcm
    from tests.test_avi_adpcm import _scalar_decode
    spb = (spb_base - 1) // 8 * 8 + 1          # 1 + multiple of 8
    n = len(samples) - len(samples) % nch
    if n == 0:
        return
    pcm = np.array(samples[:n], np.int16).reshape(-1, nch)
    data, balign = adpcm.encode_blocks(pcm, spb=spb)
    np.testing.assert_array_equal(
        adpcm.decode_blocks(data, nch, balign),
        _scalar_decode(data, nch, balign))


@given(st.integers(-2**63, 2**63 - 1))
def test_mvt_zigzag_roundtrip(n):
    from geoio_jl_spark.sources.mvt import _unzigzag, _zigzag
    z = _zigzag(n)
    assert z >= 0
    assert _unzigzag(z) == n


@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=50))
def test_mvt_varint_stream_roundtrip(vals):
    from geoio_jl_spark.sources.mvt import _read_varint, _varint
    buf = b"".join(_varint(v) for v in vals)
    pos, out = 0, []
    while pos < len(buf):
        v, pos = _read_varint(buf, pos)
        out.append(v)
    assert out == vals


@given(st.lists(st.lists(st.tuples(st.integers(0, 4095),
                                   st.integers(0, 4095)),
                         min_size=2, max_size=20),
                min_size=1, max_size=5))
def test_mvt_linestring_geometry_roundtrip(parts):
    from geoio_jl_spark.sources import mvt
    enc = mvt.encode_geometry(mvt.LINESTRING, parts)
    assert mvt.decode_geometry(mvt.LINESTRING, enc) == parts


@given(st.lists(st.tuples(st.text(st.characters(min_codepoint=97,
                                                max_codepoint=122),
                                  min_size=1, max_size=20),
                          st.binary(max_size=500)),
                min_size=1, max_size=10),
       st.booleans())
def test_zip_roundtrip_property(members, stored):
    """Our ZIP parser vs stdlib zipfile as the independent writer, over
    arbitrary names/payloads, both compression methods."""
    import io
    import zipfile

    from geoio_jl_spark.sources import archive
    # zipfile rejects duplicate names with a warning only; dedup for a
    # well-defined expectation
    seen, uniq = set(), []
    for i, (n, d) in enumerate(members):
        name = f"{n}_{i}"
        if name not in seen:
            seen.add(name)
            uniq.append((name, d))
    bio = io.BytesIO()
    comp = zipfile.ZIP_STORED if stored else zipfile.ZIP_DEFLATED
    with zipfile.ZipFile(bio, "w", compression=comp) as z:
        for n, d in uniq:
            z.writestr(n, d)
    buf = bio.getvalue()
    entries = archive.zip_entries(buf)
    assert [e["name"] for e in entries] == [n for n, _ in uniq]
    for e, (_, d) in zip(entries, uniq):
        assert archive.zip_member_bytes(buf, e) == d


@given(st.binary(max_size=200), st.integers(0, 199))
def test_zip_truncation_never_hangs(junk, cut):
    """Truncated/garbage zips raise ValueError (never hang, never
    struct.error) — feed real archive prefixes and raw junk."""
    import io
    import zipfile

    import pytest as _pytest

    from geoio_jl_spark.sources import archive
    bio = io.BytesIO()
    with zipfile.ZipFile(bio, "w") as z:
        z.writestr("a.txt", b"payload" * 10)
    buf = bio.getvalue()[:cut] + junk
    try:
        entries = archive.zip_entries(buf)
        for e in entries:
            archive.zip_member_bytes(buf, e)
    except ValueError:
        pass                                   # named failure is the contract


@given(st.lists(st.tuples(st.text(st.characters(min_codepoint=97,
                                                max_codepoint=122),
                                  min_size=1, max_size=30),
                          st.binary(max_size=1200)),
                min_size=1, max_size=8))
def test_tar_roundtrip_property(members):
    import io
    import tarfile

    from geoio_jl_spark.sources import archive
    uniq = [(f"{n}_{i}", d) for i, (n, d) in enumerate(members)]
    bio = io.BytesIO()
    with tarfile.open(fileobj=bio, mode="w") as t:
        for n, d in uniq:
            ti = tarfile.TarInfo(n)
            ti.size = len(d)
            t.addfile(ti, io.BytesIO(d))
    buf = bio.getvalue()
    got = archive.tar_entries(buf)
    assert [g[0] for g in got] == [n for n, _ in uniq]
    for (name, off, size), (_, d) in zip(got, uniq):
        assert buf[off:off + size] == d
