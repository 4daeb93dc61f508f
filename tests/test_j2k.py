"""JPEG 2000 lossless codec (sources/j2k.py) — differential tests against
the independently-written encoder in tests/j2k_encoder.py, layer by layer
(MQ coder, tag trees, code-block bit modelling, full codestream) so a
decoder bug would have to be mirrored in a second implementation to pass.
Reference role: GRIB2 template 5.40 is reached through eccodes in the
reference (src/extra/cdm.jl:5)."""

import numpy as np
import pytest

from geoio_jl_spark.sources.j2k import (
    HdrReader, J2KError, MQDecoder, TagTree, decode_codeblock, decode_j2k,
    _syn2d)
from tests.j2k_encoder import (
    HdrWriter, MQEncoder, TagTreeEnc, _encode_cblk, _fwd2d,
    encode_j2k_lossless)


def test_mq_roundtrip_random_contexts():
    rng = np.random.default_rng(0)
    for _ in range(6):
        n = int(rng.integers(1, 3000))
        ctxs = rng.integers(0, 19, n)
        bits = rng.integers(0, 2, n)
        enc = MQEncoder()
        for c, b in zip(ctxs, bits):
            enc.encode(int(c), int(b))
        dec = MQDecoder(enc.flush())
        assert [dec.decode(int(c)) for c in ctxs] == list(bits)


def test_mq_skewed_stream():
    """Mostly-MPS streams drive the state machine into the low-Qe states."""
    rng = np.random.default_rng(1)
    bits = (rng.random(5000) < 0.02).astype(int)
    enc = MQEncoder()
    for b in bits:
        enc.encode(0, int(b))
    dec = MQDecoder(enc.flush())
    assert [dec.decode(0) for _ in bits] == list(bits)


def test_dwt53_roundtrip_all_parities():
    rng = np.random.default_rng(2)
    for h, w in [(1, 1), (1, 5), (5, 1), (2, 2), (3, 3), (4, 7), (7, 4),
                 (16, 16), (13, 29)]:
        a = rng.integers(-2000, 2000, (h, w)).astype(np.int64)
        assert np.array_equal(_syn2d(*_fwd2d(a)), a)


def test_tagtree_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(30):
        w, h = (int(x) for x in rng.integers(1, 9, 2))
        vals = rng.integers(0, 7, (h, w)).tolist()
        te = TagTreeEnc(w, h, vals)
        wr = HdrWriter()
        for y in range(h):
            for x in range(w):
                te.encode_value(wr, x, y)
        rd = HdrReader(wr.flush() + b"\x00\x00", 0)
        td = TagTree(w, h)
        for y in range(h):
            for x in range(w):
                assert td.decode_value(rd, x, y) == vals[y][x]


@pytest.mark.parametrize("band", [0, 1, 2, 3])
def test_codeblock_roundtrip(band):
    rng = np.random.default_rng(10 + band)
    for _ in range(20):
        h, w = (int(x) for x in rng.integers(1, 24, 2))
        blk = rng.integers(-400, 401, (h, w)).astype(np.int64)
        nb = int(np.abs(blk).max()).bit_length()
        if nb == 0:
            continue
        data = _encode_cblk(blk, band, nb)
        out = decode_codeblock(MQDecoder(data), w, h, band, nb, 3 * nb - 2)
        assert np.array_equal(out, blk)


def test_codeblock_sparse_exercises_runlength():
    """Mostly-zero block: the cleanup pass takes the run-length branch."""
    rng = np.random.default_rng(7)
    blk = np.zeros((32, 32), np.int64)
    idx = rng.integers(0, 32, (12, 2))
    blk[idx[:, 0], idx[:, 1]] = rng.integers(-100, 100, 12)
    nb = int(np.abs(blk).max()).bit_length()
    data = _encode_cblk(blk, 3, nb)
    out = decode_codeblock(MQDecoder(data), 32, 32, 3, nb, 3 * nb - 2)
    assert np.array_equal(out, blk)


@pytest.mark.parametrize("levels,cb_exp", [(0, 2), (1, 4), (2, 2), (3, 6)])
def test_codestream_roundtrip(levels, cb_exp):
    rng = np.random.default_rng(100 * levels + cb_exp)
    for _ in range(6):
        h, w = (int(x) for x in rng.integers(1, 50, 2))
        depth = int(rng.integers(2, 17))
        img = rng.integers(0, 1 << depth, (h, w)).astype(np.int64)
        cs = encode_j2k_lossless(img, depth, levels=levels, cb_exp=cb_exp)
        out, info = decode_j2k(cs)
        assert np.array_equal(out, img)
        assert (info["width"], info["height"]) == (w, h)


def test_codestream_smooth_field():
    """GRIB-like smooth field, production-shaped parameters (64×64
    code-blocks, 3 decomposition levels, 12-bit)."""
    yy, xx = np.mgrid[0:40, 0:57]
    img = np.clip((1000 + 500 * np.sin(xx / 7.0) * np.cos(yy / 5.0))
                  .astype(np.int64), 0, 4095)
    cs = encode_j2k_lossless(img, 12, levels=3, cb_exp=6)
    out, _ = decode_j2k(cs)
    assert np.array_equal(out, img)
    # wavelet coding should beat raw 12-bit packing on a smooth field
    assert len(cs) < img.size * 12 / 8


def test_not_a_codestream_raises():
    with pytest.raises(J2KError, match="SOC"):
        decode_j2k(b"\x89PNG\r\n\x1a\n")


def test_irreversible_wavelet_rejected():
    img = np.zeros((4, 4), np.int64)
    cs = bytearray(encode_j2k_lossless(img, 8, levels=0))
    # COD SPcod wavelet byte: SOC(2)+SIZ(2+2+39)+COD marker(2)+len(2)
    # + Scod(1)+SGcod(4)+levels(1)+cbw(1)+cbh(1)+style(1) → wavelet next
    off = 2 + 43 + 4 + 9
    assert cs[off] == 1
    cs[off] = 0  # claim 9/7
    with pytest.raises(J2KError, match="9/7"):
        decode_j2k(bytes(cs))


def test_corrupt_streams_fail_cleanly():
    """Truncations and byte flips of a valid codestream must raise (any
    exception type) promptly — never hang or return silently-wrong
    sizes.  Tier-1 bit corruption inside a codeblock segment can decode
    to different values (MQ streams carry no checksum, matching other
    J2K decoders), so only structural damage is asserted here."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16)).astype(np.int64)
    cs = encode_j2k_lossless(img, 8, levels=2, cb_exp=4)
    # truncations in the marker/header region must raise
    for cut in (1, 3, 10, 40, 60):
        with pytest.raises(Exception):
            decode_j2k(cs[:cut])
    # header byte flips: either a named failure or a (16, 16) result —
    # never a crash-free wrong-shaped array
    for pos in range(2, 100, 7):
        bad = bytearray(cs)
        bad[pos] ^= 0xFF
        try:
            out, info = decode_j2k(bytes(bad))
        except Exception:
            continue
        assert out.shape[0] * out.shape[1] == info["width"] * info["height"]


def test_decoder_rejects_unsupported_shapes():
    img = np.zeros((8, 8), np.int64)
    cs = bytearray(encode_j2k_lossless(img, 8, levels=1))
    # flip Csiz (component count) at SIZ offset: SOC(2)+marker(2)+len(2)
    # + 34 bytes → Csiz at 2+4+34 = 40
    two = bytearray(cs)
    two[41] = 2
    with pytest.raises(J2KError, match="components"):
        decode_j2k(bytes(two))


def test_tilepart_param_marker_rejected():
    """A PPT/COC/QCC in the tile-part header changes decoding parameters
    — skipping it silently would mis-decode, so it must raise."""
    img = np.zeros((4, 4), np.int64)
    cs = bytearray(encode_j2k_lossless(img, 8, levels=0))
    sot = cs.index(b"\xff\x90")
    sod = cs.index(b"\xff\x93", sot)
    ppt = b"\xff\x61\x00\x03\x00"          # PPT, Lppt=3, index 0
    cs2 = bytes(cs[:sod]) + ppt + bytes(cs[sod:])
    # fix Psot (tile-part length grew)
    import struct as _s
    psot = _s.unpack_from(">I", cs2, sot + 6)[0]
    cs2 = bytearray(cs2)
    _s.pack_into(">I", cs2, sot + 6, psot + len(ppt))
    with pytest.raises(J2KError, match="tile-part header marker 0xFF61"):
        decode_j2k(bytes(cs2))


def test_truncated_input_raises_named_error():
    img = np.arange(64, dtype=np.int64).reshape(8, 8) % 256
    cs = encode_j2k_lossless(img, 8, levels=1)
    for cut in (3, 7, 21, 45, len(cs) // 2):
        with pytest.raises(J2KError):
            decode_j2k(cs[:cut])
