"""AVI/MJPEG container + IMA ADPCM codec tests.

The ADPCM differential: a deliberately naive scalar decoder written
straight from the IMA spec text (no shared code with the vectorized
implementation) must agree bit-for-bit with sources/adpcm.decode_blocks.
The AVI differential: frames extracted through the container must be
byte-identical to the JPEG blobs that went in, and decode through the
engine's own JPEG codec."""

import struct

import numpy as np
import pytest

from geoio_jl_spark.sources import adpcm, avi, jpeg

# ---------------------------------------------------------------------------
# independent scalar IMA ADPCM decoder (spec transcription, test-only)
# ---------------------------------------------------------------------------

_STEPS = adpcm.STEP_TABLE.tolist()
_IDX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _scalar_decode(data: bytes, nch: int, block_align: int):
    out = [[] for _ in range(nch)]
    for b0 in range(0, len(data) - block_align + 1, block_align):
        blk = data[b0:b0 + block_align]
        preds, idxs = [], []
        for c in range(nch):
            p, i, _r = struct.unpack_from("<hBB", blk, 4 * c)
            preds.append(p)
            idxs.append(min(max(i, 0), 88))
            out[c].append(p)
        body = blk[4 * nch:]
        # walk 4-byte groups, channel-interleaved
        for g0 in range(0, len(body) - 4 * nch + 1, 4 * nch):
            for c in range(nch):
                four = body[g0 + 4 * c: g0 + 4 * c + 4]
                for byte in four:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = _STEPS[idxs[c]]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        p = preds[c] + (-diff if nib & 8 else diff)
                        p = min(32767, max(-32768, p))
                        preds[c] = p
                        idxs[c] = min(88, max(0, idxs[c] + _IDX[nib & 7]))
                        out[c].append(p)
    n = min(len(o) for o in out) if out else 0
    return np.array([o[:n] for o in out], np.int16).T


def test_adpcm_vectorized_matches_scalar_mono():
    rng = np.random.default_rng(1)
    pcm = (np.cumsum(rng.integers(-800, 800, size=2021))
           .clip(-32768, 32767).astype(np.int16)[:, None])
    data, balign = adpcm.encode_blocks(pcm, spb=505)
    fast = adpcm.decode_blocks(data, 1, balign)
    slow = _scalar_decode(data, 1, balign)
    np.testing.assert_array_equal(fast, slow)


def test_adpcm_vectorized_matches_scalar_stereo():
    rng = np.random.default_rng(2)
    pcm = (np.cumsum(rng.integers(-500, 500, size=(1011, 2)), axis=0)
           .clip(-32768, 32767).astype(np.int16))
    data, balign = adpcm.encode_blocks(pcm, spb=505)
    fast = adpcm.decode_blocks(data, 2, balign)
    slow = _scalar_decode(data, 2, balign)
    np.testing.assert_array_equal(fast, slow)


def test_adpcm_snr_on_sine():
    t = np.arange(8000) / 16000.0
    x = 0.6 * np.sin(2 * np.pi * 440 * t)
    buf = adpcm.encode_wav_adpcm(x, rate=16000)
    y, rate = adpcm.decode_wav_adpcm(buf)
    assert rate == 16000
    assert y.shape == (8000, 1)
    err = y[:, 0] - x
    snr = 10 * np.log10((x ** 2).mean() / max((err ** 2).mean(), 1e-12))
    assert snr > 25.0, f"ADPCM SNR too low: {snr:.1f} dB"


def test_adpcm_fact_truncates_padding():
    x = np.linspace(-0.5, 0.5, 777)          # not a multiple of spb
    buf = adpcm.encode_wav_adpcm(x, rate=8000, spb=33)
    y, _ = adpcm.decode_wav_adpcm(buf)
    assert y.shape == (777, 1)               # fact chunk honored


def test_adpcm_rejects_pcm_wav():
    from geoio_jl_spark.operators.multimodal import encode_wav
    pcm_wav = encode_wav(np.zeros(100), rate=8000)
    with pytest.raises(ValueError, match="not IMA ADPCM"):
        adpcm.decode_wav_adpcm(pcm_wav)


def test_adpcm_dispatch_in_decode_audio():
    from geoio_jl_spark.operators.multimodal import decode_audio
    t = np.arange(4000) / 8000.0
    x = 0.4 * np.sin(2 * np.pi * 220 * t)
    a, rate = decode_audio(adpcm.encode_wav_adpcm(x, rate=8000))
    assert rate == 8000 and a.shape == (4000, 1)
    assert np.abs(a[:, 0] - x).max() < 0.05


# ---------------------------------------------------------------------------
# AVI / MJPEG
# ---------------------------------------------------------------------------

def _frames(n=6, h=24, w=32, seed=3):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return [np.roll(base, 4 * i, axis=1) for i in range(n)]


def test_avi_probe():
    buf = avi.encode_mjpeg(_frames(), fps=12)
    meta = avi.probe(buf)
    assert meta == {"codec": "MJPG", "width": 32, "height": 24,
                    "fps": 12, "n_frames": 6}


def test_avi_frame_chunks_are_byte_identical_jpegs():
    frames = _frames()
    blobs = [jpeg.encode(f, quality=90) for f in frames]
    buf = avi.encode_mjpeg(frames, fps=10, quality=90)
    chunks = avi.frame_chunks(buf)
    assert len(chunks) == len(frames)
    for (off, ln), blob in zip(chunks, blobs):
        assert buf[off:off + ln] == blob


def test_avi_decode_frames_via_own_jpeg_codec():
    frames = _frames(n=4)
    buf = avi.encode_mjpeg(frames, quality=95)
    out = avi.decode_frames(buf)
    assert len(out) == 4
    for got, orig in zip(out, frames):
        assert got.shape == orig.shape
        mse = ((got.astype(float) - orig.astype(float)) ** 2).mean()
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
        assert psnr > 25.0


def test_avi_every_k_skips_decode():
    frames = _frames(n=7)
    buf = avi.encode_mjpeg(frames)
    out = avi.decode_frames(buf, every_k=3)
    assert len(out) == 3                     # frames 0, 3, 6
    full = avi.decode_frames(buf)
    for got, want in zip(out, full[::3]):
        np.testing.assert_array_equal(got, want)


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError, match="not an AVI"):
        avi.probe(b"RIFF\x04\x00\x00\x00WAVE")


def test_avi_odd_sized_chunk_padding():
    """A JPEG blob with odd length must not desync the RIFF walk."""
    frames = _frames(n=3, h=17, w=19, seed=9)
    buf = avi.encode_mjpeg(frames, quality=77)
    chunks = avi.frame_chunks(buf)
    assert len(chunks) == 3
    for off, ln in chunks:
        assert buf[off:off + 2] == b"\xff\xd8"   # SOI at every offset
