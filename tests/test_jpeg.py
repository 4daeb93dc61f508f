"""Baseline JPEG codec tests (reference io/images.jl: load image.jpg,
save, reload, PSNR equality)."""

from __future__ import annotations

import numpy as np
import pytest

from geoio_jl_spark.sources import jpeg


@pytest.fixture(scope="module")
def fixture_img():
    with open("/root/reference/test/data/image.jpg", "rb") as f:
        return jpeg.decode(f.read())


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_decode_reference_fixture(fixture_img):
    """image.jpg: baseline 4:4:4 1800x1200 (io/images.jl:3-5)."""
    assert fixture_img.shape == (1200, 1800, 3)
    assert fixture_img.dtype == np.uint8
    means = fixture_img.mean(axis=(0, 1))
    # regression anchor on the fixed fixture bytes
    np.testing.assert_allclose(means, [100.9, 123.2, 100.9], atol=1.0)


def test_save_reload_psnr(fixture_img):
    """io/images.jl:12-19 psnr_equality on save round-trip."""
    crop = fixture_img[:256, :256]
    again = jpeg.decode(jpeg.encode(crop, quality=90))
    assert _psnr(crop, again) > 35.0


def test_grayscale_roundtrip():
    rng = np.random.default_rng(7)
    base = rng.integers(40, 200, (40, 56, 1), dtype=np.uint8)
    # smooth it so quantization error stays small
    smooth = base.astype(float)
    for _ in range(4):
        smooth = (smooth + np.roll(smooth, 1, 0) + np.roll(smooth, 1, 1)) / 3
    img = smooth.astype(np.uint8)
    out = jpeg.decode(jpeg.encode(img, quality=95))
    assert out.shape == img.shape
    assert _psnr(img, out) > 35.0


def test_odd_dimensions_pad():
    img = np.full((13, 19, 3), 77, np.uint8)
    out = jpeg.decode(jpeg.encode(img))
    assert out.shape == (13, 19, 3)
    assert int(np.abs(out.astype(int) - 77).max()) <= 2


def test_registry_dispatch_jpg(spark, tmp_path):
    """save + load through the img grid table (S8/K8 IMGEXTS parity)."""
    from geoio_jl_spark.sources import registry
    h, w = 16, 24
    y, x = np.mgrid[0:h, 0:w]
    arr = np.stack([(x * 9) % 200 + 20, (y * 7) % 200 + 20,
                    ((x + y) * 5) % 200 + 20], axis=2).astype(np.uint8)
    smooth = arr.astype(float)
    for _ in range(4):
        smooth = (smooth + np.roll(smooth, 1, 0) + np.roll(smooth, 1, 1)) / 3
    arr = smooth.astype(np.uint8)
    path = str(tmp_path / "grid.jpg")
    with open(path, "wb") as f:
        f.write(jpeg.encode(arr, quality=95))
    df = registry.load(spark, path)
    assert df.count() == h * w
    assert {"r", "g", "b"}.issubset(df.columns)
    out = str(tmp_path / "resaved.jpg")
    registry.save(df, out)
    df2 = registry.load(spark, out)
    assert df2.count() == h * w
