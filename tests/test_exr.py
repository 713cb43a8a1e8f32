import numpy as np
import pytest

from robir_tpu.utils.exr import read_exr, write_exr
from tests.conftest import has_reference


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((37, 53, 3)).astype(np.float32) ** 2
    path = str(tmp_path / "x.exr")
    write_exr(path, img)
    out = read_exr(path)
    np.testing.assert_array_equal(img, out)


def test_roundtrip_single_channel(tmp_path):
    img = np.linspace(0, 10, 64 * 64, dtype=np.float32).reshape(64, 64)
    path = str(tmp_path / "y.exr")
    write_exr(path, img)
    out = read_exr(path)
    np.testing.assert_array_equal(img[..., None], out)


@pytest.mark.skipif(not has_reference(), reason="reference assets not mounted")
def test_read_reference_envmap():
    img = read_exr("/root/reference/envmaps/envmap3.exr")
    assert img.shape == (250, 500, 3)
    assert img.dtype == np.float32
    # sane HDR radiance values
    assert 0.0 <= img.min() and img.max() <= 100.0
    assert 0.1 < img.mean() < 10.0


@pytest.mark.skipif(not has_reference(), reason="reference assets not mounted")
def test_piz_decode_against_preview_oracle():
    """envmap6.exr is PIZ-compressed; the repo ships a tonemapped preview
    PNG of the same data (top half of envmap6/log_im_128.png) rendered by
    the reference itself — an independent decode oracle."""
    import cv2
    from PIL import Image
    img = read_exr("/root/reference/envmaps/envmap6.exr")
    assert img.shape == (512, 1024, 4)
    small = cv2.resize(img[..., :3], (512, 256), interpolation=cv2.INTER_AREA)
    tone = np.clip(np.power(np.clip(small, 0, None), 1 / 2.2), 0, 1)
    png = np.asarray(Image.open(
        "/root/reference/envmaps/envmap6/log_im_128.png"), dtype=np.float32) / 255
    assert np.abs(tone - png[:256, :, :3]).mean() < 0.02


@pytest.mark.skipif(not has_reference(), reason="reference assets not mounted")
def test_piz_decode_envmap12():
    img = read_exr("/root/reference/envmaps/envmap12.exr")
    assert img.shape == (512, 1024, 3)
    assert img.min() >= 0 and 0.01 < img.mean() < 10


def test_piz_write_roundtrip(tmp_path):
    """PIZ encode -> decode is bit-exact at HALF precision, across odd
    sizes, channel counts, and incompressible (noise) content."""
    rng = np.random.default_rng(7)
    for shape in [(37, 41, 3), (64, 64, 4), (1, 7, 1), (200, 100, 3)]:
        x = (rng.random(shape) * 8).astype(np.float32)
        p = str(tmp_path / "t.exr")
        write_exr(p, x, compression="piz")
        y = read_exr(p)
        np.testing.assert_array_equal(
            y, x.astype(np.float16).astype(np.float32))


@pytest.mark.skipif(not has_reference(), reason="reference assets not mounted")
def test_piz_write_reference_envmap(tmp_path):
    """Re-encode a reference HDR asset with PIZ; decode matches the
    half-cast original exactly and the file beats ZIP-float32 size."""
    import os
    env = read_exr("/root/reference/envmaps/envmap3.exr")
    p_piz = str(tmp_path / "piz.exr")
    p_zip = str(tmp_path / "zip.exr")
    write_exr(p_piz, env, compression="piz")
    write_exr(p_zip, env)
    back = read_exr(p_piz)
    np.testing.assert_array_equal(
        back, env.astype(np.float16).astype(np.float32))
    assert os.path.getsize(p_piz) < 0.5 * os.path.getsize(p_zip)
