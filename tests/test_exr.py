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
