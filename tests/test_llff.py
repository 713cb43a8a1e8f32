"""LLFF loader tests on a synthetic forward-facing capture."""

import os

import numpy as np
import pytest

from robir_tpu.data.llff import (LLFFConfig, LLFFScene, convert_to_ndc,
                                 recenter_poses, spiral_path)


def _make_llff_scene(tmp_path, n=10, h=32, w=40):
    from PIL import Image
    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "images", exist_ok=True)
    focal = 50.0
    rows = []
    for i in range(n):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"{i:03d}.png")
        # forward-facing camera near z=0 looking along -z, LLFF raw layout
        # columns [down, right, back] with hwf appended
        t = np.array([0.3 * (i - n / 2) / n, 0.02 * i, 0.1 * rng.random()])
        right = np.array([1.0, 0, 0])
        down = np.array([0, -1.0, 0])
        back = np.array([0, 0, 1.0])
        m = np.stack([down, right, back], 1)  # [3,3] columns in raw order
        pose = np.concatenate([m, t[:, None], np.array([[h], [w], [focal]])], 1)
        near, far = 2.0 + 0.1 * i, 12.0
        rows.append(np.concatenate([pose.ravel(), [near, far]]))
    np.save(tmp_path / "poses_bounds.npy", np.stack(rows))
    return focal


def test_llff_loads_and_splits(tmp_path):
    _make_llff_scene(tmp_path)
    train = LLFFScene(LLFFConfig(data_dir=str(tmp_path)), "train")
    test = LLFFScene(LLFFConfig(data_dir=str(tmp_path)), "test")
    assert train.n_images + test.n_images == 10
    assert test.n_images == 2  # every 8th of 10
    b = train.sample(np.random.default_rng(1), 64)
    assert b.origins.shape == (64, 3) and b.pixels.shape == (64, 3)
    assert np.isfinite(b.origins).all() and np.isfinite(b.directions).all()
    # NDC rays live in the unit-ish cube along z
    assert b.origins[:, 2].min() > -1.5 and b.origins[:, 2].max() < 1.5
    # render path generated for forward-facing captures
    assert train.render_poses.shape[1:] == (3, 4)


def test_ndc_conversion_properties():
    """NDC: rays starting on the near plane map to o2 ~ -1 + 2n/oz; the
    far plane (z -> -inf) maps to depth 1 along the converted ray."""
    rng = np.random.default_rng(2)
    o = np.array([[0.0, 0.0, 0.0]], np.float32)
    d = np.array([[0.1, -0.05, -1.0]], np.float32)
    ndc_o, ndc_d = convert_to_ndc(o, d, focal=50.0, w=100, h=100, near=1.0)
    # origin sits on the near plane: o2 = 1 + 2*near/oz with oz = -near -> -1
    assert ndc_o[0, 2] == pytest.approx(-1.0, abs=1e-5)
    # marching t=1 along the ndc ray reaches z_ndc = 1 (infinity)
    assert (ndc_o[0, 2] + ndc_d[0, 2]) == pytest.approx(1.0, abs=1e-5)


def test_recenter_poses_centers():
    rng = np.random.default_rng(3)
    poses = np.tile(np.eye(3, 5, dtype=np.float32)[None], (6, 1, 1))
    poses[:, :3, 3] = rng.standard_normal((6, 3)) + 5.0
    out = recenter_poses(poses)
    assert np.abs(out[:, :3, 3].mean(0)).max() < 1e-4


def test_spiral_path_shape():
    poses = np.tile(np.eye(3, 5, dtype=np.float32)[None], (4, 1, 1))
    poses[:, 2, 4] = 50.0
    poses[:, :3, 3] = np.random.default_rng(4).standard_normal((4, 3)) * 0.1
    bds = np.array([[2.0, 10.0]] * 4)
    path = spiral_path(poses, bds, n_frames=30)
    assert path.shape == (30, 3, 4)
    assert np.isfinite(path).all()


def test_multicam_loader(tmp_path):
    """Multicam metadata.json with two different-resolution cameras."""
    import json
    from PIL import Image
    from robir_tpu.data.multicam import MulticamConfig, MulticamScene
    rng = np.random.default_rng(5)
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    meta = {"train": {"file_path": [], "pix2cam": [], "cam2world": [],
                      "width": [], "height": [], "lossmult": [],
                      "near": [], "far": []}}
    for i, (h, w) in enumerate([(16, 20), (24, 30)]):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "imgs" / f"{i}.png")
        focal = 0.5 * w
        pix2cam = np.linalg.inv(np.array(
            [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]]))
        c2w = np.eye(4)[:3]
        c2w[:, 3] = [0, 0, 2.0 + i]
        m = meta["train"]
        m["file_path"].append(f"imgs/{i}.png")
        m["pix2cam"].append(pix2cam.tolist())
        m["cam2world"].append(c2w.tolist())
        m["width"].append(w)
        m["height"].append(h)
        m["lossmult"].append(1.0)
        m["near"].append(1.0)
        m["far"].append(6.0)
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump(meta, f)

    scene = MulticamScene(MulticamConfig(dataset_dir=str(tmp_path)))
    assert scene.n_images == 2
    assert scene.flat.origins.shape[0] == 16 * 20 + 24 * 30
    b = scene.sample(np.random.default_rng(0), 32)
    assert b.pixels.shape == (32, 3)
    np.testing.assert_allclose(np.linalg.norm(b.viewdirs, axis=-1), 1.0,
                               rtol=1e-5)
    r0 = scene.image_rays(0)
    assert r0.origins.shape[0] == 16 * 20
    # origins at the camera centers
    np.testing.assert_allclose(r0.origins[0], [0, 0, 2.0], atol=1e-6)
