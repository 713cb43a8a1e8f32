"""LLFF loader tests on a synthetic forward-facing capture."""

import os

import numpy as np
import pytest

from robir_tpu.data.llff import (LLFFConfig, LLFFScene, convert_to_ndc,

                                 recenter_poses, spiral_path)


pytestmark = pytest.mark.slow


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


def _make_multicam(tmp_path):
    """metadata.json with two different-resolution cameras per split."""
    import json
    from PIL import Image
    rng = np.random.default_rng(5)
    os.makedirs(tmp_path / "imgs", exist_ok=True)
    meta = {}
    n = 0
    for split in ("train", "test"):
        meta[split] = {"file_path": [], "pix2cam": [], "cam2world": [],
                       "width": [], "height": [], "lossmult": [],
                       "near": [], "far": []}
        for i, (h, w) in enumerate([(16, 20), (24, 30)]):
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(tmp_path / "imgs" / f"{n}.png")
            focal = 0.5 * w
            pix2cam = np.linalg.inv(np.array(
                [[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]]))
            c2w = np.eye(4)[:3]
            c2w[:, 3] = [0, 0, 2.0 + i]
            m = meta[split]
            m["file_path"].append(f"imgs/{n}.png")
            m["pix2cam"].append(pix2cam.tolist())
            m["cam2world"].append(c2w.tolist())
            m["width"].append(w)
            m["height"].append(h)
            m["lossmult"].append(1.0)
            m["near"].append(1.0)
            m["far"].append(6.0)
            n += 1
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump(meta, f)


def test_multicam_loader(tmp_path):
    """Multicam metadata.json with two different-resolution cameras."""
    from robir_tpu.data.multicam import MulticamConfig, MulticamScene
    _make_multicam(tmp_path)
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


def test_spherify_poses_properties():
    """Inward-facing cameras on a sphere around an off-origin point:
    after spherification the attention point is the origin, camera radii
    are ~1, and the render path circles at the camera centroid height."""
    from robir_tpu.data.llff import spherify_poses
    rng = np.random.default_rng(6)
    target = np.array([2.0, -1.0, 0.5])
    poses = []
    for _ in range(12):
        d = rng.standard_normal(3)
        d /= np.linalg.norm(d)
        eye = target + 4.0 * d
        back = (eye - target) / 4.0          # camera z away from target
        right = np.cross([0, 0, 1.0], back)
        right /= np.linalg.norm(right)
        up = np.cross(back, right)
        poses.append(np.stack([right, up, back, eye], 1))
    poses = np.asarray(poses, np.float32)
    bds = np.array([[2.0, 8.0]] * 12)

    out, render, new_bds = spherify_poses(poses, bds, n_frames=30)
    assert out.shape == (12, 3, 4) and render.shape == (30, 3, 4)
    # camera distances normalized to ~1
    r = np.linalg.norm(out[:, :3, 3], axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=1e-4)
    # optical axes still pass near the (new) origin
    o = out[:, :3, 3]
    z = out[:, :3, 2]
    closest = o - np.sum(o * z, -1, keepdims=True) * z
    assert np.linalg.norm(closest, axis=-1).max() < 1e-3
    # render cameras look at the origin too
    ro = render[:, :3, 3]
    rz = render[:, :3, 2]
    cos = np.sum(-rz * (-ro), -1) / np.linalg.norm(ro, axis=-1)
    assert cos.min() > 0.999
    # bounds rescaled by the same factor
    assert new_bds.shape == bds.shape and new_bds[0, 0] < bds[0, 0]


def _make_inward_llff_scene(tmp_path, n=12, h=32, w=40):
    from PIL import Image
    rng = np.random.default_rng(9)
    os.makedirs(tmp_path / "images", exist_ok=True)
    target = np.array([1.0, 0.5, -0.3])
    rows = []
    for i in range(n):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "images" / f"{i:03d}.png")
        th, ph = 2 * np.pi * i / n, 0.3 + 0.4 * rng.random()
        eye = target + 5.0 * np.array([np.cos(th) * np.cos(ph),
                                       np.sin(th) * np.cos(ph), np.sin(ph)])
        back = (eye - target) / np.linalg.norm(eye - target)
        right = np.cross([0, 0, 1.0], back)
        right /= np.linalg.norm(right)
        up = np.cross(back, right)
        m = np.stack([-up, right, back], 1)  # raw LLFF [down right back]
        pose = np.concatenate(
            [m, eye[:, None], np.array([[h], [w], [50.0]])], 1)
        rows.append(np.concatenate([pose.ravel(), [2.0, 9.0]]))
    np.save(tmp_path / "poses_bounds.npy", np.stack(rows))


def test_llff_spherify_loader(tmp_path):
    """spherify=True path through the loader: circular render path, unit
    camera radii, metric (non-NDC) rays, near/far from scaled bounds."""
    _make_inward_llff_scene(tmp_path)
    from robir_tpu.data.llff import LLFFConfig, LLFFScene
    sc = LLFFScene(LLFFConfig(data_dir=str(tmp_path), spherify=True), "train")
    assert sc.render_poses.shape == (120, 3, 4)
    r = np.linalg.norm(sc.poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=1e-4)
    b = sc.sample(np.random.default_rng(0), 16)
    assert np.isfinite(b.origins).all()
    assert float(b.near.min()) > 0


def test_llff_spherify_rejects_forward_facing(tmp_path):
    """Forward-facing capture + spherify is a config error — must raise a
    clear ValueError instead of emitting NaN poses."""
    _make_llff_scene(tmp_path)
    from robir_tpu.data.llff import LLFFConfig, LLFFScene
    with pytest.raises(ValueError, match="forward-facing"):
        LLFFScene(LLFFConfig(data_dir=str(tmp_path), spherify=True), "train")


def test_multicam_trainer_ragged_eval(tmp_path):
    """Multicam trains from the CLI dispatch and the eval/test paths
    handle per-image resolutions (image_shape hook)."""
    from robir_tpu.data.multicam import MulticamConfig, MulticamScene
    from robir_tpu.fields.vnerf import VNeRFConfig
    from robir_tpu.render.mip import MipRenderConfig
    from robir_tpu.stages.neus_stage import (NeusTrainConfig, NeusTrainer,
                                             make_stage1_bindings)

    _make_multicam(tmp_path)
    scene = MulticamScene(MulticamConfig(dataset_dir=str(tmp_path)))
    model_cfg = VNeRFConfig(width=16, depth=2, skips=(), multires=3,
                            multires_view=2, use_ipe=True, ipe_max_deg=4)
    render_cfg = MipRenderConfig(num_samples=8, n_levels=2)
    bindings = make_stage1_bindings("vnerf", "mip", model_cfg, render_cfg)
    tr = NeusTrainer(scene, model_cfg, render_cfg,
                     NeusTrainConfig(batch_size=8, max_steps=6, eval_chunk=64),
                     log_dir=str(tmp_path / "logs"), seed=0,
                     bindings=bindings)
    m = tr.run(3)
    assert np.isfinite(m["loss"])
    test_scene = MulticamScene(MulticamConfig(dataset_dir=str(tmp_path)),
                               "test")
    out0 = tr.render_image(0, scene=test_scene)
    out1 = tr.render_image(1, scene=test_scene)
    assert out0["rgb"].shape == (16, 20, 3)
    assert out1["rgb"].shape == (24, 30, 3)
    metrics = tr.test(test_scene)
    assert np.isfinite(metrics["mean_psnr"])


def test_llff_cli_dispatch(tmp_path):
    """dataset.type=llff trains from the one stage-1 CLI (mip render)."""
    import json
    from robir_tpu.cli import main
    _make_llff_scene(tmp_path)
    conf = {
        "model": {"type": "vnerf", "width": 16, "depth": 2, "skips": [],
                  "multires": 3, "multires_view": 2},
        "render": {"type": "mip", "num_samples": 8, "n_levels": 2},
        "train": {"batch_size": 8, "max_steps": 4, "eval_chunk": 64,
                  "ckpt_every": 100, "eval_every": 0},
        "dataset": {"type": "llff", "llffhold": 8},
    }
    cpath = tmp_path / "conf.json"
    cpath.write_text(json.dumps(conf))
    main(["neus", "--conf", str(cpath), "--data", str(tmp_path),
          "--log_dir", str(tmp_path / "logs"), "--n_iters", "3"])
    assert (tmp_path / "logs" / "NeuS" / "ckpt_000003.npz").exists()
