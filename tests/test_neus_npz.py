"""cameras_sphere.npz datasets: projective round-trip consistency."""

import os

import numpy as np
import pytest

from robir_tpu.data.neus_npz import (DTUConfig, DTUSceneDataset, NeuSNpzConfig,

                                     NeuSNpzDataset, load_K_Rt_from_P)


pytestmark = pytest.mark.slow


def _make_scene(tmp_path, n=6, h=40, w=48):
    """Synthetic cameras_sphere.npz scene: OpenCV cameras in a ring looking
    at the origin + random images/masks."""
    import cv2
    rng = np.random.default_rng(0)
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32)
    os.makedirs(tmp_path / "image", exist_ok=True)
    os.makedirs(tmp_path / "mask", exist_ok=True)
    cams = {}
    poses = []
    for i in range(n):
        theta = 2 * np.pi * i / n
        center = 3.0 * np.array([np.cos(theta), np.sin(theta), 0.4], np.float32)
        # OpenCV camera: z forward toward origin, y down
        z = -center / np.linalg.norm(center)
        x = np.cross(np.array([0, 0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_w2c = np.stack([x, y, z], 0).astype(np.float32)
        t_w2c = (-R_w2c @ center).astype(np.float32)
        P = K @ np.concatenate([R_w2c, t_w2c[:, None]], 1)
        world_mat = np.eye(4, dtype=np.float32)
        world_mat[:3, :4] = P
        cams[f"world_mat_{i}"] = world_mat
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "image" / f"{i:03d}.png"), img)
        cv2.imwrite(str(tmp_path / "mask" / f"{i:03d}.png"),
                    np.full((h, w, 3), 255, np.uint8))
        poses.append((R_w2c, t_w2c, center))
    np.savez(tmp_path / "cameras_sphere.npz", **cams)
    return K, poses


def test_decompose_roundtrip(tmp_path):
    K, poses = _make_scene(tmp_path)
    R_w2c, t_w2c, center = poses[0]
    P = K @ np.concatenate([R_w2c, t_w2c[:, None]], 1)
    K4, pose = load_K_Rt_from_P(P)
    np.testing.assert_allclose(K4[:3, :3], K, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pose[:3, 3], center, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pose[:3, :3], R_w2c.T, rtol=1e-4, atol=1e-5)


class TestNeuSNpz:
    def test_ray_projection_roundtrip(self, tmp_path):
        K, poses = _make_scene(tmp_path)
        ds = NeuSNpzDataset(NeuSNpzConfig(data_dir=str(tmp_path)))
        assert ds.n_images == 6 and ds.images.shape[1:] == (40, 48, 3)
        # project a world point, then the ray at that pixel must pass it
        X = np.array([0.2, -0.1, 0.1], np.float32)
        for i in range(ds.n_images):
            R_w2c, t_w2c, center = poses[i]
            xc = R_w2c @ X + t_w2c
            uv = (K @ xc)[:2] / (K @ xc)[2]
            o, v = ds.gen_rays_at(i)
            px, py = int(round(uv[0])), int(round(uv[1]))
            if not (0 <= px < 48 and 0 <= py < 40):
                continue
            ray_o, ray_d = o[py, px], v[py, px]
            t = np.dot(X - ray_o, ray_d)
            dist = np.linalg.norm(ray_o + t * ray_d - X)
            assert dist < 0.05, (i, dist)  # within a pixel's footprint

    def test_random_rays_and_near_far(self, tmp_path):
        _make_scene(tmp_path)
        ds = NeuSNpzDataset(NeuSNpzConfig(data_dir=str(tmp_path)))
        b = ds.gen_random_rays_at(np.random.default_rng(1), 0, 64)
        assert b["origins"].shape == (64, 3) and b["rgb"].shape == (64, 3)
        np.testing.assert_allclose(np.linalg.norm(b["dirs"], axis=-1), 1.0,
                                   rtol=1e-5)
        near, far = ds.near_far_from_sphere(b["origins"], b["dirs"])
        assert (far - near == pytest.approx(2.0)) or np.allclose(far - near, 2.0)
        # camera is at radius 3 -> near ~ 2, far ~ 4 for centered rays
        assert 1.0 < near.mean() < 3.0

    def test_slerp_between(self, tmp_path):
        _make_scene(tmp_path)
        ds = NeuSNpzDataset(NeuSNpzConfig(data_dir=str(tmp_path)))
        o0, _ = ds.gen_rays_at(0)
        o_mid, v_mid = ds.gen_rays_between(0, 1, 0.5)
        o1, _ = ds.gen_rays_at(1)
        # midpoint camera sits between the two endpoints
        d_total = np.linalg.norm(o0[0, 0] - o1[0, 0])
        assert np.linalg.norm(o_mid[0, 0] - o0[0, 0]) < d_total
        assert np.linalg.norm(o_mid[0, 0] - o1[0, 0]) < d_total
        # poses restored after the call
        o0_again, _ = ds.gen_rays_at(0)
        np.testing.assert_array_equal(o0, o0_again)


class TestDTUScene:
    def test_syn_interface(self, tmp_path):
        _make_scene(tmp_path)
        ds = DTUSceneDataset(DTUConfig(data_dir=str(tmp_path)))
        assert ds.n_cameras == 6
        b = ds.sample_pixels(np.random.default_rng(2), 0, 32)
        assert b["points"].shape == (32, 3) and b["rgb"].shape == (32, 3)
        np.testing.assert_allclose(np.linalg.norm(b["dirs"], axis=-1), 1.0,
                                   rtol=1e-5)
        # cameras scaled x0.5: origins at radius ~1.5
        r = np.linalg.norm(b["points"][0])
        assert 1.2 < r < 1.8
        # rays aim roughly at the origin
        t_ca = -np.sum(b["points"] * b["dirs"], -1)
        closest = np.linalg.norm(b["points"] + t_ca[:, None] * b["dirs"], axis=-1)
        assert closest.mean() < 0.7


class TestNeuSNpzScene:
    """Stage-1 adapter (NeuSDatasetWrapper parity, interface.py:182-243)."""

    def test_train_batch_shapes(self, tmp_path):
        from robir_tpu.data.neus_npz import NeuSNpzScene, NeuSNpzSceneConfig
        _make_scene(tmp_path)
        sc = NeuSNpzScene(NeuSNpzSceneConfig(dataset_dir=str(tmp_path),
                                             batch_size=32))
        b = sc.sample(np.random.default_rng(0))
        assert b.origins.shape == (32, 3) and b.pixels.shape == (32, 3)
        # sphere near/far (reference near_far_from_sphere): far - near = 2
        np.testing.assert_allclose(b.far - b.near, 2.0, rtol=1e-5)
        # lossmult carries the object mask
        assert b.lossmult.shape == (32, 1)
        assert np.all(b.radii == 0.0)

    def test_eval_rays_align_with_images(self, tmp_path):
        from robir_tpu.data.neus_npz import NeuSNpzScene, NeuSNpzSceneConfig
        _make_scene(tmp_path)
        sc = NeuSNpzScene(NeuSNpzSceneConfig(dataset_dir=str(tmp_path),
                                             test_resolution_level=2), "test")
        assert (sc.h, sc.w) == (20, 24)
        full = sc.image_rays(0)
        assert full.origins.shape == (sc.h * sc.w, 3)
        assert full.pixels.shape == (sc.h * sc.w, 3)
        np.testing.assert_allclose(
            np.linalg.norm(full.viewdirs, axis=-1), 1.0, rtol=1e-5)

    def test_trainer_smoke(self, tmp_path):
        """A few NeuS train steps on the npz scene reach finite loss
        (the stage-1 DTU path of neus/config/dtu/*.gin)."""
        from robir_tpu.data.neus_npz import NeuSNpzScene, NeuSNpzSceneConfig
        from robir_tpu.fields.neus_model import NeuSConfig
        from robir_tpu.fields.radiance import RenderingConfig
        from robir_tpu.fields.sdf import SDFConfig
        from robir_tpu.render.neus import NeusRenderConfig
        from robir_tpu.stages.neus_stage import NeusTrainConfig, NeusTrainer

        _make_scene(tmp_path)
        sc = NeuSNpzScene(NeuSNpzSceneConfig(dataset_dir=str(tmp_path),
                                             batch_size=8))
        model_cfg = NeuSConfig(
            sdf=SDFConfig(d_in=3, d_out=17, d_hidden=16, n_layers=2,
                          skip_in=(), multires=2),
            color=RenderingConfig(d_feature=16, mode="idr", d_in=9, d_out=3,
                                  d_hidden=16, n_layers=2, multires_view=2))
        render_cfg = NeusRenderConfig(n_samples=8, n_importance=4,
                                      up_sample_steps=2, white_bkgd=False)
        tr = NeusTrainer(sc, model_cfg, render_cfg,
                         NeusTrainConfig(batch_size=8, max_steps=10),
                         log_dir=str(tmp_path / "logs"), seed=0)
        m = tr.run(3)
        assert np.isfinite(m["loss"])
