"""Texture pipeline + focus sampler on the procedural sphere scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.data.syn_dataset import SynDataset, SynDatasetConfig
from robir_tpu.data.synthetic import make_sphere_dataset
from robir_tpu.texture.focus_sampler import (TexSpaceSampler,
                                             focus_sampler_from_dataset)
from robir_tpu.texture.mesh import extract_mesh
from robir_tpu.texture.pipeline import TexSampler, erode_map
from robir_tpu.tracing.grid import GridConfig, SDFGrid

RADIUS = 0.5  # world (stage-1) radius; stage-2 sees 0.25 after pose /2


def sphere_sdf(x):
    return jnp.linalg.norm(x, axis=-1) - RADIUS


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("syn"))
    make_sphere_dataset(d, n_train=10, n_test=2, h=64, w=64, radius=RADIUS)
    return d


@pytest.fixture(scope="module")
def mesh_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("mesh")
    mesh = extract_mesh(sphere_sdf, resolution=64,
                        bbox_min=(-0.7,) * 3, bbox_max=(0.7,) * 3)
    p = str(d / "mesh.ply")
    mesh.export_ply(p)
    return p


def test_erode_map_fills_boundary():
    img = np.zeros((8, 8, 3), np.float32)
    mask = np.zeros((8, 8, 3), np.float32)
    img[2:6, 2:6] = 5.0
    mask[2:6, 2:6] = 1.0
    out = erode_map(img, mask, iterations=1)
    assert out[1, 2, 0] == pytest.approx(5.0)  # dilated into the border
    assert out[0, 0, 0] == 0.0                  # far texels untouched
    np.testing.assert_array_equal(out[2:6, 2:6], img[2:6, 2:6])


class TestTexSampler:
    def test_samples_on_surface(self, mesh_path):
        ts = TexSampler(mesh_path, resolution=512)
        rng = np.random.default_rng(0)
        s = ts.sample(rng, 2000)
        m = s["object_mask"]
        assert m.mean() > 0.05
        # x is in stage-2 coords (x0.5): sphere of radius 0.25
        sd = np.abs(np.asarray(sphere_sdf(jnp.asarray(s["x"][m] * 2.0))))
        assert np.median(sd) < 0.01
        # normals point outward
        n = s["normal"][m]
        want = s["x"][m] / np.linalg.norm(s["x"][m], axis=-1, keepdims=True)
        assert (np.sum(n * want, -1) > 0.9).mean() > 0.95
        # tangents orthogonal-ish to normals
        dot_u = np.abs(np.sum(s["tangent_u"][m] * n, -1))
        assert np.median(dot_u) < 0.2


class TestFocusSampler:
    def test_projection_roundtrip(self, scene_dir):
        """Points projected into a camera must reproject along the sampled
        view_dir (the reference's own inv-sampler check,
        focus_sampler.py:229-235)."""
        ds = SynDataset(SynDatasetConfig(instance_dir=scene_dir))
        fs = focus_sampler_from_dataset(ds)
        rng = np.random.default_rng(1)
        x = rng.standard_normal((50, 3)).astype(np.float32)
        x = x / np.linalg.norm(x, axis=-1, keepdims=True) * 0.25
        sample, gt = fs.scatter_sample(x)
        # recast: cam_loc + t * view_dir should reach x
        for m in range(0, fs.n_cameras, 3):
            d = sample["view_dir"][m]
            t = np.sum((x - fs.cam_loc[m]) * d, -1)
            recon = fs.cam_loc[m] + t[:, None] * d
            err = np.linalg.norm(recon - x, axis=-1)
            assert err.max() < 1e-5
        # most on-sphere points are inside at least half the camera masks
        assert sample["object_mask"].mean() > 0.5
        assert gt["rgb"].shape == (fs.n_cameras, 50, 3)

    def test_projected_color_matches_gt(self, scene_dir):
        """Sample the image at the projection of a surface point and compare
        with the analytic shading at that point."""
        ds = SynDataset(SynDatasetConfig(instance_dir=scene_dir))
        fs = focus_sampler_from_dataset(ds)
        # front-facing point toward camera 0
        cam = fs.cam_loc[0]
        p = cam / np.linalg.norm(cam) * 0.25
        sample, gt = fs.scatter_sample(p[None].astype(np.float32))
        assert sample["object_mask"][0, 0]
        rgb = gt["rgb"][0, 0]
        # analytic lambert shading (synthetic.py render_sphere_gt), linearized
        n = p / np.linalg.norm(p) if np.linalg.norm(p) > 0 else p
        light = np.array([0.5, 0.3, 0.8])
        light = light / np.linalg.norm(light)
        # world-space normal is p*2 normalized = same direction
        lam = np.clip(n @ light, 0, 1) * 0.8 + 0.2
        want = (lam * np.array([0.8, 0.3, 0.2])) ** 2.2  # load_rgb gamma
        np.testing.assert_allclose(rgb, want, atol=0.05)


class TestTexSpaceSampler:
    def test_data_batch(self, scene_dir, mesh_path):
        ds = SynDataset(SynDatasetConfig(instance_dir=scene_dir))
        fs = focus_sampler_from_dataset(ds)
        ts = TexSampler(mesh_path, resolution=512)
        grid = SDFGrid.build(lambda x: sphere_sdf(x * 2.0) / 2.0,
                             GridConfig(resolution=96, bbox_min=(-0.35,) * 3,
                                        bbox_max=(0.35,) * 3))
        tss = TexSpaceSampler(ts, fs, jax.jit(grid.cast))
        rng = np.random.default_rng(2)
        inputs, normal, rgb = tss.data_batch(rng, 256)
        assert inputs["points"].shape == (256, 3)
        assert inputs["dirs"].shape == (256, 3)
        m = inputs["object_mask"]
        # on a convex sphere every in-mask texture point facing the camera is
        # visible; expect a healthy visible fraction
        assert m.mean() > 0.1
        # dirs point from the camera toward the points
        cam = inputs["points"][0]
        t = np.sum((0.25 * normal[m] - cam) * inputs["dirs"][m], -1)
        assert (t > 0).mean() > 0.95


def test_obj_loader_triangulates_quads(tmp_path):
    """Quad faces fan-triangulate instead of silently dropping geometry."""
    from robir_tpu.texture.pipeline import _load_obj_mesh
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                 "f 1/1 2/2 3/3 4/4\n")
    mesh = _load_obj_mesh(str(p))
    assert mesh.tris.shape == (2, 3)
    # both triangles of the quad present, total area 1.0
    a = mesh.verts[mesh.tris]
    area = 0.5 * np.abs(np.cross(a[:, 1] - a[:, 0],
                                 a[:, 2] - a[:, 0])[:, 2]).sum()
    assert area == pytest.approx(1.0)
