"""End-to-end stage-1 training on the procedural sphere scene.

Covers: blender loader + ray generation, pjit'd train step on an 8-device
CPU mesh, loss descent, eval render, checkpoint save/resume, and the M0
SG-fit loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.core.mesh import MeshConfig, create_mesh
from robir_tpu.data.blender import BlenderConfig, BlenderScene
from robir_tpu.data.synthetic import make_sphere_dataset
from robir_tpu.fields.neus_model import NeuSConfig
from robir_tpu.fields.radiance import RenderingConfig
from robir_tpu.fields.sdf import SDFConfig
from robir_tpu.render.neus import NeusRenderConfig
from robir_tpu.stages.neus_stage import (NeusTrainConfig, NeusTrainer)

pytestmark = pytest.mark.slow


SMALL_MODEL = NeuSConfig(
    sdf=SDFConfig(d_out=65, d_hidden=64, n_layers=4, skip_in=(2,), multires=4),
    color=RenderingConfig(d_feature=64, d_hidden=64, n_layers=2))
SMALL_RENDER = NeusRenderConfig(n_samples=16, n_importance=16, up_sample_steps=2)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sphere"))
    make_sphere_dataset(d, n_train=8, n_test=2, h=32, w=32)
    return BlenderScene(BlenderConfig(dataset_dir=d, batch_size=128), "train")


def test_blender_loader_shapes(scene):
    assert scene.images.shape == (8, 32, 32, 3)
    assert scene.masks.shape == (8, 32, 32, 1)
    b = scene.sample(np.random.default_rng(0), 64)
    assert b.origins.shape == (64, 3) and b.pixels.shape == (64, 3)
    # viewdirs unit norm
    np.testing.assert_allclose(np.linalg.norm(b.viewdirs, axis=-1), 1.0, rtol=1e-5)
    # mask is 0/1
    assert set(np.unique(b.lossmult)).issubset({0.0, 1.0})


def test_rays_hit_sphere(scene):
    """Geometric sanity: rays through mask=1 pixels pass within the sphere
    radius of the origin; mask=0 rays miss."""
    b = scene.sample(np.random.default_rng(1), 256)
    o, d = b.origins, b.viewdirs
    t_closest = -np.sum(o * d, -1)
    closest = np.linalg.norm(o + t_closest[:, None] * d, axis=-1)
    hits = b.lossmult[:, 0] > 0.5
    assert (closest[hits] < 0.52).mean() > 0.95
    assert (closest[~hits] > 0.48).mean() > 0.95


@pytest.mark.parametrize("use_mesh", [False, True])
def test_train_descends(scene, use_mesh, tmp_path):
    mesh = create_mesh(MeshConfig()) if use_mesh else None
    tcfg = NeusTrainConfig(batch_size=128, anneal_end=50, lr_init=5e-4,
                           lr_delay_steps=0, max_steps=400, eval_chunk=256)
    tr = NeusTrainer(scene, SMALL_MODEL, SMALL_RENDER, tcfg, mesh=mesh,
                     log_dir=str(tmp_path / "logs"), seed=0)
    m0 = tr.run(3, log_every=1)
    m1 = tr.run(120, log_every=1)
    assert np.isfinite(m1["loss"])
    assert m1["loss"] < m0["loss"], (m0, m1)
    assert m1["psnr"] > m0["psnr"]

    # eval render produces an image and a finite psnr
    out = tr.render_image(0)
    assert out["rgb"].shape == (32, 32, 3)
    assert np.isfinite(out["psnr"])

    # checkpoint roundtrip preserves step + params
    path = tr.save()
    tr2 = NeusTrainer(scene, SMALL_MODEL, SMALL_RENDER, tcfg, mesh=mesh,
                      log_dir=str(tmp_path / "logs"), seed=123)
    tr2.restore(path)
    assert tr2.step == tr.step
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sg_fit_descends():
    from robir_tpu.render.sg import compute_envmap
    from robir_tpu.stages.sg_fit import SGFitConfig, fit_envmap, init_lgt_sgs
    # synthetic GT from a known SG mixture
    gt_sgs = init_lgt_sgs(jax.random.PRNGKey(7), 8)
    gt = np.asarray(compute_envmap(gt_sgs, 32, 64))
    losses = []
    sgs, loss = fit_envmap(gt, SGFitConfig(num_sg=8, n_iters=300, H=32, W=64),
                           seed=1, log_every=100,
                           log_fn=lambda i, l: losses.append(l))
    assert loss < losses[0] * 0.25
    assert sgs.shape == (8, 7)


def test_shadow_dataset_has_cast_shadows(tmp_path):
    """Two-sphere scene: some big-sphere pixels facing the light must be
    darkened by the small occluder (hard cast shadow), and the blender
    loader must ingest the scene unchanged."""
    from robir_tpu.data.blender import BlenderConfig, BlenderScene
    from robir_tpu.data.synthetic import (make_shadow_dataset,
                                          render_two_sphere_gt, look_at)

    d = str(tmp_path / "shadow")
    make_shadow_dataset(d, n_train=3, n_test=1, h=48, w=48)
    scene = BlenderScene(BlenderConfig(dataset_dir=d), "train")
    assert scene.n_images == 3

    # off-axis view near the light direction: the shadow patch is visible
    # (from exactly the light axis the occluder hides its own shadow)
    ld = np.array([0.5, 0.3, 0.8]); ld = ld / np.linalg.norm(ld)
    eye = ld + np.array([0.8, -0.6, 0.2])
    eye = eye / np.linalg.norm(eye) * 3.0
    c2w = look_at(eye.astype(np.float32), np.zeros(3, np.float32))
    focal = 0.5 * 96 / np.tan(0.5 * 0.6911112070083618)
    img = render_two_sphere_gt(c2w, 96, 96, focal)
    hit = img[..., 3] > 0.5
    # shadowed big-sphere pixels: ambient only = 0.2 * albedo_r = 0.16
    red = img[..., 0][hit]
    shadow_frac = (np.abs(red - 0.2 * 0.8) < 1e-6).mean()
    assert shadow_frac > 0.02, shadow_frac   # the cast-shadow patch exists
    assert (red > 0.5).any()                 # lit region exists too


def test_cli_train_eval_protocol(tmp_path, capsys):
    """The neus CLI runs in-train eval renders + mesh extraction and a
    final test pass (video + mean PSNR + description.json) — the reference
    protocol (trainer.py:75-81, exp_runner.py:49-50). VERDICT r1 #5."""
    import glob
    import json as jsonlib
    import os
    from robir_tpu import cli
    from robir_tpu.data.synthetic import make_sphere_dataset

    d = str(tmp_path / "scene")
    make_sphere_dataset(d, n_train=6, n_test=2, h=32, w=32)
    conf = {
        "model": {"sdf": {"d_out": 33, "d_hidden": 32, "n_layers": 3,
                          "skip_in": [], "multires": 3, "bias": 0.5},
                  "color": {"d_feature": 32, "d_hidden": 32, "n_layers": 2},
                  "radius": 2.0},
        "render": {"n_samples": 16, "n_importance": 16, "up_sample_steps": 2},
        "train": {"batch_size": 64, "max_steps": 200, "lr_init": 5e-4,
                  "lr_delay_steps": 0, "eval_chunk": 256, "anneal_end": 50,
                  "eval_every": 40, "mesh_resolution": 32, "ckpt_every": 100},
        "dataset": {"batch_size": 64},
    }
    conf_path = tmp_path / "conf.json"
    conf_path.write_text(jsonlib.dumps(conf))
    log_dir = str(tmp_path / "logs")
    cli.main(["neus", "--conf", str(conf_path), "--data", d,
              "--log_dir", log_dir, "--n_iters", "90"])
    out = capsys.readouterr().out
    assert "test: " in out and "mean_psnr=" in out

    neus_dir = os.path.join(log_dir, "NeuS", "neus")  # Logger exp subdir
    # in-train eval artifacts at steps 40 and 80
    pngs = glob.glob(os.path.join(neus_dir, "plots", "test_rgb_*.png"))
    assert len(pngs) >= 2, pngs
    meshes = glob.glob(os.path.join(neus_dir, "meshes", "mesh_*.ply"))
    assert len(meshes) >= 2, meshes
    # final test pass artifacts
    vids = (glob.glob(os.path.join(neus_dir, "plots", "test_frames.mp4"))
            + glob.glob(os.path.join(neus_dir, "plots", "test_frames.gif")))
    assert vids, os.listdir(os.path.join(neus_dir, "plots"))
    desc = jsonlib.load(open(os.path.join(neus_dir, "description.json")))
    assert "mean_psnr" in desc and "render_time" in desc \
        and "rays_per_sec" in desc
