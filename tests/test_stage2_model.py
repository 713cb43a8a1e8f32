"""Stage-2 composite model: functional end-to-end checks on a sphere NeuS."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.fields.envmap_material import EnvmapMaterialConfig
from robir_tpu.fields.envmap_material import init_envmap_material
from robir_tpu.fields.neus_model import NeuSConfig, init_neus
from robir_tpu.fields.radiance import RenderingConfig
from robir_tpu.fields.sdf import SDFConfig
from robir_tpu.fields.visibility import (IndirIllumConfig, VisNetConfig,
                                         init_indirect, init_visnet)
from robir_tpu.render.color import ToneMapConfig, init_tonemap
from robir_tpu.render.stage2 import (Stage2Config, Stage2Model, stage2_forward,
                                     trace_radiance)
from robir_tpu.tracing.grid import GridConfig, build_sdf_grid

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def model():
    neus_cfg = NeuSConfig(
        sdf=SDFConfig(d_out=33, d_hidden=32, n_layers=3, skip_in=(), multires=3,
                      bias=0.5),
        color=RenderingConfig(d_feature=32, d_hidden=32, n_layers=2))
    cfg = Stage2Config(
        neus=neus_cfg,
        envmap=EnvmapMaterialConfig(multires=4, num_lgt_sgs=16,
                                    encoder_dims=(64, 64), decoder_dims=(32,)),
        indirect=IndirIllumConfig(multires=4, dims=(32, 32), num_lgt_sgs=8),
        visnet=VisNetConfig(points_multires=4, dirs_multires=4, dims=(32, 32)),
        tonemap=ToneMapConfig(hdr_mode=2),
        grid=GridConfig(resolution=96, bbox_min=(-0.6, -0.6, -0.6),
                        bbox_max=(0.6, 0.6, 0.6)))

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "implicit_network": init_neus(k1, neus_cfg),
        "envmap_material_network": init_envmap_material(k2, cfg.envmap),
        "indirect_illum_network": init_indirect(k3, cfg.indirect),
        "visibility_network": init_visnet(k4, cfg.visnet),
        "gamma": init_tonemap(cfg.tonemap),
    }
    m = Stage2Model(params, cfg)
    # bake the tracer grid from the (geometric-init ~ sphere r=0.25) SDF
    grid = build_sdf_grid(m.sdf, cfg.grid, chunk=16384)
    return Stage2Model(params, cfg, grid)


def _input_batch(n=32, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.standard_normal((n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 0.55
    d = -o / np.linalg.norm(o, axis=-1, keepdims=True)  # aim at center
    return {"points": jnp.asarray(o), "dirs": jnp.asarray(d),
            "hdr_shift": jnp.full((n, 1), 0.5)}


def test_bridge_sdf_is_halved_sphere(model):
    """The bridge queries NeuS at 2x coords and halves the output: the
    geometric-init sphere (radius ~0.5 in stage-1 coords) appears at radius
    ~0.25 in stage-2 coords."""
    d = np.array([[1.0, 0, 0]], np.float32)
    vals = [float(model.sdf(jnp.asarray(d * r))[0, 0]) for r in (0.1, 0.25, 0.5)]
    assert vals[0] < 0 < vals[2]
    assert abs(vals[1]) < 0.1


def test_forward_material(model):
    inp = _input_batch()
    out = stage2_forward(model, jax.random.PRNGKey(1), inp,
                         trainstage="Material", train_spec=True)
    n = 32
    assert out["network_object_mask"].shape == (n,)
    assert bool(jnp.all(out["network_object_mask"])), "all rays aim at the sphere"
    for k in ["sg_rgb", "indir_rgb", "sg_diffuse_rgb", "sg_specular_rgb",
              "normals", "diffuse_albedo", "normal_map", "vis_shadow"]:
        assert out[k].shape == (n, 3), k
        assert np.isfinite(np.asarray(out[k])).all(), k
    assert out["roughness"].shape == (n, 1)
    # surface points lie on the SDF zero level set (the fresh geometric-init
    # surface is only loosely spherical, so check sdf, not radius)
    s = np.abs(np.asarray(model.sdf(out["points"])))
    assert np.median(s) < 1e-3, np.median(s)
    assert (s < 0.01).mean() > 0.9  # bisection-refined hits
    # SG colors are non-negative
    assert np.asarray(out["sg_rgb"]).min() >= 0


def test_forward_illum_stage(model):
    inp = _input_batch(seed=2)
    out = stage2_forward(model, jax.random.PRNGKey(2), inp, trainstage="Illum")
    assert out["indirect_sgs"].shape == (32, 8, 7)
    assert out["indir_integral"].shape == (32, 3)
    assert out["normals"].shape == (32, 3)
    assert "sg_rgb" not in out


def test_trace_radiance(model):
    inp = _input_batch(seed=3)
    fwd = stage2_forward(model, jax.random.PRNGKey(3), inp, trainstage="Illum")
    tr = trace_radiance(model, jax.random.PRNGKey(4), fwd, nsamp=32)
    assert tr["trace_radiance"].shape == (32, 32, 3)
    assert tr["pred_vis"].shape == (32, 32, 2)
    gt_vis = np.asarray(tr["gt_vis"])
    # from the sphere surface, roughly half the directions point inward and
    # hit the sphere again (occluded) — back-culled but still traced
    assert 0.1 < gt_vis.mean() < 0.9
    assert np.isfinite(np.asarray(tr["trace_radiance"])).all()
    assert np.isfinite(np.asarray(tr["gt_integral"])).all()
    # radiance is zeroed on back-culled dirs
    back = np.asarray(tr["indir_mask"]) == False  # noqa: E712
    assert (np.asarray(tr["trace_radiance"])[back] >= 0).all()


def test_forward_differentiable_wrt_materials(model):
    inp = _input_batch(seed=5)

    def loss_fn(env_params):
        params = dict(model.params)
        params["envmap_material_network"] = env_params
        m = Stage2Model(params, model.cfg, model.grid_values)
        out = stage2_forward(m, jax.random.PRNGKey(5), inp,
                             trainstage="Material", train_spec=True)
        return jnp.mean(out["sg_rgb"] ** 2) + jnp.mean(out["normal_map"] ** 2)

    g = jax.grad(loss_fn)(model.params["envmap_material_network"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_forward_jits(model):
    inp = _input_batch(seed=6)
    fn = jax.jit(lambda key, inp: stage2_forward(model, key, inp,
                                                 trainstage="Material",
                                                 train_spec=True)["sg_rgb"])
    out = fn(jax.random.PRNGKey(6), inp)
    assert np.isfinite(np.asarray(out)).all()


# -- IDR mode: use_neus=False + sphere tracer (VERDICT r1 #7) ----------------

@pytest.fixture(scope="module")
def idr_model():
    """Pure-IDR composite: plain ImplicitNetwork/RenderingNetwork with the
    sphere tracer as primary tracer
    (implicit_differentiable_renderer.py:268-282)."""
    from robir_tpu.stages.stage2_runner import init_stage2_params
    from robir_tpu.tracing.sphere import SphereTracerConfig

    # 64x4 trunk: the geometric init of the very small 32x3 trunk is too
    # lopsided (negative pockets on the r=1 shell) for sphere tracing
    neus_cfg = NeuSConfig(
        sdf=SDFConfig(d_out=33, d_hidden=64, n_layers=4, skip_in=(),
                      multires=3, bias=0.5),
        color=RenderingConfig(d_feature=32, d_hidden=32, n_layers=2))
    cfg = Stage2Config(
        neus=neus_cfg,
        envmap=EnvmapMaterialConfig(multires=4, num_lgt_sgs=16,
                                    encoder_dims=(64, 64),
                                    decoder_dims=(32,)),
        indirect=IndirIllumConfig(multires=4, dims=(32, 32), num_lgt_sgs=8),
        visnet=VisNetConfig(points_multires=4, dirs_multires=4,
                            dims=(32, 32)),
        tonemap=ToneMapConfig(hdr_mode=0, gamma=1.0),
        use_neus=False, tracer="sphere",
        sphere_tracer=SphereTracerConfig(object_bounding_sphere=1.0,
                                         n_steps=64))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    return Stage2Model(params, cfg)  # no grid needed


def test_idr_geometric_init_sphere(idr_model):
    """The IDR implicit net (geometric init) is a monotone sphere-like
    field in stage-2 coords — no coordinate rescale, unlike the NeuS
    bridge (its sphere is at bias/coord_scale instead)."""
    x = jnp.array([[0.0, 0.0, 0.0], [0.9, 0.0, 0.0], [0.0, 0.9, 0.0]])
    s = np.asarray(idr_model.sdf(x))[:, 0]
    assert s[0] < -0.2 and s[1] > 0.1 and s[2] > 0.1


def test_idr_sphere_tracer_hits(idr_model):
    inp = _input_batch(24)
    o = jnp.asarray(np.tile(np.array([[0, 0, 1.6]], np.float32), (24, 1)))
    d = _input_batch(24)["points"] * 0.2 - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    dists, hit, x = idr_model.trace(o, d)
    assert bool(hit.any())
    s = np.asarray(idr_model.sdf(x[hit]))
    assert np.abs(s).max() < 5e-3  # converged on the zero level set


def test_idr_forward_material(idr_model):
    """Full stage-2 forward through the IDR pair + sphere tracer."""
    inp = _input_batch(24)
    inp["points"] = jnp.asarray(
        np.tile(np.array([[0, 0, 1.6]], np.float32), (24, 1)))
    d = _input_batch(24)["points"] * 0.2 - inp["points"]
    inp["dirs"] = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = stage2_forward(idr_model, jax.random.PRNGKey(1), inp,
                         trainstage="Material")
    assert bool(out["network_object_mask"].any())
    for k in ("sg_rgb", "indir_rgb", "diffuse_albedo", "normals"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    # the rendering network (borrow_color path) is reachable too
    c = idr_model.borrow_color(out["points"][:4], inp["dirs"][:4])
    assert c.shape == (4, 3) and np.isfinite(np.asarray(c)).all()


def test_trace_errors_are_actionable(idr_model):
    """Probes: unknown tracer names the value; grid tracer without baked
    grid names the fix."""
    import dataclasses
    from robir_tpu.render.stage2 import Stage2Model
    bad = Stage2Model(idr_model.params,
                      dataclasses.replace(idr_model.cfg, tracer="octree"))
    o = jnp.zeros((2, 3)) + jnp.array([0.0, 0.0, 1.5])
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (2, 1))
    with pytest.raises(KeyError, match="octree"):
        bad.trace(o, d)
    nogrid = Stage2Model(idr_model.params,
                         dataclasses.replace(idr_model.cfg, tracer="grid"))
    with pytest.raises(ValueError, match="bake_grid"):
        nogrid.trace(o, d)


def test_idr_params_checkpoint_roundtrip(idr_model, tmp_path):
    """IDR-mode param trees (extra rendering_network top-level key) survive
    checkpoint save + surgical restore."""
    from robir_tpu.core import checkpoint as ckpt_lib
    path = str(tmp_path / "idr.npz")
    ckpt_lib.save(path, idr_model.params, step=7)
    import jax.tree_util as jtu
    blank = jtu.tree_map(jnp.zeros_like, idr_model.params)
    restored, meta = ckpt_lib.restore_into(blank, path)
    for (ka, a), (kb, b) in zip(
            jtu.tree_leaves_with_path(idr_model.params),
            jtu.tree_leaves_with_path(restored)):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # surgical: keep only the rendering network
    partial, _ = ckpt_lib.restore_into(
        blank, path, keep=lambda p: p.startswith("rendering_network"))
    rn = partial["rendering_network"]
    assert any(float(jnp.abs(x).max()) > 0
               for x in jtu.tree_leaves(rn))
    assert all(float(jnp.abs(x).max()) == 0
               for x in jtu.tree_leaves(partial["implicit_network"]))
