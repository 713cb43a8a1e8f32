"""Exact masked compaction (core/compact.py) + its grid-march integration.

The reference compacts ragged work host-side with boolean indexing
(utils/octree.py:493-585 ``while k.any()``; trace_radiance hit-only network
evals, model/implicit_differentiable_renderer.py:566-650). The TPU design
must be EXACT under static shapes: these tests pin equality against the
uncompacted computation, including chunk-boundary and all-/none-needed
edges.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.core.compact import compact_apply
from robir_tpu.tracing.grid import (GridConfig, SDFGrid, build_sdf_grid,
                                    grid_cast)


pytestmark = pytest.mark.slow


def _fn(x, v):
    return {"a": x * 2.0 + v[:, None], "b": v > 0.0}


@pytest.mark.parametrize("frac", [0.0, 0.2, 1.0])
@pytest.mark.parametrize("n,chunk", [(1000, 128), (256, 256), (64, 128)])
def test_compact_apply_matches_dense(frac, n, chunk):
    rng = np.random.default_rng(3)
    need = jnp.asarray(rng.random(n) < frac)
    x = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(n,)).astype(np.float32))

    out = jax.jit(lambda m, x, v: compact_apply(_fn, m, [x, v], chunk))(
        need, x, v)
    ref = _fn(x, v)
    assert out["a"].dtype == jnp.float32 and out["b"].dtype == jnp.bool_
    np.testing.assert_array_equal(
        np.asarray(out["a"]), np.where(np.asarray(need)[:, None],
                                       np.asarray(ref["a"]), 0.0))
    np.testing.assert_array_equal(
        np.asarray(out["b"]), np.asarray(need) & np.asarray(ref["b"]))


def test_compact_apply_counts_skipped_chunks():
    """Needed rows pack into the leading chunks: with 10% needed of 8
    chunks, at most ceil(n_need/chunk)+0 chunks may execute. Verified via a
    side-effect-free proxy: outputs at needed rows must come from the real
    fn (nonzero), so the zero-branch demonstrably ran elsewhere."""
    n, chunk = 1024, 128
    rng = np.random.default_rng(0)
    need = jnp.asarray(rng.random(n) < 0.1)
    x = jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32) + 10.0)
    (out,) = jax.jit(
        lambda m, x: compact_apply(lambda xc: (xc + 1.0,), m, [x], chunk))(
            need, x)
    np.testing.assert_allclose(np.asarray(out)[np.asarray(need)],
                               np.asarray(x + 1.0)[np.asarray(need)])
    assert np.all(np.asarray(out)[~np.asarray(need)] == 0.0)


def _sphere_sdf(x):
    return jnp.linalg.norm(x, axis=-1) - 0.5


def test_grid_cast_compaction_bit_exact():
    """The two-phase compacted march + compacted refine must equal the
    monolithic full-width march exactly (trajectories are independent)."""
    cfg_on = GridConfig(resolution=64, max_steps=96, compact_after=8,
                        compact_chunk=128)
    cfg_off = GridConfig(resolution=64, max_steps=96, compact_after=0)
    grid = build_sdf_grid(_sphere_sdf, cfg_on)

    rng = np.random.default_rng(7)
    n = 1024
    o = rng.uniform(-0.9, 0.9, (n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 0.55  # just outside
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    t1, h1, x1 = jax.jit(lambda o, d: grid_cast(grid, cfg_on, o, d))(o, d)
    t2, h2, x2 = jax.jit(lambda o, d: grid_cast(grid, cfg_off, o, d))(o, d)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    assert np.asarray(h1).any() and not np.asarray(h1).all()


def test_grid_cast_default_config_hits_sphere():
    """Default GridConfig (compaction on) still satisfies the hit oracle."""
    sg = SDFGrid.build(_sphere_sdf, GridConfig(resolution=96, compact_chunk=512))
    n = 2048
    rng = np.random.default_rng(1)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(np.array([[0.0, 0.0, 0.9]], np.float32), (n, 1))
    t, hit, x = jax.jit(sg.cast)(o, d)
    # analytic: ray hits sphere of r=.5 from (0,0,.9) iff the closest
    # approach distance < r
    oc = o
    b = np.sum(oc * np.asarray(d), -1)
    cdist2 = np.sum(oc * oc, -1) - b ** 2
    expect = (cdist2 < 0.5 ** 2) & (b < 0)
    agree = np.mean(np.asarray(hit) == expect)
    assert agree > 0.98, agree
    r_hit = np.linalg.norm(np.asarray(x)[np.asarray(hit)], axis=-1)
    assert np.median(np.abs(r_hit - 0.5)) < 2e-3


def _small_stage2():
    import tempfile

    from robir_tpu.data.syn_dataset import SynDataset, SynDatasetConfig
    from robir_tpu.data.synthetic import make_sphere_dataset
    from robir_tpu.fields.envmap_material import EnvmapMaterialConfig
    from robir_tpu.fields.neus_model import NeuSConfig
    from robir_tpu.fields.radiance import RenderingConfig
    from robir_tpu.fields.sdf import SDFConfig
    from robir_tpu.fields.visibility import IndirIllumConfig, VisNetConfig
    from robir_tpu.render.color import ToneMapConfig
    from robir_tpu.render.stage2 import Stage2Config

    scene = tempfile.mkdtemp()
    make_sphere_dataset(scene, n_train=4, n_test=1, h=48, w=48, radius=0.5)
    dataset = SynDataset(SynDatasetConfig(instance_dir=scene))
    cfg = Stage2Config(
        neus=NeuSConfig(
            sdf=SDFConfig(d_out=33, d_hidden=32, n_layers=3, skip_in=(),
                          multires=3, bias=0.5),
            color=RenderingConfig(d_feature=32, d_hidden=32, n_layers=2)),
        envmap=EnvmapMaterialConfig(multires=4, num_lgt_sgs=16,
                                    encoder_dims=(64, 64),
                                    decoder_dims=(32,)),
        indirect=IndirIllumConfig(multires=4, dims=(32, 32), num_lgt_sgs=8),
        visnet=VisNetConfig(points_multires=4, dirs_multires=4,
                            dims=(32, 32)),
        tonemap=ToneMapConfig(hdr_mode=2),
        grid=GridConfig(resolution=48, bbox_min=(-0.45,) * 3,
                        bbox_max=(0.45,) * 3, compact_chunk=256))
    return dataset, cfg


def test_stage2_forward_compacted_matches_dense():
    """Material-path compaction vs dense. Deterministic outputs (diffuse,
    vis_shadow, material heads, normals) must match exactly; the specular
    branch draws per-point MC dirs whose values depend on batch shape, so
    it is compared statistically."""
    from robir_tpu.render.stage2 import Stage2Model, stage2_forward
    from robir_tpu.stages.stage2_runner import init_stage2_params
    from robir_tpu.stages.vis import StageOptConfig  # noqa: F401 (env check)
    from robir_tpu.tracing.grid import build_sdf_grid

    dataset, cfg = _small_stage2()
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    model0 = Stage2Model(params, cfg)
    grid = build_sdf_grid(model0.sdf, cfg.grid)
    model = Stage2Model(params, cfg, grid)

    rng = np.random.default_rng(0)
    b = dataset.sample_pixels(rng, 0, 512)
    inp = {"points": b["points"], "dirs": b["dirs"],
           "object_mask": b["object_mask"],
           "hdr_shift": np.full((512, 1), 0.4, np.float32)}
    k = jax.random.PRNGKey(3)
    dense = stage2_forward(model, k, inp, trainstage="Material",
                           train_spec=False)
    comp = stage2_forward(model, k, inp, trainstage="Material",
                          train_spec=False, compact_chunk=64)
    assert bool(np.asarray(dense["surface_mask"]).any())
    for key in ["sg_diffuse_rgb", "vis_shadow", "diffuse_albedo",
                "roughness", "metallic", "normal_map", "normals",
                "indir_diffuse_rgb", "points", "network_object_mask"]:
        np.testing.assert_allclose(
            np.asarray(comp[key]), np.asarray(dense[key]), rtol=2e-5,
            atol=2e-5, err_msg=key)
    # specular: same scale, finite, default off-surface
    sm = np.asarray(dense["surface_mask"])
    sc, sd = np.asarray(comp["sg_specular_rgb"]), np.asarray(
        dense["sg_specular_rgb"])
    assert np.isfinite(sc).all()
    assert np.allclose(sc[~sm], 1.0) and np.allclose(sd[~sm], 1.0)
    if sm.sum() > 16:
        assert abs(sc[sm].mean() - sd[sm].mean()) < 0.35 * (
            abs(sd[sm].mean()) + 1e-3)


def test_pbr_step_trains_with_compaction():
    """The PBR runner with compact_chunk engaged: finite, decreasing, and
    gradients reach the material params."""
    from robir_tpu.stages.pbr import PBRRunner, PBRStageConfig
    from robir_tpu.stages.stage2_runner import (StageOptConfig,
                                                init_stage2_params)

    dataset, cfg = _small_stage2()
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    pbr = PBRRunner(cfg, params, dataset,
                    PBRStageConfig(num_pixels=256, compact_chunk=64,
                                   opt=StageOptConfig(lr=1e-3)))
    pbr.bake_grid()
    before = jax.tree_util.tree_map(
        np.asarray, pbr.params["envmap_material_network"]["lgtSGs"])
    trace = []
    pbr.run(30, log_every=1, log_fn=lambda i, m: trace.append(m["rgb_loss"]))
    assert np.all(np.isfinite(trace))
    assert np.mean(trace[-5:]) < np.mean(trace[:5]) * 1.2
    after = np.asarray(pbr.params["envmap_material_network"]["lgtSGs"])
    assert not np.allclose(before, after)


def test_cesr_step_compacted_sv_loss_matches_dense():
    """CESR row-mode compaction: sv_loss (shadow-KL + white + normal
    consistency) must equal the dense step's exactly — every ingredient is
    chunk-invariant (per-light sweep draws shared, shadow/normal nets
    deterministic, weights zero off-surface). Run for warmup and explore."""
    import dataclasses as dc

    from robir_tpu.fields.sdf import SDFConfig
    from robir_tpu.stages import cesr as cesr_mod
    from robir_tpu.stages.cesr import CESRRunner, CESRStageConfig
    from robir_tpu.stages.stage2_runner import (StageOptConfig,
                                                init_stage2_params)

    @dc.dataclass(frozen=True)
    class SmallCESR(CESRStageConfig):
        @property
        def shadow_cfg(self):
            return SDFConfig(d_in=cesr_mod.SHADOW_PE.out_dim + 16, d_out=2,
                             d_hidden=64, n_layers=3, skip_in=(), multires=0)

        @property
        def normal_cfg(self):
            return SDFConfig(d_in=cesr_mod.SHADOW_PE.out_dim, d_out=3,
                             d_hidden=64, n_layers=3, skip_in=(), multires=0)

    dataset, cfg = _small_stage2()
    base = dict(num_pixels=256, opt=StageOptConfig(lr=1e-3), white_light=True)
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)

    runners = {}
    for name, chunk in [("dense", 0), ("compact", 64)]:
        p = jax.tree_util.tree_map(jnp.array, params)  # fresh copy
        runners[name] = CESRRunner(
            cfg, p, dataset, SmallCESR(compact_chunk=chunk, **base), seed=7)
        runners[name].bake_grid()
    runners["compact"].grid_values = runners["dense"].grid_values

    batch = runners["dense"]._batch() if hasattr(
        runners["dense"], "_batch") else None
    assert batch is not None
    k = jax.random.PRNGKey(11)

    for prefit in ["warmup", "explore", "project"]:
        outs = {}
        for name, r in runners.items():
            _, _, m = r._step(r._trainable, r._frozen, r.opt_state,
                              r.grid_values, r.spec_var, batch, k,
                              prefit if prefit != "explore" else "none",
                              False, prefit != "warmup")
            outs[name] = {kk: float(v) for kk, v in m.items()}
        assert np.isfinite(outs["compact"]["sv_loss"])
        np.testing.assert_allclose(outs["compact"]["sv_loss"],
                                   outs["dense"]["sv_loss"], rtol=1e-4,
                                   err_msg=prefit)


def test_blocked_gather_matches_rows():
    """The blocked z-gather layout reproduces grid_sdf to fp32 rounding
    (XLA fuses the blend differently per layout — 1-2 ulp reassociation
    is expected, exact zeros are not where the difference lives), and
    grid_cast is invariant to it up to bisection resolution."""
    from robir_tpu.tracing.grid import (_make_sdf_fn, _sdf_blocked,
                                        _to_blocked, grid_sdf)

    cfg_b = GridConfig(resolution=160, compact_after=0, blocked_gather=True)
    cfg_r = GridConfig(resolution=160, compact_after=0, blocked_gather=False)
    grid = build_sdf_grid(_sphere_sdf, cfg_b)

    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-1.2, 1.2, (4096, 3)),       # interior + outside
        np.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0], [0.0, 0.0, 1.0]]),
        rng.uniform(0.99, 1.01, (64, 3)),         # boundary band
    ]).astype(np.float32)

    blocked = _to_blocked(grid, cfg_b)
    a = np.asarray(jax.jit(lambda x: _sdf_blocked(blocked, cfg_b, x))(pts))
    b = np.asarray(jax.jit(lambda x: grid_sdf(grid, cfg_b, x))(pts))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    fn = _make_sdf_fn(grid, cfg_b)
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(pts))), b,
                               rtol=1e-6, atol=1e-6)

    o = rng.uniform(-0.9, 0.9, (512, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 0.8
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t1, h1, x1 = jax.jit(lambda o, d: grid_cast(grid, cfg_b, o, d))(o, d)
    t2, h2, x2 = jax.jit(lambda o, d: grid_cast(grid, cfg_r, o, d))(o, d)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert np.mean(h1 == h2) > 0.998, np.mean(h1 == h2)
    both = h1 & h2
    np.testing.assert_allclose(np.asarray(t1)[both], np.asarray(t2)[both],
                               atol=2e-3)
    assert h1.any()


def test_quad_rows_matches_grid_sdf():
    """The quad-row layout (one 4R-row gather per lookup) is BIT-exact
    with grid_sdf — identical corner values and blend association — and
    grid_cast is bit-invariant to it (same trajectories, same hits)."""
    from robir_tpu.tracing.grid import (_make_sdf_fn, _sdf_quad, _to_quad,
                                        grid_sdf)

    cfg_q = GridConfig(resolution=160, compact_after=8, quad_rows=True)
    cfg_r = GridConfig(resolution=160, compact_after=8, quad_rows=False)
    grid = build_sdf_grid(_sphere_sdf, cfg_q)

    rng = np.random.default_rng(1)
    pts = np.concatenate([
        rng.uniform(-1.2, 1.2, (4096, 3)),
        np.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0], [0.0, 0.0, 1.0]]),
        rng.uniform(0.99, 1.01, (64, 3)),
    ]).astype(np.float32)

    quad = _to_quad(grid, cfg_q)
    a = np.asarray(jax.jit(lambda x: _sdf_quad(quad, cfg_q, x))(pts))
    b = np.asarray(jax.jit(lambda x: grid_sdf(grid, cfg_q, x))(pts))
    # same blend association; XLA may still fuse differently -> allow ulps
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    fn = _make_sdf_fn(grid, cfg_q)
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(pts))), b,
                               rtol=1e-6, atol=1e-6)

    o = rng.uniform(-0.9, 0.9, (512, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 0.8
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t1, h1, x1 = jax.jit(lambda o, d: grid_cast(grid, cfg_q, o, d))(o, d)
    t2, h2, x2 = jax.jit(lambda o, d: grid_cast(grid, cfg_r, o, d))(o, d)
    h1, h2 = np.asarray(h1), np.asarray(h2)
    assert np.mean(h1 == h2) > 0.998, np.mean(h1 == h2)
    both = h1 & h2
    np.testing.assert_allclose(np.asarray(t1)[both], np.asarray(t2)[both],
                               atol=2e-3)
    assert h1.any()


def test_over_relax_matches_conservative():
    """Over-relaxed sphere tracing with rejection (Keinert-style) finds
    the same hits as the conservative march (tolerance-level t agreement;
    the rejection test guarantees no crossing is skipped), on a sphere
    and on a thin-feature torus, with and without the compacted tail."""
    def torus_sdf(x):
        q = jnp.stack([jnp.linalg.norm(x[:, :2], axis=-1) - 0.6,
                       x[:, 2]], -1)
        return jnp.linalg.norm(q, axis=-1) - 0.15

    rng = np.random.default_rng(7)
    o = rng.uniform(-0.9, 0.9, (1024, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 0.85
    d = rng.normal(size=(1024, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    # near-bbox sphere: surface 0.05 inside the bbox face, rays from the
    # center — an over-relaxed step near the surface can overshoot past
    # t_far, and deactivating there would skip the crossing before the
    # rejection check fires (the bbox-exit clamp's regression case)
    def near_bbox_sphere(x):
        return jnp.linalg.norm(x, axis=-1) - 0.5

    for sdf, res in ((_sphere_sdf, 96), (torus_sdf, 128),
                     (near_bbox_sphere, 96)):
        if sdf is near_bbox_sphere:
            o = np.zeros((512, 3), np.float32)
            d = rng.normal(size=(512, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
        for compact_after in (0, 8):
            bbox = 0.55 if sdf is near_bbox_sphere else 1.0
            cfg_c = GridConfig(resolution=res, max_steps=192,
                               compact_after=compact_after,
                               compact_chunk=256,
                               bbox_min=(-bbox,) * 3, bbox_max=(bbox,) * 3)
            cfg_o = dataclasses.replace(cfg_c, over_relax=1.6)
            grid = build_sdf_grid(sdf, cfg_c)
            t1, h1, _ = jax.jit(
                lambda o, d: grid_cast(grid, cfg_c, o, d))(o, d)
            t2, h2, _ = jax.jit(
                lambda o, d: grid_cast(grid, cfg_o, o, d))(o, d)
            h1, h2 = np.asarray(h1), np.asarray(h2)
            agree = np.mean(h1 == h2)
            assert agree > 0.995, (agree, res, compact_after)
            both = h1 & h2
            diff = np.abs(np.asarray(t1)[both] - np.asarray(t2)[both])
            # grazing rays may bracket a neighboring crossing: bound the
            # tail by one cell, the bulk by bisection tolerance
            assert np.mean(diff < 3e-3) > 0.98, (res, compact_after,
                                                 diff.max())
            assert diff.max() < cfg_c.cell, (res, compact_after,
                                             diff.max())
            assert h1.any() and h2.any()
