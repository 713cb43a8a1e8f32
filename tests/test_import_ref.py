"""Reference-checkpoint import bridge round trip (VERDICT r3 item 2).

Builds the REFERENCE torch modules, saves their state dicts in the
reference's own on-disk formats (stage-1 ``{step:06d}.tar`` with a
``'model'`` state dict, neus/optimization/log.py:75-88; stage-2
``ModelParameters/*.pth`` with ``'model_state_dict'``,
training/train_pbr.py:118-127), imports them through
``robir_tpu.core.import_ref`` / the ``import-ref`` CLI, and checks the
imported JAX model evaluates identically to the torch source — forward
parity on every imported submodule, plus a relight-path render off the
imported checkpoint.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import has_reference

pytestmark = [pytest.mark.skipif(not has_reference(),
                                 reason="reference not mounted"),
              pytest.mark.slow]


@pytest.fixture(scope="module")
def torch_modules():
    from tests.ref_loader import import_reference_module, patch_torch_cpu
    patch_torch_cpu()
    import torch
    torch.manual_seed(0)
    nm = import_reference_module("model.neus_model")
    idr = import_reference_module("model.implicit_differentiable_renderer")
    sg = import_reference_module("model.sg_envmap_material")
    cc = import_reference_module("model.color_correction")
    neus = nm.NeuSModel(mode="idr", hashing=False, outside=False, embed="PE")
    envmap = sg.EnvmapMaterialNetwork(multires=2, latent_dim=32,
                                      num_lgt_sgs=16)
    indirect = idr.IndirctIllumNetwork(multires=2, dims=[32, 32],
                                       num_lgt_sgs=8)
    vis = idr.VisNetwork(points_multires=2, dirs_multires=2, dims=[32, 32])
    gamma = cc.GammaCorrect(2.2, 2)
    return neus, envmap, indirect, vis, gamma


def _our_cfg():
    from robir_tpu.fields.envmap_material import EnvmapMaterialConfig
    from robir_tpu.fields.neus_model import NeuSConfig
    from robir_tpu.fields.visibility import IndirIllumConfig, VisNetConfig
    from robir_tpu.render.color import ToneMapConfig
    from robir_tpu.render.stage2 import Stage2Config
    from robir_tpu.tracing.grid import GridConfig
    # NeuSConfig() defaults mirror the reference NeuSModel('idr') sizes;
    # graft() shape-checks every leaf, so any drift fails loudly
    return Stage2Config(
        neus=NeuSConfig(),
        envmap=EnvmapMaterialConfig(multires=2, latent_dim=32,
                                    num_lgt_sgs=16),
        indirect=IndirIllumConfig(multires=2, dims=(32, 32), num_lgt_sgs=8),
        visnet=VisNetConfig(points_multires=2, dirs_multires=2,
                            dims=(32, 32)),
        tonemap=ToneMapConfig(gamma=2.2, hdr_mode=2),
        grid=GridConfig(resolution=32, bbox_min=(-0.6,) * 3,
                        bbox_max=(0.6,) * 3))


@pytest.fixture(scope="module")
def imported(torch_modules, tmp_path_factory):
    """Save reference-format artifacts, import via the CLI entry points."""
    import torch

    from robir_tpu.core import checkpoint as ckpt_lib
    from robir_tpu.core import import_ref
    from robir_tpu.stages.stage2_runner import init_stage2_params

    neus, envmap, indirect, vis, gamma = torch_modules
    d = tmp_path_factory.mktemp("refckpt")

    # stage-1 tarball, exactly the reference writer's layout
    tar = str(d / "020000.tar")
    torch.save({"global_step": 20000, "resume_time": 1.0,
                "model": neus.state_dict()}, tar)

    # stage-2 pth: IDRNetwork.state_dict() == prefixed module dicts
    sd = {}
    for prefix, mod in [("implicit_network.neus_model", neus),
                        ("envmap_material_network", envmap),
                        ("indirect_illum_network", indirect),
                        ("visibility_network", vis),
                        ("gamma", gamma)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    pth = str(d / "latest.pth")
    torch.save({"model_state_dict": sd, "epoch": 7}, pth)

    cfg = _our_cfg()
    base = init_stage2_params(jax.random.PRNGKey(1), cfg)

    s1_path = import_ref.import_stage1(tar, str(d / "NeuS"))
    s1_tree, meta1 = ckpt_lib.load(s1_path)
    assert meta1["step"] == 20000

    s2_path = import_ref.import_stage2(pth, base, str(d / "latest.npz"))
    s2_tree, meta2 = ckpt_lib.load(s2_path)
    assert meta2["step"] == 7
    return cfg, s1_tree["params"], s2_tree


def test_stage1_sdf_color_parity(torch_modules, imported):
    import torch
    neus, *_ = torch_modules
    cfg, s1, _ = imported
    from robir_tpu.fields.neus_model import NeuS
    ours = NeuS(s1, cfg.neus)
    x = np.random.default_rng(0).standard_normal((33, 3)).astype(np.float32) * 0.4
    with torch.no_grad():
        want = neus.sdf_network(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.full(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    n = np.random.default_rng(1).standard_normal((33, 3)).astype(np.float32)
    v = np.random.default_rng(2).standard_normal((33, 3)).astype(np.float32)
    f = want[:, 1:]
    with torch.no_grad():
        want_c = neus.color(torch.from_numpy(x), torch.from_numpy(n),
                            torch.from_numpy(v), torch.from_numpy(f)).numpy()
    got_c = np.asarray(ours.color(jnp.asarray(x), jnp.asarray(n),
                                  jnp.asarray(v), jnp.asarray(f)))
    np.testing.assert_allclose(got_c, want_c, rtol=2e-4, atol=2e-5)

    with torch.no_grad():
        want_dev = float(neus.deviation_network(torch.zeros(1)).reshape(-1)[0])
    assert abs(float(ours.inv_s()) - want_dev) / want_dev < 1e-5


def test_stage2_heads_parity(torch_modules, imported):
    import torch
    _, envmap, indirect, vis, gamma = torch_modules
    cfg, _, s2 = imported

    rng = np.random.default_rng(3)
    pts = rng.standard_normal((19, 3)).astype(np.float32) * 0.3

    # material head — kill the AE perturbation so both are deterministic
    from robir_tpu.fields.envmap_material import envmap_material_apply
    orig_randn = torch.randn
    torch.randn = lambda *a, **k: torch.zeros(*a)
    try:
        with torch.no_grad():
            r = envmap(torch.from_numpy(pts), train_spec=True)
    finally:
        torch.randn = orig_randn
    got = envmap_material_apply(s2["envmap_material_network"], cfg.envmap,
                                jnp.asarray(pts), key=None, train_spec=True)
    np.testing.assert_allclose(np.asarray(got.diffuse_albedo),
                               r["sg_diffuse_albedo"].numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.roughness),
                               r["sg_roughness"].numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.lgt_sgs),
                               r["sg_lgtSGs"].detach().numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.normal_map),
                               r["sg_normal_map"].numpy(),
                               rtol=2e-3, atol=2e-4)

    # visibility net
    from robir_tpu.fields.visibility import visnet_apply
    dirs = rng.standard_normal((19, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    with torch.no_grad():
        want_v = vis(torch.from_numpy(pts), torch.from_numpy(dirs)).numpy()
    got_v = np.asarray(visnet_apply(s2["visibility_network"], cfg.visnet,
                                    jnp.asarray(pts), jnp.asarray(dirs)))
    np.testing.assert_allclose(got_v, want_v, rtol=2e-4, atol=2e-5)

    # indirect-illum net (deterministic: randn zeroed)
    from robir_tpu.fields.visibility import indirect_apply
    shift = rng.random((19, 1)).astype(np.float32)
    torch.randn = lambda *a, **k: torch.zeros(*a)
    try:
        with torch.no_grad():
            want_sgs, want_int = indirect(torch.from_numpy(pts),
                                          torch.from_numpy(shift))
    finally:
        torch.randn = orig_randn
    got_sgs, got_int = indirect_apply(s2["indirect_illum_network"],
                                      cfg.indirect, jnp.asarray(pts),
                                      jnp.asarray(shift), key=None)
    np.testing.assert_allclose(np.asarray(got_sgs), want_sgs.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_int), want_int.numpy(),
                               rtol=2e-4, atol=2e-5)

    # gamma scalars
    np.testing.assert_allclose(float(s2["gamma"]["gamma"]),
                               float(gamma.gamma.detach()))
    np.testing.assert_allclose(float(s2["gamma"]["adapt_illum"]),
                               float(gamma.hdr_shift.adapt_illum.detach()))


def test_imported_checkpoint_renders(imported):
    """The relight path runs off an imported stage-2 checkpoint: bake the
    grid from the imported (scaled) geometry and shade a pixel batch."""
    from robir_tpu.render.stage2 import Stage2Model, stage2_forward
    from robir_tpu.tracing.grid import build_sdf_grid

    cfg, s1, s2 = imported
    params = dict(s2)
    params["implicit_network"] = s1  # the _stage2_setup graft
    model = Stage2Model(params, cfg)
    grid = build_sdf_grid(model.sdf, cfg.grid)
    model = Stage2Model(params, cfg, grid)

    n = 64
    rng = np.random.default_rng(5)
    o = np.tile(np.array([0.0, 0.0, -1.2], np.float32), (n, 1))
    d = np.array([0.0, 0.0, 1.0], np.float32) + \
        0.25 * rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    inp = {"points": jnp.asarray(o), "dirs": jnp.asarray(d),
           "hdr_shift": jnp.full((n, 1), 0.5)}
    out = stage2_forward(model, jax.random.PRNGKey(0), inp,
                         trainstage="Material", compact_chunk=16)
    assert np.isfinite(np.asarray(out["sg_rgb"])).all()
    assert int(np.asarray(out["network_object_mask"]).sum()) > 0


def test_cli_import_ref(torch_modules, tmp_path):
    """The CLI wrapper writes the stage-1 npz where _stage2_setup looks."""
    import torch

    from robir_tpu import cli
    from robir_tpu.core import checkpoint as ckpt_lib

    neus, *_ = torch_modules
    tar = str(tmp_path / "000123.tar")
    torch.save({"global_step": 123, "model": neus.state_dict()}, tar)
    log_dir = str(tmp_path / "exp")
    cli.main(["import-ref", "--conf", "configs/sphere_smoke.json",
              "--log_dir", log_dir, "--stage1_tar", tar])
    path = ckpt_lib.latest_path(os.path.join(log_dir, "NeuS"))
    assert path and path.endswith("ckpt_000123.npz")
    tree, meta = ckpt_lib.load(path)
    assert meta["step"] == 123
    assert "sdf_network" in tree["params"]
