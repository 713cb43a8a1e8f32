"""Stage-2 field parity: SparseAE, EnvmapMaterial, VisNet, IndirectIllum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.fields import envmap_material as em
from robir_tpu.fields import sparse_ae as sa
from robir_tpu.fields import visibility as vis
from robir_tpu.fields.encoding import PEConfig, positional_encoding
from tests.conftest import has_reference

pytestmark = [pytest.mark.skipif(not has_reference(), reason="reference not mounted"), pytest.mark.slow]


def _seq_linears_to_params(seq):
    """torch Sequential(Linear, act, Linear, ...) -> {'lin{i}': {w, b}}."""
    import torch
    params = {}
    i = 0
    for layer in seq:
        if isinstance(layer, torch.nn.Linear):
            params[f"lin{i}"] = {
                "w": jnp.asarray(layer.weight.detach().numpy().T),
                "b": jnp.asarray(layer.bias.detach().numpy()),
            }
            i += 1
    return params


def _ae_to_params(t_ae):
    return {"encoder": _seq_linears_to_params(t_ae.brdf_encoder_layer),
            "decoder": _seq_linears_to_params(t_ae.brdf_decoder_layer)}


@pytest.fixture(scope="module")
def ref_mod():
    from tests.ref_loader import import_reference_module, patch_torch_cpu
    patch_torch_cpu()
    return import_reference_module("model.sg_envmap_material")


@pytest.fixture(scope="module")
def ref_idr():
    from tests.ref_loader import import_reference_module, patch_torch_cpu
    patch_torch_cpu()
    return import_reference_module("model.implicit_differentiable_renderer")


class TestSparseAE:
    def test_forward_parity(self, ref_mod):
        import torch
        torch.manual_seed(0)
        t_ae = ref_mod.SparseAE(63, 5, out_act=torch.sigmoid)
        cfg = sa.SparseAEConfig(in_dim=63, out_dim=5, out_act="sigmoid")
        params = _ae_to_params(t_ae)
        x = np.random.default_rng(0).standard_normal((20, 63)).astype(np.float32)
        with torch.no_grad():
            want, _ = t_ae(torch.from_numpy(x))
        got, _ = sa.sparse_ae_apply(params, cfg, jnp.asarray(x), key=None)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)

    def test_encode_and_var_mask(self, ref_mod):
        import torch
        torch.manual_seed(1)
        t_ae = ref_mod.SparseAE(63, 3, out_act=None)
        cfg = sa.SparseAEConfig(in_dim=63, out_dim=3, out_act=None)
        params = _ae_to_params(t_ae)
        x = np.random.default_rng(1).standard_normal((8, 63)).astype(np.float32)
        var = np.zeros(32, np.float32)
        var[:5] = 1.0
        t_ae.var = torch.from_numpy(var)
        with torch.no_grad():
            want = t_ae.encode(torch.from_numpy(x)).numpy()
        got = np.asarray(sa.encode(params, cfg, jnp.asarray(x), jnp.asarray(var)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        assert np.abs(got[:, :5]).max() == 0.0  # dropped latents

    def test_kl(self, ref_mod):
        import torch
        torch.manual_seed(2)
        t_ae = ref_mod.SparseAE(10, 3)
        latent = np.random.default_rng(2).standard_normal((50, 32)).astype(np.float32)
        want = float(t_ae.kl_divergence(0.05, torch.from_numpy(latent)))
        got = float(sa.ae_kl_divergence(jnp.asarray(latent), 0.05))
        assert got == pytest.approx(want, rel=1e-4)


class TestEnvmapMaterial:
    @pytest.fixture(scope="class")
    def pair(self, ref_mod):
        import torch
        torch.manual_seed(3)
        t_net = ref_mod.EnvmapMaterialNetwork(multires=10, num_lgt_sgs=16,
                                              specular_albedo=0.05)
        cfg = em.EnvmapMaterialConfig(multires=10, num_lgt_sgs=16,
                                      specular_albedo=0.05)
        params = {
            "brdf_encoder_layer": _ae_to_params(t_net.brdf_encoder_layer),
            "spec_brdf_encoder_layer": _ae_to_params(t_net.spec_brdf_encoder_layer),
            "normal_decoder_layer": _ae_to_params(t_net.normal_decoder_layer),
            "specular_reflectance": jnp.asarray(
                t_net.specular_reflectance.detach().numpy()),
            "lgtSGs": jnp.asarray(t_net.lgtSGs.detach().numpy()),
        }
        return t_net, cfg, params

    def test_forward_parity(self, pair):
        import torch
        t_net, cfg, params = pair
        x = (np.random.default_rng(3).standard_normal((16, 3)) * 0.4).astype(np.float32)
        # kill the AE perturbation so both sides are deterministic
        orig_randn = torch.randn
        torch.randn = lambda *a, **k: torch.zeros(*a)
        try:
            with torch.no_grad():
                want = t_net(torch.from_numpy(x), train_spec=True)
        finally:
            torch.randn = orig_randn
        got = em.envmap_material_apply(params, cfg, jnp.asarray(x), key=None,
                                       train_spec=True)
        np.testing.assert_allclose(np.asarray(got.roughness),
                                   want["sg_roughness"].numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.metallic),
                                   want["sg_metallic"].numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.diffuse_albedo),
                                   want["sg_diffuse_albedo"].numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.normal_map),
                                   want["sg_normal_map"].numpy(), rtol=2e-3, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got.lgt_sgs),
                                   want["sg_lgtSGs"].detach().numpy(), rtol=1e-5)

    def test_init_statistics(self):
        """Fresh init matches the reference's init invariants: gray mu,
        lambda >= 10, total energy ~ 2pi*0.8, duplicated fibonacci lobes."""
        cfg = em.EnvmapMaterialConfig(num_lgt_sgs=128)
        sgs = np.asarray(em.init_lgt_sgs(jax.random.PRNGKey(0), cfg))
        assert (sgs[:, 3] >= 10).all()
        np.testing.assert_allclose(sgs[:, 5], sgs[:, 4], rtol=1e-6)
        np.testing.assert_allclose(sgs[:, 6], sgs[:, 4], rtol=1e-6)
        energy = np.asarray(em.compute_energy(jnp.asarray(sgs))).sum(0)
        np.testing.assert_allclose(energy, 2 * np.pi * 0.8, rtol=1e-3)
        np.testing.assert_allclose(sgs[:64, :3], sgs[64:, :3], atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(sgs[:64, :3], axis=-1), 1.0,
                                   rtol=1e-4)

    def test_fibonacci_parity(self, ref_mod):
        want = ref_mod.fibonacci_sphere(64)
        got = em.fibonacci_sphere(64)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


class TestVisNetwork:
    def test_forward_parity(self, ref_idr):
        import torch
        torch.manual_seed(4)
        t_net = ref_idr.VisNetwork(points_multires=10, dirs_multires=4,
                                   dims=[128, 128, 128, 128])
        cfg = vis.VisNetConfig(points_multires=10, dirs_multires=4,
                               dims=(128, 128, 128, 128))
        params = _seq_linears_to_params(t_net.vis_layer)
        rng = np.random.default_rng(4)
        p = rng.standard_normal((30, 3)).astype(np.float32)
        d = rng.standard_normal((30, 3)).astype(np.float32)
        with torch.no_grad():
            want = t_net(torch.from_numpy(p), torch.from_numpy(d)).numpy()
        got = np.asarray(vis.visnet_apply(params, cfg, jnp.asarray(p), jnp.asarray(d)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestIndirectIllum:
    def test_forward_parity(self, ref_idr):
        import torch
        torch.manual_seed(5)
        t_net = ref_idr.IndirctIllumNetwork(multires=10, dims=[128, 128, 128, 128],
                                            num_lgt_sgs=24)
        cfg = vis.IndirIllumConfig(multires=10, dims=(128, 128, 128, 128),
                                   num_lgt_sgs=24)
        params = {
            "lobe_layer": _seq_linears_to_params(t_net.lobe_layer),
            "integral_layer": _ae_to_params(t_net.integral_layer),
        }
        rng = np.random.default_rng(5)
        p = (rng.standard_normal((12, 3)) * 0.4).astype(np.float32)
        shift = rng.standard_normal((12, 1)).astype(np.float32)
        orig_randn = torch.randn
        torch.randn = lambda *a, **k: torch.zeros(*a)
        try:
            with torch.no_grad():
                want_sgs, want_int = t_net(torch.from_numpy(p), torch.from_numpy(shift))
        finally:
            torch.randn = orig_randn
        got_sgs, got_int = vis.indirect_apply(params, cfg, jnp.asarray(p),
                                              jnp.asarray(shift), key=None)
        np.testing.assert_allclose(np.asarray(got_sgs), want_sgs.numpy(),
                                   rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_int), want_int.numpy(),
                                   rtol=2e-4, atol=1e-5)


def test_cesr_dropout_iter_minus2_softplus_latent():
    """truck-config variant: dropout_iter=-2 switches the spec-BRDF
    encoder's latent activation to softplus (train_cesr.py:186-188)."""
    import dataclasses
    from robir_tpu.stages.cesr import CESRRunner, CESRStageConfig
    from robir_tpu.stages.stage2_runner import init_stage2_params

    from robir_tpu.render.stage2 import Stage2Config
    from robir_tpu.fields.neus_model import NeuSConfig
    from robir_tpu.fields.sdf import SDFConfig
    from robir_tpu.fields.radiance import RenderingConfig
    from robir_tpu.fields.envmap_material import EnvmapMaterialConfig
    from robir_tpu.fields.visibility import IndirIllumConfig, VisNetConfig
    from robir_tpu.render.color import ToneMapConfig
    from robir_tpu.tracing.grid import GridConfig
    cfg = Stage2Config(
        neus=NeuSConfig(sdf=SDFConfig(d_out=17, d_hidden=16, n_layers=2,
                                      skip_in=(), multires=2),
                        color=RenderingConfig(d_feature=16, d_hidden=16,
                                              n_layers=1)),
        envmap=EnvmapMaterialConfig(multires=2, num_lgt_sgs=4,
                                    encoder_dims=(16,), decoder_dims=(16,),
                                    latent_dim=8),
        indirect=IndirIllumConfig(multires=2, dims=(16,), num_lgt_sgs=4),
        visnet=VisNetConfig(points_multires=2, dirs_multires=2, dims=(16,)),
        tonemap=ToneMapConfig(hdr_mode=2),
        grid=GridConfig(resolution=8))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)

    class _DS:
        n_cameras = 1

    sc = CESRStageConfig(num_lights=4, dropout_iter=-2)
    r = CESRRunner(cfg, params, _DS(), sc)
    assert r.cfg.envmap.spec_lc_act == "softplus"
    assert r.cfg.envmap.spec_brdf_ae.lc_act == "softplus"
