"""Mip renderer parity vs reference + VNeRF/SH/hash-grid checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.fields.hashgrid import HashGridConfig, hashgrid_encode, init_hashgrid
from robir_tpu.fields.vnerf import (VNeRFConfig, eval_sh, init_vnerf,
                                    mipnerf_apply, vnerf_apply)
from robir_tpu.render import mip
from robir_tpu.render.neus import Rays
from tests.conftest import has_reference

pytestmark = pytest.mark.slow


def _rand_rays(n=6, seed=0):
    rng = np.random.default_rng(seed)
    o = np.zeros((n, 3), np.float32)
    d = rng.standard_normal((n, 3)).astype(np.float32)
    v = d / np.linalg.norm(d, -1, keepdims=True)
    radii = np.full((n, 1), 0.01, np.float32)
    ones = np.ones((n, 1), np.float32)
    return o, d, v, radii, ones


class TestMipParityVsTorch:
    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_gaussians_and_sampling(self):
        from tests.ref_loader import import_neus_module, patch_torch_cpu
        patch_torch_cpu()
        import torch
        ref = import_neus_module("volume_render.mip_render")
        o, d, v, radii, ones = _rand_rays()
        t_vals = np.sort(np.random.default_rng(1).uniform(
            1.0, 5.0, (6, 9)).astype(np.float32), -1)

        want_m, want_c = ref.cast_rays(torch.from_numpy(t_vals),
                                       torch.from_numpy(o),
                                       torch.from_numpy(d),
                                       torch.from_numpy(radii), diag=True)
        got_m, got_c = mip.cast_rays(jnp.asarray(t_vals), jnp.asarray(o),
                                     jnp.asarray(d), jnp.asarray(radii))
        np.testing.assert_allclose(np.asarray(got_m), want_m.numpy(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(),
                                   rtol=1e-5, atol=1e-7)

        # deterministic stratified sampling
        want_t = ref.sample_along_rays(
            torch.from_numpy(o), torch.from_numpy(d), torch.from_numpy(radii),
            8, torch.from_numpy(ones * 1.0), torch.from_numpy(ones * 5.0),
            False, False, cast_cone=False)
        got_t, _ = mip.sample_along_rays(None, jnp.asarray(o), jnp.asarray(d),
                                         jnp.asarray(radii), 8,
                                         jnp.asarray(ones), jnp.asarray(ones * 5),
                                         randomized=False)
        np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(),
                                   rtol=1e-5, atol=1e-6)

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_piecewise_pdf(self):
        from tests.ref_loader import import_neus_module, patch_torch_cpu
        patch_torch_cpu()
        import torch
        ref = import_neus_module("volume_render.mip_render")
        rng = np.random.default_rng(2)
        bins = np.sort(rng.uniform(0, 4, (5, 9)).astype(np.float32), -1)
        weights = rng.random((5, 8)).astype(np.float32)
        want = ref.sorted_piecewise_constant_pdf(
            torch.from_numpy(bins.copy()), torch.from_numpy(weights.copy()),
            6, False).numpy()
        got = np.asarray(mip.sorted_piecewise_constant_pdf(
            None, jnp.asarray(bins), jnp.asarray(weights), 6, False))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_density_process(self):
        from tests.ref_loader import import_neus_module, patch_torch_cpu
        patch_torch_cpu()
        import torch
        import torch.nn.functional as F
        ref = import_neus_module("volume_render.mip_render")
        rng = np.random.default_rng(3)
        B, S = 4, 8
        raw_rgb = rng.standard_normal((B, S, 3)).astype(np.float32)
        raw_density = rng.standard_normal((B, S, 1)).astype(np.float32)
        t_vals = np.sort(rng.uniform(1, 5, (B, S + 1)).astype(np.float32), -1)
        d = rng.standard_normal((B, 3)).astype(np.float32)

        want = ref.density_process(
            torch.from_numpy(raw_rgb), torch.from_numpy(raw_density), None,
            None, torch.from_numpy(t_vals), torch.from_numpy(d),
            rgb_activation=torch.sigmoid, density_bias=-1.0,
            density_activation=F.softplus, white_bkgd=True)
        cfg = mip.MipRenderConfig(white_bkgd=True, density_bias=-1.0,
                                  density_activation="softplus")
        got = mip.density_process(jnp.asarray(raw_rgb), jnp.asarray(raw_density),
                                  jnp.asarray(t_vals), jnp.asarray(d), cfg)
        for k in ("rgb", "acc", "weights"):
            np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(),
                                       rtol=1e-4, atol=1e-5, err_msg=k)

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_eval_sh_parity(self):
        from tests.ref_loader import import_neus_module, patch_torch_cpu
        patch_torch_cpu()
        import torch
        m = import_neus_module("misc.math")
        rng = np.random.default_rng(4)
        sh = rng.standard_normal((10, 3, 25)).astype(np.float32)
        dirs = rng.standard_normal((10, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, -1, keepdims=True)
        for deg in (0, 1, 2, 3, 4):
            # the reference indexes sh_arr[k] per basis fn (list layout)
            sh_list = [torch.from_numpy(sh[..., k])
                       for k in range((deg + 1) ** 2)]
            want = m.eval_sh(deg, sh_list, torch.from_numpy(dirs)).numpy()
            got = np.asarray(eval_sh(deg, jnp.asarray(sh[..., :(deg + 1) ** 2]),
                                     jnp.asarray(dirs)))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                       err_msg=f"deg {deg}")


class TestVNeRFRender:
    def test_full_mip_render(self):
        cfg = VNeRFConfig(depth=2, width=32, multires=4, use_ipe=True,
                          ipe_max_deg=6)
        params = init_vnerf(jax.random.PRNGKey(0), cfg)
        o, d, v, radii, ones = _rand_rays()
        rays = Rays(*[jnp.asarray(a) for a in
                      [o, d, v, radii, ones, ones * 1.0, ones * 5.0]])
        rcfg = mip.MipRenderConfig(n_levels=2, num_samples=8)
        out = mip.render_mip(jax.random.PRNGKey(1), rays,
                             lambda m, c, vd: mipnerf_apply(params, cfg, m, c, vd),
                             rcfg)
        assert len(out) == 2
        fine = out[-1]
        assert fine["rgb"].shape == (6, 3)
        assert np.isfinite(np.asarray(fine["rgb"])).all()
        # differentiable end to end
        g = jax.grad(lambda p: jnp.mean(mip.render_mip(
            jax.random.PRNGKey(1), rays,
            lambda m, c, vd: mipnerf_apply(p, cfg, m, c, vd), rcfg)[-1]["rgb"]))(params)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))

    def test_vnerf_shapes(self):
        cfg = VNeRFConfig(depth=2, width=32, multires=4)
        params = init_vnerf(jax.random.PRNGKey(0), cfg)
        pts = jnp.zeros((4, 8, 3))
        dirs = jnp.asarray(np.tile([[0, 0, 1.0]], (4, 1)).astype(np.float32))
        rgb, density = vnerf_apply(params, cfg, pts, dirs)
        assert rgb.shape == (4, 8, 3) and density.shape == (4, 8, 1)


class TestHashGrid:
    def test_interpolation_smoothness(self):
        cfg = HashGridConfig(n_levels=4, log2_hashmap_size=12)
        params = init_hashgrid(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (50, 3)),
                        jnp.float32)
        f = hashgrid_encode(params, cfg, x)
        assert f.shape == (50, 8)
        f2 = hashgrid_encode(params, cfg, x + 1e-5)
        assert float(jnp.abs(f - f2).max()) < 1e-5  # continuous

    def test_gradient_flows_to_tables(self):
        cfg = HashGridConfig(n_levels=2, log2_hashmap_size=10)
        params = init_hashgrid(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (20, 3)),
                        jnp.float32)
        g = jax.grad(lambda p: jnp.sum(hashgrid_encode(p, cfg, x) ** 2))(params)
        assert float(jnp.abs(g["tables"]).sum()) > 0


def test_hash_sdf_field():
    from robir_tpu.fields.hashgrid import (HashGridConfig, HashSDFConfig,
                                           hash_sdf_apply, init_hash_sdf)
    cfg = HashSDFConfig(grid=HashGridConfig(n_levels=4, log2_hashmap_size=10),
                        d_out=17, width=32, depth=2)
    params = init_hash_sdf(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (40, 3)), jnp.float32)
    out = hash_sdf_apply(params, cfg, x)
    assert out.shape == (40, 17)
    g = jax.grad(lambda p: jnp.sum(hash_sdf_apply(p, cfg, x) ** 2))(params)
    assert float(jnp.abs(g["hash"]["tables"]).sum()) > 0


class TestSimilarityProcessParity:
    """'sim'/'sdf'/'raw' compositors vs reference similarity_process
    (mip_render.py:87-198). VERDICT r1 #10."""

    def _inputs(self, c_density=8, seed=0):
        rng = np.random.default_rng(seed)
        B, S = 5, 12
        raw_rgb = rng.standard_normal((B, S, 3)).astype(np.float32)
        raw_density = rng.standard_normal((B, S, c_density)).astype(np.float32)
        t_vals = np.sort(rng.uniform(1.0, 5.0, (B, S + 1)).astype(np.float32), -1)
        d = rng.standard_normal((B, 3)).astype(np.float32)
        means = rng.standard_normal((B, S, 3)).astype(np.float32) * 0.6
        return raw_rgb, raw_density, t_vals, d, means

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_sim_mode(self):
        from tests.ref_loader import import_neus_module, patch_torch_cpu
        patch_torch_cpu()
        import torch
        ref = import_neus_module("volume_render.mip_render")
        raw_rgb, raw_density, t_vals, d, means = self._inputs()

        want = ref.similarity_process(
            torch.from_numpy(raw_rgb), torch.from_numpy(raw_density),
            torch.from_numpy(means), None, torch.from_numpy(t_vals),
            torch.from_numpy(d), raw_noise_std=0.0, white_bkgd=True,
            mode="sim")
        cfg = mip.MipRenderConfig(white_bkgd=True, mode="sim")
        got = mip.similarity_process(
            jnp.asarray(raw_rgb), jnp.asarray(raw_density),
            jnp.asarray(means), jnp.asarray(t_vals), jnp.asarray(d), cfg,
            mode="sim")
        for k in ("rgb", "dist", "acc", "weights", "sim_or_grad"):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       want[k].detach().numpy(),
                                       rtol=2e-5, atol=1e-5, err_msg=k)

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_raw_mode(self):
        from tests.ref_loader import import_neus_module, patch_torch_cpu
        patch_torch_cpu()
        import torch
        ref = import_neus_module("volume_render.mip_render")
        raw_rgb, raw_density, t_vals, d, means = self._inputs(c_density=1)
        raw_density = raw_density[..., 0]

        want = ref.similarity_process(
            torch.from_numpy(raw_rgb), torch.from_numpy(raw_density),
            torch.from_numpy(means), None, torch.from_numpy(t_vals),
            torch.from_numpy(d), raw_noise_std=0.0, white_bkgd=False,
            mode="raw")
        cfg = mip.MipRenderConfig(white_bkgd=False, mode="raw")
        got = mip.similarity_process(
            jnp.asarray(raw_rgb), jnp.asarray(raw_density),
            jnp.asarray(means), jnp.asarray(t_vals), jnp.asarray(d), cfg,
            mode="raw")
        for k in ("rgb", "dist", "acc", "weights"):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       want[k].detach().numpy(),
                                       rtol=2e-5, atol=1e-5, err_msg=k)

    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_sdf_mode(self):
        """NeuS-style section compositing: analytic sphere SDF stand-in;
        reference auto-anneal starts at ratio 0 (mip_render.py:141-146),
        so cos_anneal_ratio=0 matches the first reference call."""
        from tests.ref_loader import import_neus_module, patch_torch_cpu
        patch_torch_cpu()
        import torch
        ref = import_neus_module("volume_render.mip_render")
        raw_rgb, _, t_vals, d, means = self._inputs(c_density=1)
        B, S = means.shape[:2]
        sdf_np = (np.linalg.norm(means, axis=-1) - 0.5).astype(np.float32)

        class TorchSphere:
            def grad(self, x):
                return x / torch.linalg.norm(x, dim=-1, keepdim=True)

            def dev(self, x):
                return torch.full((x.shape[0], 1), 20.0)

            def radius(self):
                return 1.0

        class JaxSphere:
            def grad(self, x):
                return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

            def dev(self, x):
                return jnp.full((x.shape[0], 1), 20.0)

            def radius(self):
                return 1.0

        # fresh auto-anneal state
        if hasattr(ref.similarity_process, "__cos_anneal_ratio"):
            delattr(ref.similarity_process, "__cos_anneal_ratio")
        want = ref.similarity_process(
            torch.from_numpy(raw_rgb), torch.from_numpy(sdf_np),
            torch.from_numpy(means), TorchSphere(),
            torch.from_numpy(t_vals), torch.from_numpy(d),
            raw_noise_std=0.0, white_bkgd=True, mode="sdf")
        cfg = mip.MipRenderConfig(white_bkgd=True, mode="sdf")
        got = mip.similarity_process(
            jnp.asarray(raw_rgb), jnp.asarray(sdf_np), jnp.asarray(means),
            jnp.asarray(t_vals), jnp.asarray(d), cfg, mode="sdf",
            model=JaxSphere(), cos_anneal_ratio=0.0)
        for k in ("rgb", "dist", "acc", "weights"):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       want[k].detach().numpy(),
                                       rtol=2e-5, atol=1e-5, err_msg=k)
        # analytic unit normals -> eikonal error is fp noise on both sides
        np.testing.assert_allclose(float(got["sim_or_grad"]),
                                   float(want["sim_or_grad"]),
                                   rtol=1e-4, atol=1e-9)

    def test_render_mip_sim_mode_end_to_end(self):
        """cfg.mode='sim' routes the full loop through similarity_process."""
        o, dirs, v, radii, ones = _rand_rays()
        rays = Rays(jnp.asarray(o), jnp.asarray(dirs), jnp.asarray(v),
                    jnp.asarray(radii), jnp.asarray(ones),
                    jnp.asarray(ones * 1.0), jnp.asarray(ones * 5.0))

        def model_fn(means, covs, viewdirs):
            B, S = means.shape[:2]
            rgb = jnp.tanh(means)
            sig = jnp.concatenate([means, means ** 2], -1)
            return rgb, sig

        cfg = mip.MipRenderConfig(num_samples=16, mode="sim")
        ret = jax.jit(lambda k: mip.render_mip(k, rays, model_fn, cfg))(
            jax.random.PRNGKey(0))
        assert len(ret) == cfg.n_levels
        for out in ret:
            assert np.isfinite(np.asarray(out["rgb"])).all()
            assert out["sim_or_grad"].shape == out["weights"].shape
