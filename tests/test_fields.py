"""Field-network parity vs the PyTorch reference (weight-transferred)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.fields import sdf as sdf_mod
from robir_tpu.fields import radiance as rad_mod
from robir_tpu.fields.encoding import PEConfig, positional_encoding
from robir_tpu.fields.neus_model import (NeuSConfig, NeuS, VarianceConfig,
                                         init_neus, init_variance,
                                         variance_apply)
from tests.conftest import has_reference

pytestmark = [pytest.mark.skipif(not has_reference(),
                                 reason="reference not mounted"),
              pytest.mark.slow]


def _torch_linear_to_params(lin, weight_norm: bool):
    """Convert a torch Linear (possibly weight_norm-wrapped) to our layout."""
    if weight_norm:
        v = lin.weight_v.detach().numpy().T  # [in, out]
        g = lin.weight_g.detach().numpy().reshape(-1)  # [out]
        b = lin.bias.detach().numpy()
        return {"v": jnp.asarray(v), "g": jnp.asarray(g), "b": jnp.asarray(b)}
    w = lin.weight.detach().numpy().T
    b = lin.bias.detach().numpy()
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def test_pe_matches_reference():
    from tests.ref_loader import import_reference_module
    import torch
    fields = import_reference_module("model.neus_model")
    # reference stage-2 PE: model/neus_model.py class PE
    ref_pe = fields.PE(input_dims=3, num_freq=6)
    x = np.random.default_rng(0).standard_normal((17, 3)).astype(np.float32)
    want = ref_pe.embed(torch.from_numpy(x)).numpy()
    got = np.asarray(positional_encoding(jnp.asarray(x), PEConfig(num_freqs=6)))
    assert got.shape == want.shape == (17, 3 + 3 * 2 * 6)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ipe_matches_reference():
    from tests.ref_loader import import_reference_module
    import torch
    from robir_tpu.fields.encoding import IPEConfig, ipe_isotropic
    fields = import_reference_module("model.neus_model")
    ipe = fields.IPE(min_deg=0, max_deg=6, in_dim=3)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((23, 3)).astype(np.float32)
    cov = fields.isotropic_cov(torch.from_numpy(x), 0.005)
    want = ipe(torch.from_numpy(x), cov).numpy()
    got = np.asarray(ipe_isotropic(jnp.asarray(x), IPEConfig(0, 6), var=0.005))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestSDFParity:
    @pytest.fixture(scope="class")
    def pair(self):
        from tests.ref_loader import import_reference_module
        import torch
        torch.manual_seed(0)
        nf = import_reference_module("model.neus_model")
        ref = nf.SDFNetwork(d_in=3, d_out=257, d_hidden=256, n_layers=8,
                            skip_in=[4], multires=6, bias=0.5, scale=1.0,
                            geometric_init=True, weight_norm=True)
        cfg = sdf_mod.SDFConfig(d_in=3, d_out=257, d_hidden=256, n_layers=8,
                                skip_in=(4,), multires=6, bias=0.5, scale=1.0)
        params = {
            f"lin{i}": _torch_linear_to_params(getattr(ref, f"lin{i}"), True)
            for i in range(9)
        }
        return ref, cfg, params

    def test_forward(self, pair):
        import torch
        ref, cfg, params = pair
        x = np.random.default_rng(2).standard_normal((64, 3)).astype(np.float32) * 0.5
        with torch.no_grad():
            want = ref(torch.from_numpy(x)).numpy()
        got = np.asarray(sdf_mod.sdf_apply(params, cfg, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_gradient(self, pair):
        import torch
        ref, cfg, params = pair
        x = np.random.default_rng(3).standard_normal((32, 3)).astype(np.float32) * 0.5
        want = ref.gradient(torch.from_numpy(x)).squeeze(1).detach().numpy()
        got = np.asarray(sdf_mod.sdf_gradient(params, cfg, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-4)

    def test_value_and_gradient_consistent(self, pair):
        _, cfg, params = pair
        x = jnp.asarray(np.random.default_rng(4).standard_normal((16, 3)), jnp.float32)
        v1 = sdf_mod.sdf_value(params, cfg, x)
        v2, g2 = sdf_mod.sdf_value_and_gradient(params, cfg, x)
        g1 = sdf_mod.sdf_gradient(params, cfg, x)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)

    def test_geometric_init_is_sphere(self):
        """Fresh geometric init should give SDF ~ |x| - bias."""
        cfg = sdf_mod.SDFConfig(multires=6, bias=0.5)
        params = sdf_mod.init_sdf(jax.random.PRNGKey(0), cfg)
        dirs = np.random.default_rng(5).standard_normal((100, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        means = []
        for r in [0.2, 0.5, 1.0]:
            vals = np.asarray(sdf_mod.sdf_value(params, cfg, jnp.asarray(dirs * r)))
            means.append(vals.mean())
            # loose sphere (the torch geometric init is equally loose)
            assert abs(vals.mean() - (r - 0.5)) < 0.2, (r, vals.mean())
        assert means[0] < 0 < means[2] and means == sorted(means)


class TestRenderingParity:
    def test_forward(self):
        from tests.ref_loader import import_reference_module
        import torch
        torch.manual_seed(1)
        nf = import_reference_module("model.neus_model")
        ref = nf.RenderingNetwork(d_feature=256, mode="idr", d_in=9, d_out=3,
                                  d_hidden=256, n_layers=4, weight_norm=True,
                                  multires_view=4)
        cfg = rad_mod.RenderingConfig(d_feature=256, mode="idr", d_in=9,
                                      d_out=3, d_hidden=256, n_layers=4,
                                      multires_view=4)
        params = {
            f"lin{i}": _torch_linear_to_params(getattr(ref, f"lin{i}"), True)
            for i in range(5)
        }
        rng = np.random.default_rng(6)
        pts = rng.standard_normal((40, 3)).astype(np.float32)
        nrm = rng.standard_normal((40, 3)).astype(np.float32)
        dirs = rng.standard_normal((40, 3)).astype(np.float32)
        feat = rng.standard_normal((40, 256)).astype(np.float32)
        with torch.no_grad():
            want = ref(*(torch.from_numpy(a) for a in (pts, nrm, dirs, feat))).numpy()
        got = np.asarray(rad_mod.rendering_apply(
            params, cfg, *(jnp.asarray(a) for a in (pts, nrm, dirs, feat))))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestNeRFBgParity:
    def test_forward(self):
        from tests.ref_loader import import_reference_module
        import torch
        torch.manual_seed(2)
        nf = import_reference_module("model.neus_model")
        ref = nf.NeRF(d_in=4)
        cfg = rad_mod.NeRFBgConfig(d_in=4)
        params = {}
        for i, lin in enumerate(ref.pts_linears):
            params[f"pts_lin{i}"] = _torch_linear_to_params(lin, False)
        params["views_lin0"] = _torch_linear_to_params(ref.views_linears[0], False)
        params["feature"] = _torch_linear_to_params(ref.feature_linear, False)
        params["alpha"] = _torch_linear_to_params(ref.alpha_linear, False)
        params["rgb"] = _torch_linear_to_params(ref.rgb_linear, False)

        rng = np.random.default_rng(7)
        pts = rng.standard_normal((30, 4)).astype(np.float32)
        views = rng.standard_normal((30, 3)).astype(np.float32)
        with torch.no_grad():
            want_a, want_rgb = ref(torch.from_numpy(pts), torch.from_numpy(views))
        got_a, got_rgb = rad_mod.nerf_bg_apply(params, cfg, jnp.asarray(pts),
                                               jnp.asarray(views))
        np.testing.assert_allclose(np.asarray(got_a), want_a.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_rgb), want_rgb.numpy(), rtol=1e-4, atol=1e-5)


def test_variance():
    p = init_variance(VarianceConfig(0.3))
    assert float(variance_apply(p)) == pytest.approx(float(np.exp(3.0)), rel=1e-5)


def test_neus_facade_shapes():
    cfg = NeuSConfig(sdf=sdf_mod.SDFConfig(d_hidden=64, n_layers=4, multires=4,
                                           d_out=65),
                     color=rad_mod.RenderingConfig(d_feature=64, d_hidden=64,
                                                   n_layers=2))
    params = init_neus(jax.random.PRNGKey(0), cfg)
    model = NeuS(params, cfg)
    x = jnp.zeros((10, 3))
    assert model.sdf(x).shape == (10, 1)
    s, f = model.sdf_and_feat(x)
    assert s.shape == (10, 1) and f.shape == (10, 64)
    assert model.grad(x).shape == (10, 3)
    c = model.color(x, model.grad(x), x, f)
    assert c.shape == (10, 3)
    assert float(model.inv_s()) > 0


class TestStorageDtype:
    """bf16 activation-storage mode (fields/mlp.apply_linear storage_dtype):
    the TPU-shipped config. Outputs stay fp32; values match the fp32 path
    to bf16 rounding; gradients flow."""

    def test_sdf_close_and_fp32_out(self):
        import dataclasses
        from robir_tpu.fields.sdf import (SDFConfig, init_sdf, sdf_apply,
                                          sdf_full_and_gradient)
        cfg = SDFConfig(d_out=33, d_hidden=64, n_layers=4, skip_in=(2,),
                        multires=4)
        p = init_sdf(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (128, 3),
                               minval=-1.0, maxval=1.0)
        bcfg = dataclasses.replace(cfg, storage_dtype="bfloat16")
        a = sdf_apply(p, cfg, x)
        b = sdf_apply(p, bcfg, x)
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-2)
        # second-order structure still differentiates
        def loss(pp):
            full, g = sdf_full_and_gradient(pp, bcfg, x)
            return (jnp.mean(full[:, 0] ** 2)
                    + jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2))
        grads = jax.grad(loss)(p)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)

    def test_rendering_and_visnet_close(self):
        import dataclasses
        from robir_tpu.fields.radiance import (RenderingConfig,
                                               init_rendering,
                                               rendering_apply)
        from robir_tpu.fields.visibility import (VisNetConfig, init_visnet,
                                                 visnet_apply)
        rc = RenderingConfig(d_feature=32, d_hidden=64, n_layers=3)
        rp = init_rendering(jax.random.PRNGKey(0), rc)
        n = 64
        pts = jax.random.normal(jax.random.PRNGKey(1), (n, 3))
        nrm = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
        feat = jax.random.normal(jax.random.PRNGKey(2), (n, 32)) * 0.1
        a = rendering_apply(rp, rc, pts, nrm, nrm, feat)
        b = rendering_apply(
            rp, dataclasses.replace(rc, storage_dtype="bfloat16"),
            pts, nrm, nrm, feat)
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)

        vc = VisNetConfig(points_multires=4, dirs_multires=4, dims=(64, 64))
        vp = init_visnet(jax.random.PRNGKey(3), vc)
        a = visnet_apply(vp, vc, pts, nrm)
        b = visnet_apply(
            vp, dataclasses.replace(vc, storage_dtype="bfloat16"), pts, nrm)
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2)

    def test_visnet_outer_matches_broadcast(self):
        """Factorized sweep (first layer on the factors) == dense broadcast
        evaluation, fp32-exact up to dot reassociation."""
        from robir_tpu.fields.visibility import (VisNetConfig, init_visnet,
                                                 visnet_apply,
                                                 visnet_outer_apply)
        cfg = VisNetConfig(points_multires=4, dirs_multires=4, dims=(64, 64))
        p = init_visnet(jax.random.PRNGKey(0), cfg)
        N, K = 12, 40
        pts = jax.random.normal(jax.random.PRNGKey(1), (N, 3)) * 0.4
        dirs = jax.random.normal(jax.random.PRNGKey(2), (K, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        want = visnet_apply(
            p, cfg,
            jnp.broadcast_to(pts[:, None, :], (N, K, 3)),
            jnp.broadcast_to(dirs[None, :, :], (N, K, 3)))
        got = visnet_outer_apply(p, cfg, pts, dirs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # bf16-storage variant stays close
        import dataclasses
        got16 = visnet_outer_apply(
            p, dataclasses.replace(cfg, storage_dtype="bfloat16"), pts, dirs)
        np.testing.assert_allclose(np.asarray(got16), np.asarray(want),
                                   atol=0.1)


def test_grid_embed_matches_torch_grid_sample():
    """Grid embedder (neus/model/embedders.py:107-124) vs
    F.grid_sample(align_corners=False) directly — inside, outside, and
    boundary-straddling coords."""
    import torch
    import torch.nn.functional as F
    from robir_tpu.fields.encoding import (GridEmbedConfig, grid_embed,
                                           init_grid_embed)

    cfg = GridEmbedConfig(n_cells=9, out_dim=5)
    params = init_grid_embed(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-0.95, 0.95, (64, 3)),
        rng.uniform(-1.3, 1.3, (64, 3)),           # partially outside
        np.array([[1.0, -1.0, 0.0], [0.0, 0.0, 0.0]]),
    ]).astype(np.float32)

    ours = np.asarray(grid_embed(params, cfg, jnp.asarray(pts)))

    g = torch.from_numpy(np.asarray(params["grid"], np.float32))[None]
    tin = torch.from_numpy(pts).view(1, -1, 1, 1, 3)
    ref = F.grid_sample(g, tin, align_corners=False)
    ref = ref.view(cfg.out_dim, -1).permute(1, 0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    # gradient flows to the grid parameter (it's learnable in the reference)
    grad = jax.grad(lambda p: jnp.sum(
        grid_embed(p, cfg, jnp.asarray(pts[:64])) ** 2))(params)
    assert float(jnp.abs(grad["grid"]).sum()) > 0


class TestManualGradient:
    """grad_mode="manual" must reproduce the vmap(grad) formulation: it is
    the same matmul/sigmoid chain written as plain batched ops."""

    def _pair(self, storage_dtype=None, skip_in=(4,), n_layers=8):
        import dataclasses
        cfg = sdf_mod.SDFConfig(multires=6, skip_in=skip_in,
                                n_layers=n_layers,
                                storage_dtype=storage_dtype)
        params = sdf_mod.init_sdf(jax.random.PRNGKey(7), cfg)
        # perturb away from the symmetric geometric init
        params = jax.tree_util.tree_map(
            lambda p: p + 0.01 * jax.random.normal(
                jax.random.PRNGKey(int(p.size) % 97), p.shape), params)
        man = dataclasses.replace(cfg, grad_mode="manual")
        return cfg, man, params

    def test_fp32_matches_vjp(self):
        cfg, man, params = self._pair()
        x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 3)),
                        jnp.float32) * 0.5
        f0, g0 = sdf_mod.sdf_full_and_gradient(params, cfg, x)
        f1, g1 = sdf_mod.sdf_full_and_gradient(params, man, x)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-4, atol=1e-6)

    def test_second_order_param_grads_match(self):
        """The outer (training) gradient through the spatial gradient must
        match: loss = sum(grad_x ** 2) + sum(full ** 2)."""
        cfg, man, params = self._pair()
        x = jnp.asarray(np.random.default_rng(1).standard_normal((32, 3)),
                        jnp.float32) * 0.5

        def loss(pp, c):
            full, g = sdf_mod.sdf_full_and_gradient(pp, c, x)
            return jnp.sum(g ** 2) + 1e-3 * jnp.sum(full ** 2)

        g0 = jax.grad(lambda pp: loss(pp, cfg))(params)
        g1 = jax.grad(lambda pp: loss(pp, man))(params)
        for k0, k1 in zip(jax.tree_util.tree_leaves(g0),
                          jax.tree_util.tree_leaves(g1)):
            # different-but-equivalent graphs accumulate in different
            # orders; tolerance is fp32 reassociation noise
            np.testing.assert_allclose(np.asarray(k1), np.asarray(k0),
                                       rtol=5e-4, atol=1e-4)

    def test_bf16_storage_close(self):
        cfg, man, params = self._pair(storage_dtype="bfloat16")
        x = jnp.asarray(np.random.default_rng(2).standard_normal((64, 3)),
                        jnp.float32) * 0.5
        f0, g0 = sdf_mod.sdf_full_and_gradient(params, cfg, x)
        f1, g1 = sdf_mod.sdf_full_and_gradient(params, man, x)
        # identical op sequence in the same storage dtype -> bf16-noise close
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=5e-2, atol=5e-2)

    def test_skip_at_last_layer(self):
        cfg, man, params = self._pair(skip_in=(2, 3), n_layers=3)
        x = jnp.asarray(np.random.default_rng(3).standard_normal((16, 3)),
                        jnp.float32) * 0.5
        f0, g0 = sdf_mod.sdf_full_and_gradient(params, cfg, x)
        f1, g1 = sdf_mod.sdf_full_and_gradient(params, man, x)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   rtol=1e-4, atol=1e-6)


class TestOutColsSlice:
    """sdf_value / NeuS.sdf restrict the head to the sdf column
    (fields/sdf.py _slice_out_cols) — exact column slicing up to matmul
    reassociation; bit-exact under bf16 storage."""

    def test_fp32_reassociation_close(self):
        import dataclasses
        cfg = sdf_mod.SDFConfig(d_out=33, d_hidden=32, n_layers=3,
                                skip_in=(), multires=3)
        params = sdf_mod.init_sdf(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(np.random.default_rng(0).standard_normal((64, 3)),
                        jnp.float32) * 0.5
        full = sdf_mod.sdf_apply(params, cfg, x)
        sliced = sdf_mod.sdf_apply(params, cfg, x, out_cols=1)
        assert sliced.shape == (64, 1)
        np.testing.assert_allclose(np.asarray(sliced),
                                   np.asarray(full[..., :1]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(sdf_mod.sdf_value(params, cfg, x)),
            np.asarray(sliced))

    def test_bf16_storage_bit_exact(self):
        import dataclasses
        cfg = sdf_mod.SDFConfig(d_out=33, d_hidden=32, n_layers=3,
                                skip_in=(), multires=3,
                                storage_dtype="bfloat16")
        params = sdf_mod.init_sdf(jax.random.PRNGKey(1), cfg)
        x = jnp.asarray(np.random.default_rng(1).standard_normal((64, 3)),
                        jnp.float32) * 0.5
        full = sdf_mod.sdf_apply(params, cfg, x)
        sliced = sdf_mod.sdf_apply(params, cfg, x, out_cols=1)
        np.testing.assert_array_equal(np.asarray(sliced),
                                      np.asarray(full[..., :1]))

    def test_skip_at_head_layer(self):
        # out_cols must compose with a skip connection AT the head layer
        cfg = sdf_mod.SDFConfig(d_out=17, d_hidden=16, n_layers=3,
                                skip_in=(2, 3), multires=2)
        params = sdf_mod.init_sdf(jax.random.PRNGKey(2), cfg)
        x = jnp.asarray(np.random.default_rng(2).standard_normal((8, 3)),
                        jnp.float32) * 0.5
        full = sdf_mod.sdf_apply(params, cfg, x)
        sliced = sdf_mod.sdf_apply(params, cfg, x, out_cols=1)
        np.testing.assert_allclose(np.asarray(sliced),
                                   np.asarray(full[..., :1]),
                                   rtol=1e-4, atol=1e-6)
