"""NeuS volume-renderer parity vs the PyTorch reference.

With perturb=0 and deterministic importance sampling, the whole render is
deterministic, so weight-transferred models must agree to fp32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.fields import radiance as rad_mod
from robir_tpu.fields import sdf as sdf_mod
from robir_tpu.fields.neus_model import NeuS, NeuSConfig, VarianceConfig, init_neus
from robir_tpu.render import neus as rn
from tests.conftest import has_reference
from tests.test_fields import _torch_linear_to_params

pytestmark = [pytest.mark.skipif(not has_reference(), reason="reference not mounted"), pytest.mark.slow]

SDF_KW = dict(d_in=3, d_out=65, d_hidden=64, n_layers=4, skip_in=(2,),
              multires=4, bias=0.5, scale=1.0)
COLOR_KW = dict(d_feature=64, mode="idr", d_in=9, d_out=3, d_hidden=64,
                n_layers=2, multires_view=4)


def _build_pair():
    """Small SDF+color nets in torch and jax with identical weights."""
    from tests.ref_loader import import_reference_module
    import torch
    torch.manual_seed(0)
    nm = import_reference_module("model.neus_model")
    t_sdf = nm.SDFNetwork(**{**SDF_KW, "skip_in": [2]})
    t_col = nm.RenderingNetwork(**COLOR_KW, weight_norm=True)

    cfg = NeuSConfig(
        sdf=sdf_mod.SDFConfig(**{**SDF_KW, "skip_in": (2,)}),
        color=rad_mod.RenderingConfig(**COLOR_KW),
        variance=VarianceConfig(0.3),
        background=None,
        radius=2.0)
    params = {
        "sdf_network": {f"lin{i}": _torch_linear_to_params(getattr(t_sdf, f"lin{i}"), True)
                        for i in range(5)},
        "color_network": {f"lin{i}": _torch_linear_to_params(getattr(t_col, f"lin{i}"), True)
                          for i in range(3)},
        "deviation_network": {"variance": jnp.float32(0.3)},
    }

    class TorchISDF:
        """Duck-typed ISDF for the reference render_neus."""

        def sdf(self, x):
            return t_sdf.sdf(x)

        def sdf_and_feat(self, x):
            out = t_sdf(x)
            return out[..., :1], out[..., 1:]

        def grad(self, x):
            shape = list(x.shape[:-1]) + [-1]
            return t_sdf.gradient(x.view(-1, 3)).view(shape)

        def color(self, x, gradients, dirs, feature_vector):
            return t_col(x, gradients, dirs, feature_vector)

        def dev(self, x):
            return torch.ones([len(x), 1]) * torch.exp(torch.tensor(0.3) * 10.0)

        def radius(self):
            return 2.0

    return TorchISDF(), NeuS(params, cfg)


def _make_rays(n=8, seed=0):
    rng = np.random.default_rng(seed)
    origins = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
    targets = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    near = np.full((n, 1), 1.5, np.float32)
    far = np.full((n, 1), 4.5, np.float32)
    return origins, dirs, near, far


class TestRenderParity:
    @pytest.fixture(scope="class")
    def models(self):
        return _build_pair()

    @pytest.mark.parametrize("cos_anneal", [0.3, 1.0])
    def test_full_render(self, models, cos_anneal):
        from tests.ref_loader import import_neus_module
        import torch
        t_model, j_model = models
        ref_render = import_neus_module("volume_render.sdf_render")
        origins, dirs, near, far = _make_rays()

        t_rays = ref_render.Rays(
            origins=torch.from_numpy(origins), directions=torch.from_numpy(dirs),
            viewdirs=torch.from_numpy(dirs), radii=torch.zeros(8, 1),
            lossmult=torch.ones(8, 1), near=torch.from_numpy(near),
            far=torch.from_numpy(far))
        with torch.no_grad():
            want = ref_render.render_neus(
                t_rays, t_model, cos_anneal_ratio=cos_anneal, n_samples=16,
                n_importance=16, n_outside=0, up_sample_steps=4,
                white_bkgd=True, perturb=0.0, is_eval=True)

        j_rays = rn.Rays(
            origins=jnp.asarray(origins), directions=jnp.asarray(dirs),
            viewdirs=jnp.asarray(dirs), radii=jnp.zeros((8, 1)),
            lossmult=jnp.ones((8, 1)), near=jnp.asarray(near),
            far=jnp.asarray(far))
        cfg = rn.NeusRenderConfig(n_samples=16, n_importance=16, n_outside=0,
                                  up_sample_steps=4, white_bkgd=True)
        got = rn.render_neus(None, j_rays, j_model, cos_anneal, cfg, is_eval=True)

        np.testing.assert_allclose(np.asarray(got["rgb"]), want["rgb"].numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["acc"]), want["acc"].numpy(),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["gradient_error"]),
                                   want["sim_or_grad"].numpy(), rtol=2e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["dist"]), want["dist"].numpy(),
                                   rtol=1e-3, atol=1e-3)

    def test_sample_pdf_det(self):
        from tests.ref_loader import import_neus_module
        import torch
        ref_render = import_neus_module("volume_render.sdf_render")
        rng = np.random.default_rng(1)
        bins = np.sort(rng.random((6, 10)).astype(np.float32), axis=-1)
        weights = rng.random((6, 9)).astype(np.float32)
        want = ref_render.sample_pdf(torch.from_numpy(bins),
                                     torch.from_numpy(weights), 8, det=True).numpy()
        got = np.asarray(rn.sample_pdf(None, jnp.asarray(bins),
                                       jnp.asarray(weights), 8, det=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_render_is_jittable_and_differentiable(self, models):
        _, j_model = models
        origins, dirs, near, far = _make_rays()
        j_rays = rn.Rays(jnp.asarray(origins), jnp.asarray(dirs),
                         jnp.asarray(dirs), jnp.zeros((8, 1)),
                         jnp.ones((8, 1)), jnp.asarray(near), jnp.asarray(far))
        cfg = rn.NeusRenderConfig(n_samples=16, n_importance=16)

        @jax.jit
        def loss_fn(params):
            model = NeuS(params, j_model.cfg)
            out = rn.render_neus(jax.random.PRNGKey(0), j_rays, model, 1.0, cfg)
            return jnp.mean(out["rgb"] ** 2) + 0.1 * out["gradient_error"]

        g = jax.grad(loss_fn)(j_model.params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # the eikonal term must reach the SDF weights (double differentiation)
        gnorm = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree_util.tree_leaves(g["sdf_network"]))
        assert gnorm > 0


def test_merge_sorted_matches_argsort():
    """merge_sorted == stable argsort of the concatenation (incl. ties)."""
    import jax.numpy as jnp
    from robir_tpu.render.neus import merge_sorted

    rng = np.random.default_rng(3)
    a = np.sort(rng.integers(0, 20, (16, 9)).astype(np.float32) / 2.0, -1)
    b = np.sort(rng.integers(0, 20, (16, 5)).astype(np.float32) / 2.0, -1)
    va = rng.standard_normal((16, 9)).astype(np.float32)
    vb = rng.standard_normal((16, 5)).astype(np.float32)

    z, v = merge_sorted(jnp.asarray(a), jnp.asarray(b),
                        jnp.asarray(va), jnp.asarray(vb))
    z_all = np.concatenate([a, b], -1)
    v_all = np.concatenate([va, vb], -1)
    order = np.argsort(z_all, -1, kind="stable")
    np.testing.assert_allclose(np.asarray(z),
                               np.take_along_axis(z_all, order, -1), rtol=0,
                               atol=0)
    np.testing.assert_allclose(np.asarray(v),
                               np.take_along_axis(v_all, order, -1), rtol=0,
                               atol=1e-6)


def test_sample_pdf_inds_match_searchsorted():
    """The broadcast comparison count == searchsorted(side='right')."""
    import jax.numpy as jnp
    from robir_tpu.render.neus import sample_pdf

    rng = np.random.default_rng(5)
    bins = np.sort(rng.random((8, 17)).astype(np.float32), -1)
    w = rng.random((8, 16)).astype(np.float32)
    out = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(w),
                                12, det=True))
    # reference formulation (numpy searchsorted per row)
    wref = w + 1e-5
    pdf = wref / wref.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((8, 1)), np.cumsum(pdf, -1)], -1)
    u = np.linspace(0.5 / 12, 1 - 0.5 / 12, 12, dtype=np.float32)
    u = np.broadcast_to(u, (8, 12))
    ref = np.empty_like(out)
    for i in range(8):
        inds = np.searchsorted(cdf[i], u[i], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[1] - 1, inds)
        denom = cdf[i][above] - cdf[i][below]
        denom = np.where(denom < 1e-5, 1.0, denom)
        t = (u[i] - cdf[i][below]) / denom
        ref[i] = bins[i][below] + t * (bins[i][above] - bins[i][below])
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6)


def test_sample_pdf_masked_reduction_edges():
    """The masked max/min bracket lookups (no take_along_axis) equal the
    index-gather formulation on degenerate inputs: zero-weight bins
    (repeated cdf values), all-zero rows (uniform fallback pdf), and the
    stochastic path where u can fall in the first/last bucket."""
    import jax
    import jax.numpy as jnp
    from robir_tpu.render.neus import sample_pdf

    def gather_formulation(key, bins, weights, n, det):
        weights = weights + 1e-5
        pdf = weights / jnp.sum(weights, -1, keepdims=True)
        cdf = jnp.cumsum(pdf, -1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)
        B, T = cdf.shape
        if det:
            u = jnp.linspace(0.5 / n, 1.0 - 0.5 / n, n)
            u = jnp.broadcast_to(u, (B, n))
        else:
            u = jax.random.uniform(key, (B, n))
        inds = jnp.sum((cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), -1)
        below = jnp.maximum(0, inds - 1)
        above = jnp.minimum(T - 1, inds)
        cdf_b = jnp.take_along_axis(cdf, below, -1)
        cdf_a = jnp.take_along_axis(cdf, above, -1)
        bins_b = jnp.take_along_axis(bins, below, -1)
        bins_a = jnp.take_along_axis(bins, above, -1)
        denom = jnp.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
        return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)

    rng = np.random.default_rng(11)
    bins = np.sort(rng.uniform(0, 5, (12, 33)).astype(np.float32), -1)
    w = rng.uniform(0, 1, (12, 32)).astype(np.float32)
    w[rng.uniform(size=w.shape) < 0.4] = 0.0   # repeated cdf values
    w[0] = 0.0                                  # all-zero row
    for det in (True, False):
        key = jax.random.PRNGKey(7)
        want = np.asarray(gather_formulation(key, jnp.asarray(bins),
                                             jnp.asarray(w), 16, det))
        got = np.asarray(sample_pdf(key, jnp.asarray(bins),
                                    jnp.asarray(w), 16, det=det))
        np.testing.assert_array_equal(got, want)
