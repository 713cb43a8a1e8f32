"""Tone-mapping parity + loss-function parity vs reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.render import color as col
from robir_tpu.stages import losses
from tests.conftest import has_reference

pytestmark = pytest.mark.slow


class TestToneMapParity:
    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_curves(self):
        from tests.ref_loader import import_reference_module, patch_torch_cpu
        patch_torch_cpu()
        import torch
        ref = import_reference_module("model.color_correction")
        x = np.linspace(0.01, 0.99, 50, dtype=np.float32)
        t = np.float32(0.4)
        for name, mine, theirs in [
            ("aces_fn", col.aces_fn, ref.aces_fn),
            ("aces_inv", col.aces_inv, ref.aces_inv),
        ]:
            got = np.asarray(mine(jnp.asarray(x)))
            want = theirs(torch.from_numpy(x)).numpy()
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6, err_msg=name)
        for name, mine, theirs in [
            ("scale_fn", col.scale_aces_fn, ref.scale_aces_fn),
            ("scale_inv", col.scale_aces_inv, ref.scale_aces_inv),
            ("warp_fn", col.warp_aces_fn, ref.warp_aces_fn),
            ("warp_inv", col.warp_aces_inv, ref.warp_aces_inv),
            ("ln_fn", col.ln_space_fn, ref.ln_space_fn),
            ("ln_inv", col.ln_space_inv, ref.ln_space_inv),
        ]:
            got = np.asarray(mine(jnp.asarray(x), t))
            want = theirs(torch.from_numpy(x), torch.tensor(t)).numpy()
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5, err_msg=name)

    def test_roundtrip(self):
        cfg = col.ToneMapConfig(hdr_mode=2)
        params = col.init_tonemap(cfg)
        x = jnp.linspace(0.01, 0.95, 40)
        shift = 0.37
        hdr = col.ldr2hdr(params, cfg, x, shift)
        back = col.hdr2ldr(params, cfg, hdr, shift)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4)

    def test_fit_energy_learns_integral(self):
        cfg = col.ToneMapConfig(hdr_mode=2)
        tm = col.init_tonemap(cfg)
        rng = np.random.default_rng(0)
        px = jnp.asarray(rng.uniform(0.05, 0.95, (5000, 3)).astype(np.float32))

        def l2h(x, shift):
            return col.ldr2hdr(tm, cfg, x, shift)

        params = col.fit_energy(jax.random.PRNGKey(0), px, l2h, n_steps=400)
        shift = jnp.full((16, 1), 0.5)
        pred = np.asarray(col.energy_apply(params, shift))[0]
        want = np.asarray(jnp.mean(l2h(px[:, None, :], jnp.full((1, 1), 0.5)), 0))[0]
        np.testing.assert_allclose(pred, want, rtol=0.15)


class TestInvLossPieces:
    def test_rgb_loss_matches_boolean_indexing(self):
        cfg = losses.InvLossConfig(loss_type="L1")
        rng = np.random.default_rng(1)
        pred = rng.random((40, 3)).astype(np.float32)
        gt = rng.random((40, 3)).astype(np.float32)
        mask = rng.random(40) > 0.4
        got = float(losses.rgb_loss(cfg, jnp.asarray(pred), jnp.asarray(gt),
                                    jnp.asarray(mask)))
        want = np.abs(pred[mask] - gt[mask]).sum() / 40
        assert got == pytest.approx(want, rel=1e-5)

    def test_mask_loss_matches_reference_formula(self):
        cfg = losses.InvLossConfig(alpha=50.0)
        rng = np.random.default_rng(2)
        sdf = rng.standard_normal((30, 1)).astype(np.float32) * 0.1
        net = rng.random(30) > 0.5
        obj = rng.random(30) > 0.5
        got = float(losses.mask_loss(cfg, jnp.asarray(sdf), jnp.asarray(net),
                                     jnp.asarray(obj)))
        # replicate reference with scipy-free numpy BCE-with-logits
        sel = ~(net & obj)
        logits = (-50.0 * sdf.reshape(-1))[sel]
        gt = obj[sel].astype(np.float32)
        bce = np.clip(logits, 0, None) - logits * gt + np.log1p(np.exp(-np.abs(logits)))
        want = (1 / 50.0) * bce.sum() / 30
        assert got == pytest.approx(want, rel=1e-4)

    def test_latent_smooth(self):
        rng = np.random.default_rng(3)
        a, xa = rng.random((10, 3)), rng.random((10, 3))
        r, xr = rng.random((10, 1)), rng.random((10, 1))
        got = float(losses.latent_smooth_loss(
            jnp.asarray(a), jnp.asarray(r), jnp.asarray(xa), jnp.asarray(xr)))
        want = np.abs(a - xa).mean() + np.abs(r[:, 0] - xr[:, 0]).mean() * 0.2
        assert got == pytest.approx(want, rel=1e-5)


class TestIllumLoss:
    @pytest.mark.skipif(not has_reference(), reason="reference not mounted")
    def test_query_indir_illum_parity(self):
        from tests.ref_loader import import_reference_module, patch_torch_cpu
        patch_torch_cpu()
        import torch
        ref = import_reference_module("model.loss")
        rng = np.random.default_rng(4)
        sgs = rng.standard_normal((6, 8, 7)).astype(np.float32)
        sgs[..., 3] = np.abs(sgs[..., 3]) * 10
        dirs = rng.standard_normal((6, 12, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        want = ref.query_indir_illum(torch.from_numpy(sgs),
                                     torch.from_numpy(dirs)).numpy()
        got = np.asarray(losses.query_indir_illum(jnp.asarray(sgs), jnp.asarray(dirs)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_illum_loss_runs_and_is_finite(self):
        rng = np.random.default_rng(5)
        n, s, L = 10, 8, 4
        out = losses.illum_loss(
            losses.IllumLossConfig(),
            indirect_sgs=jnp.asarray(rng.random((n, L, 7)).astype(np.float32) + 0.1),
            indir_integral=jnp.asarray(rng.random((n, 3)).astype(np.float32)),
            network_object_mask=jnp.asarray(rng.random(n) > 0.3),
            trace_radiance=jnp.asarray(rng.random((n, s, 3)).astype(np.float32)),
            sample_dirs=jnp.asarray(rng.standard_normal((n, s, 3)).astype(np.float32)),
            gt_vis=jnp.asarray(rng.random((n, s)) > 0.5),
            pred_vis=jnp.asarray(rng.standard_normal((n, s, 2)).astype(np.float32)),
            indir_mask=jnp.asarray(rng.random((n, s)) > 0.5),
            gt_integral=jnp.asarray(rng.random((n, 3)).astype(np.float32)))
        rad, vis = out
        assert np.isfinite(float(rad)) and np.isfinite(float(vis))
        assert float(vis) > 0
