"""SG math tests: analytic/Monte-Carlo oracles + PyTorch reference parity."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.render import sg
from tests.conftest import REFERENCE_ROOT, has_reference

pytestmark = pytest.mark.slow


def _ref_sg_render():
    """Import the reference sg_render module (CPU-safe functions only)."""
    from tests.ref_loader import import_reference_module
    return import_reference_module("model.sg_render")


def random_sgs(rng, m):
    sgs = rng.standard_normal((m, 7)).astype(np.float32)
    sgs[:, 3] *= 30.0
    return sgs


def test_render_envmap_sg_matches_numpy():
    rng = np.random.default_rng(0)
    sgs = random_sgs(rng, 16)
    dirs = rng.standard_normal((100, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    got = np.asarray(sg.render_envmap_sg(jnp.asarray(sgs), jnp.asarray(dirs)))

    lobes = sgs[:, :3] / np.linalg.norm(sgs[:, :3], axis=-1, keepdims=True)
    lam = np.abs(sgs[:, 3:4])
    mu = np.abs(sgs[:, 4:])
    want = np.zeros((100, 3), np.float32)
    for i in range(100):
        w = np.exp(lam[:, 0] * (lobes @ dirs[i] - 1.0))
        want[i] = (mu * w[:, None]).sum(0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_hemisphere_int_vs_monte_carlo():
    """hemisphere_int approximates int_{H^2(n)} exp(lambda(w.axis - 1)) dw
    where cos_beta = n . axis. Tolerate the closed-form's ~few-% error."""
    rng = np.random.default_rng(1)
    n_mc = 400_000
    w = rng.standard_normal((n_mc, 3))
    w /= np.linalg.norm(w, axis=-1, keepdims=True)

    for lam in [5.0, 20.0, 80.0]:
        for cos_beta in [0.9, 0.3, 0.0, -0.4]:
            sin_beta = np.sqrt(1 - cos_beta**2)
            normal = np.array([0.0, 0.0, 1.0])
            axis = np.array([sin_beta, 0.0, cos_beta])
            mask = w @ normal > 0
            integrand = np.exp(lam * (w @ axis - 1.0)) * mask
            mc = integrand.mean() * 4 * np.pi
            got = float(sg.hemisphere_int(jnp.float32(lam), jnp.float32(cos_beta)))
            assert got == pytest.approx(mc, rel=0.08, abs=5e-3), (lam, cos_beta)


def test_lambda_trick_product():
    """The lambda-trick SG should approximate the pointwise product of two
    SGs when lambda1 << lambda2."""
    rng = np.random.default_rng(2)
    lobe1 = np.array([0.0, 0.0, 1.0], np.float32)
    lobe2v = np.array([0.2, 0.1, 0.97], np.float32)
    lobe2v /= np.linalg.norm(lobe2v)
    lam1, lam2 = 0.5, 60.0
    mu1, mu2 = 2.0, 3.0

    fl, flam, fmu = sg.lambda_trick(
        jnp.asarray(lobe1), jnp.float32(lam1), jnp.float32(mu1),
        jnp.asarray(lobe2v), jnp.float32(lam2), jnp.float32(mu2))

    dirs = rng.standard_normal((2000, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    exact = (mu1 * np.exp(lam1 * (dirs @ lobe1 - 1))
             * mu2 * np.exp(lam2 * (dirs @ lobe2v - 1)))
    approx = np.asarray(fmu) * np.exp(
        np.asarray(flam) * (dirs @ (np.asarray(fl) / np.linalg.norm(np.asarray(fl))) - 1))
    # compare where the product has significant mass
    sel = exact > exact.max() * 1e-3
    np.testing.assert_allclose(approx[sel], exact[sel], rtol=0.2)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
class TestTorchParity:
    def test_compute_envmap(self):
        import torch
        ref = _ref_sg_render()
        rng = np.random.default_rng(3)
        sgs = random_sgs(rng, 32)
        want = ref.compute_envmap(torch.from_numpy(sgs), 32, 64).numpy()
        got = np.asarray(sg.compute_envmap(jnp.asarray(sgs), 32, 64))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_hemisphere_int(self):
        import torch
        ref = _ref_sg_render()
        rng = np.random.default_rng(4)
        lam = np.abs(rng.standard_normal((50, 1)).astype(np.float32)) * 40 + 0.1
        cosb = (rng.random((50, 1)).astype(np.float32) * 2 - 1)
        want = ref.hemisphere_int(torch.from_numpy(lam), torch.from_numpy(cosb)).numpy()
        got = np.asarray(sg.hemisphere_int(jnp.asarray(lam), jnp.asarray(cosb)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_lambda_trick(self):
        import torch
        ref = _ref_sg_render()
        rng = np.random.default_rng(5)
        lobe1 = rng.standard_normal((20, 3)).astype(np.float32)
        lobe2 = rng.standard_normal((20, 3)).astype(np.float32)
        lam1 = np.abs(rng.standard_normal((20, 1)).astype(np.float32))
        lam2 = np.abs(rng.standard_normal((20, 1)).astype(np.float32)) * 50 + 5
        mu1 = np.abs(rng.standard_normal((20, 3)).astype(np.float32))
        mu2 = np.abs(rng.standard_normal((20, 3)).astype(np.float32))
        t = [torch.from_numpy(a) for a in (lobe1, lam1, mu1, lobe2, lam2, mu2)]
        wl, wlam, wmu = ref.lambda_trick(*t)
        gl, glam, gmu = sg.lambda_trick(*[jnp.asarray(a) for a in
                                          (lobe1, lam1, mu1, lobe2, lam2, mu2)])
        np.testing.assert_allclose(np.asarray(gl), wl.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(glam), wlam.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gmu), wmu.numpy(), rtol=1e-4, atol=1e-5)

    def test_render_envmap_lookup(self):
        import torch
        import torch.nn.functional  # noqa: F401
        ref = _ref_sg_render()
        rng = np.random.default_rng(6)
        envmap = rng.random((64, 128, 3)).astype(np.float32)
        dirs = rng.standard_normal((200, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        want = ref.render_envmap(torch.from_numpy(envmap), torch.from_numpy(dirs)).numpy()
        got = np.asarray(sg.render_envmap(jnp.asarray(envmap), jnp.asarray(dirs)))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_diffuse_visibility_weighting():
    """With a constant-visibility oracle, the SG-weighted mean must equal the
    fraction predicted where cos>0 weighted by SG weights."""
    key = jax.random.PRNGKey(0)
    n_pts, m = 5, 4
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.standard_normal((n_pts, 3)).astype(np.float32))
    normals = jnp.asarray(np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n_pts, 1)))
    lobes = jnp.asarray(np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (m, 1)))
    lambdas = jnp.full((m,), 40.0)

    def vis_fn(p, d):
        # logits heavily favoring "visible"
        return jnp.stack([jnp.zeros(p.shape[:-1]), 10.0 * jnp.ones(p.shape[:-1])], axis=-1)

    vis = sg.get_diffuse_visibility(key, pts, normals, vis_fn, lobes, lambdas, nsamp=16)
    assert vis.shape == (m, n_pts)
    # lobes point along +z = normal, samples cluster near +z, so cos>0 for
    # essentially all samples -> vis ~ softmax(10) ~ 1
    assert np.asarray(vis).min() > 0.95


def test_kl_divergence_matches_reference_formula():
    x = np.array([[0.2, 0.5, 0.01], [0.1, 0.4, 0.02]], np.float32)
    got = float(sg.kl_divergence(jnp.asarray(x), 0.01))
    rho = 0.01
    r = x.mean(0)
    want = np.mean(rho * np.log(rho / (r + 1e-4))
                   + (1 - rho) * np.log((1 - rho) / (1 - r + 1e-4)))
    assert got == pytest.approx(float(want), rel=1e-5)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_render_with_sg_full_parity():
    """Whole-shader parity with a constant-'visible' oracle.

    The visibility means are exactly 1 only where the back-face cull never
    triggers, so the geometry is chosen to guarantee that for the SPECULAR
    sweep: low roughness makes the warp-lobe sampling cone ~zero-width and
    view dirs in the normal hemisphere put the reflection lobes well above
    the tangent plane — no sample is ever culled, making sg_specular/sg_rgb
    deterministic. The DIFFUSE sweep keeps small cull variance at
    horizon-grazing light lobes (tolerance 5e-3; measured <=0.4% over 12
    torch seeds), and torch is seeded so the outcome is run-to-run
    deterministic (the reference samples from torch's global RNG)."""
    import torch
    from tests.ref_loader import patch_torch_cpu
    patch_torch_cpu()
    ref = _ref_sg_render()
    rng = np.random.default_rng(11)
    torch.manual_seed(11)
    N, M, L = 24, 16, 6
    points = rng.standard_normal((N, 3)).astype(np.float32) * 0.3
    normal = rng.standard_normal((N, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    viewdirs = normal + 0.35 * rng.standard_normal((N, 3)).astype(np.float32)
    viewdirs /= np.linalg.norm(viewdirs, axis=-1, keepdims=True)
    lgt = random_sgs(rng, M)
    lgt[:, 3] = np.abs(lgt[:, 3]) * 20 + 10
    indir = rng.standard_normal((N, L, 7)).astype(np.float32)
    indir[..., 3] = np.abs(indir[..., 3]) * 5 + 0.5
    indir[..., 4:] = np.abs(indir[..., 4:])
    roughness = (rng.random((N, 1)) * 0.2 + 0.1).astype(np.float32)
    albedo = rng.random((N, 3)).astype(np.float32)
    spec = np.full((1, 1), 0.05, np.float32)

    class ConstVis(torch.nn.Module):
        def forward(self, p, d):
            return torch.stack([torch.zeros(p.shape[0]),
                                torch.full((p.shape[0],), 50.0)], -1)

    want = ref.render_with_all_sg(
        torch.from_numpy(points), torch.from_numpy(normal),
        torch.from_numpy(viewdirs), torch.from_numpy(lgt),
        torch.from_numpy(spec), torch.from_numpy(roughness),
        torch.from_numpy(albedo), indir_lgtSGs=torch.from_numpy(indir),
        VisModel=ConstVis(), argmax_vis=True)

    def vis_fn(p, d):
        return jnp.stack([jnp.zeros(p.shape[:-1]),
                          jnp.full(p.shape[:-1], 50.0)], -1)

    got = sg.render_with_all_sg(
        jax.random.PRNGKey(0), jnp.asarray(points), jnp.asarray(normal),
        jnp.asarray(viewdirs), jnp.asarray(lgt), jnp.asarray(spec),
        jnp.asarray(roughness), jnp.asarray(albedo),
        indir_lgt_sgs=jnp.asarray(indir), vis_fn=vis_fn, argmax_vis=True)

    for name, mine, theirs in [
        ("sg_rgb", got.sg_rgb, want["sg_rgb"]),
        ("sg_specular_rgb", got.sg_specular_rgb, want["sg_specular_rgb"]),
        ("sg_diffuse_rgb", got.sg_diffuse_rgb, want["sg_diffuse_rgb"]),
        ("indir_rgb", got.indir_rgb, want["indir_rgb"]),
    ]:
        np.testing.assert_allclose(np.asarray(mine), theirs.detach().numpy(),
                                   rtol=5e-3, atol=5e-4, err_msg=name)
    # vis_shadow keeps Monte-Carlo variance: the cos-culled sample sets
    # differ between frameworks for grazing normals
    np.testing.assert_allclose(np.asarray(got.vis_shadow),
                               want["vis_shadow"].detach().numpy(), atol=0.06)


def _shade_inputs(seed=21, n=12, m=8):
    rng = np.random.default_rng(seed)
    points = rng.standard_normal((n, 3)).astype(np.float32) * 0.3
    normal = rng.standard_normal((n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    viewdirs = rng.standard_normal((n, 3)).astype(np.float32)
    viewdirs /= np.linalg.norm(viewdirs, axis=-1, keepdims=True)
    lgt = random_sgs(rng, m)
    lgt[:, 3] = np.abs(lgt[:, 3]) * 20 + 10
    roughness = (rng.random((n, 1)) * 0.8 + 0.15).astype(np.float32)
    albedo = rng.random((n, 3)).astype(np.float32)
    spec = np.full((1, 1), 0.05, np.float32)
    return points, normal, viewdirs, lgt, roughness, albedo, spec


def _const_vis(p, d):
    return jnp.stack([jnp.zeros(p.shape[:-1]), jnp.full(p.shape[:-1], 50.0)], -1)


def test_fun_spec_closure_matches_inline():
    """fun_spec returns the specular term as fn(roughness); evaluating at the
    original roughness must reproduce the inline render, and at a different
    roughness must change (sharper lobes -> different specular)."""
    points, normal, viewdirs, lgt, roughness, albedo, spec = _shade_inputs()
    args = (jax.random.PRNGKey(3), jnp.asarray(points), jnp.asarray(normal),
            jnp.asarray(viewdirs), jnp.asarray(lgt), jnp.asarray(spec),
            jnp.asarray(roughness), jnp.asarray(albedo))
    kw = dict(vis_fn=_const_vis, argmax_vis=True)
    inline = sg.render_with_sg(*args, **kw)
    lazy = sg.render_with_sg(*args, fun_spec=True, **kw)
    assert callable(lazy.sg_specular_rgb)
    # sg_rgb carries diffuse only in fun_spec mode (reference convention)
    np.testing.assert_allclose(np.asarray(lazy.sg_rgb),
                               np.asarray(inline.sg_diffuse_rgb), rtol=1e-6)
    re_spec = lazy.sg_specular_rgb(jnp.asarray(roughness))
    np.testing.assert_allclose(np.asarray(re_spec),
                               np.asarray(inline.sg_specular_rgb), rtol=1e-6)
    shinier = lazy.sg_specular_rgb(jnp.asarray(roughness) * 0.5)
    assert np.abs(np.asarray(shinier) - np.asarray(re_spec)).max() > 1e-4
    # differentiable in roughness (the point of the closure)
    g = jax.grad(lambda r: jnp.sum(lazy.sg_specular_rgb(r)))(
        jnp.asarray(roughness))
    assert np.isfinite(np.asarray(g)).all()


def test_multi_view_specular_matches_per_view():
    """viewdirs [V, N, 3]: per-view specular must equal V independent
    single-view renders; diffuse is shared (view-independent)."""
    points, normal, _, lgt, roughness, albedo, spec = _shade_inputs()
    rng = np.random.default_rng(5)
    V, n = 3, points.shape[0]
    vds = rng.standard_normal((V, n, 3)).astype(np.float32)
    vds /= np.linalg.norm(vds, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(9)
    kw = dict(vis_fn=_const_vis, argmax_vis=True)
    multi = sg.render_with_sg(
        key, jnp.asarray(points), jnp.asarray(normal), jnp.asarray(vds),
        jnp.asarray(lgt), jnp.asarray(spec), jnp.asarray(roughness),
        jnp.asarray(albedo), **kw)
    assert multi.sg_specular_rgb.shape == (V, n, 3)
    assert multi.sg_diffuse_rgb.shape == (n, 3)
    for v in range(V):
        single = sg.render_with_sg(
            key, jnp.asarray(points), jnp.asarray(normal),
            jnp.asarray(vds[v]), jnp.asarray(lgt), jnp.asarray(spec),
            jnp.asarray(roughness), jnp.asarray(albedo), **kw)
        np.testing.assert_allclose(np.asarray(multi.sg_specular_rgb[v]),
                                   np.asarray(single.sg_specular_rgb),
                                   rtol=2e-5, atol=1e-6)


def test_diffuse_visibility_chunked_matches_dense():
    """chunk_lights splits the sweep over light groups via lax.map; results
    must be identical to the single-pass evaluation."""
    rng = np.random.default_rng(3)
    n, m = 10, 16
    pts = (rng.standard_normal((n, 3)) * 0.3).astype(np.float32)
    nrm = rng.standard_normal((n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    lobes = rng.standard_normal((m, 3)).astype(np.float32)
    lobes /= np.linalg.norm(lobes, axis=-1, keepdims=True)
    lambdas = jnp.asarray((rng.random(m) * 30 + 5).astype(np.float32))
    key = jax.random.PRNGKey(0)
    dense = sg.get_diffuse_visibility(key, jnp.asarray(pts), jnp.asarray(nrm),
                                      _const_vis, jnp.asarray(lobes), lambdas,
                                      nsamp=8)
    for chunk in (4, 8):
        chunked = sg.get_diffuse_visibility(
            key, jnp.asarray(pts), jnp.asarray(nrm), _const_vis,
            jnp.asarray(lobes), lambdas, nsamp=8, chunk_lights=chunk)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                                   rtol=1e-6, err_msg=f"chunk={chunk}")
