"""Tracer oracles: analytic sphere SDF + brute-force marches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.tracing.grid import (GridConfig, SDFGrid, grid_cast, grid_normal,
                                    grid_sdf, grid_visibility_logits)
from robir_tpu.tracing.sphere import SphereTracerConfig, sphere_trace

RADIUS = 0.5


def sphere_sdf(x):
    return jnp.linalg.norm(x, axis=-1) - RADIUS


def torus_sdf(x, R=0.5, r=0.2):
    q = jnp.stack([jnp.linalg.norm(x[..., :2], axis=-1) - R, x[..., 2]], -1)
    return jnp.linalg.norm(q, axis=-1) - r


def _rand_rays(n, seed=0, origin_dist=2.0, target_scale=0.3):
    rng = np.random.default_rng(seed)
    o = rng.standard_normal((n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * origin_dist
    tgt = rng.uniform(-target_scale, target_scale, (n, 3)).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestGridTracer:
    @pytest.fixture(scope="class")
    def grid(self):
        return SDFGrid.build(sphere_sdf, GridConfig(resolution=128, start_offset=0.0))

    def test_grid_sdf_accuracy(self, grid):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(-0.9, 0.9, (500, 3)).astype(np.float32))
        got = np.asarray(grid.sdf(x))
        want = np.asarray(sphere_sdf(x))
        assert np.abs(got - want).max() < 2e-3  # trilinear error ~ O(cell^2)

    def test_grid_normal(self, grid):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((200, 3)).astype(np.float32)
        x = x / np.linalg.norm(x, axis=-1, keepdims=True) * 0.5
        n = np.asarray(grid.normal(jnp.asarray(x)))
        want = x / np.linalg.norm(x, axis=-1, keepdims=True)
        cos = np.sum(n * want, -1)
        assert cos.min() > 0.999

    def test_cast_hits_analytic(self, grid):
        o, d = _rand_rays(256, seed=3)
        t, hit, x = grid.cast(o, d)
        # analytic intersection
        b = jnp.sum(d * o, -1)
        c = jnp.sum(o * o, -1) - RADIUS ** 2
        disc = b * b - c
        want_hit = np.asarray(disc > 0)
        t_true = np.asarray(-b - jnp.sqrt(jnp.clip(disc, 0, None)))
        hit = np.asarray(hit)
        assert (hit == want_hit).mean() > 0.97
        both = hit & want_hit
        err = np.abs(np.asarray(t)[both] - t_true[both])
        assert np.median(err) < 1e-3 and err.max() < 5e-2

    def test_bf16_grid_matches_fp32(self, grid):
        """storage_dtype="bfloat16" (the shipped stage-2 configs' setting —
        halves the march's row-gather HBM traffic) must keep cast precision:
        sdf quantization is relative, so near-surface |sdf| values that
        drive hits/bisection stay accurate."""
        cfg16 = GridConfig(resolution=128, start_offset=0.0,
                           storage_dtype="bfloat16")
        g16 = SDFGrid.build(sphere_sdf, cfg16)
        assert g16.values.dtype == jnp.bfloat16
        o, d = _rand_rays(256, seed=3)
        t32, hit32, _ = grid.cast(o, d)
        t16, hit16, _ = g16.cast(o, d)
        assert (np.asarray(hit16) == np.asarray(hit32)).mean() > 0.99
        both = np.asarray(hit16) & np.asarray(hit32)
        err = np.abs(np.asarray(t16)[both] - np.asarray(t32)[both])
        assert np.median(err) < 1e-3 and err.max() < 5e-2
        # interpolated sdf stays within trilinear-error scale of fp32
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.uniform(-0.9, 0.9, (500, 3)).astype(np.float32))
        assert np.abs(np.asarray(g16.sdf(x)) - np.asarray(grid.sdf(x))).max() < 4e-3

    def test_miss_rays(self, grid):
        # rays pointing away from the sphere never hit
        o = jnp.asarray(np.tile([[2.0, 0, 0]], (16, 1)).astype(np.float32))
        d = jnp.asarray(np.tile([[1.0, 0, 0]], (16, 1)).astype(np.float32))
        _, hit, _ = grid.cast(o, d)
        assert not np.any(np.asarray(hit))

    def test_visibility_oracle(self, grid):
        """Points on +x surface: direction away from sphere = visible,
        direction through the sphere = occluded."""
        p = jnp.asarray(np.tile([[0.62, 0.0, 0.0]], (4, 1)).astype(np.float32))
        away = jnp.asarray(np.tile([[1.0, 0.0, 0.0]], (4, 1)).astype(np.float32))
        through = -away
        logit_away = grid.visibility_logits(p, away)
        logit_thru = grid.visibility_logits(p, through)
        vis_away = jax.nn.softmax(logit_away, -1)[..., 1]
        vis_thru = jax.nn.softmax(logit_thru, -1)[..., 1]
        assert np.all(np.asarray(vis_away) > 0.99)
        assert np.all(np.asarray(vis_thru) < 0.01)

    def test_visibility_grazing_directions(self, grid):
        """Tangential directions from surface points must read VISIBLE.

        Round-1 pathology: the fixed along-ray start bias left grazing
        rays inside the tracer's hit-epsilon band (34% false self-hits at
        res 64); grid_visibility_logits now pushes near-surface origins
        along the local SDF normal by max(start_offset, 2*hit_eps)."""
        cfg = GridConfig(resolution=64)  # coarse res = worst case
        g = SDFGrid.build(sphere_sdf, cfg)
        th = np.linspace(0.1, np.pi - 0.1, 64).astype(np.float32)
        p = np.stack([np.sin(th), np.zeros(64, np.float32), np.cos(th)],
                     -1) * RADIUS
        tang = np.stack([np.cos(th), np.zeros(64, np.float32), -np.sin(th)], -1)
        vis = jax.nn.softmax(
            grid_visibility_logits(g.values, cfg, jnp.asarray(p),
                                   jnp.asarray(tang)), -1)[..., 1]
        assert float(np.mean(np.asarray(vis) > 0.5)) > 0.9, np.asarray(vis)
        # ...without breaking the occluded class: inward dirs still hit
        inward = -p / np.linalg.norm(p, axis=-1, keepdims=True)
        occ = jax.nn.softmax(
            grid_visibility_logits(g.values, cfg, jnp.asarray(p),
                                   jnp.asarray(inward)), -1)[..., 1]
        assert float(np.asarray(occ).mean()) < 0.05

    def test_secondary_ray_from_surface(self, grid):
        """Rays starting just off the surface (the Vis-stage pattern,
        x + 0.005*n) must escape without self-hit when pointing outward."""
        rng = np.random.default_rng(4)
        n = rng.standard_normal((64, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        p = n * (RADIUS + 0.005)
        cfg = GridConfig(resolution=128)  # default start_offset=5e-3
        t, hit, _ = grid_cast(grid.values, cfg, jnp.asarray(p), jnp.asarray(n))
        assert not np.any(np.asarray(hit))

    def test_torus_cast(self):
        """Non-convex shape: grid cast against brute-force fine march."""
        cfg = GridConfig(resolution=160, start_offset=0.0)
        g = SDFGrid.build(torus_sdf, cfg)
        o, d = _rand_rays(128, seed=5)
        t, hit, _ = g.cast(o, d)
        # brute force: march tiny steps of the analytic sdf
        ts = np.linspace(0.5, 3.5, 2000, dtype=np.float32)
        pts = np.asarray(o)[:, None, :] + ts[None, :, None] * np.asarray(d)[:, None, :]
        sd = np.asarray(torus_sdf(jnp.asarray(pts.reshape(-1, 3)))).reshape(128, -1)
        bf_hit = (sd < 1e-3).any(-1)
        agree = (np.asarray(hit) == bf_hit).mean()
        assert agree > 0.95, agree
        both = np.asarray(hit) & bf_hit
        bf_t = ts[np.argmax(sd < 1e-3, axis=-1)]
        assert np.median(np.abs(np.asarray(t)[both] - bf_t[both])) < 1e-2


class TestSphereTracer:
    def test_hits_analytic_sphere(self):
        o, d = _rand_rays(128, seed=6)
        cam = o  # per-ray origins
        res = sphere_trace(sphere_sdf, cam, d,
                           SphereTracerConfig(object_bounding_sphere=1.0))
        b = np.sum(np.asarray(d) * np.asarray(o), -1)
        c = np.sum(np.asarray(o) ** 2, -1) - RADIUS ** 2
        disc = b * b - c
        want_hit = disc > 0
        t_true = -b - np.sqrt(np.clip(disc, 0, None))
        hit = np.asarray(res.mask)
        assert (hit == want_hit).mean() > 0.97
        err = np.abs(np.asarray(res.dists) - t_true)[hit & want_hit]
        assert err.max() < 1e-3

    def test_nonconvex_secant(self):
        """Torus requires the dense-sampling + secant path for grazing rays."""
        o, d = _rand_rays(128, seed=7)
        res = sphere_trace(torus_sdf, o, d,
                           SphereTracerConfig(object_bounding_sphere=1.0))
        hit = np.asarray(res.mask)
        pts = np.asarray(res.points)[hit]
        surf = np.abs(np.asarray(torus_sdf(jnp.asarray(pts))))
        assert np.median(surf) < 1e-3

    def test_origin_inside_object(self):
        """Origins inside the object: first sdf sample is already negative.
        The reference converges immediately on signed sdf <= threshold
        (ray_tracing.py:139-149) and the sampler's first-negative argmax
        (not first +/- transition) must still find the root."""
        rng = np.random.default_rng(9)
        o = rng.standard_normal((32, 3)).astype(np.float32)
        o = o / np.linalg.norm(o, axis=-1, keepdims=True) * (RADIUS * 0.5)
        d = rng.standard_normal((32, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        res = sphere_trace(sphere_sdf, jnp.asarray(o), jnp.asarray(d),
                           SphereTracerConfig(object_bounding_sphere=1.0))
        assert np.asarray(res.mask).all()
        # converged where it stood (sdf(origin) < 0 <= threshold)
        assert np.allclose(np.asarray(res.dists), 0.0, atol=1e-5)

    def test_bounding_rim_rays_miss(self):
        """Rays grazing the bounding-sphere rim (tiny near/far interval far
        from the object) must report miss, not freeze at `near` as a rim
        'hit' — the tracer does not clamp t to the interval, so the
        start marker overshoots the end marker and t_start < t_end fails."""
        o = jnp.asarray(np.tile([[0.0, 0.0, 2.0]], (8, 1)).astype(np.float32))
        # aim just inside the unit bounding sphere but far outside the object
        ang = np.arcsin(0.98 / 2.0)
        d = np.tile([[np.sin(ang), 0.0, -np.cos(ang)]], (8, 1)).astype(np.float32)
        res = sphere_trace(sphere_sdf, o, jnp.asarray(d),
                           SphereTracerConfig(object_bounding_sphere=1.0))
        assert not np.asarray(res.mask).any()

    def test_jit_compatible(self):
        o, d = _rand_rays(32, seed=8)
        fn = jax.jit(lambda o, d: sphere_trace(sphere_sdf, o, d))
        res = fn(o, d)
        assert np.isfinite(np.asarray(res.dists)).all()
