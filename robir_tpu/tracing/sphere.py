"""IDR sphere tracer: root-finding against the live SDF MLP.

Capability parity with ``model/ray_tracing.py`` (RayTracing): dual-ended
sphere tracing inside the bounding sphere (``sphere_tracing:102-206``),
dense sampling + first-sign-change + secant refinement for non-converged
rays (``ray_sampler:208-274``, ``secant:276-297``), and minimal-SDF points
for rays that miss (``minimal_sdf_points:299-326``).

TPU-native: every branch ("sampler_mask", "mask_left_out", ...) becomes
masked dense compute over the full ray batch — same math because the masked
lanes' results are discarded by ``where``. Iteration counts are static.
Used when the cached-grid tracer is disabled (reference ``use_octree=False``
path, ``model/implicit_differentiable_renderer.py:268-273``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

SDFFn = Callable[[jnp.ndarray], jnp.ndarray]  # [N, 3] -> [N] or [N, 1]


@dataclasses.dataclass(frozen=True)
class SphereTracerConfig:
    object_bounding_sphere: float = 1.0
    sdf_threshold: float = 5.0e-5
    line_search_step: float = 0.5
    line_step_iters: int = 1
    sphere_tracing_iters: int = 10
    n_steps: int = 100
    n_secant_steps: int = 8


class TraceResult(NamedTuple):
    points: jnp.ndarray       # [N, 3]
    mask: jnp.ndarray         # [N] bool: converged surface hit
    dists: jnp.ndarray        # [N]


def _sdf1(sdf: SDFFn, x: jnp.ndarray) -> jnp.ndarray:
    out = sdf(x)
    return out.reshape(out.shape[0]) if out.ndim > 1 else out


def sphere_intersection(cam_loc: jnp.ndarray, dirs: jnp.ndarray, r: float):
    """Ray-sphere near/far (reference ``utils/rend_util.py:141-163``).
    Returns (near [N], far [N], hit [N])."""
    b = jnp.sum(dirs * cam_loc, axis=-1)
    c = jnp.sum(cam_loc * cam_loc, axis=-1) - r * r
    under = b * b - c
    hit = under > 0
    sq = jnp.sqrt(jnp.clip(under, 0.0, None))
    near = jnp.clip(-b - sq, 0.0, None)
    far = jnp.clip(-b + sq, 0.0, None)
    return near, far, hit


def sphere_trace(sdf: SDFFn, cam_loc: jnp.ndarray, dirs: jnp.ndarray,
                 cfg: SphereTracerConfig = SphereTracerConfig()) -> TraceResult:
    """Full tracer: dual-ended sphere tracing + dense secant fallback."""
    n = dirs.shape[0]
    near, far, mask_intersect = sphere_intersection(cam_loc, dirs,
                                                    cfg.object_bounding_sphere)

    # -- dual-ended sphere tracing (ray_tracing.py:102-206) -----------------
    def trace_one_direction(t0, t_lim, sign):
        """sign=+1 marches forward from near; sign=-1 backward from far."""
        def body(_, state):
            t, unfinished = state
            x = cam_loc + t[:, None] * dirs
            s = _sdf1(sdf, x)
            # (the reference's back-stepping line search on overshoot is
            # subsumed by the dense-sampling + secant fallback below)
            t_new = t + sign * s
            done = jnp.abs(s) < cfg.sdf_threshold
            out_of_range = (sign * (t_new - t_lim)) > 0
            unfinished = unfinished & ~done & ~out_of_range
            t = jnp.where(unfinished, t_new, t)
            return t, unfinished

        unfinished = mask_intersect
        t, unfinished = jax.lax.fori_loop(0, cfg.sphere_tracing_iters, body,
                                          (t0, unfinished))
        return t, unfinished

    t_start, unfinished_start = trace_one_direction(near, far, +1.0)
    t_end, _ = trace_one_direction(far, near, -1.0)

    x_start = cam_loc + t_start[:, None] * dirs
    s_start = _sdf1(sdf, x_start)
    converged = mask_intersect & (jnp.abs(s_start) < cfg.sdf_threshold)
    network_mask = t_start < t_end

    # -- dense sampling + secant for unconverged rays (ray_sampler) ---------
    need_sampler = unfinished_start & mask_intersect
    steps = jnp.linspace(0.0, 1.0, cfg.n_steps)
    t_samples = t_start[:, None] + (t_end - t_start)[:, None] * steps[None, :]
    pts = cam_loc[:, None, :] + t_samples[..., None] * dirs[:, None, :]
    s_samples = _sdf1(sdf, pts.reshape(-1, 3)).reshape(n, cfg.n_steps)

    # first sign change (+ -> -)
    sign_change = (s_samples[:, :-1] > 0) & (s_samples[:, 1:] < 0)
    any_change = jnp.any(sign_change, axis=-1)
    first = jnp.argmax(sign_change, axis=-1)

    idx = jnp.arange(n)
    t_lo = t_samples[idx, first]
    t_hi = t_samples[idx, first + 1]
    s_lo = s_samples[idx, first]
    s_hi = s_samples[idx, first + 1]

    def secant_body(_, state):
        t_lo, t_hi, s_lo, s_hi = state
        t_mid = t_lo - s_lo * (t_hi - t_lo) / (s_hi - s_lo + 1e-10)
        x_mid = cam_loc + t_mid[:, None] * dirs
        s_mid = _sdf1(sdf, x_mid)
        neg = s_mid < 0
        t_hi = jnp.where(neg, t_mid, t_hi)
        s_hi = jnp.where(neg, s_mid, s_hi)
        t_lo = jnp.where(neg, t_lo, t_mid)
        s_lo = jnp.where(neg, s_lo, s_mid)
        return t_lo, t_hi, s_lo, s_hi

    t_lo, t_hi, s_lo, s_hi = jax.lax.fori_loop(
        0, cfg.n_secant_steps, secant_body, (t_lo, t_hi, s_lo, s_hi))
    t_secant = t_lo - s_lo * (t_hi - t_lo) / (s_hi - s_lo + 1e-10)

    # combine: converged sphere-trace first, secant result for sampler rays
    t_final = jnp.where(need_sampler & any_change, t_secant, t_start)
    mask_final = jnp.where(need_sampler, any_change, converged | network_mask)
    mask_final = mask_final & mask_intersect

    # rays that miss everything: minimal-|sdf| point along the segment
    # (ray_tracing.py:299-326) — gives a sensible surrogate point
    min_idx = jnp.argmin(jnp.abs(s_samples), axis=-1)
    t_min = t_samples[idx, min_idx]
    t_final = jnp.where(mask_final, t_final, jnp.where(mask_intersect, t_min,
                                                       -jnp.sum(dirs * cam_loc, -1)))

    points = cam_loc + t_final[:, None] * dirs
    return TraceResult(points=points, mask=mask_final, dists=t_final)
