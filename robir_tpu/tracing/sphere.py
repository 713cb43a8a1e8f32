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
    # Reference semantics, dense-masked:
    # - convergence is on SIGNED sdf <= threshold (a ray that lands inside
    #   after the line search is finished, not "lost"),
    # - an overshoot (next sdf < 0) triggers the back-stepping line search
    #   (acc -= (1-step)/2^i * curr_sdf, ray_tracing.py:178-201),
    # - t is NOT clamped to the sphere interval: a start that marches past
    #   the end marker keeps its overshot value, so the final
    #   t_start < t_end test correctly reports a miss (rays grazing the
    #   bounding-sphere rim would otherwise freeze at `near` and read as
    #   rim "hits").
    thr = cfg.sdf_threshold

    def eval_sdf(t):
        return _sdf1(sdf, cam_loc + t[:, None] * dirs)

    def body(_, state):
        t_s, t_e, unf_s, unf_e, next_s, next_e = state
        # zero-out converged lanes (ref :139-149: curr_sdf <= thr -> 0,
        # unfinished &= curr_sdf > thr)
        curr_s = jnp.where(unf_s, next_s, 0.0)
        curr_e = jnp.where(unf_e, next_e, 0.0)
        curr_s = jnp.where(curr_s <= thr, 0.0, curr_s)
        curr_e = jnp.where(curr_e <= thr, 0.0, curr_e)
        unf_s = unf_s & (curr_s > thr)
        unf_e = unf_e & (curr_e > thr)
        t_s = t_s + curr_s
        t_e = t_e - curr_e
        next_s = eval_sdf(t_s)
        next_e = eval_sdf(t_e)
        # back-stepping line search on overshoot (ray_tracing.py:178-201)
        for i in range(cfg.line_step_iters):
            factor = (1.0 - cfg.line_search_step) / (2.0 ** i)
            back_s = unf_s & (next_s < 0)
            back_e = unf_e & (next_e < 0)
            t_s = jnp.where(back_s, t_s - factor * curr_s, t_s)
            t_e = jnp.where(back_e, t_e + factor * curr_e, t_e)
            next_s = jnp.where(back_s, eval_sdf(t_s), next_s)
            next_e = jnp.where(back_e, eval_sdf(t_e), next_e)
        crossed = t_s < t_e
        return t_s, t_e, unf_s & crossed, unf_e & crossed, next_s, next_e

    state0 = (near, far, mask_intersect, mask_intersect,
              eval_sdf(near), eval_sdf(far))
    t_start, t_end, unfinished_start, _, _, _ = jax.lax.fori_loop(
        0, cfg.sphere_tracing_iters, body, state0)

    network_mask = t_start < t_end  # ray_tracing.py:41

    # -- dense sampling + secant for unconverged rays (ray_sampler) ---------
    need_sampler = unfinished_start & mask_intersect
    steps = jnp.linspace(0.0, 1.0, cfg.n_steps)
    t_samples = t_start[:, None] + (t_end - t_start)[:, None] * steps[None, :]
    pts = cam_loc[:, None, :] + t_samples[..., None] * dirs[:, None, :]
    s_samples = _sdf1(sdf, pts.reshape(-1, 3)).reshape(n, cfg.n_steps)

    # first NEGATIVE sample (ray_sampler's sign*descending argmin trick,
    # ray_tracing.py:231-234 — not first +/- transition: an interval that
    # starts inside the surface still counts), secant over (ind-1, ind)
    neg = s_samples < 0
    any_change = jnp.any(neg, axis=-1)
    first = jnp.argmax(neg, axis=-1)

    idx = jnp.arange(n)
    lo = jnp.maximum(first - 1, 0)  # ref wraps -1 to the last sample; clamp
    t_lo = t_samples[idx, lo]
    t_hi = t_samples[idx, first]
    s_lo = s_samples[idx, lo]
    s_hi = s_samples[idx, first]

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
    mask_final = jnp.where(need_sampler, any_change, network_mask)
    mask_final = mask_final & mask_intersect

    # rays that miss everything: minimal-(signed)-sdf point along the
    # segment (ray_sampler's p_out path / minimal_sdf_points,
    # ray_tracing.py:242-249,299-326) — a sensible surrogate point
    min_idx = jnp.argmin(s_samples, axis=-1)
    t_min = t_samples[idx, min_idx]
    t_final = jnp.where(mask_final, t_final, jnp.where(mask_intersect, t_min,
                                                       -jnp.sum(dirs * cam_loc, -1)))

    points = cam_loc + t_final[:, None] * dirs
    return TraceResult(points=points, mask=mask_final, dists=t_final)
