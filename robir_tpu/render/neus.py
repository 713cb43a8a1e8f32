"""NeuS SDF volume renderer: hierarchical importance sampling + sigmoid-CDF
alpha compositing.

Parity: reference ``neus/volume_render/sdf_render.py`` —
``sample_pdf:5-35``, ``up_sample:38-82``, ``cat_z_vals:85-99``,
``render_core_outside:102-138``, ``render_core:141-235``,
``render_neus:238-348``.

TPU-first design:
- every tensor is fixed-shape; the 4-round upsampling loop is unrolled at
  trace time (static), importance samples ride through ``jnp.sort`` +
  vectorized searchsorted,
- the sampling phase is wrapped in ``stop_gradient`` (the reference uses
  ``torch.no_grad``),
- SDF gradients for shading/eikonal come from per-point VJPs of the pure
  SDF function — one forward + one backward, batched by vmap,
- rays are batched on the leading axis; shard it over the mesh 'data' axis
  for multi-chip.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..fields.neus_model import NeuS


class Rays(NamedTuple):
    """Mirror of the reference ray bundle (``neus/misc/defs.py:8-10``)."""

    origins: jnp.ndarray      # [N, 3]
    directions: jnp.ndarray   # [N, 3]
    viewdirs: jnp.ndarray     # [N, 3]
    radii: jnp.ndarray        # [N, 1]
    lossmult: jnp.ndarray     # [N, 1]
    near: jnp.ndarray         # [N, 1]
    far: jnp.ndarray          # [N, 1]


@dataclasses.dataclass(frozen=True)
class NeusRenderConfig:
    n_samples: int = 64
    n_importance: int = 64
    n_outside: int = 0
    up_sample_steps: int = 4
    white_bkgd: bool = True
    perturb: float = 1.0
    # low-precision trunk matmuls for the no-grad importance-sampling phase
    # only (sample placement tolerates bf16; the shaded render stays fp32)
    sampling_dtype: str | None = None


def sample_pdf(key: Optional[jax.Array], bins: jnp.ndarray, weights: jnp.ndarray,
               n_samples: int, det: bool = False) -> jnp.ndarray:
    """Inverse-CDF sampling (NeRF). bins [B, T], weights [B, T-1] ->
    [B, n_samples]. Parity: sdf_render.py:5-35."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [B, T]
    B, T = cdf.shape

    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        u = jax.random.uniform(key, (B, n_samples))

    # searchsorted(side="right") as a broadcast comparison count: binary
    # search compiles to serial gather chains on TPU; the dense [B,n,T]
    # compare+reduce is one fused VPU pass (measured: the searchsorted/sort
    # formulation made importance sampling 42% of the whole train step).
    # The four bracket lookups are masked max/min reductions over the same
    # [B,n,T] mask instead of take_along_axis: both cdf and bins are
    # row-wise ascending, so the largest masked entry IS the entry at
    # index (count-1) and the smallest anti-masked entry IS the entry at
    # index count — exactly the reference's below/above gathers, without
    # TPU scalar-gather fusions (measured 1.33 ms -> ~0 of the 2.55 ms
    # sampling phase; same z_vals bit-for-bit on the det path).
    mask_le = cdf[:, None, :] <= u[:, :, None]                    # [B, n, T]
    cdf_b = jnp.broadcast_to(cdf[:, None, :], mask_le.shape)
    bins_b = jnp.broadcast_to(bins[:, None, :], mask_le.shape)
    ninf, pinf = -jnp.inf, jnp.inf
    cdf_below = jnp.max(jnp.where(mask_le, cdf_b, ninf), -1)
    bins_below = jnp.max(jnp.where(mask_le, bins_b, ninf), -1)
    cdf_above = jnp.min(jnp.where(mask_le, pinf, cdf_b), -1)
    bins_above = jnp.min(jnp.where(mask_le, pinf, bins_b), -1)
    # clamp semantics of the reference's below/above index clips: an empty
    # mask (u < cdf[0], impossible for u>=0) falls back to column 0, a full
    # mask (u >= cdf[-1]) to column T-1
    cdf_below = jnp.where(jnp.isfinite(cdf_below), cdf_below, cdf[:, :1])
    bins_below = jnp.where(jnp.isfinite(bins_below), bins_below, bins[:, :1])
    cdf_above = jnp.where(jnp.isfinite(cdf_above), cdf_above, cdf[:, -1:])
    bins_above = jnp.where(jnp.isfinite(bins_above), bins_above, bins[:, -1:])
    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def up_sample(rays_o, rays_d, z_vals, sdf, n_importance, inv_s, sphere_radius=1.0):
    """One round of NeuS importance sampling at fixed inv_s.
    Parity: sdf_render.py:38-82."""
    batch_size, n_samples = z_vals.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
    radius = jnp.linalg.norm(pts, axis=-1)
    inside_sphere = (radius[:, :-1] < sphere_radius) | (radius[:, 1:] < sphere_radius)
    sdf = sdf.reshape(batch_size, n_samples)
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)

    # robustify: use min(cos, prev_cos) (see reference comment block :52-66)
    prev_cos = jnp.concatenate([jnp.zeros((batch_size, 1)), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch_size, 1)), 1.0 - alpha + 1e-7], -1), -1)[:, :-1]
    weights = alpha * trans
    return sample_pdf(None, z_vals, weights, n_importance, det=True)


def merge_sorted(a, b, vals_a=None, vals_b=None):
    """Merge row-wise sorted [B, n1] and [B, n2] into sorted [B, n1+n2],
    carrying optional per-element values along.

    TPU-native replacement for argsort-of-concatenation (sdf_render.py:94):
    both inputs are already sorted, so each element's merged position is its
    own index plus a broadcast comparison count against the other array; the
    scatter into the merged row rides one-hot matmuls on the MXU instead of
    a bitonic sort network. Ties keep ``a`` first (argsort-stable order)."""
    B, n1 = a.shape
    n2 = b.shape[1]
    T = n1 + n2
    rank_a = (jnp.arange(n1)[None, :]
              + jnp.sum((b[:, None, :] < a[:, :, None]), -1))
    rank_b = (jnp.arange(n2)[None, :]
              + jnp.sum((a[:, None, :] <= b[:, :, None]), -1))
    onehot_a = jax.nn.one_hot(rank_a, T, dtype=a.dtype)     # [B, n1, T]
    onehot_b = jax.nn.one_hot(rank_b, T, dtype=a.dtype)
    # HIGHEST precision: at TPU DEFAULT these tiny einsums run as a single
    # bf16 pass, quantizing the scattered z/sdf VALUES (~0.4% rel err —
    # comparable to the fine sample spacing). The one-hot sides are exact
    # either way; full fp32 on [B,n,T] this small is microseconds.
    hi = jax.lax.Precision.HIGHEST
    merged = (jnp.einsum("bnt,bn->bt", onehot_a, a, precision=hi)
              + jnp.einsum("bnt,bn->bt", onehot_b, b, precision=hi))
    if vals_a is None:
        return merged
    vals = (jnp.einsum("bnt,bn->bt", onehot_a, vals_a, precision=hi)
            + jnp.einsum("bnt,bn->bt", onehot_b, vals_b, precision=hi))
    return merged, vals


def cat_z_vals(model: NeuS, rays_o, rays_d, z_vals, new_z_vals, sdf,
               last: bool, compute_dtype=None):
    """Merge sample positions, gathering SDF values along.
    Parity: sdf_render.py:85-99 (same result as its sort+index_select:
    both inputs are per-row sorted, so a rank merge is exact)."""
    batch_size, n_samples = z_vals.shape
    _, n_importance = new_z_vals.shape
    if last:
        return merge_sorted(z_vals, new_z_vals), sdf
    pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z_vals[..., :, None]
    new_sdf = model.sdf(pts.reshape(-1, 3), compute_dtype).reshape(
        batch_size, n_importance)
    return merge_sorted(z_vals, new_z_vals, sdf, new_sdf)


def render_core_outside(rays_o, rays_d, z_vals, sample_dist, model: NeuS,
                        background_rgb=None):
    """NeRF++ background shell. Parity: sdf_render.py:102-138."""
    batch_size, n_samples = z_vals.shape
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full((batch_size, 1), sample_dist)], -1)
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]
    dis = jnp.clip(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e10)
    pts4 = jnp.concatenate([pts / dis, 1.0 / dis], axis=-1)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (batch_size, n_samples, 3))

    density, sampled_color = model.background(pts4.reshape(-1, 4), dirs.reshape(-1, 3))
    alpha = 1.0 - jnp.exp(
        -jax.nn.softplus(density.reshape(batch_size, n_samples)) * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch_size, 1)), 1.0 - alpha + 1e-7], -1), -1)[:, :-1]
    weights = alpha * trans
    sampled_color = sampled_color.reshape(batch_size, n_samples, 3)
    color = jnp.sum(weights[:, :, None] * sampled_color, axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - jnp.sum(weights, -1, keepdims=True))
    return {"color": color, "sampled_color": sampled_color,
            "alpha": alpha, "weights": weights}


def render_core(rays_o, rays_d, z_vals, sample_dist, model: NeuS,
                background_alpha=None, background_sampled_color=None,
                background_rgb=None, cos_anneal_ratio=0.0):
    """Core NeuS compositing. Parity: sdf_render.py:141-235."""
    batch_size, n_samples = z_vals.shape
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full((batch_size, 1), sample_dist)], -1)
    mid_z = z_vals + dists * 0.5
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]).reshape(-1, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (batch_size, n_samples, 3)).reshape(-1, 3)

    sdf_full, gradients = model.full_with_grad(pts)
    sdf, feature = sdf_full[..., :1], sdf_full[..., 1:]
    sampled_color = model.color(pts, gradients, dirs, feature).reshape(
        batch_size, n_samples, 3)

    inv_s = model.inv_s()

    true_cos = jnp.sum(dirs * gradients, -1, keepdims=True)
    # anneal keeps cos "not dead" early in training (sdf_render.py:174-177)
    iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
                 + jax.nn.relu(-true_cos) * cos_anneal_ratio)

    est_next = sdf + iter_cos * dists.reshape(-1, 1) * 0.5
    est_prev = sdf - iter_cos * dists.reshape(-1, 1) * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip(((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
                      ).reshape(batch_size, n_samples), 0.0, 1.0)

    pts_norm = jnp.linalg.norm(pts, axis=-1).reshape(batch_size, n_samples)
    radius = model.radius()
    inside_sphere = jax.lax.stop_gradient((pts_norm < radius).astype(alpha.dtype))
    relax_inside = jax.lax.stop_gradient((pts_norm < radius * 1.2).astype(alpha.dtype))

    if background_alpha is not None:
        alpha = alpha * inside_sphere + background_alpha[:, :n_samples] * (1.0 - inside_sphere)
        alpha = jnp.concatenate([alpha, background_alpha[:, n_samples:]], axis=-1)
        sampled_color = (sampled_color * inside_sphere[:, :, None]
                         + background_sampled_color[:, :n_samples]
                         * (1.0 - inside_sphere)[:, :, None])
        sampled_color = jnp.concatenate(
            [sampled_color, background_sampled_color[:, n_samples:]], axis=1)
    else:
        alpha = alpha * inside_sphere

    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch_size, 1)), 1.0 - alpha + 1e-7], -1), -1)[:, :-1]
    weights = alpha * trans
    weights_sum = jnp.sum(weights, -1, keepdims=True)
    color = jnp.sum(sampled_color * weights[:, :, None], axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    # safe norm: fields with clipped encodings (hash grid outside its bbox)
    # have exactly-zero spatial gradients, where d|g|/dg is NaN
    grad_norm = jnp.sqrt(jnp.sum(
        gradients.reshape(batch_size, n_samples, 3) ** 2, axis=-1) + 1e-12)
    gradient_error = jnp.sum(relax_inside * (grad_norm - 1.0) ** 2) / (
        jnp.sum(relax_inside) + 1e-5)

    return {
        "color": color,
        "sdf": sdf,
        "dists": dists,
        "gradients": gradients.reshape(batch_size, n_samples, 3),
        "s_val": 1.0 / inv_s,
        "mid_z_vals": mid_z,
        "weights": weights,
        "cdf": prev_cdf.reshape(batch_size, n_samples),
        "gradient_error": gradient_error,
        "inside_sphere": inside_sphere,
    }


def render_neus(key: Optional[jax.Array], rays: Rays, model: NeuS,
                cos_anneal_ratio, cfg: NeusRenderConfig = NeusRenderConfig(),
                is_eval: bool = False) -> dict:
    """Top-level NeuS render. Parity: sdf_render.py:238-348.

    ``key`` may be None when is_eval (no stochastic perturbation).
    """
    perturb = 0.0 if is_eval else cfg.perturb
    rays_o, rays_d = rays.origins, rays.directions
    near, far = rays.near, rays.far
    batch_size = rays_o.shape[0]
    sample_dist = 2.0 / cfg.n_samples
    z_vals = jnp.linspace(0.0, 1.0, cfg.n_samples)[None, :]
    z_vals = near + (far - near) * z_vals

    z_vals_outside = None
    if cfg.n_outside > 0:
        z_vals_outside = jnp.linspace(
            1e-3, 1.0 - 1.0 / (cfg.n_outside + 1.0), cfg.n_outside)

    background_rgb = jnp.ones((1, 3)) if cfg.white_bkgd else None

    if perturb > 0:
        key, k1 = jax.random.split(key)
        t_rand = jax.random.uniform(k1, (batch_size, 1)) - 0.5
        z_vals = z_vals + t_rand * 2.0 / cfg.n_samples
        if cfg.n_outside > 0:
            key, k2 = jax.random.split(key)
            mids = 0.5 * (z_vals_outside[..., 1:] + z_vals_outside[..., :-1])
            upper = jnp.concatenate([mids, z_vals_outside[..., -1:]], -1)
            lower = jnp.concatenate([z_vals_outside[..., :1], mids], -1)
            t_rand = jax.random.uniform(k2, (batch_size, cfg.n_outside))
            z_vals_outside = lower[None, :] + (upper - lower)[None, :] * t_rand

    if cfg.n_outside > 0:
        z_vals_outside = far / jnp.flip(z_vals_outside, axis=-1) + 1.0 / cfg.n_samples

    # importance sampling (no grad, like the reference's torch.no_grad block)
    if cfg.n_importance > 0:
        samp_dtype = (jnp.bfloat16 if cfg.sampling_dtype == "bfloat16"
                      else None)

        def sampling(z_vals):
            pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
            sdf = model.sdf(pts.reshape(-1, 3), samp_dtype).reshape(
                batch_size, cfg.n_samples)
            for i in range(cfg.up_sample_steps):
                new_z = up_sample(rays_o, rays_d, z_vals, sdf,
                                  cfg.n_importance // cfg.up_sample_steps,
                                  64 * 2 ** i, model.radius())
                z_vals, sdf = cat_z_vals(model, rays_o, rays_d, z_vals, new_z,
                                         sdf, last=(i + 1 == cfg.up_sample_steps),
                                         compute_dtype=samp_dtype)
            return z_vals

        z_vals = jax.lax.stop_gradient(sampling(jax.lax.stop_gradient(z_vals)))

    n_total = cfg.n_samples + cfg.n_importance

    background_alpha = None
    background_sampled_color = None
    if cfg.n_outside > 0:
        z_feed = jnp.sort(jnp.concatenate([z_vals, z_vals_outside], axis=-1), axis=-1)
        ret_out = render_core_outside(rays_o, rays_d, z_feed, sample_dist, model)
        background_sampled_color = ret_out["sampled_color"]
        background_alpha = ret_out["alpha"]

    ret_fine = render_core(
        rays_o, rays_d, z_vals, sample_dist, model,
        background_rgb=background_rgb,
        background_alpha=background_alpha,
        background_sampled_color=background_sampled_color,
        cos_anneal_ratio=cos_anneal_ratio)

    weights = ret_fine["weights"]
    acc = jnp.sum(weights, axis=-1)
    z_mids = ret_fine["mid_z_vals"]
    distance = jnp.sum(weights[..., :128] * z_mids, axis=-1) / acc
    distance = jnp.clip(jnp.nan_to_num(distance, nan=jnp.inf),
                        near.squeeze(-1), far.squeeze(-1))
    del n_total
    return {
        "rgb": ret_fine["color"],
        "dist": distance,
        "acc": acc,
        "gradient_error": ret_fine["gradient_error"],
        "weights": weights,
        "means": z_mids,
        "s_val": ret_fine["s_val"],
    }
