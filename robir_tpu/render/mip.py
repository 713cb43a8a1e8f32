"""Mip-NeRF cone-cast renderer (the stage-1 alternate render mode).

Parity: ``neus/volume_render/mip_render.py`` — conical-frustum Gaussians
(``conical_frustum_to_gaussian:256-287``, ``lift_gaussian:231-253``),
stratified sampling (``sample_along_rays:311-350``), blurpool resampling
(``resample_along_rays:419-461``), sorted piecewise-constant PDF inversion
(``sorted_piecewise_constant_pdf:353-416``), density compositing
(``density_process:42-84``), the 'sim'/'sdf'/'raw' compositor family
(``similarity_process:87-198``), and the n-level ``render_mip`` loop
(``:201-226``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .neus import Rays


def lift_gaussian(d, t_mean, t_var, r_var):
    """Lift a 1D ray Gaussian to 3D (diagonal covariance)."""
    mean = d[..., None, :] * t_mean[..., None]
    mag = jnp.sum(d ** 2, axis=-1, keepdims=True)
    d_mag_sq = jnp.maximum(mag, 1e-10)
    d_outer_diag = d ** 2
    null_outer_diag = 1 - d_outer_diag / d_mag_sq
    t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
    xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
    return mean, t_cov_diag + xy_cov_diag


def conical_frustum_to_gaussian(d, t0, t1, base_radius):
    """Stable conical-frustum moments (mip_render.py:256-287)."""
    mu = (t0 + t1) / 2
    hw = (t1 - t0) / 2
    t_mean = mu + (2 * mu * hw ** 2) / (3 * mu ** 2 + hw ** 2)
    t_var = (hw ** 2) / 3 - (4 / 15) * ((hw ** 4 * (12 * mu ** 2 - hw ** 2))
                                        / (3 * mu ** 2 + hw ** 2) ** 2)
    r_var = base_radius ** 2 * ((mu ** 2) / 4 + (5 / 12) * hw ** 2
                                - 4 / 15 * (hw ** 4) / (3 * mu ** 2 + hw ** 2))
    return lift_gaussian(d, t_mean, t_var, r_var)


def cast_rays(t_vals, origins, directions, radii):
    t0, t1 = t_vals[..., :-1], t_vals[..., 1:]
    means, covs = conical_frustum_to_gaussian(directions, t0, t1, radii)
    return means + origins[..., None, :], covs


def sample_along_rays(key, origins, directions, radii, num_samples, near, far,
                      randomized: bool, lindisp: bool = False):
    """Stratified fencepost sampling (mip_render.py:311-350)."""
    batch_size = origins.shape[0]
    t_vals = jnp.linspace(0.0, 1.0, num_samples + 1)
    if lindisp:
        t_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        t_vals = near * (1.0 - t_vals) + far * t_vals

    if randomized:
        mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        upper = jnp.concatenate([mids, t_vals[..., -1:]], -1)
        lower = jnp.concatenate([t_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, (batch_size, num_samples + 1))
        t_vals = lower + (upper - lower) * t_rand
    else:
        t_vals = jnp.broadcast_to(t_vals, (batch_size, num_samples + 1))
    means, covs = cast_rays(t_vals, origins, directions, radii)
    return t_vals, (means, covs)


def sorted_piecewise_constant_pdf(key, bins, weights, num_samples,
                                  randomized: bool):
    """Invert a piecewise-constant CDF over sorted bins
    (mip_render.py:353-416)."""
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(eps - weight_sum, 0.0)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf,
                           jnp.ones_like(cdf[..., :1])], axis=-1)

    full_shape = cdf.shape[:-1] + (num_samples,)
    if randomized:
        s = 1 / num_samples
        u = jnp.arange(num_samples) * s
        u = u + jax.random.uniform(key, full_shape) * (s - 1e-8)
        u = jnp.minimum(u, 1.0 - 1e-8)
    else:
        u = jnp.linspace(0.0, 1.0 - 1e-5, num_samples)
        u = jnp.broadcast_to(u, full_shape)

    mask = cdf[..., :, None] <= u[..., None, :]

    def find_interval(x):
        x0 = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), axis=-2)
        x1 = jnp.min(jnp.where(~mask, x[..., None], x[..., -1:, None]), axis=-2)
        return x0, x1

    bins_g0, bins_g1 = find_interval(bins)
    cdf_g0, cdf_g1 = find_interval(cdf)

    t = jnp.clip(jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), nan=0.0), 0, 1)
    return bins_g0 + t * (bins_g1 - bins_g0)


def resample_along_rays(key, origins, directions, radii, t_vals, weights,
                        randomized: bool, stop_grad: bool = True,
                        resample_padding: float = 0.01):
    """Blurpool + CDF resampling (mip_render.py:419-461)."""
    weights_pad = jnp.concatenate([weights[..., :1], weights,
                                   weights[..., -1:]], axis=-1)
    weights_max = jnp.maximum(weights_pad[..., :-1], weights_pad[..., 1:])
    weights_blur = 0.5 * (weights_max[..., :-1] + weights_max[..., 1:])
    weights = weights_blur + resample_padding

    new_t_vals = sorted_piecewise_constant_pdf(
        key, t_vals, weights, t_vals.shape[-1], randomized)
    if stop_grad:
        new_t_vals = jax.lax.stop_gradient(new_t_vals)
    means, covs = cast_rays(new_t_vals, origins, directions, radii)
    return new_t_vals, (means, covs)


@dataclasses.dataclass(frozen=True)
class MipRenderConfig:
    n_levels: int = 2
    num_samples: int = 64
    resample_padding: float = 0.01
    rgb_padding: float = 0.001
    density_bias: float = -1.0
    density_activation: str = "softplus"  # softplus | relu
    white_bkgd: bool = True
    stop_level_grad: bool = True
    # 'mip' = density compositing; 'sim'/'sdf'/'raw' = similarity_process
    # sub-modes (mip_render.py:203)
    mode: str = "mip"


def density_process(raw_rgb, raw_density, t_vals, rays_d,
                    cfg: MipRenderConfig):
    """Density compositing (mip_render.py:42-84)."""
    rgb = jax.nn.sigmoid(raw_rgb)
    rgb = rgb * (1 + 2 * cfg.rgb_padding) - cfg.rgb_padding
    act = jax.nn.softplus if cfg.density_activation == "softplus" else jax.nn.relu
    density = act(raw_density + cfg.density_bias)

    t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
    t_dists = t_vals[..., 1:] - t_vals[..., :-1]
    delta = t_dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)
    density_delta = density[..., 0] * delta

    alpha = 1 - jnp.exp(-density_delta)
    trans = jnp.exp(-jnp.concatenate([
        jnp.zeros_like(density_delta[..., :1]),
        jnp.cumsum(density_delta[..., :-1], axis=-1)], axis=-1))
    weights = alpha * trans

    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1)
    distance = jnp.sum(weights * t_mids, axis=-1) / acc
    distance = jnp.clip(jnp.nan_to_num(distance, nan=jnp.inf),
                        t_vals[:, 0], t_vals[:, -1])
    if cfg.white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return {"rgb": comp_rgb, "dist": distance, "acc": acc,
            "weights": weights, "sim_or_grad": jnp.ones_like(alpha)}


def similarity_process(raw_rgb, raw_density, means, t_vals, rays_d,
                       cfg: MipRenderConfig, mode: str = "sim",
                       model=None, cos_anneal_ratio: float = 1.0,
                       key=None, raw_noise_std: float = 0.0):
    """The reference's 'sim' compositor family (mip_render.py:87-198).

    Three sub-modes on the raw density channel(s):
    - 'sim': alpha from the cosine similarity of adjacent per-sample
      feature vectors (relu(1 - relu(sim + 0.5))), rgb from segment
      midpoints (:113-126);
    - 'sdf': NeuS-style section CDF compositing over an SDF channel with
      an eikonal term (:128-175). ``model`` must expose
      ``grad(x)``/``dev(x)``/``radius()``; the reference's call-counting
      auto-anneal (:141-146, a stateful function attribute) is replaced by
      the explicit ``cos_anneal_ratio`` argument — stateful op counters
      don't exist under jit;
    - otherwise: vanilla relu raw2alpha (:176-178).

    Returns the same dict shape as :func:`density_process`, with the
    similarity (or the eikonal gradient error) in ``sim_or_grad``.
    """
    rgb = jax.nn.sigmoid(raw_rgb)
    dists = t_vals[..., 1:] - t_vals[..., :-1]
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)
    if raw_density.ndim == 3 and raw_density.shape[-1] == 1:
        raw_density = raw_density[..., 0]

    noise = 0.0
    if raw_noise_std > 0.0 and key is not None:
        noise = jax.random.normal(key, raw_density.shape) * raw_noise_std

    if "sim" in mode:
        sig = raw_density if raw_density.ndim == 3 else raw_density[..., None]
        a_sig, b_sig = sig[:, :-1], sig[:, 1:]
        sim = jnp.sum(a_sig * b_sig, -1) / (
            jnp.linalg.norm(a_sig, axis=-1) + 1e-3) / (
            jnp.linalg.norm(b_sig, axis=-1) + 1e-3)
        sim = jnp.concatenate([sim, sim[:, -1:]], 1)
        alpha = jax.nn.relu(1.0 - jax.nn.relu(sim + 0.5))
        rgb = (rgb[:, 1:] + rgb[:, :-1]) / 2.0
        rgb = jnp.concatenate([rgb, rgb[:, -1:]], 1)
        sim_or_grad = sim
    elif "sdf" in mode:
        batch_size, n_samples = means.shape[0], means.shape[1]
        sdf = raw_density
        flat = means.reshape(-1, 3)
        gradients = model.grad(flat).reshape(batch_size, n_samples, 3)
        inv_s = jnp.broadcast_to(model.dev(flat).reshape(
            batch_size, n_samples), (batch_size, n_samples))
        dirs = jnp.broadcast_to(rays_d[:, None, :], means.shape)
        true_cos = jnp.sum(dirs * gradients, -1)
        iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5)
                     * (1.0 - cos_anneal_ratio)
                     + jax.nn.relu(-true_cos) * cos_anneal_ratio)
        est_next = sdf + iter_cos * dists * 0.5
        est_prev = sdf - iter_cos * dists * 0.5
        prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
        next_cdf = jax.nn.sigmoid(est_next * inv_s)
        alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5),
                         0.0, 1.0)
        pts_norm = jnp.linalg.norm(means, axis=-1)
        radius = model.radius()
        inside = jax.lax.stop_gradient(
            (pts_norm < radius).astype(alpha.dtype))
        relax_inside = jax.lax.stop_gradient(
            (pts_norm < radius * 1.2).astype(alpha.dtype))
        alpha = alpha * inside
        grad_norm = jnp.sqrt(jnp.sum(gradients ** 2, axis=-1) + 1e-12)
        sim_or_grad = jnp.sum(relax_inside * (grad_norm - 1.0) ** 2) / (
            jnp.sum(relax_inside) + 1e-5)
    else:
        alpha = 1.0 - jnp.exp(-jax.nn.relu(raw_density + noise) * dists)
        sim_or_grad = jnp.ones_like(alpha)

    trans = jnp.cumprod(jnp.concatenate(
        [jnp.ones((alpha.shape[0], 1)), 1.0 - alpha + 1e-10], -1), -1)
    weights = alpha * trans[:, :-1]
    rgb_map = jnp.sum(weights[..., None] * rgb, -2)
    mid_z = (t_vals[:, 1:] + t_vals[:, :-1]) / 2.0
    depth_map = jnp.sum(weights * mid_z, -1)
    acc_map = jnp.sum(weights, -1)
    if cfg.white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return {"rgb": rgb_map, "dist": depth_map, "acc": acc_map,
            "weights": weights, "sim_or_grad": sim_or_grad}


# model_fn(means [B,S,3], covs_diag [B,S,3], viewdirs [B,3]) -> (raw_rgb, raw_density)
MipModelFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray],
                      tuple[jnp.ndarray, jnp.ndarray]]


def render_mip(key: Optional[jax.Array], rays: Rays, model_fn: MipModelFn,
               cfg: MipRenderConfig = MipRenderConfig(),
               is_eval: bool = False, model=None,
               cos_anneal_ratio: float = 1.0) -> list[dict]:
    """n-level coarse-to-fine render loop (mip_render.py:201-226).
    Returns the per-level output list (last entry is the fine render).

    ``cfg.mode``: 'mip' composites densities (density_process); any other
    value routes through :func:`similarity_process` with that sub-mode
    (reference dispatch at mip_render.py:203). The 'sdf' sub-mode needs
    ``model`` (grad/dev/radius)."""
    randomized = not is_eval
    ret = []
    t_vals = None
    weights = None
    for level in range(cfg.n_levels):
        if key is not None:
            key, k = jax.random.split(key)
        else:
            k = None
        if level == 0:
            t_vals, (means, covs) = sample_along_rays(
                k, rays.origins, rays.directions, rays.radii,
                cfg.num_samples, rays.near, rays.far, randomized)
        else:
            t_vals, (means, covs) = resample_along_rays(
                k, rays.origins, rays.directions, rays.radii, t_vals,
                weights, randomized, cfg.stop_level_grad,
                cfg.resample_padding)
        raw_rgb, raw_density = model_fn(means, covs, rays.viewdirs)
        if cfg.mode == "mip":
            out = density_process(raw_rgb, raw_density, t_vals,
                                  rays.directions, cfg)
        else:
            out = similarity_process(raw_rgb, raw_density, means, t_vals,
                                     rays.directions, cfg, mode=cfg.mode,
                                     model=model,
                                     cos_anneal_ratio=cos_anneal_ratio)
        out["means"] = means
        weights = out["weights"]
        ret.append(out)
    return ret
