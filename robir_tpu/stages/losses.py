"""Stage-2 losses: InvLoss (PBR/CESR/Norm) and IllumLoss (Vis).

Parity: ``model/loss.py`` — masked L1/L2 rgb (:31-42), eikonal (:44-49),
mask BCE with alpha-scaled logits (:51-59), latent smooth with the 0.2
roughness trick (:61-67), normal consistency (:69-73), KL sparsity on AE
latents (:75-95); IllumLoss = SG-vs-traced radiance L1 + integral L1 +
cross-entropy visibility (:144-179).

TPU-native: boolean-indexed reductions become mask-weighted dense sums
(identical values: sums over masked-out lanes are zero, denominators use
the reference's own normalizers).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..fields.sparse_ae import ae_kl_divergence


@dataclasses.dataclass(frozen=True)
class InvLossConfig:
    idr_rgb_weight: float = 1.0
    eikonal_weight: float = 0.1
    mask_weight: float = 100.0
    alpha: float = 50.0
    sg_rgb_weight: float = 1.0
    kl_weight: float = 1.0
    latent_smooth_weight: float = 1.0
    loss_type: str = "L1"


def _img_err(cfg: InvLossConfig, a, b):
    if cfg.loss_type == "L1":
        return jnp.abs(a - b)
    if cfg.loss_type == "L2":
        return (a - b) ** 2
    raise ValueError(cfg.loss_type)


def rgb_loss(cfg: InvLossConfig, rgb_pred, rgb_gt, mask) -> jnp.ndarray:
    """Masked image loss / n_rays (loss.py:31-42). mask: [N] bool."""
    n = rgb_pred.shape[0]
    err = _img_err(cfg, rgb_pred, rgb_gt.reshape(-1, 3))
    return jnp.sum(err * mask[:, None]) / n


def eikonal_loss(grad_theta) -> jnp.ndarray:
    return jnp.mean((jnp.linalg.norm(grad_theta, axis=-1) - 1.0) ** 2)


def mask_loss(cfg: InvLossConfig, sdf_output, network_object_mask,
              object_mask) -> jnp.ndarray:
    """BCE on -alpha*sdf for rays outside (net & obj) (loss.py:51-59)."""
    n = object_mask.shape[0]
    sel = ~(network_object_mask & object_mask)
    logits = -cfg.alpha * sdf_output.reshape(-1)
    gt = object_mask.astype(jnp.float32)
    bce = jnp.clip(logits, 0, None) - logits * gt + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return (1.0 / cfg.alpha) * jnp.sum(bce * sel) / n


def latent_smooth_loss(diffuse_albedo, roughness, xi_diffuse, xi_roughness):
    """L1(albedo pair) + 0.2 * L1(roughness pair) (loss.py:61-67)."""
    return (jnp.mean(jnp.abs(diffuse_albedo - xi_diffuse))
            + jnp.mean(jnp.abs(roughness[..., 0] - xi_roughness[..., 0])) * 0.2)


def normal_consistency_loss(normal_map, normals, surface_mask):
    """Masked MSE between the AE normal map and geometry normals
    (loss.py:69-73)."""
    w = surface_mask[:, None].astype(normal_map.dtype)
    denom = jnp.clip(jnp.sum(w) * normal_map.shape[-1], 1.0, None)
    return jnp.sum(w * (normal_map - normals) ** 2) / denom


def kl_loss(raw_latent, rho: float = 0.05) -> jnp.ndarray:
    """KL sparsity on the (already masked) AE latent batch (loss.py:85-95).
    Callers evaluate the encoder on surface points and pass the raw latent."""
    return ae_kl_divergence(raw_latent, rho)


def masked_spec_kl(envmap_params, envmap_cfg, points, mask,
                   var=None, rho: float = 0.05) -> jnp.ndarray:
    """Bernoulli KL sparsity on the spec-BRDF encoder latents at surface
    points (reference loss.py:85-95 evaluated at points[network_object_mask],
    loss.py:114): dense equivalent via a mask-weighted batch mean. Shared by
    the PBR and CESR steps (CESR passes the dropout ``var``)."""
    from ..fields.encoding import positional_encoding
    from ..fields.sparse_ae import encode as ae_encode
    pts_pe = positional_encoding(points, envmap_cfg.pe)
    latent = ae_encode(envmap_params["spec_brdf_encoder_layer"],
                       envmap_cfg.spec_brdf_ae, pts_pe, var=var)
    w = mask.astype(jnp.float32)[:, None]
    rho_hat = jnp.sum(jax.nn.sigmoid(latent) * w, 0) / jnp.clip(
        jnp.sum(w), 1.0, None)
    return jnp.mean(rho * jnp.log(rho / (rho_hat + 1e-4)) + (1 - rho)
                    * jnp.log((1 - rho) / (1 - rho_hat + 1e-4)))


# ---------------------------------------------------------------------------
# IllumLoss (Vis stage)
# ---------------------------------------------------------------------------


def query_indir_illum(lgt_sgs: jnp.ndarray, sample_dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate per-point SG sets along sample dirs (loss.py:128-141).
    lgt_sgs [N, L, 7], sample_dirs [N, S, 3] -> [N, S, 3]."""
    lobes = lgt_sgs[..., :3] / jnp.linalg.norm(lgt_sgs[..., :3], axis=-1, keepdims=True)
    lam = lgt_sgs[..., 3:4]
    mu = lgt_sgs[..., -3:]
    d = sample_dirs[:, :, None, :]
    rad = mu[:, None] * jnp.exp(lam[:, None] * (jnp.sum(d * lobes[:, None], -1, keepdims=True) - 1.0))
    return jnp.sum(rad, axis=2)


@dataclasses.dataclass(frozen=True)
class IllumLossConfig:
    loss_type: str = "L1"


def illum_loss(cfg: IllumLossConfig, *, indirect_sgs, indir_integral,
               network_object_mask, trace_radiance, sample_dirs, gt_vis,
               pred_vis, indir_mask, gt_integral, anneal_t=0.0):
    """(radiance_loss, visibility_loss) — parity with IllumLoss.forward
    (loss.py:156-179), dense-masked.

    Shapes (N = rays, S = secondary dirs):
      indirect_sgs [N, L, 7], indir_integral [N, 3],
      network_object_mask [N] bool, trace_radiance [N, S, 3],
      sample_dirs [N, S, 3], gt_vis [N, S] bool (True = occluded/hit),
      pred_vis [N, S, 2] logits, indir_mask [N, S] bool, gt_integral [N, 3].
    """
    err = (lambda a, b: jnp.abs(a - b)) if cfg.loss_type == "L1" else (
        lambda a, b: (a - b) ** 2)

    pred_rad = query_indir_illum(indirect_sgs, sample_dirs)
    w = (indir_mask & network_object_mask[:, None]).astype(jnp.float32)[..., None]
    gt_rad = trace_radiance + anneal_t
    radiance = jnp.sum(err(gt_rad, pred_rad) * w) / jnp.clip(jnp.sum(w) * 3, 1.0, None)

    wi = network_object_mask.astype(jnp.float32)[:, None]
    integral = jnp.sum(err(gt_integral, indir_integral) * wi) / jnp.clip(
        jnp.sum(wi) * 3, 1.0, None)
    radiance_total = radiance + integral

    # visibility CE: label 1 = visible = NOT hit (loss.py:174-176)
    labels = (~gt_vis).astype(jnp.int32)
    logp = jax.nn.log_softmax(pred_vis, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    wv = network_object_mask.astype(jnp.float32)[:, None]
    visibility = jnp.sum(ce * wv) / jnp.clip(jnp.sum(wv * jnp.ones_like(ce)), 1.0, None)

    return radiance_total, visibility
