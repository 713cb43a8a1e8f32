"""Stage-1 NeRF model family: VNeRF, MipNeRF, spherical harmonics.

Parity targets: ``neus/model/fields.py`` (VNeRF:11-64, MipNeRF variants),
``neus/misc/math.py`` (eval_sh:35-88). The MLP trunk reuses the NeRF
architecture from :mod:`robir_tpu.fields.radiance` (8x256 + viewdir head);
MipNeRF swaps the positional encoding for the integrated encoding over the
cone Gaussians.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .encoding import IPEConfig, PEConfig, integrated_pos_enc, positional_encoding
from .mlp import Params, apply_linear, init_linear


@dataclasses.dataclass(frozen=True)
class VNeRFConfig:
    depth: int = 8
    width: int = 256
    multires: int = 10
    multires_view: int = 4
    skips: tuple[int, ...] = (4,)
    use_ipe: bool = False      # MipNeRF mode: encode (mean, cov) Gaussians
    ipe_max_deg: int = 16

    @property
    def pts_pe(self) -> PEConfig:
        return PEConfig(num_freqs=self.multires, input_dims=3)

    @property
    def ipe(self) -> IPEConfig:
        return IPEConfig(min_deg=0, max_deg=self.ipe_max_deg, input_dims=3)

    @property
    def view_pe(self) -> PEConfig:
        return PEConfig(num_freqs=self.multires_view, input_dims=3)

    @property
    def in_ch(self) -> int:
        return self.ipe.out_dim if self.use_ipe else self.pts_pe.out_dim


def init_vnerf(key: jax.Array, cfg: VNeRFConfig) -> Params:
    W = cfg.width
    keys = jax.random.split(key, cfg.depth + 4)
    params: Params = {"pts_lin0": init_linear(keys[0], cfg.in_ch, W)}
    for i in range(cfg.depth - 1):
        d_in = W + cfg.in_ch if i in cfg.skips else W
        params[f"pts_lin{i + 1}"] = init_linear(keys[i + 1], d_in, W)
    params["views_lin0"] = init_linear(keys[cfg.depth],
                                       cfg.view_pe.out_dim + W, W // 2)
    params["feature"] = init_linear(keys[cfg.depth + 1], W, W)
    params["density"] = init_linear(keys[cfg.depth + 2], W, 1)
    params["rgb"] = init_linear(keys[cfg.depth + 3], W // 2, 3)
    return params


def _trunk(params: Params, cfg: VNeRFConfig, enc: jnp.ndarray,
           views_e: jnp.ndarray):
    h = enc
    for i in range(cfg.depth):
        h = jax.nn.relu(apply_linear(params[f"pts_lin{i}"], h))
        if i in cfg.skips:
            h = jnp.concatenate([enc, h], axis=-1)
    density = apply_linear(params["density"], h)
    feature = apply_linear(params["feature"], h)
    h = jnp.concatenate([feature, views_e], axis=-1)
    h = jax.nn.relu(apply_linear(params["views_lin0"], h))
    rgb = apply_linear(params["rgb"], h)
    return rgb, density


def vnerf_apply(params: Params, cfg: VNeRFConfig, points: jnp.ndarray,
                dirs: jnp.ndarray):
    """points [B, S, 3], dirs [B, 3] -> (raw_rgb [B, S, 3],
    raw_density [B, S, 1]); activations applied by the renderer."""
    B, S, _ = points.shape
    enc = positional_encoding(points.reshape(-1, 3), cfg.pts_pe)
    views_e = positional_encoding(dirs, cfg.view_pe)
    views_e = jnp.broadcast_to(views_e[:, None, :],
                               (B, S, views_e.shape[-1])).reshape(B * S, -1)
    rgb, density = _trunk(params, cfg, enc, views_e)
    return rgb.reshape(B, S, 3), density.reshape(B, S, 1)


def mipnerf_apply(params: Params, cfg: VNeRFConfig, means: jnp.ndarray,
                  covs_diag: jnp.ndarray, dirs: jnp.ndarray):
    """Gaussian-input variant (IMip.color_and_density_of_gaussian)."""
    B, S, _ = means.shape
    enc = integrated_pos_enc(means.reshape(-1, 3),
                             covs_diag.reshape(-1, 3), cfg.ipe)
    views_e = positional_encoding(dirs, cfg.view_pe)
    views_e = jnp.broadcast_to(views_e[:, None, :],
                               (B, S, views_e.shape[-1])).reshape(B * S, -1)
    rgb, density = _trunk(params, cfg, enc, views_e)
    return rgb.reshape(B, S, 3), density.reshape(B, S, 1)


# ---------------------------------------------------------------------------
# Spherical harmonics (neus/misc/math.py:35-88)
# ---------------------------------------------------------------------------

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)
_C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
       -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
       0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH basis colors: sh [..., C, (deg+1)^2], dirs [..., 3]."""
    assert 0 <= deg <= 4
    result = _C0 * sh[..., 0]
    if deg > 0:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        result = (result - _C1 * y * sh[..., 1] + _C1 * z * sh[..., 2]
                  - _C1 * x * sh[..., 3])
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result + _C2[0] * xy * sh[..., 4]
                      + _C2[1] * yz * sh[..., 5]
                      + _C2[2] * (2.0 * zz - xx - yy) * sh[..., 6]
                      + _C2[3] * xz * sh[..., 7]
                      + _C2[4] * (xx - yy) * sh[..., 8])
            if deg > 2:
                result = (result + _C3[0] * y * (3 * xx - yy) * sh[..., 9]
                          + _C3[1] * xy * z * sh[..., 10]
                          + _C3[2] * y * (4 * zz - xx - yy) * sh[..., 11]
                          + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[..., 12]
                          + _C3[4] * x * (4 * zz - xx - yy) * sh[..., 13]
                          + _C3[5] * z * (xx - yy) * sh[..., 14]
                          + _C3[6] * x * (xx - 3 * yy) * sh[..., 15])
                if deg > 3:
                    result = (result
                              + _C4[0] * xy * (xx - yy) * sh[..., 16]
                              + _C4[1] * yz * (3 * xx - yy) * sh[..., 17]
                              + _C4[2] * xy * (7 * zz - 1) * sh[..., 18]
                              + _C4[3] * yz * (7 * zz - 3) * sh[..., 19]
                              + _C4[4] * (zz * (35 * zz - 30) + 3) * sh[..., 20]
                              + _C4[5] * xz * (7 * zz - 3) * sh[..., 21]
                              + _C4[6] * (xx - yy) * (7 * zz - 1) * sh[..., 22]
                              + _C4[7] * xz * (xx - 3 * yy) * sh[..., 23]
                              + _C4[8] * (xx * (xx - 3 * yy)
                                          - yy * (3 * xx - yy)) * sh[..., 24])
    return result
