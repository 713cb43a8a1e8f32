"""Radiance (rendering) MLP and NeRF background field.

Parity targets:
- ``RenderingNetwork`` (``neus/model/neus_fields.py:190-257``; stage-2 copy
  ``model/neus_model.py:441-519`` and IDR variant
  ``model/implicit_differentiable_renderer.py:108-167``): modes
  'idr' / 'no_view_dir' / 'no_normal', view-dir PE, weight-norm linears,
  ReLU trunk, sigmoid output (unless 'raw' in mode).
- ``NeRF`` background (``neus_fields.py:260-337``): the NeRF++ outer shell
  with 4D inverted-sphere input.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .encoding import PEConfig, positional_encoding
from .mlp import Params, apply_linear, apply_linear_parts, init_linear


@dataclasses.dataclass(frozen=True)
class RenderingConfig:
    d_feature: int = 256
    mode: str = "idr"  # {no_view_dir, no_normal, idr} (+ 'raw' disables sigmoid)
    d_in: int = 9      # points(3) + viewdirs(3) + normals(3)
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    weight_norm: bool = True
    multires_view: int = 4
    squeeze_out: bool = True
    # bf16 inter-layer activation storage (see fields/sdf.SDFConfig):
    # halves the color sweep's HBM traffic; outputs return fp32
    storage_dtype: str | None = None

    @property
    def store(self):
        return jnp.bfloat16 if self.storage_dtype == "bfloat16" else None

    @property
    def effective_d_in(self) -> int:
        d = self.d_in
        if "no" in self.mode:
            d -= 3
        return d

    @property
    def view_pe(self) -> PEConfig:
        return PEConfig(num_freqs=self.multires_view, input_dims=3)

    @property
    def dims(self) -> tuple[int, ...]:
        d0 = self.effective_d_in + self.d_feature
        if self.multires_view > 0:
            d0 += self.view_pe.out_dim - 3
        return (d0,) + (self.d_hidden,) * self.n_layers + (self.d_out,)

    @property
    def use_sigmoid(self) -> bool:
        return self.squeeze_out and "raw" not in self.mode


def init_rendering(key: jax.Array, cfg: RenderingConfig) -> Params:
    dims = cfg.dims
    keys = jax.random.split(key, len(dims) - 1)
    return {
        f"lin{i}": init_linear(keys[i], dims[i], dims[i + 1],
                               weight_norm=cfg.weight_norm)
        for i in range(len(dims) - 1)
    }


def rendering_apply(params: Params, cfg: RenderingConfig, points: jnp.ndarray,
                    normals: jnp.ndarray, view_dirs: jnp.ndarray,
                    feature_vectors: jnp.ndarray) -> jnp.ndarray:
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.view_pe)
    if "no_view_dir" in cfg.mode:
        small = jnp.concatenate([points, normals], axis=-1)
    elif "no_normal" in cfg.mode:
        small = jnp.concatenate([points, view_dirs], axis=-1)
    else:  # idr
        small = jnp.concatenate([points, view_dirs, normals], axis=-1)
    # first layer as split matmuls: the 256-wide feature block never rides
    # through a concatenated input buffer (nor its backward slice) — equal
    # to concat-then-matmul up to fp32 reassociation over the K dim
    h = apply_linear_parts(params["lin0"], [small, feature_vectors],
                           storage_dtype=cfg.store)
    n = len(cfg.dims)
    for i in range(1, n - 1):
        h = jax.nn.relu(h)
        h = apply_linear(params[f"lin{i}"], h, storage_dtype=cfg.store)
    h = h.astype(jnp.float32)
    if cfg.use_sigmoid:
        h = jax.nn.sigmoid(h)
    return h


# ---------------------------------------------------------------------------
# NeRF background (NeRF++ outer shell)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class NeRFBgConfig:
    depth: int = 8
    width: int = 256
    d_in: int = 4       # [x/r, 1/r] inverted-sphere coords
    d_in_view: int = 3
    multires: int = 10
    multires_view: int = 4
    skips: tuple[int, ...] = (4,)

    @property
    def pts_pe(self) -> PEConfig:
        return PEConfig(num_freqs=self.multires, input_dims=self.d_in)

    @property
    def view_pe(self) -> PEConfig:
        return PEConfig(num_freqs=self.multires_view, input_dims=self.d_in_view)


def init_nerf_bg(key: jax.Array, cfg: NeRFBgConfig) -> Params:
    in_ch = cfg.pts_pe.out_dim
    in_ch_view = cfg.view_pe.out_dim
    W = cfg.width
    keys = jax.random.split(key, cfg.depth + 4)
    params: Params = {"pts_lin0": init_linear(keys[0], in_ch, W)}
    for i in range(cfg.depth - 1):
        d_in = W + in_ch if i in cfg.skips else W
        params[f"pts_lin{i + 1}"] = init_linear(keys[i + 1], d_in, W)
    params["views_lin0"] = init_linear(keys[cfg.depth], in_ch_view + W, W // 2)
    params["feature"] = init_linear(keys[cfg.depth + 1], W, W)
    params["alpha"] = init_linear(keys[cfg.depth + 2], W, 1)
    params["rgb"] = init_linear(keys[cfg.depth + 3], W // 2, 3)
    return params


def nerf_bg_apply(params: Params, cfg: NeRFBgConfig, pts: jnp.ndarray,
                  views: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(alpha/density [N,1], rgb [N,3]). Parity: NeRF.forward
    (neus_fields.py:313-337) with use_viewdirs=True — note the reference
    appends the skip input *after* the activation at skip layers."""
    pts_e = positional_encoding(pts, cfg.pts_pe)
    views_e = positional_encoding(views, cfg.view_pe)
    h = pts_e
    for i in range(cfg.depth):
        h = jax.nn.relu(apply_linear(params[f"pts_lin{i}"], h))
        if i in cfg.skips:
            h = jnp.concatenate([pts_e, h], axis=-1)
    alpha = apply_linear(params["alpha"], h)
    feature = apply_linear(params["feature"], h)
    h = jnp.concatenate([feature, views_e], axis=-1)
    h = jax.nn.relu(apply_linear(params["views_lin0"], h))
    rgb = apply_linear(params["rgb"], h)
    return alpha, rgb
