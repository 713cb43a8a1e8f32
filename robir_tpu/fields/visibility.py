"""Visibility classifier + indirect-illumination SG field.

Parity:
- ``VisNetwork`` (``model/implicit_differentiable_renderer.py:225-258``):
  (PE(x), PE(w)) -> 2 logits (occluded, visible), ReLU MLP.
- ``IndirctIllumNetwork`` (same file :170-222): PE(x) (+ hdr shift) -> 24 SG
  lobes (theta/phi via sigmoid -> unit vectors, lambda = sigmoid*30+0.1,
  mu = relu) plus an indirect hemispheric integral through a softplus-latent
  SparseAE head — note the reference uses the AE's *perturbed-input* output
  (index 1) for the integral.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import PEConfig, positional_encoding
from .mlp import Params, apply_linear, init_linear
from .sparse_ae import SparseAEConfig, init_sparse_ae, sparse_ae_apply


@dataclasses.dataclass(frozen=True)
class VisNetConfig:
    points_multires: int = 10
    dirs_multires: int = 4
    dims: tuple[int, ...] = (128, 128, 128, 128)
    # bf16 inter-layer activation storage (see fields/sdf.SDFConfig):
    # halves the sweep's HBM traffic without the dual-precision copies the
    # operand-only compute_dtype path produced (r1 OOM); logits return fp32
    storage_dtype: str | None = None

    @property
    def store(self):
        import jax.numpy as _jnp
        return _jnp.bfloat16 if self.storage_dtype == "bfloat16" else None

    @property
    def p_pe(self) -> PEConfig:
        return PEConfig(num_freqs=self.points_multires, input_dims=3)

    @property
    def d_pe(self) -> PEConfig:
        return PEConfig(num_freqs=self.dirs_multires, input_dims=3)


def init_visnet(key: jax.Array, cfg: VisNetConfig) -> Params:
    dims = (cfg.p_pe.out_dim + cfg.d_pe.out_dim,) + cfg.dims + (2,)
    keys = jax.random.split(key, len(dims) - 1)
    return {f"lin{i}": init_linear(keys[i], dims[i], dims[i + 1])
            for i in range(len(dims) - 1)}


def visnet_apply(params: Params, cfg: VisNetConfig, points: jnp.ndarray,
                 view_dirs: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """[..., 3], [..., 3] -> [..., 2] logits. ``compute_dtype`` runs the
    trunk in low precision (fp32 accumulate) — safe for classifier logits
    and the dominant cost of the PBR visibility sweeps."""
    p = positional_encoding(points, cfg.p_pe)
    d = positional_encoding(view_dirs, cfg.d_pe)
    h = jnp.concatenate([p, d], axis=-1)
    n = len(cfg.dims) + 1
    for i in range(n):
        h = apply_linear(params[f"lin{i}"], h, compute_dtype, cfg.store)
        if i < n - 1:
            h = jax.nn.relu(h)
    return h.astype(jnp.float32)


def visnet_outer_apply(params: Params, cfg: VisNetConfig,
                       points: jnp.ndarray, dirs: jnp.ndarray,
                       compute_dtype=None) -> jnp.ndarray:
    """Outer-product sweep: points [N, 3] x dirs [K, 3] -> logits [N, K, 2].

    Same math as :func:`visnet_apply` on the broadcasted (point, dir) grid,
    exploiting that the first layer's input is a concat of per-point and
    per-dir encodings: W0 splits into point rows and dir rows, so the first
    matmul runs on N + K rows instead of N*K, and nothing of size [N, K]
    exists until the first hidden width. This removes both the
    pathologically-padded [N, K, 3] broadcast inputs (42x tile padding for
    bf16 minor-dim-3 layouts on TPU — compile-time OOM) and the redundant
    first-layer FLOPs of the dense sweep in render/sg.get_diffuse_visibility
    (reference semantics: sg_render.py:111-195).
    """
    p = positional_encoding(points, cfg.p_pe)   # [N, Dp]
    d = positional_encoding(dirs, cfg.d_pe)     # [K, Dd]
    l0 = params["lin0"]
    if "v" in l0:
        v = l0["v"]
        w0 = v * (l0["g"] / (jnp.linalg.norm(v, axis=0) + 0.0))
    else:
        w0 = l0["w"]
    wp, wd = w0[: p.shape[-1]], w0[p.shape[-1]:]
    store = cfg.store
    dt = store or compute_dtype
    if dt is not None:
        p, wp = p.astype(dt), wp.astype(dt)
        d, wd = d.astype(dt), wd.astype(dt)
    acc = dt if store is not None else jnp.float32
    hp = jax.lax.dot_general(p, wp, (((1,), (0,)), ((), ())),
                             preferred_element_type=acc)       # [N, H]
    hd = jax.lax.dot_general(d, wd, (((1,), (0,)), ((), ())),
                             preferred_element_type=acc)       # [K, H]
    hd = hd + l0["b"].astype(hd.dtype)
    h = jax.nn.relu(hp[:, None, :] + hd[None, :, :])            # [N, K, H]
    n = len(cfg.dims) + 1
    for i in range(1, n):
        h = apply_linear(params[f"lin{i}"], h, compute_dtype, store)
        if i < n - 1:
            h = jax.nn.relu(h)
    return h.astype(jnp.float32)


@dataclasses.dataclass(frozen=True)
class IndirIllumConfig:
    multires: int = 10
    dims: tuple[int, ...] = (128, 128, 128, 128)
    num_lgt_sgs: int = 24
    use_hdr: bool = True

    @property
    def pe(self) -> PEConfig:
        return PEConfig(num_freqs=self.multires, input_dims=3)

    @property
    def in_dim(self) -> int:
        return self.pe.out_dim + (1 if self.use_hdr else 0)

    @property
    def integral_ae(self) -> SparseAEConfig:
        return SparseAEConfig(in_dim=self.in_dim, out_dim=3, out_act=None,
                              smooth_on_latent=False, lc_act="softplus")


def init_indirect(key: jax.Array, cfg: IndirIllumConfig) -> Params:
    k1, k2 = jax.random.split(key)
    dims = (cfg.in_dim,) + cfg.dims + (cfg.num_lgt_sgs * 6,)
    keys = jax.random.split(k1, len(dims) - 1)
    return {
        "lobe_layer": {f"lin{i}": init_linear(keys[i], dims[i], dims[i + 1])
                       for i in range(len(dims) - 1)},
        "integral_layer": init_sparse_ae(k2, cfg.integral_ae),
    }


def indirect_apply(params: Params, cfg: IndirIllumConfig, points: jnp.ndarray,
                   hdr_shift: Optional[jnp.ndarray] = None,
                   key: Optional[jax.Array] = None
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[N, 3] (, [N, 1]) -> (lgt_sgs [N, M, 7], env_int [N, 3])."""
    x = positional_encoding(points, cfg.pe)
    if cfg.use_hdr:
        x = jnp.concatenate([x, hdr_shift], axis=-1)

    h = x
    n = len(cfg.dims) + 1
    for i in range(n):
        h = apply_linear(params["lobe_layer"][f"lin{i}"], h)
        if i < n - 1:
            h = jax.nn.relu(h)
    out = h.reshape(points.shape[0], cfg.num_lgt_sgs, 6)

    tp = jax.nn.sigmoid(out[..., :2])
    theta = tp[..., :1] * 2 * np.pi
    phi = tp[..., 1:2] * np.pi
    lobes = jnp.concatenate([jnp.cos(theta) * jnp.sin(phi),
                             jnp.sin(theta) * jnp.sin(phi),
                             jnp.cos(phi)], axis=-1)
    lam = jax.nn.sigmoid(out[..., 2:3]) * 30 + 0.1
    mu = jax.nn.relu(out[..., 3:])
    lgt_sgs = jnp.concatenate([lobes, lam, mu], axis=-1)

    # reference uses the perturbed-input AE output for the integral
    # (implicit_differentiable_renderer.py:220)
    _, env_int = sparse_ae_apply(params["integral_layer"], cfg.integral_ae,
                                 x, key)
    return lgt_sgs, jnp.abs(env_int)
