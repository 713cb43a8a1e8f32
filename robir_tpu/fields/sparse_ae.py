"""Sparse autoencoder: latent-bottleneck material/normal heads.

Parity: ``SparseAE`` (``model/sg_envmap_material.py:40-118``): 512x4
LeakyReLU(0.2) encoder -> latent(32), 128x2 decoder; latent activation
(sigmoid by default, softplus for the indirect-integral head); smoothness
pair from a perturbed latent (+N(0,0.01)) or perturbed input (+N(0,0.02));
latent dropout mask ``var`` (the CESR-stage resampled mask,
``train_cesr.py:639-641``) multiplies the raw latent by (1 - var).

TPU-native: the dropout mask is explicit state passed by the caller (not a
mutable module attribute) and randomness comes from PRNG keys.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .mlp import Params, apply_linear, init_linear


@dataclasses.dataclass(frozen=True)
class SparseAEConfig:
    in_dim: int = 63
    out_dim: int = 5
    latent_dim: int = 32
    encoder_dims: tuple[int, ...] = (512, 512, 512, 512)
    decoder_dims: tuple[int, ...] = (128, 128)
    smooth_on_latent: bool = True
    out_act: Optional[str] = "sigmoid"   # None | 'sigmoid'
    lc_act: str = "sigmoid"              # 'sigmoid' | 'softplus'


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.2)


def init_sparse_ae(key: jax.Array, cfg: SparseAEConfig) -> Params:
    enc_dims = (cfg.in_dim,) + cfg.encoder_dims + (cfg.latent_dim,)
    dec_dims = (cfg.latent_dim,) + cfg.decoder_dims + (cfg.out_dim,)
    keys = jax.random.split(key, len(enc_dims) + len(dec_dims))
    params: Params = {"encoder": {}, "decoder": {}}
    for i in range(len(enc_dims) - 1):
        params["encoder"][f"lin{i}"] = init_linear(keys[i], enc_dims[i], enc_dims[i + 1])
    for i in range(len(dec_dims) - 1):
        params["decoder"][f"lin{i}"] = init_linear(
            keys[len(enc_dims) + i], dec_dims[i], dec_dims[i + 1])
    return params


def _lc_act(cfg: SparseAEConfig, x):
    if cfg.lc_act == "sigmoid":
        return jax.nn.sigmoid(x)
    if cfg.lc_act == "softplus":
        return jax.nn.softplus(x)
    raise ValueError(cfg.lc_act)


def encode(params: Params, cfg: SparseAEConfig, x: jnp.ndarray,
           var: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Raw (pre-activation) latent, with the dropout mask applied."""
    h = x
    n = len(cfg.encoder_dims) + 1
    for i in range(n):
        h = apply_linear(params["encoder"][f"lin{i}"], h)
        if i < n - 1:
            h = _leaky(h)
    if var is not None:
        h = h * (1.0 - var)
    return h


def decode(params: Params, cfg: SparseAEConfig, latent: jnp.ndarray) -> jnp.ndarray:
    h = latent
    n = len(cfg.decoder_dims) + 1
    for i in range(n):
        h = apply_linear(params["decoder"][f"lin{i}"], h)
        if i < n - 1:
            h = _leaky(h)
    return h


def sparse_ae_apply(params: Params, cfg: SparseAEConfig, x: jnp.ndarray,
                    key: Optional[jax.Array] = None,
                    var: Optional[jnp.ndarray] = None
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(out, out_xi): decoded output + smoothness-pair output from a
    perturbed latent/input. ``key=None`` disables the perturbation (the pair
    equals the primary output) for deterministic eval."""
    latent = _lc_act(cfg, encode(params, cfg, x, var))
    out = decode(params, cfg, latent)

    if key is None:
        out_xi = out
    elif cfg.smooth_on_latent:
        rand_lc = latent + 0.01 * jax.random.normal(key, latent.shape)
        out_xi = decode(params, cfg, rand_lc)
    else:
        rand_x = x + 0.02 * jax.random.normal(key, x.shape)
        rand_lc = _lc_act(cfg, encode(params, cfg, rand_x, var))
        out_xi = decode(params, cfg, rand_lc)

    if cfg.out_act == "sigmoid":
        out = jax.nn.sigmoid(out)
        out_xi = jax.nn.sigmoid(out_xi)
    return out, out_xi


def ae_kl_divergence(raw_latent: jnp.ndarray, rho: float = 0.05) -> jnp.ndarray:
    """KL sparsity on sigmoid(latent) batch means
    (sg_envmap_material.py:101-105)."""
    rho_hat = jnp.mean(jax.nn.sigmoid(raw_latent), axis=0)
    return jnp.mean(rho * jnp.log(rho / (rho_hat + 1e-4))
                    + (1 - rho) * jnp.log((1 - rho) / (1 - rho_hat + 1e-4)))
