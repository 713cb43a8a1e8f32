"""Positional encodings: NeRF PE (with cosine-easing window) and mip-NeRF IPE.

Behavioral parity targets:
- PE: reference ``model/embedder.py:7-55`` / ``neus/model/embedders.py``
  (PE class). Feature layout is [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]
  with per-frequency 3-vectors interleaved sin-then-cos, log-spaced
  frequencies 2^0..2^(L-1).
- cosine easing window: ``neus/model/embedders.py`` (cosine_easing_window),
  the nerfies progressive-frequency schedule.
- IPE: integrated positional encoding over a Gaussian,
  ``model/neus_model.py:25-94``; the isotropic-covariance wrapper is
  ``neus/model/neus_fields.py`` (``ipe_embedder``, var=0.005 default used by
  the stage-2 AE heads via ``model/sg_envmap_material.py:149-151``).

All functions are pure jnp and shape-polymorphic over leading dims.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PEConfig:
    num_freqs: int = 10
    input_dims: int = 3
    include_input: bool = True
    log_sampling: bool = True

    @property
    def out_dim(self) -> int:
        d = self.input_dims if self.include_input else 0
        return d + 2 * self.num_freqs * self.input_dims


def pe_freq_bands(cfg: PEConfig) -> np.ndarray:
    max_freq = cfg.num_freqs - 1
    if cfg.log_sampling:
        return 2.0 ** np.linspace(0.0, max_freq, cfg.num_freqs)
    return np.linspace(2.0 ** 0.0, 2.0 ** max_freq, cfg.num_freqs)


def positional_encoding(x: jnp.ndarray, cfg: PEConfig,
                        alpha: jnp.ndarray | float | None = None) -> jnp.ndarray:
    """NeRF positional encoding, feature order matching the reference.

    ``alpha``: optional cosine-easing window position (0..num_freqs). When
    given, each frequency band's (sin, cos) pair is scaled by the window —
    the nerfies progressive schedule.
    """
    freqs = pe_freq_bands(cfg)
    feats = []
    if cfg.include_input:
        feats.append(x)
    if alpha is not None:
        window = cosine_easing_window(cfg.num_freqs, alpha)
    for i, f in enumerate(freqs):
        s, c = jnp.sin(x * f), jnp.cos(x * f)
        if alpha is not None:
            s, c = s * window[i], c * window[i]
        feats.append(s)
        feats.append(c)
    return jnp.concatenate(feats, axis=-1)


def cosine_easing_window(num_bands: int, alpha) -> jnp.ndarray:
    """Tukey-style window easing frequencies in one at a time as ``alpha``
    goes 0 -> num_bands. Matches ``PE.cosine_easing_window``."""
    bands = jnp.linspace(0.0, num_bands - 1.0, num_bands)
    x = jnp.clip(alpha - bands, 0.0, 1.0)
    return 0.5 * (1 + jnp.cos(jnp.pi * x + jnp.pi))


# ---------------------------------------------------------------------------
# Integrated positional encoding (mip-NeRF)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class IPEConfig:
    min_deg: int = 0
    max_deg: int = 6
    input_dims: int = 3

    @property
    def out_dim(self) -> int:
        return 2 * (self.max_deg - self.min_deg) * self.input_dims


def integrated_pos_enc(mean: jnp.ndarray, var_diag: jnp.ndarray,
                       cfg: IPEConfig) -> jnp.ndarray:
    """IPE of a Gaussian with diagonal covariance.

    E[sin(f x)] under x ~ N(mu, sigma^2) = sin(f mu) exp(-f^2 sigma^2 / 2);
    same attenuation for cos. Output layout: [sin(all scales), cos(all
    scales)] like the mip-NeRF expected_sin formulation used by the
    reference IPE (``model/neus_model.py:25-94``).
    """
    scales = 2.0 ** np.arange(cfg.min_deg, cfg.max_deg)
    shape = mean.shape[:-1] + (len(scales) * cfg.input_dims,)
    y = (mean[..., None, :] * scales[:, None]).reshape(shape)
    y_var = (var_diag[..., None, :] * scales[:, None] ** 2).reshape(shape)
    atten = jnp.exp(-0.5 * y_var)
    return jnp.concatenate([atten * jnp.sin(y), atten * jnp.cos(y)], axis=-1)


def ipe_isotropic(x: jnp.ndarray, cfg: IPEConfig, var: float = 0.005) -> jnp.ndarray:
    """Isotropic-covariance IPE: the stage-2 AE-head input encoding
    (``neus/model/neus_fields.py`` ``ipe_embedder``)."""
    return integrated_pos_enc(x, jnp.full_like(x, var), cfg)
