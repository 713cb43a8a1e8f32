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


# ---------------------------------------------------------------------------
# Learnable dense feature-grid embedder
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class GridEmbedConfig:
    """Learnable trilinear feature grid (``neus/model/embedders.py`` Grid,
    :107-124): a [C, N, N, N] parameter sampled with
    ``F.grid_sample(..., align_corners=False)`` at coords in [-1, 1]."""
    n_cells: int = 128
    out_dim: int = 3

    @property
    def feature_dim(self) -> int:
        return self.out_dim


def init_grid_embed(key, cfg: GridEmbedConfig) -> dict:
    import jax
    return {"grid": jax.random.normal(
        key, (cfg.out_dim, cfg.n_cells, cfg.n_cells, cfg.n_cells))}


def grid_embed(params: dict, cfg: GridEmbedConfig,
               x: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] coords in [-1, 1] -> [..., out_dim] trilinear features.

    Matches torch ``F.grid_sample`` semantics exactly: align_corners=False
    (half-texel inset: coord c maps to index ((c+1)*N - 1)/2), zero padding
    outside, and grid_sample's (x, y, z) coordinate order indexing grid
    dims (W, H, D) — i.e. x walks the LAST grid axis.

    TPU form: four gathers of contiguous W-rows (one per (z, y) corner
    pair) + a one-hot x contraction, not eight scalar corner gathers —
    the same row-gather pattern as the tracer's trilinear lookup
    (tracing/grid.py; scalar gathers measured ~10x slower at scale).
    grid_sample's zero padding folds into the row/one-hot weights."""
    g = params["grid"]  # [C, N, N, N] = [C, D, H, W]
    C, N = g.shape[0], g.shape[1]
    shape = x.shape[:-1]
    pts = x.reshape(-1, 3)
    # unnormalize (align_corners=False): ix = ((x + 1) * W - 1) / 2
    idx = ((pts + 1.0) * N - 1.0) * 0.5           # [M, 3] in (x, y, z)
    i0 = jnp.floor(idx).astype(jnp.int32)
    f = idx - i0
    fx, fy, fz = f[:, 0], f[:, 1], f[:, 2]
    ix0, iy0, iz0 = i0[:, 0], i0[:, 1], i0[:, 2]

    rows = g.reshape(C, N * N, N)                 # [C, D*H, W]
    cols = jnp.arange(N, dtype=jnp.int32)[None, :]

    def row(oy, oz):
        """Gather the (z0+oz, y0+oy) W-row per point, zeroed off-grid."""
        iy, iz = iy0 + oy, iz0 + oz
        inb = (iy >= 0) & (iy < N) & (iz >= 0) & (iz < N)
        lin = jnp.clip(iz, 0, N - 1) * N + jnp.clip(iy, 0, N - 1)
        v = jnp.take(rows, lin, axis=1)            # [C, M, W]
        return jnp.where(inb[None, :, None], v, 0.0)

    # one-hot x weights carry grid_sample's zero padding in x: an
    # out-of-range column simply matches no lane
    wx = ((cols == ix0[:, None]) * (1 - fx)[:, None]
          + (cols == (ix0 + 1)[:, None]) * fx[:, None])  # [M, W]
    out = jnp.zeros((C, pts.shape[0]))
    for oy, wy in ((0, 1 - fy), (1, fy)):
        for oz, wz in ((0, 1 - fz), (1, fz)):
            blend = jnp.sum(row(oy, oz) * wx[None], axis=-1)   # [C, M]
            out = out + blend * (wy * wz)[None, :]
    return out.T.reshape(shape + (C,))
