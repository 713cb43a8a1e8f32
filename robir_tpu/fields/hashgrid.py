"""Multi-resolution hash-grid encoding (instant-NGP style), TPU-native.

The reference's fast-encoding path is tinycudann, commented out everywhere
(``model/neus_model.py:8``, ``neus/model/embedders.py:5`` — the Hash/TCNN
classes are dead code but part of the capability surface). This is a
from-scratch functional equivalent: L levels of growing resolution, each a
hashed feature table, trilinearly interpolated — all gathers, which
vectorize cleanly on TPU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .mlp import Params

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 18
    base_resolution: int = 16
    per_level_scale: float = 1.5
    bbox_min: tuple[float, float, float] = (-1.0, -1.0, -1.0)
    bbox_max: tuple[float, float, float] = (1.0, 1.0, 1.0)

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def resolution(self, level: int) -> int:
        return int(np.floor(self.base_resolution
                            * self.per_level_scale ** level))


def init_hashgrid(key: jax.Array, cfg: HashGridConfig) -> Params:
    """Tables ~ U(-1e-4, 1e-4) per instant-NGP convention."""
    tables = jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.n_features),
        minval=-1e-4, maxval=1e-4)
    return {"tables": tables}


def _hash(coords: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] int32 -> [...,] uint32 spatial hash (instant-NGP)."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (c[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (c[..., 2] * jnp.uint32(_PRIMES[2]))
    return h


def hashgrid_encode(params: Params, cfg: HashGridConfig,
                    x: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] -> [N, n_levels * n_features] trilinear hashed features."""
    lo = jnp.asarray(cfg.bbox_min)
    hi = jnp.asarray(cfg.bbox_max)
    u = jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)

    feats = []
    corners = np.array([[i, j, k] for i in (0, 1) for j in (0, 1)
                        for k in (0, 1)], dtype=np.int32)  # [8, 3]
    for level in range(cfg.n_levels):
        res = cfg.resolution(level)
        g = u * (res - 1)
        g0 = jnp.floor(g).astype(jnp.int32)
        frac = g - g0
        # 8 corners, hashed into the level's table
        idx = g0[:, None, :] + corners[None]  # [N, 8, 3]
        mask = cfg.table_size - 1
        h = (_hash(idx) & jnp.uint32(mask)).astype(jnp.int32)  # [N, 8]
        vals = params["tables"][level][h]  # [N, 8, F]
        w = jnp.stack([
            jnp.where(corners[None, :, d] == 1, frac[:, None, d],
                      1.0 - frac[:, None, d])
            for d in range(3)], -1).prod(-1)  # [N, 8]
        feats.append(jnp.sum(vals * w[..., None], axis=1))
    return jnp.concatenate(feats, axis=-1)


@dataclasses.dataclass(frozen=True)
class HashSDFConfig:
    """Hash-encoded SDF field: the reference's (dead) tinycudann fast path
    (``neus/model/neus_fields.py`` HashSDFNetwork) as a live TPU-native
    capability — hash features + a small fused-width MLP head."""

    grid: HashGridConfig = HashGridConfig()
    d_out: int = 257
    width: int = 128
    depth: int = 4


def init_hash_sdf(key: jax.Array, cfg: HashSDFConfig) -> Params:
    from .mlp import init_linear

    k0, key = jax.random.split(key)
    params = {"hash": init_hashgrid(k0, cfg.grid)}
    dims = (cfg.grid.out_dim,) + (cfg.width,) * cfg.depth + (cfg.d_out,)
    keys = jax.random.split(key, len(dims) - 1)
    params["mlp"] = {f"lin{i}": init_linear(keys[i], dims[i], dims[i + 1])
                     for i in range(len(dims) - 1)}
    return params


def hash_sdf_apply(params: Params, cfg: HashSDFConfig,
                   x: jnp.ndarray) -> jnp.ndarray:
    from .mlp import apply_linear

    h = hashgrid_encode(params["hash"], cfg.grid, x)
    n = cfg.depth + 1
    for i in range(n):
        h = apply_linear(params["mlp"][f"lin{i}"], h)
        if i < n - 1:
            h = jax.nn.relu(h)
    return h
