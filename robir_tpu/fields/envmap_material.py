"""Learnable illumination (SG mixture) + spatially-varying BRDF heads.

Parity: ``EnvmapMaterialNetwork`` (``model/sg_envmap_material.py:120-275``):
- ``lgtSGs`` [M, 7] parameter with gray-mu randn init, lambda = 10 + |20 z|,
  energy normalization to 2pi*0.8, fibonacci lobes duplicated across halves,
- three SparseAE heads: diffuse brdf (legacy, out_act None),
  spec brdf (albedo3 + roughness1 + metallic1, sigmoid out, ranges
  roughness*0.9+0.09 / metallic*0.99+0.01), normal decoder (IPE(var=1e-5)
  input, out_act None, smooth-on-input),
- scalar Fresnel ``specular_reflectance``,
- optional upper-hemisphere lobe restriction (|y| of the lobe).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import IPEConfig, PEConfig, integrated_pos_enc, positional_encoding
from .mlp import Params
from .sparse_ae import (SparseAEConfig, init_sparse_ae, sparse_ae_apply)


def fibonacci_sphere(samples: int) -> np.ndarray:
    """Golden-angle uniform sphere points (sg_envmap_material.py:12-30)."""
    i = np.arange(samples, dtype=np.float64)
    phi = np.pi * (3.0 - np.sqrt(5.0))
    y = 1 - (i / float(samples - 1)) * 2
    radius = np.sqrt(1 - y * y)
    theta = phi * i
    return np.stack([np.cos(theta) * radius, y, np.sin(theta) * radius], -1)


def compute_energy(lgt_sgs: jnp.ndarray) -> jnp.ndarray:
    """Per-SG total energy (sg_envmap_material.py:33-37)."""
    lam = jnp.abs(lgt_sgs[:, 3:4])
    mu = jnp.abs(lgt_sgs[:, 4:])
    return mu * 2.0 * np.pi / lam * (1.0 - jnp.exp(-2.0 * lam))


@dataclasses.dataclass(frozen=True)
class EnvmapMaterialConfig:
    multires: int = 10
    num_lgt_sgs: int = 128
    upper_hemi: bool = False
    specular_albedo: float = 0.05
    latent_dim: int = 32
    encoder_dims: tuple[int, ...] = (512, 512, 512, 512)
    decoder_dims: tuple[int, ...] = (128, 128)
    # latent activation of the specular-BRDF encoder; the truck config's
    # dropout_iter=-2 switches it to softplus (train_cesr.py:186-188)
    spec_lc_act: str = "sigmoid"

    @property
    def pe(self) -> PEConfig:
        return PEConfig(num_freqs=self.multires, input_dims=3)

    @property
    def ipe(self) -> IPEConfig:
        return IPEConfig(min_deg=0, max_deg=self.multires, input_dims=3)

    @property
    def brdf_ae(self) -> SparseAEConfig:
        return SparseAEConfig(in_dim=self.pe.out_dim, out_dim=5,
                              latent_dim=self.latent_dim, out_act=None,
                              encoder_dims=self.encoder_dims,
                              decoder_dims=self.decoder_dims)

    @property
    def spec_brdf_ae(self) -> SparseAEConfig:
        return SparseAEConfig(in_dim=self.pe.out_dim, out_dim=5,
                              latent_dim=self.latent_dim, out_act="sigmoid",
                              lc_act=self.spec_lc_act,
                              encoder_dims=self.encoder_dims,
                              decoder_dims=self.decoder_dims)

    @property
    def normal_ae(self) -> SparseAEConfig:
        return SparseAEConfig(in_dim=self.ipe.out_dim, out_dim=3,
                              latent_dim=self.latent_dim, out_act=None,
                              smooth_on_latent=False,
                              encoder_dims=self.encoder_dims,
                              decoder_dims=self.decoder_dims)


def init_lgt_sgs(key: jax.Array, cfg: EnvmapMaterialConfig) -> jnp.ndarray:
    """Reference lgtSGs init (sg_envmap_material.py:161-177)."""
    m = cfg.num_lgt_sgs
    sgs = np.array(jax.random.normal(key, (m, 7)))  # writable host copy
    sgs[:, -2:] = sgs[:, -3:-2]  # gray mu
    sgs[:, 3:4] = 10.0 + np.abs(sgs[:, 3:4] * 20.0)
    energy = np.asarray(compute_energy(jnp.asarray(sgs)))
    sgs[:, 4:] = np.abs(sgs[:, 4:]) / energy.sum(0, keepdims=True) * 2.0 * np.pi * 0.8
    lobes = fibonacci_sphere(m // 2).astype(np.float32)
    sgs[:m // 2, :3] = lobes
    sgs[m // 2:, :3] = lobes
    if cfg.upper_hemi:
        sgs[:, 1] = np.abs(sgs[:, 1])
    return jnp.asarray(sgs, jnp.float32)


def restrict_lobes_upper(lgt_sgs: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([lgt_sgs[..., :1], jnp.abs(lgt_sgs[..., 1:2]),
                            lgt_sgs[..., 2:]], axis=-1)


def init_envmap_material(key: jax.Array, cfg: EnvmapMaterialConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "brdf_encoder_layer": init_sparse_ae(k1, cfg.brdf_ae),
        "spec_brdf_encoder_layer": init_sparse_ae(k2, cfg.spec_brdf_ae),
        "normal_decoder_layer": init_sparse_ae(k3, cfg.normal_ae),
        "specular_reflectance": jnp.full((1, 1), cfg.specular_albedo),
        "lgtSGs": init_lgt_sgs(k4, cfg),
    }


class MaterialOutput(NamedTuple):
    lgt_sgs: jnp.ndarray
    specular_reflectance: jnp.ndarray
    roughness: jnp.ndarray
    metallic: jnp.ndarray
    normal_map: jnp.ndarray
    diffuse_albedo: jnp.ndarray
    random_xi_roughness: jnp.ndarray
    random_xi_metallic: jnp.ndarray
    random_xi_diffuse_albedo: jnp.ndarray
    random_xi_normal: jnp.ndarray


def envmap_material_apply(params: Params, cfg: EnvmapMaterialConfig,
                          points: jnp.ndarray, key: Optional[jax.Array] = None,
                          train_spec: bool = False,
                          spec_var: Optional[jnp.ndarray] = None
                          ) -> MaterialOutput:
    """Forward (sg_envmap_material.py:188-247). ``train_spec=False``
    stop-gradients the BRDF heads (the Norm/Vis stages freeze materials);
    ``spec_var`` is the CESR latent-dropout mask for the spec head."""
    pts_ipe = integrated_pos_enc(points, jnp.full_like(points, 1e-5), cfg.ipe)
    pts_pe = positional_encoding(points, cfg.pe)

    k_spec, k_norm = (jax.random.split(key) if key is not None else (None, None))
    brdf, brdf_xi = sparse_ae_apply(params["spec_brdf_encoder_layer"],
                                    cfg.spec_brdf_ae, pts_pe, k_spec,
                                    var=spec_var)
    if not train_spec:
        brdf = jax.lax.stop_gradient(brdf)
        brdf_xi = jax.lax.stop_gradient(brdf_xi)

    roughness = brdf[..., 3:4] * 0.9 + 0.09
    metallic = brdf[..., 4:5] * 0.99 + 0.01
    diffuse_albedo = brdf[..., :3]
    xi_roughness = brdf_xi[..., 3:4] * 0.9 + 0.09
    xi_metallic = brdf_xi[..., 4:5]
    xi_diffuse = brdf_xi[..., :3]

    normal_map, xi_normal = sparse_ae_apply(params["normal_decoder_layer"],
                                            cfg.normal_ae, pts_ipe, k_norm)
    normal_map = normal_map / jnp.clip(
        jnp.linalg.norm(normal_map, axis=-1, keepdims=True), 1e-4, None)
    xi_normal = xi_normal / jnp.clip(
        jnp.linalg.norm(xi_normal, axis=-1, keepdims=True), 1e-4, None)

    lgt_sgs = params["lgtSGs"]
    if cfg.upper_hemi:
        lgt_sgs = restrict_lobes_upper(lgt_sgs)

    return MaterialOutput(
        lgt_sgs=lgt_sgs,
        specular_reflectance=params["specular_reflectance"],
        roughness=roughness, metallic=metallic, normal_map=normal_map,
        diffuse_albedo=diffuse_albedo,
        random_xi_roughness=xi_roughness, random_xi_metallic=xi_metallic,
        random_xi_diffuse_albedo=xi_diffuse, random_xi_normal=xi_normal)


def get_light(params: Params, cfg: EnvmapMaterialConfig) -> jnp.ndarray:
    lgt = jax.lax.stop_gradient(params["lgtSGs"])
    return restrict_lobes_upper(lgt) if cfg.upper_hemi else lgt


def load_light(params: Params, path: str) -> tuple[Params, np.ndarray]:
    """Swap in prefit SGs + envmap image for relighting
    (sg_envmap_material.py:257-268). Returns (new params, envmap HxWx3)."""
    import os

    from ..utils.exr import read_exr

    sgs = np.load(os.path.join(path, "sg_128.npy"))
    new_params = dict(params)
    new_params["lgtSGs"] = jnp.asarray(sgs, jnp.float32)
    envmap = read_exr(path + ".exr")[..., :3]
    return new_params, envmap
