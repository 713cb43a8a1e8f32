"""NeuS model facade: SDF net + radiance net + variance (+ background).

Parity: ``NeuSModel`` (``neus/model/neus_fields.py:385-448``) and the
stage-2 bridge ``ImplicitNetworkMy`` (``model/neus_model.py:755-884``).
A parameter pytree bundles the sub-networks under the same names the
reference uses in its state dicts, so cross-stage checkpoint surgery maps
1:1.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .mlp import Params
from .radiance import (NeRFBgConfig, RenderingConfig, init_nerf_bg,
                       init_rendering, nerf_bg_apply, rendering_apply)
from .sdf import (SDFConfig, init_sdf, sdf_and_feat, sdf_apply,
                  sdf_full_and_gradient, sdf_gradient, sdf_value,
                  sdf_value_and_gradient)


@dataclasses.dataclass(frozen=True)
class VarianceConfig:
    init_val: float = 0.3


def init_variance(cfg: VarianceConfig) -> Params:
    return {"variance": jnp.float32(cfg.init_val)}


def variance_apply(params: Params) -> jnp.ndarray:
    """inv_s = exp(10 * v) (reference ``SingleVarianceNetwork``,
    neus_fields.py:343-349)."""
    return jnp.exp(params["variance"] * 10.0)


@dataclasses.dataclass(frozen=True)
class NeuSConfig:
    sdf: SDFConfig = SDFConfig(d_in=3, d_out=257, d_hidden=256, n_layers=8)
    color: RenderingConfig = RenderingConfig(
        d_feature=256, mode="idr", d_in=9, d_out=3, d_hidden=256, n_layers=4)
    variance: VarianceConfig = VarianceConfig(0.3)
    background: NeRFBgConfig | None = None  # None = no outer NeRF shell
    radius: float = 2.0  # reference NeuSModel.radius() (neus_fields.py:436)


def init_neus(key: jax.Array, cfg: NeuSConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    params: Params = {
        "sdf_network": init_sdf(k1, cfg.sdf),
        "color_network": init_rendering(k2, cfg.color),
        "deviation_network": init_variance(cfg.variance),
    }
    if cfg.background is not None:
        params["nerf_outside"] = init_nerf_bg(k3, cfg.background)
    return params


class NeuS:
    """Thin stateless namespace binding (params, cfg) for renderer use.

    All methods are pure; this class only spares call sites from threading
    (params, cfg) pairs into every helper. Safe under jit (it holds only a
    pytree + hashable config).
    """

    def __init__(self, params: Params, cfg: NeuSConfig):
        self.params = params
        self.cfg = cfg

    def sdf(self, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
        # out_cols=1: exact column slice of the 257-wide head (bit-exact
        # under bf16 storage; reassociation-level in fp32) — the sampling
        # phase never reads the feature channels
        return sdf_apply(self.params["sdf_network"], self.cfg.sdf, x,
                         compute_dtype, out_cols=1)

    def sdf_and_feat(self, x: jnp.ndarray):
        return sdf_and_feat(self.params["sdf_network"], self.cfg.sdf, x)

    def grad(self, x: jnp.ndarray) -> jnp.ndarray:
        return sdf_gradient(self.params["sdf_network"], self.cfg.sdf, x)

    def sdf_with_grad(self, x: jnp.ndarray):
        return sdf_value_and_gradient(self.params["sdf_network"], self.cfg.sdf, x)

    def full(self, x: jnp.ndarray) -> jnp.ndarray:
        return sdf_apply(self.params["sdf_network"], self.cfg.sdf, x)

    def full_with_grad(self, x: jnp.ndarray):
        """(sdf+features, sdf spatial gradient) sharing one forward."""
        return sdf_full_and_gradient(self.params["sdf_network"], self.cfg.sdf, x)

    def color(self, x, gradients, dirs, feature) -> jnp.ndarray:
        return rendering_apply(self.params["color_network"], self.cfg.color,
                               x, gradients, dirs, feature)

    def inv_s(self) -> jnp.ndarray:
        return jnp.clip(variance_apply(self.params["deviation_network"]), 1e-6, 1e6)

    def radius(self) -> float:
        return self.cfg.radius

    def background(self, pts4, dirs):
        return nerf_bg_apply(self.params["nerf_outside"],
                             self.cfg.background, pts4, dirs)


# ---------------------------------------------------------------------------
# Hash-encoded NeuS variant (reference HashSDFNetwork,
# neus/model/neus_fields.py — the tcnn fast path, dead in the reference,
# live here): same renderer-facing interface as NeuS with the SDF trunk
# replaced by hash features + a small MLP head.
# ---------------------------------------------------------------------------


from .hashgrid import HashSDFConfig  # noqa: E402  (no import cycle)


@dataclasses.dataclass(frozen=True)
class HashNeuSConfig:
    hash_sdf: HashSDFConfig = HashSDFConfig()
    color: RenderingConfig = RenderingConfig(
        d_feature=256, mode="idr", d_in=9, d_out=3, d_hidden=256, n_layers=4)
    variance: VarianceConfig = VarianceConfig(0.3)
    radius: float = 2.0


def init_hash_neus(key: jax.Array, cfg: HashNeuSConfig) -> Params:
    from .hashgrid import init_hash_sdf

    k1, k2 = jax.random.split(key)
    return {
        "sdf_network": init_hash_sdf(k1, cfg.hash_sdf),
        "color_network": init_rendering(k2, cfg.color),
        "deviation_network": init_variance(cfg.variance),
    }


class HashNeuS:
    """NeuS-interface binding over the hash-SDF field (no background
    shell). Drop-in for ``render_neus``'s model argument."""

    def __init__(self, params: Params, cfg: HashNeuSConfig):
        self.params = params
        self.cfg = cfg

    def _full(self, x: jnp.ndarray) -> jnp.ndarray:
        from .hashgrid import hash_sdf_apply
        return hash_sdf_apply(self.params["sdf_network"], self.cfg.hash_sdf, x)

    def sdf(self, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
        del compute_dtype  # hash path is gather-bound; low precision no-op
        return self._full(x)[..., :1]

    def full_with_grad(self, x: jnp.ndarray):
        """(sdf+features, d sdf/dx) via the same per-point aux-VJP trick as
        the dense SDF (fields/sdf.py sdf_full_and_gradient)."""

        def one(pt):
            def f(pp):
                out = self._full(pp[None])[0]
                return out[0], out

            (_, full), g = jax.value_and_grad(f, has_aux=True)(pt)
            return full, g

        return jax.vmap(one)(x)

    def color(self, x, gradients, dirs, feature) -> jnp.ndarray:
        return rendering_apply(self.params["color_network"], self.cfg.color,
                               x, gradients, dirs, feature)

    def inv_s(self) -> jnp.ndarray:
        return jnp.clip(variance_apply(self.params["deviation_network"]),
                        1e-6, 1e6)

    def radius(self) -> float:
        return self.cfg.radius
