"""HDR tone mapping, gamma correction, and the energy-integral prefit.

Parity: ``model/color_correction.py`` (GammaCorrect, ACESToneMapping with 4
hdr modes — 0 scale-ACES, 1 warp-ACES, 2 ln-space ["the latest version"],
3 identity; learnable ``adapt_illum`` shift) and ``model/energy_integral.py``
(EnergyInt MLP fit so E(shift) ~ mean_{masked px} ldr2hdr(px, shift), 1000
Adam steps at Vis-stage startup).

All stateless: parameters ride in pytrees, the hdr mode in a frozen config.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..fields.encoding import PEConfig, positional_encoding
from ..fields.mlp import Params, apply_linear, init_linear

# ---------------------------------------------------------------------------
# ACES curves (color_correction.py:31-73)
# ---------------------------------------------------------------------------


def aces_fn(x):
    return x * (2.51 * x + 0.03) / (x * (2.43 * x + 0.59) + 0.14)


def aces_inv(x):
    return ((0.59 * x - 0.03) + jnp.sqrt((0.59 * x - 0.03) ** 2
            + 4 * (2.51 - 2.43 * x) * 0.14 * x)) / (2 * (2.51 - 2.43 * x))


def warp_aces_inv(x, t):
    return 0.73 * aces_inv(x * t) / aces_inv(0.73 * t)


def warp_aces_fn(x, t):
    return aces_fn(aces_inv(0.73 * t) / 0.73 * x) / t


def scale_aces_inv(x, t):
    t = t ** 0.2
    return aces_inv(x * t)


def scale_aces_fn(x, t):
    t = t ** 0.2
    return aces_fn(x) / t


def ln_space_fn(x, shift):
    x = x * (0.5 + shift) / 0.5
    return x / (1 + shift * x)


def ln_space_inv(x, shift):
    y = x / (1 - shift * x)
    return y * 0.5 / (0.5 + shift)


def identity_fn(x, t):
    return x


_HDR_MODES = {
    0: (scale_aces_fn, scale_aces_inv),  # the mode the released confs use
                                         # (confs_sg/{hotdog,truck,dtu}.conf
                                         # set hdr_mode = 0, gamma = 1.0)
    1: (warp_aces_fn, warp_aces_inv),
    2: (ln_space_fn, ln_space_inv),   # "latest version" per the reference
                                      # comment (color_correction.py:76-94),
                                      # but NOT what the shipped confs select
    3: (identity_fn, identity_fn),
}


@dataclasses.dataclass(frozen=True)
class ToneMapConfig:
    # defaults mirror the shipped reference confs (hotdog.conf:66-67)
    hdr_mode: int = 0
    gamma: float = 1.0


def init_tonemap(cfg: ToneMapConfig) -> Params:
    """GammaCorrect + ACESToneMapping learnables
    (color_correction.py:7-28,76-83)."""
    return {
        "gamma": jnp.float32(cfg.gamma),
        "indir_coef": jnp.float32(1.0),
        "dir_coef": jnp.float32(2.0),
        "coef": jnp.float32(1.0),
        "adapt_illum": jnp.float32(0.0),
        "energy": init_energy(jax.random.PRNGKey(0)),
    }


def gamma_forward(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(x, 1.0 / params["gamma"])


def gamma_inv(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(x, params["gamma"])


def as_input(params: Params) -> jnp.ndarray:
    """The learnable shift as a [1,1] input (color_correction.py:116-119)."""
    return jnp.clip(params["adapt_illum"] * 10 + 0.5, 0, 1).reshape(1, 1)


def make_shift(params: Params, shift=None) -> jnp.ndarray:
    if shift is None:
        shift = as_input(params)
    shift = jnp.asarray(shift, jnp.float32)
    if shift.ndim == 0:
        shift = shift[None]
    return jnp.clip(shift, 1e-4, 1.0)


def hdr2ldr(params: Params, cfg: ToneMapConfig, x, raw_shift=None):
    fn, _ = _HDR_MODES[cfg.hdr_mode]
    return fn(x, make_shift(params, raw_shift))


def ldr2hdr(params: Params, cfg: ToneMapConfig, x, raw_shift=None):
    _, inv = _HDR_MODES[cfg.hdr_mode]
    return inv(x, make_shift(params, raw_shift))


def energy_scalar(params: Params, shift: jnp.ndarray) -> jnp.ndarray:
    """E(shift)/E(1) (color_correction.py ``scalar``)."""
    max_e = jnp.mean(energy_apply(params["energy"], jnp.ones_like(shift)),
                     -1, keepdims=True)
    e = jnp.mean(energy_apply(params["energy"], shift), -1, keepdims=True)
    return e / jnp.clip(max_e, 1e-4, 1.0)


# ---------------------------------------------------------------------------
# Energy integral net (energy_integral.py)
# ---------------------------------------------------------------------------

_ENERGY_PE = PEConfig(num_freqs=4, input_dims=1)
_ENERGY_DIMS = (128, 128, 64)


def init_energy(key: jax.Array) -> Params:
    dims = (_ENERGY_PE.out_dim,) + _ENERGY_DIMS + (3,)
    keys = jax.random.split(key, len(dims) - 1)
    return {f"lin{i}": init_linear(keys[i], dims[i], dims[i + 1])
            for i in range(len(dims) - 1)}


def energy_apply(params: Params, shift: jnp.ndarray) -> jnp.ndarray:
    """[N, 1] shift -> [N, 3] softplus energy."""
    h = positional_encoding(shift, _ENERGY_PE)
    n = len(_ENERGY_DIMS) + 1
    for i in range(n):
        h = apply_linear(params[f"lin{i}"], h)
        if i < n - 1:
            h = jax.nn.relu(h)
    return jax.nn.softplus(h)


def fit_energy(key: jax.Array, masked_pixels: jnp.ndarray,
               ldr2hdr_fn: Callable, n_steps: int = 1000,
               batch_px: int = 8192, batch_shift: int = 512,
               lr: float = 5e-4) -> Params:
    """Fit E(shift) ~ mean ldr2hdr(masked dataset pixels, shift)
    (energy_integral.py:51-77). ``masked_pixels``: [P, 3] in [0,1].
    Host-side prologue — runs once at Vis-stage startup, not inside pjit."""
    params = init_energy(key)
    tx = optax.adam(lr, b1=0.9, b2=0.99)
    opt_state = tx.init(params)
    px = jnp.clip(masked_pixels, 1e-4, 1.0)

    @jax.jit
    def step(params, opt_state, k):
        k1, k2 = jax.random.split(k)
        shift = jnp.clip(jax.random.uniform(k1, (batch_shift, 1)), 1e-4, 1 - 1e-4)
        idx = jax.random.randint(k2, (batch_px,), 0, px.shape[0])
        batch = px[idx]
        gt = jnp.mean(ldr2hdr_fn(batch[:, None, :], shift), axis=0)

        def loss_fn(p):
            return jnp.mean((gt - energy_apply(p, shift)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
    return params
