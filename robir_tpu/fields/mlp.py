"""Dense layers as init/apply pairs: plain and weight-normalized linear.

Weight norm follows PyTorch semantics (``nn.utils.weight_norm``, dim=0):
W = g * v / ||v|| with the norm taken per *output* unit, and g initialized
to ||v|| so the initial effective weight equals the raw init. Parameters are
stored JAX-style as ``v: [in, out]``, ``g: [out]``, ``b: [out]`` (the norm
per output unit is over axis 0).

Default init mirrors ``torch.nn.Linear``: U(-1/sqrt(in), 1/sqrt(in)) for
both weight and bias, so untrained-network behavior is distributionally
comparable to the reference.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


def torch_linear_init(key: jax.Array, in_dim: int, out_dim: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """torch.nn.Linear default init (kaiming_uniform a=sqrt(5) reduces to
    U(-1/sqrt(in), 1/sqrt(in)) for weight; bias uses the same bound)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_dim)
    w = jax.random.uniform(kw, (in_dim, out_dim), minval=-bound, maxval=bound)
    b = jax.random.uniform(kb, (out_dim,), minval=-bound, maxval=bound)
    return w, b


def init_linear(key: jax.Array, in_dim: int, out_dim: int, *,
                weight_norm: bool = False,
                w_init: Callable | None = None,
                b_init: Callable | None = None) -> Params:
    """``w_init(key, (in, out))`` / ``b_init(key, (out,))`` override the
    torch-default initialization."""
    kw, kb = jax.random.split(key)
    if w_init is None and b_init is None:
        w, b = torch_linear_init(key, in_dim, out_dim)
    else:
        w = (w_init or (lambda k, s: torch_linear_init(k, in_dim, out_dim)[0]))(kw, (in_dim, out_dim))
        b = (b_init or (lambda k, s: jnp.zeros(s)))(kb, (out_dim,))
    if weight_norm:
        g = jnp.linalg.norm(w, axis=0)  # per output unit
        return {"v": w, "g": g, "b": b}
    return {"w": w, "b": b}


def effective_weight(params: Params) -> jnp.ndarray:
    """The weight-norm fold ``w = v * g / ||v||_col`` (torch
    nn.utils.weight_norm semantics, dim=0 over inputs after our
    transpose), or the plain ``w``. The single shared definition — the
    apply paths and the hand-written SDF backward must agree bit-for-bit
    or the manual gradient silently diverges from the forward."""
    if "v" in params:
        v = params["v"]
        return v * (params["g"] / (jnp.linalg.norm(v, axis=0) + 0.0))
    return params["w"]


def apply_linear(params: Params, x: jnp.ndarray,
                 compute_dtype=None, storage_dtype=None) -> jnp.ndarray:
    """``compute_dtype`` (e.g. bfloat16) runs the matmul on low-precision
    operands with fp32 accumulation — used for tolerance-insensitive paths
    like no-grad importance sampling.

    ``storage_dtype`` (e.g. bfloat16) additionally RETURNS the layer output
    in that dtype, so inter-layer activations — and, crucially, the
    residuals autodiff saves for the backward pass — live in HBM at half
    width. On the v5e the big dense sweeps are HBM-bandwidth-bound (the
    matmul passes are already bf16 at DEFAULT precision), so this is the
    lever that actually moves the train step: measured 21.5 -> 14.9 ms on
    the NeuS step (fp32 weights, fp32 MXU accumulate in both cases)."""
    w = effective_weight(params)
    if storage_dtype is not None:
        y = jax.lax.dot_general(x.astype(storage_dtype),
                                w.astype(storage_dtype),
                                (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=storage_dtype)
        return y + params["b"].astype(storage_dtype)
    if compute_dtype is not None:
        y = jax.lax.dot_general(x.astype(compute_dtype), w.astype(compute_dtype),
                                (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y + params["b"]
    return x @ w + params["b"]


def apply_linear_parts(params: Params, parts: list[jnp.ndarray],
                       compute_dtype=None, storage_dtype=None,
                       pre_scale: float | None = None) -> jnp.ndarray:
    """``apply_linear(params, concat(parts, -1) * pre_scale)`` without
    materializing the concatenation: the weight is split by part widths and
    the partial products summed (equal up to fp32 reassociation over the
    contracted dim).

    On TPU this removes two hot data-movement HLOs per wide input: the
    forward concatenate (copying the dominant wide part into a fresh
    buffer) and the backward transpose's slice extracting its cotangent —
    measured 0.2 ms each per train step at [65k, 289] on the v5e color
    net."""
    w = effective_weight(params)
    b = params["b"]
    off = 0
    y = None
    for p in parts:
        k = p.shape[-1]
        wp = w[off:off + k]
        off += k
        if pre_scale is not None:
            p = p * jnp.asarray(pre_scale, p.dtype)
        if storage_dtype is not None:
            t = jax.lax.dot_general(p.astype(storage_dtype),
                                    wp.astype(storage_dtype),
                                    (((p.ndim - 1,), (0,)), ((), ())),
                                    preferred_element_type=storage_dtype)
        elif compute_dtype is not None:
            t = jax.lax.dot_general(p.astype(compute_dtype),
                                    wp.astype(compute_dtype),
                                    (((p.ndim - 1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:
            t = p @ wp
        y = t if y is None else y + t
    assert off == w.shape[0], (off, w.shape)
    if storage_dtype is not None:
        return y + b.astype(storage_dtype)
    return y + b


def softplus_beta(x: jnp.ndarray, beta: float = 100.0) -> jnp.ndarray:
    """torch Softplus(beta): log(1 + exp(beta x)) / beta, numerically stable
    (torch switches to identity above threshold; jax.nn.softplus is already
    stable so values agree to fp32 rounding)."""
    return jax.nn.softplus(beta * x) / beta
