"""Fused SDF trunk value + spatial gradient as Pallas TPU kernels.

The NeuS render core needs, at every sample point, the trunk output AND its
spatial gradient (shading normal + eikonal; reference autograd at
``neus/model/neus_fields.py:120-135``), and the training step then
backpropagates through both — a second-order structure that, under plain
XLA, round-trips every layer's activations (and their backward
intermediates) through HBM. Measured on the v5e, that leaves the train step
at ~25 TF/s against a 104 TF/s matmul peak: bandwidth-bound.

These kernels keep the whole chain in VMEM per row tile:

- forward kernel: trunk forward (saving pre-activations) + the reverse
  chain ``u_{i-1} = sigma'(z_{i-1}) * (W_i u_i)[:d]`` that yields
  ``de = d y_0 / d e`` — one pass, ~2x forward matmul FLOPs.
- backward kernel (hand-derived VJP): given cotangents (dy, dde), an
  ascending sweep pushes dde through the reverse chain (producing the
  ``sbar_i`` cotangents on sigma'(z_i) and half the weight grads), then the
  standard descending backward runs with ``sigma''(z_i) * sbar_i``
  injections — all second-order terms of the value+grad op, exactly.

The op is exposed with jax.custom_vjp, so the *outer* train-step
differentiation consumes the hand VJP and never traces the per-point
autograd graph. PE encoding/decoding stays outside in XLA (cheap
elementwise; its own second order is handled by ordinary AD).

Derivation (per row; a_0 = e, c_i = concat skip, z_i = c_i W_i + b_i):
  value chain   y = z_{L-1}
  grad chain    u_{L-1} = e0;  p_i = u_i W_i^T;
                q_i = p_i[:d]/sqrt2 (skip) else p_i;  de += p_i[d:]/sqrt2
                u_{i-1} = s_{i-1} * q_i;  de += q_0       s_i = sigma'(z_i)
  VJP of the grad chain w.r.t. (e, W): ascending i = 0..L-1
                qbar_0 = dde;  qbar_i = s_{i-1} * ubar_{i-1}
                sbar_{i-1} = q_i * ubar_{i-1}
                pbar_i = qbar_i (skip: [:d] scaled, [d:] = dde/sqrt2)
                dW_i += pbar_i^T u_i;   ubar_i = pbar_i W_i
  combined descending backward: zbar_{L-1} = dy
                dW_i += c_i^T zbar_i; db_i += sum zbar_i
                cbar = zbar_i W_i^T; (skip split -> de_out, abar)
                zbar_{i-1} = s_{i-1} * abar + sigma''(z_{i-1}) * sbar_{i-1}
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import MLPPlan, _act, _interpret, _pad_rows, fold_weight_norm

_SQ2 = np.float32(1.0 / np.sqrt(2.0))


def _mm(a, b, ta: bool = False, tb: bool = False):
    """bf16-operand matmul with fp32 accumulate — the same single-MXU-pass
    numerics XLA uses for fp32 dots at DEFAULT precision (fp32-pass Mosaic
    matmuls run ~3.7x slower on v5e and erase the fusion win). Transposition
    is expressed through dot_general contraction dims, not relayouts."""
    if not _interpret():  # on CPU (tests) keep fp32 for exact comparisons
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    dims = (((0 if ta else a.ndim - 1,), (1 if tb else 0,)), ((), ()))
    return jax.lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.float32)


def _sigma_p(plan: MLPPlan, z):
    """sigma'(z) for the plan activation."""
    if plan.activation == "softplus100":
        return jax.nn.sigmoid(100.0 * z)
    if plan.activation == "relu":
        return (z > 0).astype(z.dtype)
    return jnp.ones_like(z)


def _sigma_pp(plan: MLPPlan, s):
    """sigma''(z) expressed through s = sigma'(z)."""
    if plan.activation == "softplus100":
        return 100.0 * s * (1.0 - s)
    return jnp.zeros_like(s)


def _forward_phases(plan: MLPPlan, x, weights, biases):
    """Shared by both kernels: returns (y, de, cs, ss, us, qs)."""
    n = plan.n_layers
    # phase 1: forward, saving layer inputs c_i and s_i = sigma'(z_i)
    cs, ss = [], []
    h = x
    for i in range(n):
        c = (jnp.concatenate([h, x], axis=-1) * _SQ2
             if i in plan.skip_in else h)
        cs.append(c)
        z = _mm(c, weights[i]) + biases[i]
        if i < n - 1:
            s = _sigma_p(plan, z)
            ss.append(s)
            h = _act(plan, z)
        else:
            y = z
    # phase 2: reverse chain for de = d y_0 / d x
    B = x.shape[0]
    out_last = plan.layer_out_dim(n - 1)
    e0 = (jax.lax.broadcasted_iota(jnp.int32, (B, out_last), 1) == 0
          ).astype(jnp.float32)
    us = [None] * n
    qs = [None] * n
    us[n - 1] = e0
    de = jnp.zeros_like(x)
    u = e0
    for i in range(n - 1, -1, -1):
        p = _mm(u, weights[i], tb=True)
        if i in plan.skip_in:
            d = plan.dims[i]
            de = de + p[:, d:] * _SQ2
            q = p[:, :d] * _SQ2
        else:
            q = p
        qs[i] = q
        if i > 0:
            u = ss[i - 1] * q
            us[i - 1] = u
        else:
            de = de + q
    return y, de, cs, ss, us, qs


def _fwd_kernel(plan: MLPPlan, *refs):
    n = plan.n_layers
    x_ref = refs[0]
    weights = [refs[1 + i][:] for i in range(n)]
    biases = [refs[1 + n + i][:] for i in range(n)]
    y_ref, de_ref = refs[1 + 2 * n], refs[2 + 2 * n]
    y, de, *_ = _forward_phases(plan, x_ref[:], weights, biases)
    y_ref[:] = y
    de_ref[:] = de


def _bwd_kernel(plan: MLPPlan, *refs):
    n = plan.n_layers
    x_ref, dy_ref, dde_ref = refs[0], refs[1], refs[2]
    weights = [refs[3 + i][:] for i in range(n)]
    biases = [refs[3 + n + i][:] for i in range(n)]
    dx_ref = refs[3 + 2 * n]
    dw_refs = refs[4 + 2 * n:4 + 3 * n]
    db_refs = refs[4 + 3 * n:4 + 4 * n]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for i in range(n):
            dw_refs[i][:] = jnp.zeros_like(dw_refs[i])
            db_refs[i][:] = jnp.zeros_like(db_refs[i])

    x = x_ref[:]
    dde = dde_ref[:]
    y, de, cs, ss, us, qs = _forward_phases(plan, x, weights, biases)
    del y, de

    # ascending sweep: VJP of the reverse (grad) chain
    sbars = [None] * (n - 1)
    ubar = None
    dws = [None] * n
    for i in range(n):
        if i == 0:
            qbar = dde
        else:
            qbar = ss[i - 1] * ubar
            sbars[i - 1] = qs[i] * ubar
        if i in plan.skip_in:
            d = plan.dims[i]
            pbar = jnp.concatenate([qbar * _SQ2, dde * _SQ2], axis=-1)
        else:
            pbar = qbar
        dws[i] = _mm(pbar, us[i], ta=True)
        ubar = _mm(pbar, weights[i])

    # descending sweep: standard backward with sigma'' injections
    zbar = dy_ref[:]
    dx = jnp.zeros_like(x)
    for i in range(n - 1, -1, -1):
        dws[i] = dws[i] + _mm(cs[i], zbar, ta=True)
        db_refs[i][:] += jnp.sum(zbar, axis=0)
        dw_refs[i][:] += dws[i]
        cbar = _mm(zbar, weights[i], tb=True)
        if i in plan.skip_in:
            d = plan.dims[i]
            dx = dx + cbar[:, d:] * _SQ2
            abar = cbar[:, :d] * _SQ2
        else:
            abar = cbar
        if i > 0:
            zbar = ss[i - 1] * abar + _sigma_pp(plan, ss[i - 1]) * sbars[i - 1]
        else:
            dx = dx + abar
    dx_ref[:] = dx


@functools.partial(jax.jit, static_argnums=0)
def _fused_vg_forward(plan: MLPPlan, x, weights, biases):
    xp, nrows = _pad_rows(x, plan.block_rows)
    grid = xp.shape[0] // plan.block_rows
    w_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for w in weights]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
               for b in biases]
    y, de = pl.pallas_call(
        functools.partial(_fwd_kernel, plan),
        grid=(grid,),
        in_specs=[pl.BlockSpec((plan.block_rows, x.shape[1]),
                               lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + w_specs + b_specs,
        out_specs=[
            pl.BlockSpec((plan.block_rows, plan.out_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.block_rows, x.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xp.shape[0], plan.out_dim), jnp.float32),
            jax.ShapeDtypeStruct((xp.shape[0], x.shape[1]), jnp.float32),
        ],
        interpret=_interpret(),
    )(xp, *weights, *biases)
    return y[:nrows], de[:nrows]


@functools.partial(jax.jit, static_argnums=0)
def _fused_vg_backward(plan: MLPPlan, x, weights, biases, dy, dde):
    xp, nrows = _pad_rows(x, plan.block_rows)
    dyp, _ = _pad_rows(dy, plan.block_rows)
    ddep, _ = _pad_rows(dde, plan.block_rows)
    grid = xp.shape[0] // plan.block_rows
    n = plan.n_layers
    w_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for w in weights]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
               for b in biases]
    row = lambda width: pl.BlockSpec((plan.block_rows, width),  # noqa: E731
                                     lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, plan),
        grid=(grid,),
        in_specs=[row(x.shape[1]), row(plan.out_dim), row(x.shape[1])]
        + w_specs + b_specs,
        out_specs=[row(x.shape[1])] + w_specs + b_specs,
        out_shape=[jax.ShapeDtypeStruct((xp.shape[0], x.shape[1]), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in biases],
        interpret=_interpret(),
    )(xp, dyp, ddep, *weights, *biases)
    dx = out[0][:nrows]
    return dx, tuple(out[1:1 + n]), tuple(out[1 + n:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_value_grad(plan: MLPPlan, x, weights, biases):
    """x [N, dims[0]] -> (y [N, out_dim], de = d y[:,0] / d x [N, dims[0]]).

    Differentiable once (hand VJP); the outer train step needs exactly
    first derivatives of (y, de), so no deeper AD is required.
    """
    return _fused_vg_forward(plan, x, tuple(weights), tuple(biases))


def _fused_vg_fwd(plan, x, weights, biases):
    out = _fused_vg_forward(plan, x, tuple(weights), tuple(biases))
    return out, (x, tuple(weights), tuple(biases))


def _fused_vg_bwd(plan, res, cots):
    x, weights, biases = res
    dy, dde = cots
    dx, dws, dbs = _fused_vg_backward(plan, x, weights, biases, dy, dde)
    return dx, dws, dbs


fused_value_grad.defvjp(_fused_vg_fwd, _fused_vg_bwd)
