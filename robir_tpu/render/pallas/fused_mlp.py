"""Fused MLP trunk as a Pallas TPU kernel.

The SDF/radiance trunks (8x256 with a concat-skip) are the hot ops of every
stage (SURVEY.md 2.8: the chunk sites to kernelize). Under plain XLA each
layer's activations round-trip HBM; this kernel keeps the whole trunk's
activations in VMEM per row-tile, with all weights resident, so HBM traffic
is just the input and output tiles.

Layout: weights are pre-folded (weight-norm applied outside — it is O(params)
per step) and passed as [in, out] fp32 arrays. The kernel is generated for a
static layer plan (dims, skip positions, activation), tiles rows by
``block_rows``, and supports the softplus-beta(100) / relu activations the
framework uses. A custom VJP recomputes activations tile-by-tile in the
backward kernel (flash-style) and accumulates weight grads across the
sequential TPU grid.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class MLPPlan:
    """Static description of a dense trunk.

    dims[i] -> dims[i+1] per layer; at layer l in ``skip_in`` the (scaled)
    input is concatenated first: h = concat([h, x0]) / sqrt(2).
    """

    dims: tuple[int, ...]            # layer input sizes, incl. input dim
    out_dim: int
    skip_in: tuple[int, ...] = ()
    activation: str = "softplus100"  # softplus100 | relu | none
    block_rows: int = 512

    @property
    def n_layers(self) -> int:
        return len(self.dims)

    def layer_in_dim(self, layer: int) -> int:
        d = self.dims[layer]
        if layer in self.skip_in:
            d += self.dims[0]
        return d

    def layer_out_dim(self, layer: int) -> int:
        return self.dims[layer + 1] if layer + 1 < len(self.dims) else self.out_dim


def plan_from_sdf_config(sdf_cfg, block_rows: int = 512) -> MLPPlan:
    """Build the trunk plan for an SDFConfig (accounting for the reference's
    reduced pre-skip layer widths: the layer before a skip outputs
    d_hidden - d_pe so the concat lands back at d_hidden)."""
    d0 = sdf_cfg.dims[0]
    full = sdf_cfg.dims
    ins = [d0]
    for layer in range(1, len(full) - 1):
        out = full[layer] - (d0 if layer in sdf_cfg.skip_in else 0)
        ins.append(out)
    return MLPPlan(dims=tuple(ins), out_dim=sdf_cfg.d_out,
                   skip_in=tuple(sdf_cfg.skip_in),
                   activation="softplus100", block_rows=block_rows)


def fold_weight_norm(params: dict, n_layers: int):
    """(weights, biases) tuples with weight-norm applied — O(params) work
    done once per step outside the kernel."""
    ws, bs = [], []
    for i in range(n_layers):
        lp = params[f"lin{i}"]
        if "v" in lp:
            w = lp["v"] * (lp["g"] / jnp.linalg.norm(lp["v"], axis=0))
        else:
            w = lp["w"]
        ws.append(w)
        bs.append(lp["b"])
    return tuple(ws), tuple(bs)


def _act(plan: MLPPlan, h):
    if plan.activation == "softplus100":
        return jax.nn.softplus(100.0 * h) * 0.01
    if plan.activation == "relu":
        return jax.nn.relu(h)
    return h


def _forward_rows(plan: MLPPlan, x, weights, biases):
    """Straight-line trunk on one row tile (used by both kernels)."""
    h = x
    x0 = x
    n = plan.n_layers
    for i in range(n):
        if i in plan.skip_in:
            h = jnp.concatenate([h, x0], axis=-1) * np.float32(1 / np.sqrt(2))
        h = jnp.dot(h, weights[i], preferred_element_type=jnp.float32) + biases[i]
        if i < n - 1:
            h = _act(plan, h)
    return h


def _fwd_kernel(plan: MLPPlan, *refs):
    x_ref = refs[0]
    out_ref = refs[-1]
    n = plan.n_layers
    weights = [refs[1 + i][:] for i in range(n)]
    biases = [refs[1 + n + i][:] for i in range(n)]
    out_ref[:] = _forward_rows(plan, x_ref[:], weights, biases)


def _interpret() -> bool:
    """Pallas kernels compile only for TPU; interpret elsewhere (tests)."""
    return jax.default_backend() != "tpu"


def _pad_rows(x, block):
    n = x.shape[0]
    pad = (-n) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, n


@functools.partial(jax.jit, static_argnums=0)
def _fused_forward(plan: MLPPlan, x, weights, biases):
    xp, n = _pad_rows(x, plan.block_rows)
    grid = xp.shape[0] // plan.block_rows
    n_layers = plan.n_layers

    w_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for w in weights]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
               for b in biases]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, plan),
        grid=(grid,),
        in_specs=[pl.BlockSpec((plan.block_rows, x.shape[1]),
                               lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + w_specs + b_specs,
        out_specs=pl.BlockSpec((plan.block_rows, plan.out_dim),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], plan.out_dim), jnp.float32),
        interpret=_interpret(),
    )(xp, *weights, *biases)
    return out[:n]


def _bwd_kernel(plan: MLPPlan, *refs):
    """Recompute activations for one tile, then backprop.

    Ref order: x, g, [w]*n -> outputs dx, [dw]*n, [db]*n (accumulated across
    the sequential grid).
    """
    n = plan.n_layers
    x_ref, g_ref = refs[0], refs[1]
    w_refs = refs[2:2 + n]
    b_refs = refs[2 + n:2 + 2 * n]
    dx_ref = refs[2 + 2 * n]
    dw_refs = refs[3 + 2 * n:3 + 3 * n]
    db_refs = refs[3 + 3 * n:3 + 4 * n]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for i in range(n):
            dw_refs[i][:] = jnp.zeros_like(dw_refs[i])
            db_refs[i][:] = jnp.zeros_like(db_refs[i])

    x = x_ref[:]
    x0 = x
    # forward recompute, saving pre-activations input to each layer
    layer_inputs = []
    h = x
    for i in range(n):
        if i in plan.skip_in:
            h = jnp.concatenate([h, x0], axis=-1) * np.float32(1 / np.sqrt(2))
        layer_inputs.append(h)
        z = jnp.dot(h, w_refs[i][:], preferred_element_type=jnp.float32) + b_refs[i][:]
        if i < n - 1:
            h = _act(plan, z)
        else:
            h = z

    # backward
    g = g_ref[:]
    dx0_acc = jnp.zeros_like(x0)
    for i in reversed(range(n)):
        if i < n - 1:
            # activation grad at z_i: recompute z from saved input
            z = jnp.dot(layer_inputs[i], w_refs[i][:],
                        preferred_element_type=jnp.float32) + b_refs[i][:]
            if plan.activation == "softplus100":
                g = g * jax.nn.sigmoid(100.0 * z)
            elif plan.activation == "relu":
                g = g * (z > 0).astype(g.dtype)
        dw_refs[i][:] += jnp.dot(layer_inputs[i].T, g,
                                 preferred_element_type=jnp.float32)
        db_refs[i][:] += jnp.sum(g, axis=0)
        g = jnp.dot(g, w_refs[i][:].T, preferred_element_type=jnp.float32)
        if i in plan.skip_in:
            d = plan.dims[i]
            scale = np.float32(1 / np.sqrt(2))
            dx0_acc = dx0_acc + g[:, d:] * scale
            g = g[:, :d] * scale
    dx_ref[:] = g + dx0_acc


@functools.partial(jax.jit, static_argnums=0)
def _fused_backward(plan: MLPPlan, x, weights, biases, g):
    xp, nrows = _pad_rows(x, plan.block_rows)
    gp, _ = _pad_rows(g, plan.block_rows)
    grid = xp.shape[0] // plan.block_rows
    n = plan.n_layers

    w_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for w in weights]
    b_specs = [pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
               for b in biases]
    dw_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
                for w in weights]
    db_specs = [pl.BlockSpec(b.shape, lambda i: (0,), memory_space=pltpu.VMEM)
                for b in biases]

    out = pl.pallas_call(
        functools.partial(_bwd_kernel, plan),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((plan.block_rows, x.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.block_rows, plan.out_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs + b_specs,
        out_specs=[pl.BlockSpec((plan.block_rows, x.shape[1]),
                                lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + dw_specs + db_specs,
        out_shape=[jax.ShapeDtypeStruct((xp.shape[0], x.shape[1]), jnp.float32)]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
        + [jax.ShapeDtypeStruct(b.shape, jnp.float32) for b in biases],
        interpret=_interpret(),
    )(xp, gp, *weights, *biases)
    dx = out[0][:nrows]
    dws = list(out[1:1 + n])
    dbs = list(out[1 + n:])
    return dx, dws, dbs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_mlp(plan: MLPPlan, x, weights, biases):
    """x [N, dims[0]] -> [N, out_dim] through the fused trunk."""
    return _fused_forward(plan, x, tuple(weights), tuple(biases))


def _fused_mlp_fwd(plan, x, weights, biases):
    out = _fused_forward(plan, x, tuple(weights), tuple(biases))
    return out, (x, tuple(weights), tuple(biases))


def _fused_mlp_bwd(plan, res, g):
    x, weights, biases = res
    dx, dws, dbs = _fused_backward(plan, x, weights, biases, g)
    return dx, tuple(dws), tuple(dbs)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
