"""SDF field MLP: geometric init, weight norm, skip connection, softplus-100.

Behavioral parity with the reference ``SDFNetwork``
(``neus/model/neus_fields.py:32-135``, stage-2 copy
``model/neus_model.py:312-438``): PE-encoded input, 8x256 trunk with a
concat-skip at layer 4 (divided by sqrt(2)), SAL geometric initialization
(sphere of radius ``bias``), Softplus(beta=100) activations, output =
[sdf / scale, geometry feature].

TPU-native differences:
- gradients come from ``jax.grad`` composed per-point (no autograd graph
  bookkeeping); the double-backward the reference needs for eikonal is just
  ordinary differentiation of a pure function here,
- no chunking: callers batch however they like, XLA handles the rest
  (the reference chunks at 1024 points, ``model/neus_model.py:385-417``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import PEConfig, positional_encoding
from .mlp import (Params, apply_linear, apply_linear_parts,
                  effective_weight, init_linear,
                  softplus_beta)


@dataclasses.dataclass(frozen=True)
class SDFConfig:
    d_in: int = 3
    d_out: int = 257  # 1 sdf + 256 feature
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: tuple[int, ...] = (4,)
    multires: int = 10  # reference SDFNetwork default (neus_fields.py:39)
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    inside_outside: bool = False
    # spatial-gradient formulation for sdf_full_and_gradient:
    #   "vjp"    — per-point reverse-mode via vmap(grad) (round-1/2 default),
    #   "manual" — hand-written batched backward (same matmul/sigmoid chain
    #              AD emits, as plain [N, d] batched ops). Removes the
    #              jvp(vmap(jvp())) seam HLOs the round-3 trace pinned
    #              (~0.8 ms/step of [N,1,257] cotangent assembly/splits) and
    #              skips the last layer's [N,257]x[257,256] backward matmul
    #              (the sdf seed row is the constant W_last[:, 0]).
    # Measured on the v5e NeuS train step: 11.93 -> 10.88 ms/step (1.10x,
    # tools/neus_manual_grad_bench.py); fp32-exact vs "vjp" to ~1e-4 incl.
    # second-order param grads (tests/test_fields.py::TestManualGradient).
    grad_mode: str = "manual"
    # route value+gradient through the fused Pallas kernel
    # (render/pallas/fused_value_grad.py): same math, activations stay in
    # VMEM. Opt-in; the wrapped op is once-differentiable (exactly what the
    # train step needs), so leave off for exotic higher-order uses.
    fused_kernel: bool = False
    fused_block_rows: int = 256
    # store inter-layer activations (and the residuals autodiff saves for
    # backward) in this dtype — "bfloat16" halves the trunk's HBM traffic,
    # the v5e bottleneck (matmul passes are bf16 at DEFAULT precision
    # either way; weights and MXU accumulation stay fp32-mastered).
    # PE encoding and the returned outputs remain fp32.
    storage_dtype: str | None = None

    def __post_init__(self):
        # a typo'd grad_mode would silently fall back to nothing: the
        # dispatch sites compare against "manual" only
        if self.grad_mode not in ("vjp", "manual"):
            raise ValueError(f"grad_mode {self.grad_mode!r} not in "
                             f"('vjp', 'manual')")

    @property
    def store(self):
        return jnp.bfloat16 if self.storage_dtype == "bfloat16" else None

    @property
    def pe(self) -> PEConfig:
        return PEConfig(num_freqs=self.multires, input_dims=self.d_in)

    @property
    def dims(self) -> tuple[int, ...]:
        d0 = self.pe.out_dim if self.multires > 0 else self.d_in
        return (d0,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def init_sdf(key: jax.Array, cfg: SDFConfig) -> Params:
    dims = cfg.dims
    num_layers = len(dims)
    params: Params = {}
    keys = jax.random.split(key, num_layers - 1)
    for layer in range(num_layers - 1):
        out_dim = dims[layer + 1] - dims[0] if layer + 1 in cfg.skip_in else dims[layer + 1]
        in_dim = dims[layer]
        if cfg.geometric_init:
            w_init, b_init = _geometric_init(cfg, dims, layer, num_layers, in_dim, out_dim)
        else:
            w_init = b_init = None
        params[f"lin{layer}"] = init_linear(
            keys[layer], in_dim, out_dim, weight_norm=cfg.weight_norm,
            w_init=w_init, b_init=b_init)
    return params


def _geometric_init(cfg: SDFConfig, dims, layer, num_layers, in_dim, out_dim):
    """SAL geometric initialization (reference neus_fields.py:69-89):
    last layer ~ N(sqrt(pi)/sqrt(in), 1e-4) with bias -cfg.bias so the
    initial SDF is approximately a sphere; PE channels zeroed at the input
    and skip layers."""
    if layer == num_layers - 2:
        mean = np.sqrt(np.pi) / np.sqrt(in_dim)
        if cfg.inside_outside:
            mean, bias_val = -mean, cfg.bias
        else:
            bias_val = -cfg.bias

        def w_init(k, shape):
            return mean + 1e-4 * jax.random.normal(k, shape)

        def b_init(k, shape):
            return jnp.full(shape, bias_val)
    elif cfg.multires > 0 and layer == 0:
        def w_init(k, shape):
            w = jnp.zeros(shape)
            std = np.sqrt(2) / np.sqrt(out_dim)
            return w.at[:3, :].set(std * jax.random.normal(k, (3, shape[1])))

        def b_init(k, shape):
            return jnp.zeros(shape)
    elif cfg.multires > 0 and layer in cfg.skip_in:
        def w_init(k, shape):
            std = np.sqrt(2) / np.sqrt(out_dim)
            w = std * jax.random.normal(k, shape)
            # zero the PE part of the skip input (all but the raw xyz dims)
            return w.at[-(dims[0] - 3):, :].set(0.0)

        def b_init(k, shape):
            return jnp.zeros(shape)
    else:
        def w_init(k, shape):
            std = np.sqrt(2) / np.sqrt(out_dim)
            return std * jax.random.normal(k, shape)

        def b_init(k, shape):
            return jnp.zeros(shape)
    return w_init, b_init


def _slice_out_cols(lin: Params, out_cols: int) -> Params:
    """First ``out_cols`` output columns of a linear layer — EXACT under
    weight norm because the fold ``w = v * g / ||v||_col`` is per-output-
    column (effective_weight norms over axis 0)."""
    sliced = {"b": lin["b"][:out_cols]}
    if "v" in lin:
        sliced["v"] = lin["v"][:, :out_cols]
        sliced["g"] = lin["g"][:out_cols]
    else:
        sliced["w"] = lin["w"][:, :out_cols]
    return sliced


def sdf_apply(params: Params, cfg: SDFConfig, x: jnp.ndarray,
              compute_dtype=None, out_cols: int | None = None) -> jnp.ndarray:
    """[N, 3] -> [N, d_out] = [sdf, features]. Parity with
    ``SDFNetwork.forward`` (neus_fields.py:98-112). ``compute_dtype``
    optionally runs the trunk matmuls in low precision (fp32 accumulate).

    ``out_cols`` restricts the LAST layer to its first columns — exact
    column slicing up to matmul reassociation (bit-exact in the shipped
    bfloat16-storage config, where the output quantization absorbs the
    tiling-order difference; <=5e-5 relative in fp32; see
    :func:`_slice_out_cols`). The no-grad sampling
    phase only consumes the sdf scalar, so ``out_cols=1`` skips computing
    the 256 feature columns of the [256, 257] head there (the head is
    ~1/8 of the sampling-phase matmul FLOPs)."""
    inputs = x * cfg.scale
    if cfg.multires > 0:
        inputs = positional_encoding(inputs, cfg.pe)
    if cfg.fused_kernel and compute_dtype is None and x.ndim == 2:
        from ..render.pallas.fused_mlp import (fold_weight_norm, fused_mlp,
                                               plan_from_sdf_config)
        plan = plan_from_sdf_config(cfg, block_rows=cfg.fused_block_rows)
        ws, bs = fold_weight_norm(params, plan.n_layers)
        h = fused_mlp(plan, inputs, ws, bs)
        out = jnp.concatenate([h[..., :1] / cfg.scale, h[..., 1:]], axis=-1)
        return out[..., :out_cols] if out_cols is not None else out
    h = inputs
    num_layers = len(cfg.dims)
    store = cfg.store
    for layer in range(num_layers - 1):
        lin = params[f"lin{layer}"]
        if out_cols is not None and layer == num_layers - 2:
            lin = _slice_out_cols(lin, out_cols)
        if layer in cfg.skip_in:
            # split matmul instead of concat-then-matmul (fp32-reassociation
            # equal; kills the concat copy and its backward slice)
            h = apply_linear_parts(lin, [h, inputs.astype(h.dtype)],
                                   compute_dtype, store,
                                   pre_scale=1.0 / np.sqrt(2))
        else:
            h = apply_linear(lin, h, compute_dtype, store)
        if layer < num_layers - 2:
            h = softplus_beta(h, 100.0)
    h = h.astype(jnp.float32)
    sdf_col = h[..., :1] / cfg.scale
    if out_cols == 1:
        return sdf_col
    return jnp.concatenate([sdf_col, h[..., 1:]], axis=-1)


def sdf_value(params: Params, cfg: SDFConfig, x: jnp.ndarray) -> jnp.ndarray:
    """[N, 3] -> [N, 1] signed distance (feature columns never computed)."""
    return sdf_apply(params, cfg, x, out_cols=1)


def sdf_and_feat(params: Params, cfg: SDFConfig, x: jnp.ndarray):
    out = sdf_apply(params, cfg, x)
    return out[..., :1], out[..., 1:]


def sdf_gradient(params: Params, cfg: SDFConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Analytic SDF spatial gradient at each point: [N, 3] -> [N, 3].

    Equivalent of the reference's create_graph autograd
    (neus_fields.py:120-135). With ``cfg.grad_mode == "manual"`` (default)
    this is the hand-written batched backward of
    ``_manual_full_and_gradient`` (XLA dead-code-eliminates the unused
    feature channels); "vjp" keeps the round-1/2 per-point reverse-mode
    batched by vmap — which measured faster than both a single batched VJP
    (pathological transpose-of-transpose graphs) and 3 forward-mode JVPs
    (~1.5x slower end to end), but slower than "manual".
    """
    if cfg.grad_mode == "manual" and not cfg.fused_kernel:
        return _manual_full_and_gradient(params, cfg, x)[1]
    grad_fn = jax.grad(lambda p: sdf_value(params, cfg, p[None])[0, 0])
    return jax.vmap(grad_fn)(x)


def sdf_value_and_gradient(params: Params, cfg: SDFConfig, x: jnp.ndarray):
    full, grads = sdf_full_and_gradient(params, cfg, x)
    return full[..., :1], grads


def sdf_full_and_gradient(params: Params, cfg: SDFConfig, x: jnp.ndarray):
    """(full [N, d_out], spatial grad of the sdf channel [N, 3]) in ONE
    vmapped forward+backward: the full output rides as the aux of the
    per-point sdf grad, saving the separate batched forward the reference
    pays (+12% measured on the whole train step).

    With ``cfg.fused_kernel`` the trunk runs through the fused Pallas
    value+grad kernel (with its hand-derived second-order VJP); PE and the
    coordinate scale stay outside in XLA."""
    if cfg.fused_kernel:
        return _fused_full_and_gradient(params, cfg, x)
    if cfg.grad_mode == "manual":
        return _manual_full_and_gradient(params, cfg, x)

    def one(pt):
        def f(pp):
            out = sdf_apply(params, cfg, pp[None])[0]
            return out[0], out

        (_, full), g = jax.value_and_grad(f, has_aux=True)(pt)
        return full, g

    return jax.vmap(one)(x)


def _dot_store(a, w, store):
    """The exact matmul ``apply_linear`` runs: bf16 operands + bf16-rounded
    output when ``store`` is set (fp32 MXU accumulate on TPU), plain fp32
    otherwise."""
    if store is not None:
        return jax.lax.dot_general(a.astype(store), w.astype(store),
                                   (((a.ndim - 1,), (0,)), ((), ())),
                                   preferred_element_type=store)
    return a @ w


def _manual_full_and_gradient(params: Params, cfg: SDFConfig, x: jnp.ndarray):
    """Batched forward + hand-written input-gradient backward.

    Mathematically identical to reverse-mode AD of the forward (same matmul
    and sigmoid(beta z) chain, in the same storage dtype), but written as
    plain batched ops so (a) the outer loss gradient differentiates a flat
    graph instead of a nested jvp(vmap(jvp())) one, and (b) the last layer's
    backward matmul collapses to broadcasting the constant seed row
    W_last[:, 0]. The reference computes this same quantity with
    create_graph autograd (neus_fields.py:120-135)."""
    store = cfg.store
    n_lin = len(cfg.dims) - 1
    ws, bs = [], []
    for layer in range(n_lin):
        p = params[f"lin{layer}"]
        # the SAME weight-norm fold the forward applies (mlp.py) — any
        # numerical drift between the two would silently desync the
        # manual backward from sdf_apply
        ws.append(effective_weight(p))
        bs.append(p["b"])

    def encode(xx):
        inputs = xx * cfg.scale
        if cfg.multires > 0:
            inputs = positional_encoding(inputs, cfg.pe)
        return inputs

    e, pe_vjp = jax.vjp(encode, x)

    inv_sqrt2 = 1.0 / np.sqrt(2)
    h = e
    pre_acts = []  # hidden-layer pre-activations, in storage dtype
    for layer in range(n_lin):
        if layer in cfg.skip_in:
            # split matmul over [trunk | e] instead of concat-then-matmul
            trunk = ws[layer].shape[0] - e.shape[-1]
            s = jnp.asarray(inv_sqrt2, h.dtype)
            z = (_dot_store(h * s, ws[layer][:trunk], store)
                 + _dot_store(e.astype(h.dtype) * s, ws[layer][trunk:],
                              store))
        else:
            z = _dot_store(h, ws[layer], store)
        z = z + (bs[layer].astype(z.dtype) if store is not None else bs[layer])
        if layer < n_lin - 1:
            pre_acts.append(z)
            h = softplus_beta(z, 100.0)
        else:
            h = z
    h = h.astype(jnp.float32)
    full = jnp.concatenate([h[..., :1] / cfg.scale, h[..., 1:]], axis=-1)

    # backward: d sdf / d encoded-input. Seed through the last (linear)
    # layer is its first weight column — constant across points.
    seed = ws[-1][:, 0] / cfg.scale
    if store is not None:
        seed = seed.astype(store)
    g = jnp.broadcast_to(seed[None, :], (x.shape[0], seed.shape[0]))
    g_e = None
    if n_lin - 1 in cfg.skip_in:  # skip concat feeding the last layer
        trunk = ws[-1].shape[0] - e.shape[-1]
        g = g * jnp.asarray(inv_sqrt2, g.dtype)
        g_e = g[:, trunk:]
        g = g[:, :trunk]
    for layer in range(n_lin - 2, -1, -1):
        z = pre_acts[layer]
        gz = g * jax.nn.sigmoid(jnp.asarray(100.0, z.dtype) * z)
        if layer in cfg.skip_in:
            # split backward matmuls mirror the split forward: no [N, in]
            # cotangent buffer to slice apart
            trunk = ws[layer].shape[0] - e.shape[-1]
            gz = gz * jnp.asarray(inv_sqrt2, gz.dtype)
            part = _dot_store(gz, ws[layer][trunk:].T, store)
            g_e = part if g_e is None else g_e + part
            g = _dot_store(gz, ws[layer][:trunk].T, store)
        else:
            g = _dot_store(gz, ws[layer].T, store)
    g_e = g if g_e is None else g_e + g.astype(g_e.dtype)
    (grad_x,) = pe_vjp(g_e.astype(e.dtype))
    return full, grad_x


def _fused_full_and_gradient(params: Params, cfg: SDFConfig, x: jnp.ndarray):
    from ..render.pallas.fused_mlp import (fold_weight_norm,
                                           plan_from_sdf_config)
    from ..render.pallas.fused_value_grad import fused_value_grad

    plan = plan_from_sdf_config(cfg, block_rows=cfg.fused_block_rows)
    ws, bs = fold_weight_norm(params, plan.n_layers)

    def encode(xx):
        inputs = xx * cfg.scale
        if cfg.multires > 0:
            inputs = positional_encoding(inputs, cfg.pe)
        return inputs

    e, pe_vjp = jax.vjp(encode, x)
    y, de = fused_value_grad(plan, e, ws, bs)
    (grad_x,) = pe_vjp(de)
    full = jnp.concatenate([y[..., :1] / cfg.scale, y[..., 1:]], axis=-1)
    return full, grad_x / cfg.scale
