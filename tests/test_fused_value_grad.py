"""Fused value+spatial-gradient kernel vs pure-XLA autodiff.

Validates the hand-derived second-order VJP of
``render/pallas/fused_value_grad.fused_value_grad`` (forward outputs AND
all cotangents: dx, dW_i, db_i) against ordinary JAX AD of an identical
straight-line trunk, on CPU in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.render.pallas.fused_mlp import MLPPlan
from robir_tpu.render.pallas.fused_value_grad import fused_value_grad

pytestmark = pytest.mark.slow

SQ2 = 1.0 / np.sqrt(2.0)


def ref_trunk(plan, x, ws, bs):
    h = x
    n = plan.n_layers
    for i in range(n):
        if i in plan.skip_in:
            h = jnp.concatenate([h, x], axis=-1) * SQ2
        h = h @ ws[i] + bs[i]
        if i < n - 1:
            if plan.activation == "softplus100":
                h = jax.nn.softplus(100.0 * h) * 0.01
            elif plan.activation == "relu":
                h = jax.nn.relu(h)
    return h


def ref_value_grad(plan, x, ws, bs):
    y = ref_trunk(plan, x, ws, bs)

    def one(pt):
        return jax.grad(lambda p: ref_trunk(plan, p[None], ws, bs)[0, 0])(pt)

    return y, jax.vmap(one)(x)


def make_case(plan, key, n_rows=24):
    keys = jax.random.split(key, 2 * plan.n_layers + 1)
    ws, bs = [], []
    for i in range(plan.n_layers):
        din = plan.layer_in_dim(i)
        dout = plan.layer_out_dim(i)
        ws.append(jax.random.normal(keys[2 * i], (din, dout)) / np.sqrt(din))
        bs.append(0.1 * jax.random.normal(keys[2 * i + 1], (dout,)))
    x = jax.random.normal(keys[-1], (n_rows, plan.dims[0]))
    return x, tuple(ws), tuple(bs)


PLANS = [
    MLPPlan(dims=(8, 16, 16), out_dim=9, skip_in=(), activation="softplus100",
            block_rows=8),
    MLPPlan(dims=(8, 16, 8, 16), out_dim=5, skip_in=(2,),
            activation="softplus100", block_rows=8),
    MLPPlan(dims=(8, 16, 16), out_dim=9, skip_in=(), activation="relu",
            block_rows=8),
]


@pytest.mark.parametrize("plan", PLANS)
def test_forward_matches_autodiff(plan):
    x, ws, bs = make_case(plan, jax.random.PRNGKey(0))
    y, de = fused_value_grad(plan, x, ws, bs)
    y_ref, de_ref = ref_value_grad(plan, x, ws, bs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(de), np.asarray(de_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("plan", PLANS)
def test_vjp_matches_autodiff(plan):
    """Second-order check: gradients of a loss over BOTH outputs w.r.t.
    x, weights, and biases (eikonal-through-params structure)."""
    x, ws, bs = make_case(plan, jax.random.PRNGKey(1))

    def loss_fused(x, ws, bs):
        y, de = fused_value_grad(plan, x, ws, bs)
        return (jnp.sum(jnp.sin(y) * 0.3)
                + jnp.sum((jnp.sqrt(jnp.sum(de ** 2, -1) + 1e-8) - 1.0) ** 2))

    def loss_ref(x, ws, bs):
        y, de = ref_value_grad(plan, x, ws, bs)
        return (jnp.sum(jnp.sin(y) * 0.3)
                + jnp.sum((jnp.sqrt(jnp.sum(de ** 2, -1) + 1e-8) - 1.0) ** 2))

    l1 = loss_fused(x, ws, bs)
    l2 = loss_ref(x, ws, bs)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_row_padding():
    """Rows not divisible by block_rows are padded and trimmed exactly."""
    plan = PLANS[1]
    x, ws, bs = make_case(plan, jax.random.PRNGKey(2), n_rows=13)
    y, de = fused_value_grad(plan, x, ws, bs)
    y_ref, de_ref = ref_value_grad(plan, x, ws, bs)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(de), np.asarray(de_ref), rtol=1e-5,
                               atol=1e-5)


def test_sdf_field_fused_flag_equivalence():
    """SDFConfig.fused_kernel routes value+grad and value-only through the
    kernels with identical results, including the training gradient."""
    import dataclasses as dc
    from robir_tpu.fields.sdf import (SDFConfig, init_sdf, sdf_apply,
                                      sdf_full_and_gradient)

    cfg = SDFConfig(d_out=17, d_hidden=32, n_layers=3, skip_in=(2,),
                    multires=2, scale=1.5, fused_block_rows=8)
    cfg_f = dc.replace(cfg, fused_kernel=True)
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (21, 3)) * 0.7

    f0, g0 = sdf_full_and_gradient(params, cfg, x)
    f1, g1 = sdf_full_and_gradient(params, cfg_f, x)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=2e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=2e-5,
                               atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(sdf_apply(params, cfg_f, x)),
        np.asarray(sdf_apply(params, cfg, x)), rtol=2e-5, atol=1e-5)

    # training-style gradient (second order through the eikonal term)
    def loss(p, c):
        full, g = sdf_full_and_gradient(p, c, x)
        return (jnp.mean(full ** 2)
                + jnp.mean((jnp.sqrt(jnp.sum(g ** 2, -1) + 1e-12) - 1) ** 2))

    ga = jax.grad(loss)(params, cfg)
    gb = jax.grad(loss)(params, cfg_f)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4,
                                   atol=5e-6)
