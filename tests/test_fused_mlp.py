"""Fused Pallas MLP kernel: parity with the jnp trunk (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robir_tpu.fields.encoding import positional_encoding
from robir_tpu.fields.neus_model import NeuSConfig, init_neus
from robir_tpu.fields.sdf import SDFConfig, sdf_apply
from robir_tpu.render.pallas.fused_mlp import (MLPPlan, _forward_rows,

                                               fold_weight_norm, fused_mlp,
                                               plan_from_sdf_config)


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    cfg = NeuSConfig()
    params = init_neus(jax.random.PRNGKey(0), cfg)["sdf_network"]
    ws, bs = fold_weight_norm(params, 9)
    plan = plan_from_sdf_config(cfg.sdf, block_rows=128)
    return cfg, params, ws, bs, plan


def test_plan_shapes(setup):
    cfg, params, ws, bs, plan = setup
    # pre-skip layer shrinks so the concat lands back at d_hidden
    assert plan.dims == (63, 256, 256, 256, 193, 256, 256, 256, 256)
    assert plan.skip_in == (4,)
    for i, w in enumerate(ws):
        assert w.shape[0] == plan.layer_in_dim(i)
        assert w.shape[1] == plan.layer_out_dim(i)


def test_forward_matches_sdf_apply(setup):
    cfg, params, ws, bs, plan = setup
    x3 = jnp.asarray(np.random.default_rng(0).standard_normal((300, 3)),
                     jnp.float32) * 0.5
    xpe = positional_encoding(x3, cfg.sdf.pe)
    ref = np.asarray(sdf_apply(params, cfg.sdf, x3))
    got = np.asarray(fused_mlp(plan, xpe, ws, bs))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_gradients_match(setup):
    cfg, params, ws, bs, plan = setup
    x3 = jnp.asarray(np.random.default_rng(1).standard_normal((128, 3)),
                     jnp.float32) * 0.5
    xpe = positional_encoding(x3, cfg.sdf.pe)

    def loss_ref(x, W, B):
        return jnp.sum(_forward_rows(plan, x, list(W), list(B)) ** 2)

    def loss_pl(x, W, B):
        return jnp.sum(fused_mlp(plan, x, W, B) ** 2)

    gx_r, gw_r, gb_r = jax.grad(loss_ref, argnums=(0, 1, 2))(xpe, ws, bs)
    gx_p, gw_p, gb_p = jax.grad(loss_pl, argnums=(0, 1, 2))(xpe, ws, bs)
    ref_scale = float(jnp.abs(gx_r).max())
    assert float(jnp.abs(gx_r - gx_p).max()) < 1e-4 * max(ref_scale, 1.0)
    for a, b in zip(gw_r, gw_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4,
                                   atol=1e-4 * max(float(jnp.abs(a).max()), 1.0))
    for a, b in zip(gb_r, gb_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4,
                                   atol=1e-3)  # fp32 accumulation order


def test_padding_rows(setup):
    """N not a multiple of block_rows must still be exact."""
    cfg, params, ws, bs, plan = setup
    x3 = jnp.asarray(np.random.default_rng(2).standard_normal((77, 3)),
                     jnp.float32) * 0.5
    xpe = positional_encoding(x3, cfg.sdf.pe)
    ref = np.asarray(sdf_apply(params, cfg.sdf, x3))
    got = np.asarray(fused_mlp(plan, xpe, ws, bs))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
