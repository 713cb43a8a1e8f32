"""Map hot HLO instruction names from the round-3 NeuS trace to source.

Compiles the exact bench/trace step on the live backend, dumps optimized
HLO text, and prints the defining line (with op_name/source metadata) for
each instruction name given on argv (default: the hot non-matmul ops from
tools/neus_trace_r3_out.json).
"""

from __future__ import annotations

import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from robir_tpu.fields.neus_model import NeuS, NeuSConfig, init_neus  # noqa: E402
from robir_tpu.render.neus import NeusRenderConfig, Rays, render_neus  # noqa: E402

BATCH = 512
SCAN_STEPS = 20

DEFAULT_OPS = [
    "split.670", "split.671", "concatenate.466", "concatenate.467",
    "add_bitcast_fusion.2", "multiply_reduce_fusion.65",
    "multiply_convert_fusion.64", "fusion.2188", "fusion.2134",
]


def build():
    cfg = NeuSConfig()
    cfg = dataclasses.replace(
        cfg,
        sdf=dataclasses.replace(cfg.sdf, storage_dtype="bfloat16"),
        color=dataclasses.replace(cfg.color, storage_dtype="bfloat16"))
    rcfg = NeusRenderConfig(n_samples=64, n_importance=64, up_sample_steps=4)
    params = init_neus(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(5e-4)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0, 0, 3.0]], np.float32), (BATCH, 1))
    d = rng.uniform(-0.3, 0.3, (BATCH, 3)).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((BATCH, 1), np.float32)
    rays = Rays(*[jnp.asarray(a) for a in
                  [o, d, d, 0 * ones, ones, 1.5 * ones, 4.5 * ones]])

    def multi_step(params, opt_state, r, key):
        def body(carry, k):
            p, s = carry

            def loss(pp):
                out = render_neus(k, r, NeuS(pp, cfg), 1.0, rcfg)
                return (jnp.mean((out["rgb"] - 0.5) ** 2)
                        + 0.1 * out["gradient_error"])

            g = jax.grad(loss)(p)
            u, s = opt.update(g, s)
            return (optax.apply_updates(p, u), s), None

        keys = jax.random.split(key, SCAN_STEPS)
        (p, s), _ = jax.lax.scan(body, (params, opt_state), keys)
        return p, s

    return multi_step, (params, opt_state, rays, jax.random.PRNGKey(0))


def main():
    ops = sys.argv[1:] or DEFAULT_OPS
    fn, args = build()
    compiled = jax.jit(fn).lower(*args).compile()
    text = compiled.as_text()
    print(f"HLO text: {len(text) / 1e6:.1f} MB")
    lines = text.splitlines()
    wanted = set(ops)
    for i, line in enumerate(lines):
        m = re.match(r"^\s*(?:ROOT )?%?([\w.\-]+) = ", line)
        if m and m.group(1) in wanted:
            print("=" * 70)
            print(line.strip()[:2000])


if __name__ == "__main__":
    main()
