"""A/B bench: NeuS train step with grad_mode 'vjp' vs 'manual'.

Same workload and timing protocol as bench.py (512 rays, reference
constants, K steps chained in one jitted scan, min over reps).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from robir_tpu.fields.neus_model import NeuS, NeuSConfig, init_neus  # noqa: E402
from robir_tpu.render.neus import NeusRenderConfig, Rays, render_neus  # noqa: E402

BATCH = 512
SCAN_STEPS = 20
REPS = 6


def step_time_ms(grad_mode: str) -> float:
    cfg = NeuSConfig()
    cfg = dataclasses.replace(
        cfg,
        sdf=dataclasses.replace(cfg.sdf, storage_dtype="bfloat16",
                                grad_mode=grad_mode),
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

    f = jax.jit(multi_step)
    out = f(params, opt_state, rays, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    probe = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    assert np.isfinite(probe), probe

    best = np.inf
    for rep in range(REPS):
        t0 = time.perf_counter()
        out = f(params, opt_state, rays, jax.random.PRNGKey(rep + 1))
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / SCAN_STEPS * 1e3
        best = min(best, dt)
    return best


def main():
    res = {}
    for mode in ["vjp", "manual"]:
        res[mode] = step_time_ms(mode)
        print(f"{mode}: {res[mode]:.3f} ms/step", flush=True)
    res["speedup"] = res["vjp"] / res["manual"]
    res["manual_rays_per_sec"] = BATCH / res["manual"] * 1e3
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
