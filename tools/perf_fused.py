"""Fused value+grad kernel vs XLA on the real NeuS train step (TPU)."""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


def time_scalar(f, args, n_inner=1, reps=4):
    out = f(*args)
    first = np.asarray(jax.tree_util.tree_leaves(out)[0])
    assert first.size == 1
    float(first.ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n_inner)
    return best


def main():
    from robir_tpu.fields.neus_model import NeuS, NeuSConfig, init_neus
    from robir_tpu.render.neus import NeusRenderConfig, Rays, render_neus

    print("jax", jax.__version__, jax.devices(), flush=True)
    results = {}
    BATCH = 512
    rcfg = NeusRenderConfig(n_samples=64, n_importance=64, up_sample_steps=4)
    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0, 0, 3.0]], np.float32), (BATCH, 1))
    d = rng.uniform(-0.3, 0.3, (BATCH, 3)).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((BATCH, 1), np.float32)
    rays = Rays(*[jnp.asarray(a) for a in
                  [o, d, d, 0 * ones, ones, 1.5 * ones, 4.5 * ones]])
    opt = optax.adam(5e-4)
    K = 10

    variants = {
        "xla": NeuSConfig(),
        "fused_b128": None,
        "fused_b256": None,
        "fused_b512": None,
    }
    base = NeuSConfig()
    for br in (128, 256, 512):
        variants[f"fused_b{br}"] = dataclasses.replace(
            base, sdf=dataclasses.replace(base.sdf, fused_kernel=True,
                                          fused_block_rows=br))

    params = init_neus(jax.random.PRNGKey(0), NeuSConfig())
    opt_state = opt.init(params)
    out_ref = None
    for name, cfg in variants.items():
        def multi(params, opt_state, key, _cfg=cfg):
            def body(carry, k):
                p, s = carry

                def loss(pp):
                    out = render_neus(k, rays, NeuS(pp, _cfg), 1.0, rcfg)
                    return (jnp.mean((out["rgb"] - 0.5) ** 2)
                            + 0.1 * out["gradient_error"])

                g = jax.grad(loss)(p)
                u, s = opt.update(g, s)
                return (optax.apply_updates(p, u), s), None

            (p, s), _ = jax.lax.scan(body, (params, opt_state),
                                     jax.random.split(key, K))
            return jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b) * 1e-9, p, 0.0)

        try:
            f = jax.jit(multi)
            t = time_scalar(f, (params, opt_state, jax.random.PRNGKey(0)),
                            n_inner=K, reps=5)
            val = float(f(params, opt_state, jax.random.PRNGKey(0)))
            if out_ref is None:
                out_ref = val
            drift = abs(val - out_ref) / (abs(out_ref) + 1e-9)
            rps = BATCH / t
            results[name] = {"ms": round(t * 1e3, 3),
                             "rays_per_s": round(rps, 1),
                             "rel_drift_vs_xla": round(drift, 6)}
            print(f"{name:12s}: {t * 1e3:8.3f} ms  {rps:10,.0f} rays/s  "
                  f"drift {drift:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            results[name] = {"error": str(e)[:300]}

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "perf_fused_out.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
