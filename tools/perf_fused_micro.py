"""Component-level fused-vs-XLA timings on the TPU."""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def time_scalar(f, args, reps=5):
    out = f(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from robir_tpu.fields.sdf import (SDFConfig, init_sdf,
                                      sdf_full_and_gradient, sdf_apply)

    print("jax", jax.__version__, jax.devices(), flush=True)
    cfg = SDFConfig(multires=6)  # stage-1 constants (8x256, PE 6)
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    N = 512 * 128
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3),
                           minval=-1.0, maxval=1.0)
    K = 10

    def scan_k(fn):
        def multi(params, x):
            def body(c, _):
                out = fn(params, x)
                s = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b) * 1e-9, out, 0.0)
                return c + s, ()
            tot, _ = jax.lax.scan(body, 0.0, None, length=K)
            return tot
        return jax.jit(multi)

    variants = {
        "xla": cfg,
        "fused_b128": dataclasses.replace(cfg, fused_kernel=True,
                                          fused_block_rows=128),
        "fused_b256": dataclasses.replace(cfg, fused_kernel=True,
                                          fused_block_rows=256),
        "fused_b1024": dataclasses.replace(cfg, fused_kernel=True,
                                           fused_block_rows=1024),
    }
    for name, c in variants.items():
        try:
            # value-only forward
            f1 = scan_k(lambda p, xx, _c=c: sdf_apply(p, _c, xx))
            t1 = time_scalar(f1, (params, x)) / K
            # value+grad forward
            f2 = scan_k(lambda p, xx, _c=c: sdf_full_and_gradient(p, _c, xx))
            t2 = time_scalar(f2, (params, x)) / K

            # train-style backward (second order)
            def loss(p, xx, _c=c):
                full, g = sdf_full_and_gradient(p, _c, xx)
                return (jnp.mean(full ** 2) + jnp.mean(
                    (jnp.sqrt(jnp.sum(g ** 2, -1) + 1e-12) - 1) ** 2))

            f3 = scan_k(lambda p, xx, _c=c: jax.grad(loss)(p, xx))
            t3 = time_scalar(f3, (params, x)) / K
            print(f"{name:12s}: value {t1*1e3:7.3f} ms   val+grad "
                  f"{t2*1e3:7.3f} ms   fwd+bwd {t3*1e3:7.3f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
