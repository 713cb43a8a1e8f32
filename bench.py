"""Benchmark: NeuS stage-1 training throughput (rays/sec/chip).

Methodology: K train steps are chained inside ONE jitted lax.scan and timed
to a host fetch, repeated several times taking the best — this defeats two
artifacts of the tunneled-TPU environment: per-dispatch latency (~0.5 ms)
and intermittent multi-second relay stalls. Workload is the reference's own
constants: 512 rays/step, 64 coarse + 64 importance samples, 8x256 SDF +
4x256 color trunks (neus/config/blender.gin:19, sdf_render.py:241-244).

The reference publishes no numbers (BASELINE.md); the per-chip baseline is
the upstream NeuS workload at its commonly reported ~11 steps/s on the
reference GPU: ~5.6k rays/s. ``vs_baseline`` = measured rays/s/chip / that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REFERENCE_RAYS_PER_SEC = 5600.0  # see module docstring
BATCH = 512
SCAN_STEPS = 20
REPS = 6


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from robir_tpu.fields.neus_model import NeuS, NeuSConfig, init_neus
    from robir_tpu.render.neus import NeusRenderConfig, Rays, render_neus

    cfg = NeuSConfig()
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
                        + 0.1 * out["gradient_error"]
                        + jnp.mean(out["acc"] ** 2) * 0.0)

            g = jax.grad(loss)(p)
            u, s = opt.update(g, s)
            return (optax.apply_updates(p, u), s), None

        keys = jax.random.split(key, SCAN_STEPS)
        (p, s), _ = jax.lax.scan(body, (params, opt_state), keys)
        return p, s

    f = jax.jit(multi_step)
    out = f(params, opt_state, rays, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])

    best = float("inf")
    for rep in range(REPS):
        t0 = time.perf_counter()
        out = f(params, opt_state, rays, jax.random.PRNGKey(rep + 1))
        # host fetch forces real completion through the device tunnel
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)

    n_chips = len(jax.devices())
    per_chip = BATCH / best / n_chips

    print(json.dumps({
        "metric": "neus_train_rays_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(per_chip / REFERENCE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
