"""Measure the importance-sampling phase's share of the shipped bf16 step.

Round-2 follow-up: perf_study_out.json's sampling numbers (5.3 ms) were
taken with fp32 activation storage. The shipped configs use bf16 storage
(CLAUDE.md), which shrank the render fwd+bwd but not necessarily the
sampling phase (small sequential matmuls, latency/VPU-bound). This tool
times, at the shipped bf16-storage config:

  full train step / sampling phase only / train step with sampling
  replaced by fixed z_vals (the "zero-cost sampling" bound).

Scan+min methodology per CLAUDE.md.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from robir_tpu.fields.neus_model import NeuS, NeuSConfig, init_neus  # noqa: E402
from robir_tpu.fields.radiance import RenderingConfig  # noqa: E402
from robir_tpu.fields.sdf import SDFConfig  # noqa: E402
from robir_tpu.render.neus import (NeusRenderConfig, Rays, cat_z_vals,  # noqa: E402
                                   render_core, render_neus, up_sample)
from robir_tpu.tools.profiler import time_scanned  # noqa: E402


def main():
    print("jax", jax.__version__, jax.devices(), flush=True)
    cfg = NeuSConfig(
        sdf=SDFConfig(d_in=3, d_out=257, d_hidden=256, n_layers=8,
                      storage_dtype="bfloat16"),
        color=RenderingConfig(d_feature=256, mode="idr", d_in=9, d_out=3,
                              d_hidden=256, n_layers=4,
                              storage_dtype="bfloat16"))
    rcfg = NeusRenderConfig(n_samples=64, n_importance=64, up_sample_steps=4)
    params = init_neus(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(5e-4)
    opt_state = opt.init(params)

    BATCH = 512
    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0, 0, 3.0]], np.float32), (BATCH, 1))
    d = rng.uniform(-0.3, 0.3, (BATCH, 3)).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((BATCH, 1), np.float32)
    rays = Rays(*[jnp.asarray(x) for x in
                  [o, d, d, 0 * ones, ones, 1.5 * ones, 4.5 * ones]])
    results = {}

    def report(name, step_fn, carry):
        t = time_scanned(step_fn, carry, n_steps=10, reps=4)
        results[name] = round(t * 1e3, 3)
        print(f"{name:32s}: {t * 1e3:8.3f} ms", flush=True)
        return t

    # full train step (key rides the carry so every scan step differs)
    def train_step(carry):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)

        def loss(pp):
            out = render_neus(sub, rays, NeuS(pp, cfg), 1.0, rcfg)
            return (jnp.mean((out["rgb"] - 0.5) ** 2)
                    + 0.1 * out["gradient_error"])

        g = jax.grad(loss)(params)
        u, s = opt.update(g, opt_state)
        return optax.apply_updates(params, u), s, key

    t_full = report("full_train_step_bf16",
                    train_step, (params, opt_state, jax.random.PRNGKey(1)))

    # sampling phase only
    model = NeuS(params, cfg)
    near, far = rays.near, rays.far

    def sampling(carry):
        acc, key = carry
        key, sub = jax.random.split(key)
        z_vals = jnp.linspace(0.0, 1.0, rcfg.n_samples)[None, :]
        z_vals = near + (far - near) * z_vals
        t_rand = jax.random.uniform(sub, (BATCH, 1)) - 0.5
        z_vals = z_vals + t_rand * 2.0 / rcfg.n_samples
        pts = (rays.origins[:, None, :]
               + rays.directions[:, None, :] * z_vals[..., :, None])
        sdf = model.sdf(pts.reshape(-1, 3)).reshape(BATCH, rcfg.n_samples)
        for i in range(rcfg.up_sample_steps):
            new_z = up_sample(rays.origins, rays.directions, z_vals, sdf,
                              rcfg.n_importance // rcfg.up_sample_steps,
                              64 * 2 ** i, model.radius())
            z_vals, sdf = cat_z_vals(
                model, rays.origins, rays.directions, z_vals, new_z, sdf,
                last=(i + 1 == rcfg.up_sample_steps))
        return acc + jnp.sum(z_vals) * 1e-9, key

    report("sampling_phase_bf16store", sampling,
           (jnp.float32(0.0), jax.random.PRNGKey(2)))

    # train step with sampling ablated (fixed z grid) = lower bound
    z_fixed = jnp.broadcast_to(
        jnp.linspace(1.5, 4.5, 128)[None, :], (BATCH, 128))

    def train_step_nosample(carry):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        del sub

        def loss(pp):
            m = NeuS(pp, cfg)
            out = render_core(rays.origins, rays.directions, z_fixed,
                              2.0 / 64, m, background_rgb=jnp.ones((1, 3)),
                              cos_anneal_ratio=1.0)
            return (jnp.mean((out["color"] - 0.5) ** 2)
                    + 0.1 * out["gradient_error"])

        g = jax.grad(loss)(params)
        u, s = opt.update(g, opt_state)
        return optax.apply_updates(params, u), s, key

    t_ns = report("train_step_fixed_z", train_step_nosample,
                  (params, opt_state, jax.random.PRNGKey(3)))

    results["sampling_share_ms"] = round((t_full - t_ns) * 1e3, 3)
    print(f"implied sampling share: {(t_full - t_ns) * 1e3:.3f} ms")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "sampling_phase_out.json")
    json.dump(results, open(out, "w"), indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
