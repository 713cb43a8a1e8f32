"""Trace the importance-sampling phase and print the per-op breakdown.

Identifies what dominates the standalone 5.2 ms (sampling_phase_out.json)
before deciding between an XLA-level fix and a fused Pallas kernel.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robir_tpu.fields.neus_model import NeuS, NeuSConfig, init_neus  # noqa: E402
from robir_tpu.fields.radiance import RenderingConfig  # noqa: E402
from robir_tpu.fields.sdf import SDFConfig  # noqa: E402
from robir_tpu.render.neus import (NeusRenderConfig, Rays, cat_z_vals,  # noqa: E402
                                   up_sample)
from robir_tpu.tools.profiler import summarize_trace, trace  # noqa: E402


def main():
    cfg = NeuSConfig(
        sdf=SDFConfig(storage_dtype="bfloat16"),
        color=RenderingConfig(d_feature=256, mode="idr", d_in=9, d_out=3,
                              d_hidden=256, n_layers=4,
                              storage_dtype="bfloat16"))
    rcfg = NeusRenderConfig()
    params = init_neus(jax.random.PRNGKey(0), cfg)
    model = NeuS(params, cfg)
    BATCH = 512
    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0, 0, 3.0]], np.float32), (BATCH, 1))
    d = rng.uniform(-0.3, 0.3, (BATCH, 3)).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((BATCH, 1), np.float32)
    rays = Rays(*[jnp.asarray(x) for x in
                  [o, d, d, 0 * ones, ones, 1.5 * ones, 4.5 * ones]])
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

    def multi(carry):
        def body(c, _):
            return sampling(c), None
        out, _ = jax.lax.scan(body, carry, None, length=20)
        return out

    f = jax.jit(multi)
    carry = (jnp.float32(0.0), jax.random.PRNGKey(2))
    out = f(carry)
    print("warm", float(out[0]), flush=True)
    tdir = "/tmp/sampling_trace"
    with trace(tdir):
        out = f(carry)
        float(np.asarray(out[0]))
    s = summarize_trace(tdir, top_ops=25)
    print(f"total device ms per step: {s['total_ms'] / 20:.3f}")
    print("categories (ms/step):")
    for k, v in s["categories"].items():
        print(f"  {k:30s} {v / 20:8.3f}")
    print("top ops (ms/step):")
    for k, v in s["top_ops"]:
        print(f"  {k[:90]:90s} {v / 20:8.4f}")


if __name__ == "__main__":
    main()
