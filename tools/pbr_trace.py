"""Trace the PBR train step and print the per-category device breakdown.

Follows up the round-2 factorized-sweep win (142 -> 47 ms): identifies
what the remaining 47 ms is made of before deciding the next optimization.
Same workload as bench.py's ROBIR_BENCH_STAGE=pbr mode.
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robir_tpu.render.stage2 import Stage2Config, Stage2Model  # noqa: E402
from robir_tpu.stages.pbr import PBRStageConfig, make_pbr_step  # noqa: E402
from robir_tpu.stages.stage2_runner import (StageOptConfig,  # noqa: E402
                                            init_stage2_params, make_adam,
                                            split_params)
from robir_tpu.tools.profiler import summarize_trace, trace  # noqa: E402


def main():
    cfg = Stage2Config()
    cfg = dataclasses.replace(
        cfg, visnet=dataclasses.replace(cfg.visnet, storage_dtype="bfloat16"))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    from robir_tpu.tracing.grid import build_sdf_grid
    grid = build_sdf_grid(Stage2Model(params, cfg).sdf, cfg.grid)

    n = 1024
    rng = np.random.default_rng(0)
    o = rng.standard_normal((n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 0.55
    batch = {"points": jnp.asarray(o), "dirs": jnp.asarray(-o / 0.55),
             "object_mask": jnp.ones((n,), bool),
             "rgb": jnp.full((n, 3), 0.5)}

    opt = make_adam(StageOptConfig(lr=5e-4))
    trainable, frozen = split_params(params, ("gamma",
                                              "envmap_material_network"))
    opt_state = opt.init(trainable)
    step = make_pbr_step(cfg, PBRStageConfig(num_pixels=n), opt, jit=False)
    K = 8

    def multi(trainable, opt_state, key):
        def body(c, k):
            t, s = c
            t, s, m = step(t, frozen, s, grid, batch, k)
            return (t, s), m["loss"]

        return jax.lax.scan(body, (trainable, opt_state),
                            jax.random.split(key, K))

    f = jax.jit(multi)
    out = f(trainable, opt_state, jax.random.PRNGKey(0))
    print("warm", float(np.asarray(
        jax.tree_util.tree_leaves(out)[0]).ravel()[0]), flush=True)
    tdir = "/tmp/pbr_trace"
    with trace(tdir):
        out = f(trainable, opt_state, jax.random.PRNGKey(1))
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    s = summarize_trace(tdir, top_ops=20)
    print(f"total device ms per step: {s['total_ms'] / K:.3f}")
    print("categories (ms/step):")
    for k, v in s["categories"].items():
        print(f"  {k:30s} {v / K:8.3f}")
    print("top ops (ms/step):")
    for k, v in s["top_ops"]:
        print(f"  {k[:90]:90s} {v / K:8.4f}")


if __name__ == "__main__":
    main()
