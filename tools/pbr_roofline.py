"""PBR-step roofline numbers (VERDICT r3 'what's missing' #3).

Same workload as tools/pbr_trace.py / bench.py's pbr mode (1024 all-hit
surface pixels, 128 SG lights, bf16 sweep storage): prints the XLA
cost_analysis FLOPs/bytes of the jitted train step and its scan-timed
ms/step on the current backend, plus the same at a realistic 20% surface
fraction with shade compaction (the shipped auto-guard regime). The
category split (which fusions the time sits in) comes from
tools/pbr_trace.py; docs/ROOFLINE_PBR.md holds the written analysis.

Usage:
  JAX_PLATFORMS=cpu python tools/pbr_roofline.py      # FLOP/byte only
  ROBIR_ROOFLINE_TIME=1 python tools/pbr_roofline.py  # + timings (TPU)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

if not os.environ.get("ROBIR_ROOFLINE_TIME"):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from robir_tpu.render.stage2 import Stage2Config, Stage2Model  # noqa: E402
from robir_tpu.stages.pbr import PBRStageConfig, make_pbr_step  # noqa: E402
from robir_tpu.stages.stage2_runner import (StageOptConfig,  # noqa: E402
                                            init_stage2_params, make_adam,
                                            split_params)
from robir_tpu.tools.profiler import time_scanned  # noqa: E402


def main():
    do_time = bool(os.environ.get("ROBIR_ROOFLINE_TIME"))
    cfg = Stage2Config()
    cfg = dataclasses.replace(
        cfg, visnet=dataclasses.replace(cfg.visnet,
                                        storage_dtype="bfloat16"),
        # mirror bench.py's stage-2 setup (shipped grid: quad + bf16)
        grid=dataclasses.replace(cfg.grid, quad_rows=True,
                                 storage_dtype="bfloat16"))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    from robir_tpu.tracing.grid import bake_march_layout, build_sdf_grid
    grid = bake_march_layout(
        build_sdf_grid(Stage2Model(params, cfg).sdf, cfg.grid), cfg.grid)

    n = 1024
    rng = np.random.default_rng(0)
    o = rng.standard_normal((n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 0.55
    batch_hit = {"points": jnp.asarray(o), "dirs": jnp.asarray(-o / 0.55),
                 "object_mask": jnp.ones((n,), bool),
                 "rgb": jnp.full((n, 3), 0.5)}
    # 20% surface: aim the other 80% of rays outward (miss)
    d_mix = np.asarray(-o / 0.55)
    d_mix[n // 5:] = -d_mix[n // 5:]
    batch_20 = dict(batch_hit, dirs=jnp.asarray(d_mix))

    opt = make_adam(StageOptConfig(lr=5e-4))
    trainable, frozen = split_params(params, ("gamma",
                                              "envmap_material_network"))
    opt_state = opt.init(trainable)

    out = {"n_pixels": n, "backend": jax.devices()[0].platform, "rows": {}}
    for name, batch, compact in (("all_hit_dense", batch_hit, 0),
                                 ("surface20_compact", batch_20, 128)):
        scfg = PBRStageConfig(num_pixels=n, compact_chunk=compact)
        step = make_pbr_step(cfg, scfg, opt, jit=True)
        lowered = step.lower(trainable, frozen, opt_state, grid, batch,
                             jax.random.PRNGKey(0))
        c = lowered.compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        row = {"gflop": round(c.get("flops", 0) / 1e9, 2),
               "gbytes": round(c.get("bytes accessed", 0) / 1e9, 3)}

        if do_time:
            def one(carry, step=step, batch=batch):
                t, s, k, g = carry
                k, sk = jax.random.split(k)
                t, s, _ = step(t, frozen, s, g, batch, sk)
                return t, s, k, g

            row["ms"] = round(time_scanned(
                one, (trainable, opt_state, jax.random.PRNGKey(1), grid),
                n_steps=8) * 1e3, 2)
        out["rows"][name] = row

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
