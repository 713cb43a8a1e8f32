"""A/B the CESR train step: dense shade vs surface-pixel compaction.

CESR's dominant FLOP block is the shadow net: an 8x512 MLP evaluated on
N_pixels x 128 one-hot light rows per step (train_cesr.py:106-110), plus
the factorized diffuse sweep — all per-row work, so compacting to surface
pixels should approach a 1/surface_fraction speedup. Camera-style batch
at the realistic ~35% object coverage; explore phase with rgb loss (the
long phase of the reference schedule, confs_sg/hotdog.conf).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from robir_tpu.fields.sdf import init_sdf  # noqa: E402
from robir_tpu.render.stage2 import Stage2Config, Stage2Model  # noqa: E402
from robir_tpu.stages.cesr import CESRStageConfig, make_cesr_step  # noqa: E402
from robir_tpu.stages.stage2_runner import (StageOptConfig,  # noqa: E402
                                            init_stage2_params, make_adam,
                                            split_params)
from robir_tpu.tools.profiler import time_scanned  # noqa: E402

TRAINABLE = ("gamma", "envmap_material_network", "shadow_net", "normal_net")


def main():
    cfg = Stage2Config()
    cfg = dataclasses.replace(
        cfg, visnet=dataclasses.replace(cfg.visnet, storage_dtype="bfloat16"))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    from robir_tpu.tracing.grid import build_sdf_grid, grid_cast
    grid = build_sdf_grid(Stage2Model(params, cfg).sdf, cfg.grid)

    n = 1024
    rng = np.random.default_rng(0)
    # geometric-init sphere is ~r=0.25 in stage-2 coords: aim the target
    # plane so the hit fraction lands near the blender scenes' ~1/3
    o = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    tgt = np.concatenate([rng.uniform(-0.36, 0.36, (n, 2)),
                          np.zeros((n, 1))], -1).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = {"points": jnp.asarray(o), "dirs": jnp.asarray(d),
             "object_mask": jnp.ones((n,), bool),
             "rgb": jnp.full((n, 3), 0.5)}
    _, hit, _ = jax.jit(lambda o, d: grid_cast(grid, cfg.grid, o, d))(
        batch["points"], batch["dirs"])
    frac = float(jnp.mean(hit.astype(jnp.float32)))

    out = {"surface_fraction": round(frac, 3), "n_pixels": n}
    for name, chunk in [("dense_ms", 0), ("compact_ms", 128)]:
        stage_cfg = CESRStageConfig(num_pixels=n, compact_chunk=chunk,
                                    num_lights=cfg.envmap.num_lgt_sgs,
                                    white_light=True)
        p = jax.tree_util.tree_map(jnp.array, params)
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        p["shadow_net"] = init_sdf(k1, stage_cfg.shadow_cfg)
        p["normal_net"] = init_sdf(k2, stage_cfg.normal_cfg)
        opt = make_adam(StageOptConfig(lr=5e-4))
        trainable, frozen = split_params(p, TRAINABLE)
        opt_state = opt.init(trainable)
        spec_var = jnp.zeros((cfg.envmap.latent_dim,))
        step = make_cesr_step(cfg, stage_cfg, opt)

        def one(carry):
            t, s, k = carry
            k, sk = jax.random.split(k)
            t, s, _ = step(t, frozen, s, grid, spec_var, batch, sk,
                           "none", True, True)
            return (t, s, k)

        ms = time_scanned(one, (trainable, opt_state, jax.random.PRNGKey(1)),
                          n_steps=8, reps=3) * 1e3
        out[name] = round(ms, 2)
    out["speedup"] = round(out["dense_ms"] / out["compact_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
