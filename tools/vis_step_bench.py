"""Time the Vis train step at reference constants (256 px x 512 dirs).

Round-2 context: the step was rewritten from two independent
value_and_grad calls (one per optimizer subtree, re-running the full
512-dir secondary trace twice) to ONE combined forward+backward — the
cross-gradients are structurally zero (tests/test_stage2_drivers.py::
test_vis_cross_gradients_structurally_zero), so gradients are identical.

Prints one JSON line with ms/step (scan-timed, best-of-N — see
tools/profiler.time_scanned for why dispatch-loop timing is meaningless
through the axon tunnel).
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, ".")
    from robir_tpu.core.config import build_stage2_config, load_config
    from robir_tpu.data.synthetic import make_sphere_dataset
    from robir_tpu.data.syn_dataset import SynDataset, SynDatasetConfig
    from robir_tpu.stages.stage2_runner import init_stage2_params
    from robir_tpu.stages.vis import VisRunner, VisStageConfig
    from robir_tpu.tools.profiler import time_scanned
    import tempfile

    import dataclasses

    conf = load_config("configs/hotdog.json")
    cfg = build_stage2_config(conf["model"])
    # optional grid-march overrides:
    # argv = [compact_after] [blocked 0/1] [quad 0/1] [compact_chunk];
    # ROBIR_VIS_OVERRELAX applies with or without argv overrides
    if len(sys.argv) > 1:
        cfg = dataclasses.replace(cfg, grid=dataclasses.replace(
            cfg.grid, compact_after=int(sys.argv[1]),
            blocked_gather=bool(int(sys.argv[2])) if len(sys.argv) > 2
            else cfg.grid.blocked_gather,
            quad_rows=bool(int(sys.argv[3])) if len(sys.argv) > 3
            else cfg.grid.quad_rows,
            compact_chunk=int(sys.argv[4]) if len(sys.argv) > 4
            else cfg.grid.compact_chunk))
    if os.environ.get("ROBIR_VIS_OVERRELAX"):
        cfg = dataclasses.replace(cfg, grid=dataclasses.replace(
            cfg.grid, over_relax=float(os.environ["ROBIR_VIS_OVERRELAX"])))
    with tempfile.TemporaryDirectory() as d:
        make_sphere_dataset(d, n_train=4, n_test=1, h=200, w=200, radius=0.5)
        dataset = SynDataset(SynDatasetConfig(instance_dir=d))
        params = init_stage2_params(jax.random.PRNGKey(0), cfg)
        runner = VisRunner(cfg, params, dataset,
                           VisStageConfig(num_pixels=256, nsamp=512))
        runner.bake_grid()
        batch = runner._batch()
        step = runner._step

        # grid rides in the carry: closing over a baked quad buffer embeds
        # a ~262 MB HLO constant and the relay rejects the compile request
        # (HTTP 413); the real runner passes it as a step argument too
        def one(carry):
            vp, ip, vs, istate, k, g = carry
            k, sk = jax.random.split(k)
            vp, ip, vs, istate, _ = step(vp, ip, runner._frozen, vs, istate,
                                         g, batch, sk)
            return (vp, ip, vs, istate, k, g)

        carry = (runner._vis, runner._illum, runner.vis_state,
                 runner.illum_state, jax.random.PRNGKey(1),
                 runner.grid_values)
        ms = time_scanned(one, carry, n_steps=10, reps=3) * 1e3
        print(json.dumps({"metric": "vis_step_ms", "value": round(ms, 2),
                          "px_per_sec": round(256 / (ms / 1e3), 1)}))


if __name__ == "__main__":
    main()
