"""Trace the Vis train step and print the per-category device breakdown.

Round-2 got the step 1415 -> 351 ms via row-gather trilinear grid lookups;
this identifies what the remaining time is made of before deciding the next
optimization. Same workload as tools/vis_step_bench.py (reference constants:
256 px x 512 secondary dirs, hotdog.conf:10 illum_num_pixels + the
trace_radiance nsamp=512 at train_visibility.py:299).
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from robir_tpu.core.config import build_stage2_config, load_config  # noqa: E402
from robir_tpu.data.syn_dataset import SynDataset, SynDatasetConfig  # noqa: E402
from robir_tpu.data.synthetic import make_sphere_dataset  # noqa: E402
from robir_tpu.stages.stage2_runner import init_stage2_params  # noqa: E402
from robir_tpu.stages.vis import VisRunner, VisStageConfig  # noqa: E402
from robir_tpu.tools.profiler import summarize_trace, trace  # noqa: E402


def main():
    import dataclasses

    conf = load_config("configs/hotdog.json")
    cfg = build_stage2_config(conf["model"])
    if len(sys.argv) > 1:        # argv: [quad 0/1]
        cfg = dataclasses.replace(cfg, grid=dataclasses.replace(
            cfg.grid, quad_rows=bool(int(sys.argv[1]))))
    with tempfile.TemporaryDirectory() as d:
        make_sphere_dataset(d, n_train=4, n_test=1, h=200, w=200, radius=0.5)
        dataset = SynDataset(SynDatasetConfig(instance_dir=d))
        params = init_stage2_params(jax.random.PRNGKey(0), cfg)
        runner = VisRunner(cfg, params, dataset,
                           VisStageConfig(num_pixels=256, nsamp=512))
        runner.bake_grid()
        batch = runner._batch()
        step = runner._step
        K = 4

        # grid as an explicit jit argument (closing over a baked quad
        # buffer embeds a ~262 MB HLO constant -> relay HTTP 413)
        def multi(carry, grid):
            vp, ip, vs, istate, k = carry

            def body(c, sk):
                vp, ip, vs, istate = c
                vp, ip, vs, istate, m = step(vp, ip, runner._frozen, vs,
                                             istate, grid, batch, sk)
                return (vp, ip, vs, istate), m["radiance_loss"]

            (vp, ip, vs, istate), losses = jax.lax.scan(
                body, (vp, ip, vs, istate), jax.random.split(k, K))
            return vp, ip, vs, istate, losses

        _f = jax.jit(multi)
        f = lambda c: _f(c, runner.grid_values)
        carry = (runner._vis, runner._illum, runner.vis_state,
                 runner.illum_state, jax.random.PRNGKey(1))
        out = f(carry)
        print("warm loss", np.asarray(out[-1])[-1], flush=True)
        tdir = "/tmp/vis_trace"
        with trace(tdir):
            out = f(carry)
            np.asarray(out[-1])
        s = summarize_trace(tdir, top_ops=25)
        print(f"total device ms per step: {s['total_ms'] / K:.3f}")
        print("categories (ms/step):")
        for k, v in s["categories"].items():
            print(f"  {k:30s} {v / K:8.3f}")
        print("top ops (ms/step):")
        for k, v in s["top_ops"]:
            print(f"  {k[:90]:90s} {v / K:8.4f}")


if __name__ == "__main__":
    main()
