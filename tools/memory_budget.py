"""Per-device HBM budget for the shipped stage-2 config (SCALING.md).

AOT-compiles the canonical Vis train step (hotdog.json constants, quad
layout) and reports XLA's memory analysis: argument bytes (params +
optimizer state + the baked grid), temp bytes (activations/residuals),
and the static sizes of the replicated state. Under the data-parallel
mesh every one of these EXCEPT the batch replicates per device, so the
single-chip numbers ARE the per-device numbers (the batch shard only
shrinks).

Usage: python tools/memory_budget.py  (on the TPU; CPU works for the
static sizes but XLA CPU memory analysis is less representative).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from robir_tpu.tools import vis_workload

    runner, batch, carry, info = vis_workload.build()
    step = runner._step
    frozen = runner._frozen

    leaves = jax.tree_util.tree_leaves(runner.params)
    param_mb = sum(np.asarray(l).nbytes for l in leaves) / 1e6
    opt_mb = sum(np.asarray(l).nbytes for l in
                 jax.tree_util.tree_leaves((runner.vis_state,
                                            runner.illum_state))) / 1e6
    grid_mb = sum(np.asarray(g).nbytes for g in
                  jax.tree_util.tree_leaves(runner.grid_values)) / 1e6

    vis_p, illum_p, vs, ist, key, grid = carry
    lowered = jax.jit(step).lower(vis_p, illum_p, frozen, vs, ist, grid,
                                  batch, key)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    rec = {
        "config": "hotdog.json (320^3 bf16 quad grid)",
        "workload": info,
        "params_mb": round(param_mb, 1),
        "opt_state_mb": round(opt_mb, 1),
        "grid_buffers_mb": round(grid_mb, 1),
    }
    if ma is not None:
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                rec[k.replace("_in_bytes", "_mb")] = round(v / 1e6, 1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
