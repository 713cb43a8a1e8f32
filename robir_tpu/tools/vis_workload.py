"""Canonical Vis-step benchmark workload — ONE truth (VERDICT r4 #1/#2).

Rounds 3-4 published two different Vis-step numbers because two tools
measured two different ray populations: ``tools/vis_step_bench.py`` timed
a procedural-dataset camera batch while ``bench.py``'s extra mode timed a
synthetic 35%-surface point batch. The secondary-ray fan is hit-compacted,
so the step cost scales with the batch's *surface count*, and the two
records read ~1.45x apart (61.5 vs 89.6 ms) while both claiming "256 px x
512 dirs at reference constants".

This module is the single workload both tools now share: the
procedural-dataset camera batch the real ``VisRunner`` produces — the ray
population a training step actually sees — with a FIXED seed, at the
reference constants (256 px x 512 dirs, ``configs/hotdog.json`` model
constants: 320^3 bf16 quad-rows grid). The batch's measured surface
fraction is part of the record so any future workload drift is visible.

Measurement protocol (CLAUDE.md relay-variance rule): scan-chained steps
timed to a host fetch, ALL reps recorded (spread), min as the headline;
for A/B comparisons run interleaved pairs across separate processes
(``tools/vis_ab.py``).

Reference: ``training/train_visibility.py:267-324`` (the step this
benchmarks), ``neus/optimization/log.py:154-160`` (instrumentation
intent).
"""

from __future__ import annotations

import dataclasses
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

# the canonical workload constants — change these and every consumer
# (bench.py extra mode, tools/vis_step_bench.py, tools/vis_ab.py) moves
# together
NUM_PIXELS = 256
NSAMP = 512
BATCH_SEED = 7
DATASET = dict(n_train=4, n_test=1, h=200, w=200, radius=0.5)
CAMERA_IDX = 0


def build(smoke: bool = False, compact_after: int | None = None,
          compact_chunk: int | None = None, quad_rows: bool | None = None,
          blocked_gather: bool | None = None, over_relax: float | None = None):
    """Build the canonical Vis-step workload.

    Returns ``(runner, batch, carry, info)`` where ``carry`` is the
    scan-timing carry ``(vis_p, illum_p, vis_state, illum_state, key,
    grid)`` and ``info`` records the workload provenance (surface
    fraction, constants).
    """
    from ..core.config import build_stage2_config, load_config
    from ..data.syn_dataset import SynDataset, SynDatasetConfig
    from ..data.synthetic import make_sphere_dataset
    from ..stages.stage2_runner import init_stage2_params
    from ..stages.vis import VisRunner, VisStageConfig

    import os

    conf = load_config(os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "configs",
        "hotdog.json"))
    cfg = build_stage2_config(conf["model"])
    g = cfg.grid
    if smoke:
        g = dataclasses.replace(g, resolution=48)
    overrides = dict(compact_after=compact_after,
                     compact_chunk=compact_chunk, quad_rows=quad_rows,
                     blocked_gather=blocked_gather, over_relax=over_relax)
    g = dataclasses.replace(g, **{k: v for k, v in overrides.items()
                                  if v is not None})
    cfg = dataclasses.replace(cfg, grid=g)

    npx, nsamp = (64, 32) if smoke else (NUM_PIXELS, NSAMP)
    with tempfile.TemporaryDirectory() as d:
        ds_args = dict(DATASET)
        if smoke:
            ds_args.update(h=64, w=64)
        make_sphere_dataset(d, **ds_args)
        dataset = SynDataset(SynDatasetConfig(instance_dir=d))
        params = init_stage2_params(jax.random.PRNGKey(0), cfg)
        runner = VisRunner(cfg, params, dataset,
                           VisStageConfig(num_pixels=npx, nsamp=nsamp))
        runner.bake_grid()
        # fixed-seed batch: the SAME pixels every process, every round
        runner.rng = np.random.default_rng(BATCH_SEED)
        b = dataset.sample_pixels(runner.rng, CAMERA_IDX, npx)
        hdr_shift = np.full((npx, 1), 0.5, np.float32)
        batch = runner.shard_batch({
            "points": b["points"], "dirs": b["dirs"],
            "object_mask": b["object_mask"], "hdr_shift": hdr_shift})

    carry = (runner._vis, runner._illum, runner.vis_state,
             runner.illum_state, jax.random.PRNGKey(1), runner.grid_values)
    info = {
        "vis_step_px": npx,
        "vis_step_nsamp": nsamp,
        "vis_step_object_frac": round(
            float(np.asarray(b["object_mask"], np.float32).mean()), 4),
        "vis_step_workload": "hotdog.json model constants, procedural "
                             f"sphere dataset camera batch, seed {BATCH_SEED}",
    }
    return runner, batch, carry, info


def time_step(runner, batch, carry, n_steps: int = 10, reps: int = 4):
    """All-reps ms/step for the canonical workload (min = headline)."""
    from .profiler import time_scanned_reps

    step = runner._step
    frozen = runner._frozen

    def one(c):
        vp, ip, vs, istate, k, g = c
        k, sk = jax.random.split(k)
        vp, ip, vs, istate, _ = step(vp, ip, frozen, vs, istate, g, batch,
                                     sk)
        return (vp, ip, vs, istate, k, g)

    return [t * 1e3 for t in
            time_scanned_reps(one, carry, n_steps=n_steps, reps=reps)]
