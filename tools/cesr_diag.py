"""Diagnose the CESR shadow/lit albedo-ratio drift mechanism.

Loads a completed run's CESR checkpoint and separates the two possible
overcorrection sources at analytically-shadowed vs lit surface points:

- shadow_net per-light diffuse visibility toward the SG lobes nearest
  the training light (ideal: ~0 in the cast shadow, ~1 on the lit side —
  UNDER-predicting lit-side visibility or OVER-predicting shadow depth
  forces albedo to compensate upward in the shadow);
- the recovered albedo itself (the ratio the gate measures).

CPU-friendly (forward passes only). Usage:
  python tools/cesr_diag.py /tmp/r5_runs/shadow_plain [...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "shadow_pipeline", os.path.join(REPO, "tools", "shadow_pipeline.py"))
sp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sp)


def diag(run_dir: str, stage: str = "CESR") -> dict:
    import jax
    import jax.numpy as jnp

    from robir_tpu.core import checkpoint as ckpt_lib
    from robir_tpu.core.config import build_stage2_config, build_stage_config
    from robir_tpu.stages.cesr import CESRStageConfig, shadow_net_vis
    from robir_tpu.stages.stage2_runner import init_stage2_params
    from robir_tpu.fields.sdf import init_sdf

    import dataclasses

    conf = json.load(open(os.path.join(run_dir, "conf.json")))
    cfg2 = build_stage2_config(conf["model"])
    num_lights = cfg2.envmap.num_lgt_sgs
    stage_cfg = build_stage_config(CESRStageConfig, conf.get("cesr"))
    # the runner clamps the one-hot label size to the envmap's lobe count
    stage_cfg = dataclasses.replace(stage_cfg, num_lights=num_lights)
    params = init_stage2_params(jax.random.PRNGKey(0), cfg2)
    params["shadow_net"] = init_sdf(jax.random.PRNGKey(1),
                                    stage_cfg.shadow_cfg)
    ck = os.path.join(run_dir, "logs", stage, "checkpoints", "latest.npz")
    params, _ = ckpt_lib.restore_into(params, ck, ignore_unknown=True)

    scale = conf["dataset"]["pose_scale"]
    pts_w, nrm = sp.surface_samples(4096, seed=11)
    shadow = sp.analytic_hit(pts_w + 1e-3 * nrm,
                             np.broadcast_to(sp.LIGHT, pts_w.shape).copy())
    lit_side = nrm @ sp.LIGHT > 0.2
    sel_sh = shadow & lit_side
    sel_lit = ~shadow & lit_side

    vis = np.asarray(shadow_net_vis(params["shadow_net"], stage_cfg,
                                    jnp.asarray(pts_w / scale, jnp.float32),
                                    num_lights))  # [N, L]

    # SG lobes nearest the training light, energy-weighted
    lgt = np.asarray(params["envmap_material_network"]["lgtSGs"])
    axes = lgt[:, :3] / np.linalg.norm(lgt[:, :3], axis=-1, keepdims=True)
    energy = np.abs(lgt[:, 4:]).mean(-1)
    toward = axes @ sp.LIGHT
    key_lobes = np.argsort(-(toward * energy))[:5]

    out = {"run": run_dir, "stage": stage,
           "key_lobes_toward_light": [round(float(toward[i]), 3)
                                      for i in key_lobes]}
    kv = vis[:, key_lobes].mean(-1)
    out["keylobe_vis_lit"] = round(float(kv[sel_lit].mean()), 4)
    out["keylobe_vis_shadow"] = round(float(kv[sel_sh].mean()), 4)
    out["all_lobe_vis_lit"] = round(float(vis[sel_lit].mean()), 4)
    out["all_lobe_vis_shadow"] = round(float(vis[sel_sh].mean()), 4)
    return out


if __name__ == "__main__":
    for d in sys.argv[1:]:
        print(json.dumps(diag(d)))
