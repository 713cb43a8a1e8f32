"""Quality + throughput A/B for NeuS importance-sampling round counts.

VERDICT r4 next #4 names "fewer importance rounds with a quality A/B" as
a render-FLOP lever (the reference's 4 rounds are a config, not physics:
``neus/volume_render/sdf_render.py:292-306``). Total importance samples
stay 64 either way; 2 rounds draw 32/round with the inv_s doubling
schedule truncated at 128 (vs 512) — the hypothesis is the early rounds
do the work at train batch sizes.

Per variant this measures BOTH:
- trained quality: 1500-step training on the procedural two-sphere scene
  (the r2 bf16 A/B protocol), test PSNR + mesh median error;
- step time: scan-chained train-step timing at reference constants
  (bench.py protocol, same model/shapes).

Writes one JSON line per variant.
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def time_step(up_sample_steps: int) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from robir_tpu.fields.neus_model import NeuS, NeuSConfig, init_neus
    from robir_tpu.render.neus import NeusRenderConfig, Rays, render_neus
    from robir_tpu.tools.profiler import time_scanned_reps

    cfg = NeuSConfig()
    cfg = dataclasses.replace(
        cfg,
        sdf=dataclasses.replace(cfg.sdf, storage_dtype="bfloat16"),
        color=dataclasses.replace(cfg.color, storage_dtype="bfloat16"))
    rcfg = NeusRenderConfig(n_samples=64, n_importance=64,
                            up_sample_steps=up_sample_steps)
    params = init_neus(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(5e-4)
    opt_state = opt.init(params)
    batch = 512
    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0, 0, 3.0]], np.float32), (batch, 1))
    d = rng.uniform(-0.3, 0.3, (batch, 3)).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((batch, 1), np.float32)
    rays = Rays(*[jnp.asarray(a) for a in
                  [o, d, d, 0 * ones, ones, 1.5 * ones, 4.5 * ones]])

    def one(carry):
        p, s, k = carry
        k, sk = jax.random.split(k)

        def loss(pp):
            out = render_neus(sk, rays, NeuS(pp, cfg), 1.0, rcfg)
            return (jnp.mean((out["rgb"] - 0.5) ** 2)
                    + 0.1 * out["gradient_error"])

        g = jax.grad(loss)(p)
        u, s = opt.update(g, s)
        return optax.apply_updates(p, u), s, k

    reps = time_scanned_reps(one, (params, opt_state, jax.random.PRNGKey(1)),
                             n_steps=20, reps=5)
    best = min(reps)
    return {"step_ms": round(best * 1e3, 3),
            "step_ms_reps": [round(t * 1e3, 3) for t in reps],
            "rays_per_sec": round(batch / best, 1)}


def quality(up_sample_steps: int, out_dir: str, steps: int = 1500) -> dict:
    import importlib.util

    import jax

    from robir_tpu import cli
    from robir_tpu.core import checkpoint as ckpt_lib
    from robir_tpu.core.config import build_stage1_configs
    from robir_tpu.data.synthetic import make_shadow_dataset
    from robir_tpu.fields.neus_model import NeuS, init_neus
    from robir_tpu.texture.mesh import extract_mesh

    spec = importlib.util.spec_from_file_location(
        "shadow_pipeline", os.path.join(REPO, "tools", "shadow_pipeline.py"))
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)

    scene = os.path.join(out_dir, "scene")
    if not os.path.exists(os.path.join(scene, "transforms_train.json")):
        make_shadow_dataset(scene, n_train=16, n_test=2, h=96, w=96,
                            textured=False)
    conf = sp.conf_dict(fast=False)
    conf["train"]["max_steps"] = steps
    conf_path = os.path.join(out_dir, f"conf_u{up_sample_steps}.json")
    with open(conf_path, "w") as fp:
        json.dump(conf, fp)
    logs = os.path.join(out_dir, f"logs_u{up_sample_steps}")
    cli.main(["neus", "--conf", conf_path, "--data", scene,
              "--log_dir", logs, "--n_iters", str(steps),
              "--set", f"render.up_sample_steps={up_sample_steps}"])
    desc = json.load(open(os.path.join(logs, "NeuS", "neus",
                                       "description.json")))

    _, _, s1_cfg, _ = build_stage1_configs(conf)
    state = {"params": init_neus(jax.random.PRNGKey(0), s1_cfg)}
    state, _ = ckpt_lib.restore_into(
        state, ckpt_lib.latest_path(os.path.join(logs, "NeuS")),
        keep=lambda p: p.startswith("params"))
    mesh = extract_mesh(NeuS(state["params"], s1_cfg).sdf, resolution=192,
                        bbox_min=(-0.95,) * 3, bbox_max=(0.95,) * 3)
    v = np.asarray(mesh.verts)
    d_an = np.minimum(
        np.abs(np.linalg.norm(v - sp.CENTERS[0], axis=-1) - sp.RADII[0]),
        np.abs(np.linalg.norm(v - sp.CENTERS[1], axis=-1) - sp.RADII[1]))
    return {"test_psnr": round(desc["mean_psnr"], 3),
            "mesh_err_median": round(float(np.median(d_an)), 5),
            "mesh_err_p90": round(float(np.percentile(d_an, 90)), 5)}


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/neus_upsample_ab"
    os.makedirs(out_dir, exist_ok=True)
    for rounds in (4, 2):
        rec = {"up_sample_steps": rounds}
        rec.update(time_step(rounds))
        rec.update(quality(rounds, out_dir))
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
