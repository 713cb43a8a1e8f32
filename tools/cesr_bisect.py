"""Bisect the CESR shadow/lit-ratio drift (VERDICT r4 next #2).

The round-5 plain full-schedule run measured ratio 1.169 (> the 1.15
plain bound; trend 1.02 r2 -> 1.11 r3 -> 1.169 r5), confirming real
drift. This tool reruns a suffix of the stage chain from the completed
run's checkpoints with config overrides, so each suspect is isolated at
the cost of only the stages it touches:

  # r3 suspect: compacted-shade RNG / compaction itself
  python tools/cesr_bisect.py --src /tmp/r5_runs/shadow_plain \
      --name A_dense --from-stage cesr --set cesr.compact_chunk=0

  # r4 suspect: mesh-coordinate fix (Norm trained at world/4 in r2-r3)
  python tools/cesr_bisect.py --src /tmp/r5_runs/shadow_plain \
      --name B_meshscale --from-stage norm --mesh-scale 0.5

Prints the PBR/CESR albedo shadow/lit ratios (same math as
tools/shadow_pipeline.py) as one JSON line.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_spec = importlib.util.spec_from_file_location(
    "shadow_pipeline", os.path.join(REPO, "tools", "shadow_pipeline.py"))
sp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sp)

STAGE_ORDER = ["norm", "vis", "pbr", "cesr"]
UPSTREAM = {"norm": ["NeuS"], "vis": ["NeuS", "Norm"],
            "pbr": ["NeuS", "Norm", "Vis"],
            "cesr": ["NeuS", "Norm", "Vis", "PBR"]}


def albedo_metrics(ckpt_path, conf, scale, textured):
    import jax
    import jax.numpy as jnp

    from robir_tpu.core import checkpoint as ckpt_lib
    from robir_tpu.core.config import build_stage2_config
    from robir_tpu.data.synthetic import textured_albedo
    from robir_tpu.render.stage2 import Stage2Model
    from robir_tpu.stages.stage2_runner import init_stage2_params

    cfg2 = build_stage2_config(conf["model"])
    p, _ = ckpt_lib.restore_into(
        init_stage2_params(jax.random.PRNGKey(0), cfg2), ckpt_path,
        ignore_unknown=True)
    model = Stage2Model(p, cfg2)
    pts_all, nrm_all = sp.surface_samples(4096, seed=11)
    shadow = sp.analytic_hit(pts_all + 1e-3 * nrm_all,
                             np.broadcast_to(sp.LIGHT, pts_all.shape).copy())
    lit_side = nrm_all @ sp.LIGHT > 0.2
    sel_shadow = shadow & lit_side
    sel_lit = ~shadow & lit_side
    mat = model.material(jnp.asarray(pts_all / scale, jnp.float32))
    alb = np.asarray(mat.diffuse_albedo)
    gt = (textured_albedo(pts_all) if textured
          else np.broadcast_to(sp.ALBEDO0, pts_all.shape).astype(np.float32))
    rel = alb / np.clip(gt, 1e-3, None)
    ratio = float(rel[sel_shadow].mean() / (rel[sel_lit].mean() + 1e-9))
    sscale = float((alb * gt).sum() / np.clip((alb * alb).sum(), 1e-9, None))
    psnr = float(-10 * np.log10(np.mean((sscale * alb - gt) ** 2) + 1e-12))
    return ratio, psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True,
                    help="completed shadow_pipeline run dir")
    ap.add_argument("--name", required=True)
    ap.add_argument("--from-stage", default="cesr", choices=STAGE_ORDER)
    ap.add_argument("--set", dest="overrides", action="append", default=[])
    ap.add_argument("--mesh-scale", type=float, default=None,
                    help="rescale the stage-1 mesh before Norm (0.5 "
                         "reproduces the pre-r4 coordinate bug)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--iters", action="append", default=[],
                    help="stage=count override, e.g. --iters cesr=1800")
    args = ap.parse_args()

    from robir_tpu import cli

    conf = json.load(open(os.path.join(args.src, "conf.json")))
    dst = os.path.join(args.src, "bisect", args.name)
    logs = os.path.join(dst, "logs")
    os.makedirs(logs, exist_ok=True)
    for stage_dir in UPSTREAM[args.from_stage]:
        link = os.path.join(logs, stage_dir)
        if not os.path.exists(link):
            os.symlink(os.path.join(args.src, "logs", stage_dir), link)

    mesh_path = os.path.join(args.src, "mesh.ply")
    if args.mesh_scale is not None:
        from robir_tpu.texture.mesh import Mesh
        m = Mesh.load_ply(mesh_path)
        m2 = Mesh(np.asarray(m.verts, np.float32) * args.mesh_scale,
                  np.asarray(m.tris))
        mesh_path = os.path.join(dst, "mesh_scaled.ply")
        m2.export_ply(mesh_path)

    conf_path = os.path.join(dst, "conf.json")
    with open(conf_path, "w") as fp:
        json.dump(conf, fp)

    scene = os.path.join(args.src, "scene")
    common = ["--conf", conf_path, "--data", scene, "--log_dir", logs,
              "--seed", str(args.seed)]
    for ov in args.overrides:
        common += ["--set", ov]
    n_iters = {"norm": conf["norm"]["max_iters"], "vis": 800, "pbr": 2000,
               "cesr": 600}
    for ov in args.iters:
        stage, _, count = ov.partition("=")
        n_iters[stage] = int(count)
    result_iters = dict(n_iters)

    result = {"name": args.name, "overrides": args.overrides,
              "mesh_scale": args.mesh_scale, "from": args.from_stage,
              "iters": {s: result_iters[s]
                        for s in STAGE_ORDER[STAGE_ORDER.index(
                            args.from_stage):]}}
    start = STAGE_ORDER.index(args.from_stage)
    for stage in STAGE_ORDER[start:]:
        argv = [stage, *common, "--n_iters", str(n_iters[stage])]
        if stage == "norm":
            argv += ["--mesh", mesh_path]
        t0 = time.time()
        print(f"=== {args.name} {stage}", flush=True)
        cli.main(argv)
        result[f"{stage}_seconds"] = round(time.time() - t0, 1)

    scale = conf["dataset"]["pose_scale"]
    textured = bool(json.load(open(os.path.join(
        args.src, "pipeline_metrics.json"))).get("textured"))
    for stage, key in (("PBR", "ratio_pbr"), ("CESR", "ratio_cesr")):
        ck = os.path.join(logs, stage, "checkpoints", "latest.npz")
        if os.path.exists(ck):
            r, psnr = albedo_metrics(ck, conf, scale, textured)
            result[key] = round(r, 4)
            result[key.replace("ratio", "albedo_psnr")] = round(psnr, 2)
    print(json.dumps(result), flush=True)
    with open(os.path.join(dst, "bisect_metrics.json"), "w") as fp:
        json.dump(result, fp, indent=1)


if __name__ == "__main__":
    main()
