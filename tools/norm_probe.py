"""Probe the trained Norm-stage AE normal map against analytic normals.

Diagnostic for the CESR shadow/lit-ratio drift bisection (VERDICT r4
next #2): the r4 mesh-coordinate fix changed the Norm stage's training
distribution (rounds 2-3 accidentally trained the decoder at world/4),
and the drift timeline coincides. This measures what the decoder
actually learned: mean cosine between the AE normal map and the analytic
sphere normal at true surface points (stage-2 coords), for any
shadow_pipeline run dir or bisect subdir.

Usage: python tools/norm_probe.py RUNDIR [RUNDIR...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def probe(run_dir: str) -> dict:
    import jax
    import jax.numpy as jnp

    from robir_tpu.core import checkpoint as ckpt_lib
    from robir_tpu.core.config import build_stage2_config
    from robir_tpu.fields.encoding import integrated_pos_enc
    from robir_tpu.fields.sparse_ae import sparse_ae_apply
    from robir_tpu.stages.stage2_runner import init_stage2_params

    # run dir may be a bisect subdir (conf.json beside logs/) or the
    # top-level pipeline dir
    conf = json.load(open(os.path.join(run_dir, "conf.json")))
    cfg2 = build_stage2_config(conf["model"])
    params = init_stage2_params(jax.random.PRNGKey(0), cfg2)
    ck = os.path.join(run_dir, "logs", "Norm", "checkpoints", "latest.npz")
    params, _ = ckpt_lib.restore_into(params, ck, ignore_unknown=True)
    env_cfg = cfg2.envmap

    rng = np.random.default_rng(3)
    n = np.asarray(rng.standard_normal((4096, 3)), np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    scale = conf["dataset"]["pose_scale"]
    pts_s2 = n * 0.5 / scale  # world radius 0.5 -> stage-2 coords

    pts_ipe = integrated_pos_enc(jnp.asarray(pts_s2),
                                 jnp.full_like(jnp.asarray(pts_s2), 1e-5),
                                 env_cfg.ipe)
    ae = params["envmap_material_network"]["normal_decoder_layer"]
    normal, _ = sparse_ae_apply(ae, env_cfg.normal_ae, pts_ipe,
                                jax.random.PRNGKey(0))
    normal = np.array(normal)
    normal /= np.clip(np.linalg.norm(normal, axis=-1, keepdims=True),
                      1e-4, None)
    cos = (normal * n).sum(-1)
    return {"run": run_dir, "normal_cos_mean": round(float(cos.mean()), 4),
            "normal_cos_p10": round(float(np.percentile(cos, 10)), 4)}


if __name__ == "__main__":
    for d in sys.argv[1:]:
        print(json.dumps(probe(d)))
