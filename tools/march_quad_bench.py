"""A/B the quad-row march layout (GridConfig.quad_rows) on the chip.

Scan-times grid_cast over the reference-constant Vis fan (131,072
secondary rays, 256^3 analytic sphere grid) with the layout off and on,
plus the whole Vis train step both ways. Rationale: the blocked-gather
experiment showed the march is per-row-FETCH bound, so one 4R-wide
gather per trilinear lookup (quad) should beat four R-wide gathers.

Usage (TPU):  python tools/march_quad_bench.py
Optional argv: [npx] [nsamp] (defaults 256 512).
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


def main():
    npx = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nsamp = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    fan = npx * nsamp

    from robir_tpu.render.stage2 import Stage2Config
    from robir_tpu.stages.stage2_runner import (StageOptConfig,
                                                init_stage2_params,
                                                make_adam, split_params)
    from robir_tpu.stages.vis import VisStageConfig, make_vis_step
    from robir_tpu.tools.profiler import time_scanned
    from robir_tpu.tracing.grid import grid_cast

    base = Stage2Config()
    res = int(os.environ.get("ROBIR_QUAD_RES", 0))
    store = os.environ.get("ROBIR_QUAD_STORE") or None
    base = dataclasses.replace(base, grid=dataclasses.replace(
        base.grid, bbox_min=(-0.45,) * 3, bbox_max=(0.45,) * 3,
        resolution=res or base.grid.resolution,
        storage_dtype=store or base.grid.storage_dtype,
        over_relax=float(os.environ.get("ROBIR_QUAD_OVERRELAX", 0.0))))
    params = init_stage2_params(jax.random.PRNGKey(0), base)
    R = base.grid.resolution
    ax = [np.linspace(base.grid.bbox_lo[i], base.grid.bbox_hi[i], R,
                      dtype=np.float32) for i in range(3)]
    g = np.stack(np.meshgrid(*ax, indexing="ij"), -1)
    grid = jnp.asarray(np.linalg.norm(g, axis=-1) - 0.25, base.grid.store)

    rng = np.random.default_rng(0)
    p = rng.standard_normal((fan, 3)).astype(np.float32)
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    o_fan = jnp.asarray(p * 0.26)
    d = rng.standard_normal((fan, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d_fan = jnp.asarray(d)

    out = {"fan": fan, "resolution": R,
           "backend": jax.devices()[0].platform}

    from robir_tpu.tracing.grid import bake_march_layout

    for name, quad in (("rows", False), ("quad", True)):
        cfg = dataclasses.replace(base, grid=dataclasses.replace(
            base.grid, quad_rows=quad))
        buf = bake_march_layout(grid, cfg.grid)   # shipped semantics:
        # runners bake the layout host-side once per grid refresh. The
        # buffer rides in the CARRY (a runtime input): closing over it
        # bakes a 268 MB constant into the HLO and the remote compile
        # request, which the axon relay rejects (HTTP 413).

        def march_step(carry, cfg=cfg):
            o, dd, b = carry
            t, hit, x = grid_cast(b, cfg.grid, o, dd)
            eps = (jnp.sum(t) + jnp.sum(x)) * 1e-30
            return o + eps.astype(o.dtype), dd, b

        ms = time_scanned(march_step, (o_fan, d_fan, buf), n_steps=8) * 1e3
        out[f"march_ms_{name}"] = round(ms, 2)
        if os.environ.get("ROBIR_QUAD_MARCH_ONLY"):
            continue

        vcfg = VisStageConfig(num_pixels=npx, nsamp=nsamp,
                              opt=StageOptConfig(lr=5e-4))
        vis_opt, illum_opt = make_adam(vcfg.opt), make_adam(vcfg.opt)
        vis_p, rest = split_params(params, ("visibility_network",))
        illum_p, frozen = split_params(rest, ("indirect_illum_network",))
        vstate, istate = vis_opt.init(vis_p), illum_opt.init(illum_p)
        step = make_vis_step(cfg, vcfg, vis_opt, illum_opt)
        # cameras outside the scene, aimed at the sphere: ~all pixels hit,
        # so the secondary fan really marches (see vis_roofline.py)
        cams = o_fan[:npx] * 4.0
        aim = -cams + 0.05 * d_fan[:npx]
        aim = aim / jnp.linalg.norm(aim, axis=-1, keepdims=True)
        batch = {"points": cams, "dirs": aim,
                 "object_mask": jnp.ones((npx,), bool),
                 "hdr_shift": jnp.full((npx, 1), 0.5)}

        def full_step(carry, step=step, batch=batch):
            vp, ip, vs, ist, key, b = carry
            key, sub = jax.random.split(key)
            vp, ip, vs, ist, _ = step(vp, ip, frozen, vs, ist, b,
                                      batch, sub)
            return vp, ip, vs, ist, key, b

        ms = time_scanned(
            full_step,
            (vis_p, illum_p, vstate, istate, jax.random.PRNGKey(0), buf),
            n_steps=4) * 1e3
        out[f"vis_step_ms_{name}"] = round(ms, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
