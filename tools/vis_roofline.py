"""Vis-step roofline decomposition (VERDICT r3 next-step 3).

Builds the reference-constant Vis workload (256 px x 512 dirs = 131,072
secondary rays, 8x256 SDF + 4x256 color trunks, 4x256 visibility MLP,
256^3 grid) and reports, per component:

  * XLA cost_analysis FLOPs + bytes accessed (compile-time, exact for the
    emitted HLO; scan bodies counted once — flagged where it matters),
  * measured wall time on the current backend (chain-in-scan, min of reps)
    when ROBIR_ROOFLINE_TIME=1 (use on the TPU; CPU times are not the
    roofline's subject).

Components are compiled standalone at the step's true shapes so the
whole-step time can be attributed: grid march over the fan, borrow_color
(the 16-sample frozen-NeuS render at contributing rays), the visibility
MLP forward(+backward), the indirect-net forward(+backward), and the
loss/optimizer tail. docs/ROOFLINE_VIS.md holds the written analysis.

Usage:
  JAX_PLATFORMS=cpu python tools/vis_roofline.py          # FLOP/byte table
  ROBIR_ROOFLINE_TIME=1 python tools/vis_roofline.py      # + timings (TPU)
"""

import json
import os
import sys

import numpy as np

if os.environ.get("ROBIR_ROOFLINE_CPU") or not os.environ.get(
        "ROBIR_ROOFLINE_TIME"):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

NPX = int(os.environ.get("ROBIR_ROOFLINE_NPX", 256))
NSAMP = int(os.environ.get("ROBIR_ROOFLINE_NSAMP", 512))
FAN = NPX * NSAMP


def build():
    import dataclasses

    from robir_tpu.render.stage2 import Stage2Config
    from robir_tpu.stages.stage2_runner import init_stage2_params

    cfg = Stage2Config(grid=dataclasses.replace(
        Stage2Config().grid, bbox_min=(-0.45,) * 3, bbox_max=(0.45,) * 3))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    R = cfg.grid.resolution
    ax = [np.linspace(cfg.grid.bbox_lo[i], cfg.grid.bbox_hi[i], R,
                      dtype=np.float32) for i in range(3)]
    g = np.stack(np.meshgrid(*ax, indexing="ij"), -1)
    grid = jnp.asarray(np.linalg.norm(g, axis=-1) - 0.25, cfg.grid.store)
    return cfg, params, grid


def cost(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    c = compiled.cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return compiled, {"gflop": round(c.get("flops", 0) / 1e9, 2),
                      "gbytes": round(c.get("bytes accessed", 0) / 1e9, 3)}


def timed(step_fn, carry, n_steps=8, reps=4):
    """ms/iteration with the component chained inside one jitted lax.scan
    (dispatch-loop timing is meaningless through the axon relay — the
    first draft of this tool measured the standalone march SLOWER than
    the whole step that contains it). ``step_fn`` must be carry -> carry
    with a data dependency on its own output so XLA cannot hoist it."""
    from robir_tpu.tools.profiler import time_scanned
    return time_scanned(step_fn, carry, n_steps=n_steps, reps=reps) * 1e3


def _feed(x, *outs):
    """Re-inject a negligible function of ``outs`` into ``x`` to chain
    scan iterations without changing the workload (1e-30 * sum)."""
    eps = sum(jnp.sum(o) * 1e-30 for o in outs)
    return x + eps.astype(x.dtype)


def main():
    do_time = bool(os.environ.get("ROBIR_ROOFLINE_TIME"))
    cfg, params, grid = build()

    from robir_tpu.render.stage2 import Stage2Model, stage2_forward, \
        trace_radiance
    from robir_tpu.fields.visibility import indirect_apply, visnet_apply
    from robir_tpu.tracing.grid import grid_cast

    model = Stage2Model(params, cfg, grid)
    rng = np.random.default_rng(0)

    # fan rays from near-surface origins (realistic mix of exits and hits)
    p = rng.standard_normal((FAN, 3)).astype(np.float32)
    p /= np.linalg.norm(p, axis=-1, keepdims=True)
    o_fan = jnp.asarray(p * 0.26)
    d = rng.standard_normal((FAN, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d_fan = jnp.asarray(d)

    rows = {}

    # 1. grid march over the fan (liveness-compacted, as in the step)
    compiled, c = cost(lambda o, dd: grid_cast(grid, cfg.grid, o, dd),
                       o_fan, d_fan)
    rows["march_fan"] = c
    if do_time:
        def march_step(carry):
            o, dd = carry
            t, hit, x = grid_cast(grid, cfg.grid, o, dd)
            return _feed(o, t, x), dd

        rows["march_fan"]["ms"] = round(timed(march_step, (o_fan, d_fan)), 2)

    # 2. borrow_color at the contributing fraction (~25% of the fan after
    #    hit & front & surface masking — CLAUDE.md round-3 measurement)
    n_bc = FAN // 4
    compiled, c = cost(lambda x, dd: model.borrow_color(x, dd),
                       o_fan[:n_bc], d_fan[:n_bc])
    rows["borrow_color_25pct"] = c
    if do_time:
        def bc_step(carry):
            x, dd = carry
            rgb = model.borrow_color(x, dd)
            return _feed(x, rgb), dd

        rows["borrow_color_25pct"]["ms"] = round(
            timed(bc_step, (o_fan[:n_bc], d_fan[:n_bc])), 2)

    # 3. visibility MLP fwd+bwd over the fan (the trained loss path)
    def vis_loss(vp, x, dd):
        logits = visnet_apply(vp, cfg.visnet, x, dd)
        return jnp.mean(jax.nn.log_softmax(logits)[:, 1])

    vg = jax.grad(vis_loss)
    compiled, c = cost(vg, params["visibility_network"], o_fan, d_fan)
    rows["visnet_fwd_bwd_fan"] = c
    if do_time:
        def vis_sgd(vp):
            g = vg(vp, o_fan, d_fan)
            return jax.tree_util.tree_map(lambda p, gg: p - 1e-12 * gg,
                                          vp, g)

        rows["visnet_fwd_bwd_fan"]["ms"] = round(
            timed(vis_sgd, params["visibility_network"]), 2)

    # 4. indirect net fwd+bwd at the pixel batch
    o_px = o_fan[:NPX]
    shift = jnp.full((NPX, 1), 0.5)

    def ind_loss(ip, x, s):
        sgs, integral = indirect_apply(ip, cfg.indirect, x, s,
                                       key=jax.random.PRNGKey(0))
        return jnp.mean(sgs) + jnp.mean(integral)

    ig = jax.grad(ind_loss)
    compiled, c = cost(ig, params["indirect_illum_network"], o_px, shift)
    rows["indirect_fwd_bwd_px"] = c
    if do_time:
        def ind_sgd(ip):
            g = ig(ip, o_px, shift)
            return jax.tree_util.tree_map(lambda p, gg: p - 1e-12 * gg,
                                          ip, g)

        rows["indirect_fwd_bwd_px"]["ms"] = round(
            timed(ind_sgd, params["indirect_illum_network"]), 2)

    # 5. the whole train step, for the attribution denominator
    from robir_tpu.stages.stage2_runner import (StageOptConfig, make_adam,
                                                split_params)
    from robir_tpu.stages.vis import VisStageConfig, make_vis_step

    vcfg = VisStageConfig(num_pixels=NPX, nsamp=NSAMP,
                          opt=StageOptConfig(lr=5e-4))
    vis_opt, illum_opt = make_adam(vcfg.opt), make_adam(vcfg.opt)
    vis_p, rest = split_params(params, ("visibility_network",))
    illum_p, frozen = split_params(rest, ("indirect_illum_network",))
    vstate, istate = vis_opt.init(vis_p), illum_opt.init(illum_p)
    step = make_vis_step(cfg, vcfg, vis_opt, illum_opt)
    # batch['points'] are CAMERA locations (stage2_forward traces primary
    # rays from them): place cameras outside the scene and AIM at the
    # sphere so ~all pixels are surface pixels and the secondary fan
    # really marches — random dirs mostly miss, which silently idled the
    # in-step march and made WHOLE_STEP unrepresentatively cheap in the
    # first draft of this tool.
    cams = o_fan[:NPX] * 4.0
    aim = -cams + 0.05 * d_fan[:NPX]
    aim = aim / jnp.linalg.norm(aim, axis=-1, keepdims=True)
    batch = {"points": cams, "dirs": aim,
             "object_mask": jnp.ones((NPX,), bool),
             "hdr_shift": shift}
    args = (vis_p, illum_p, frozen, vstate, istate, grid, batch,
            jax.random.PRNGKey(0))
    lowered = step.lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    rows["WHOLE_STEP"] = {"gflop": round(ca.get("flops", 0) / 1e9, 2),
                          "gbytes": round(ca.get("bytes accessed", 0) / 1e9,
                                          3)}
    if do_time:
        def full_step(carry):
            vp, ip, vs, ist, key = carry
            key, sub = jax.random.split(key)
            vp, ip, vs, ist, _ = step(vp, ip, frozen, vs, ist, grid,
                                      batch, sub)
            return vp, ip, vs, ist, key

        rows["WHOLE_STEP"]["ms"] = round(
            timed(full_step,
                  (vis_p, illum_p, vstate, istate, jax.random.PRNGKey(0)),
                  n_steps=4), 2)

    print(json.dumps({"npx": NPX, "nsamp": NSAMP, "backend":
                      jax.devices()[0].platform, "rows": rows}, indent=1))


if __name__ == "__main__":
    main()
