"""Benchmark: NeuS stage-1 training throughput (rays/sec/chip).

Methodology: K train steps are chained inside ONE jitted lax.scan and timed
to a host fetch, repeated several times taking the best — this defeats two
artifacts of the tunneled-TPU environment: per-dispatch latency (~0.5 ms)
and intermittent multi-second relay stalls. Workload is the reference's own
constants: 512 rays/step, 64 coarse + 64 importance samples, 8x256 SDF +
4x256 color trunks (neus/config/blender.gin:19, sdf_render.py:241-244).

Baseline derivation (the reference publishes no throughput numbers, so the
baseline is derived from the upstream workload's published wall-clock):

- NeuS stage-1: the official NeuS repo (which the reference's neus/ tree
  embeds, neus/config/blender.gin:19 batch_size=512) documents ~300k iters
  in ~14-16h on the original paper's GPU: 300000 / (15*3600 s) = 5.6 it/s
  * 512 rays = ~2.8k rays/s. A ~2x-faster modern single GPU (the hardware
  class the reference targets) => ~5.6k rays/s. That arithmetic, not a
  measurement, is the 5600 below — an ESTIMATE.
- PBR stage-2: reference trains 40k iters at 1024 px/iter
  (confs_sg/hotdog.conf:9 num_pixels, train_pbr.py); InvRender-family
  stage-2 runs at this scale are reported around 4-6h for 40k iters on a
  modern GPU => 40000/(4.5*3600) = 2.5 it/s => ~2.5k px/s. ESTIMATE.

``vs_baseline`` = measured rays/s/chip / estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# ESTIMATES derived from published wall-clock (see module docstring) — the
# reference itself publishes no throughput numbers.
REFERENCE_RAYS_PER_SEC = 5600.0
REFERENCE_PBR_PX_PER_SEC = 2500.0
BATCH = 512
SCAN_STEPS = 20
REPS = 6


def main():
    stage = os.environ.get("ROBIR_BENCH_STAGE", "neus")
    if stage == "pbr":
        return main_pbr()
    if stage == "extra":
        return main_extra()
    return main_neus()


def _stage2_setup_bench():
    """Reference-scale stage-2 model + baked grid shared by the PBR/Vis/
    eval metrics (bf16 sweep trunk, the shipped hotdog.json config)."""
    import dataclasses

    import jax

    from robir_tpu.render.stage2 import Stage2Config, Stage2Model
    from robir_tpu.stages.stage2_runner import init_stage2_params
    from robir_tpu.tracing.grid import build_sdf_grid

    cfg = Stage2Config()
    cfg = dataclasses.replace(
        cfg, visnet=dataclasses.replace(cfg.visnet,
                                        storage_dtype="bfloat16"),
        # mirror the shipped stage-2 configs: quad layout + bf16 grid
        grid=dataclasses.replace(cfg.grid, quad_rows=True,
                                 storage_dtype="bfloat16"))
    if os.environ.get("ROBIR_BENCH_SMOKE"):
        cfg = dataclasses.replace(
            cfg, grid=dataclasses.replace(cfg.grid, resolution=48))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    from robir_tpu.tracing.grid import bake_march_layout
    grid = bake_march_layout(
        build_sdf_grid(Stage2Model(params, cfg).sdf, cfg.grid), cfg.grid)
    return cfg, params, grid


def _pbr_batch(n, surface_frac=1.0, seed=0):
    """Pixel batch with ~surface_frac of rays hitting the init sphere
    (|x|=0.5 stage-2): hit rays aim at the center from radius 0.55; miss
    rays aim outward (the realistic-coverage workload the compaction is
    for)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    o = rng.standard_normal((n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 0.55
    d = -o / 0.55
    miss = rng.random(n) >= surface_frac
    d[miss] = -d[miss]
    return {"points": jnp.asarray(o), "dirs": jnp.asarray(d),
            "object_mask": jnp.ones((n,), bool),
            "rgb": jnp.full((n, 3), 0.5)}


def _measure_pbr(cfg, params, grid, batch, compact_chunk, n,
                 k_steps=8, reps=4):
    import jax

    from robir_tpu.stages.pbr import PBRStageConfig, make_pbr_step
    from robir_tpu.stages.stage2_runner import (StageOptConfig, make_adam,
                                                split_params)

    opt = make_adam(StageOptConfig(lr=5e-4))
    trainable, frozen = split_params(params, ("gamma",
                                              "envmap_material_network"))
    opt_state = opt.init(trainable)
    step = make_pbr_step(cfg, PBRStageConfig(num_pixels=n,
                                             compact_chunk=compact_chunk),
                         opt, jit=False)

    # grid as a jit ARGUMENT: a closed-over quad-layout buffer embeds a
    # ~268 MB HLO constant and the relay rejects the compile (HTTP 413)
    def multi(trainable, opt_state, key, grid):
        def body(c, k):
            t, s = c
            t, s, m = step(t, frozen, s, grid, batch, k)
            return (t, s), m["loss"]

        return jax.lax.scan(body, (trainable, opt_state),
                            jax.random.split(key, k_steps))

    f = jax.jit(multi)
    out = f(trainable, opt_state, jax.random.PRNGKey(0), grid)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        out = f(trainable, opt_state, jax.random.PRNGKey(rep + 1), grid)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / k_steps)
    return best


def main_pbr():
    """Secondary metric: PBR-stage training throughput at reference scale
    (1024 px/iter, 128 light SGs; hotdog.conf:9,94-108). Select with
    ROBIR_BENCH_STAGE=pbr.

    compact_chunk=0: this workload is ALL-HIT (every ray on-surface), so
    surface-pixel compaction can only add overhead — keep the metric
    comparable across rounds. Compaction wins on realistic camera batches
    are in BENCH_extra.json (ROBIR_BENCH_STAGE=extra)."""
    import jax

    cfg, params, grid = _stage2_setup_bench()
    n = 1024
    best = _measure_pbr(cfg, params, grid, _pbr_batch(n), 0, n)
    per_chip = n / best / len(jax.devices())
    print(json.dumps({
        "metric": "pbr_train_pixels_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "px/s/chip",
        "vs_baseline": round(per_chip / REFERENCE_PBR_PX_PER_SEC, 3),
    }))


def main_extra():
    """Multi-metric record (VERDICT r3 weak #4): PBR px/s all-hit + at
    realistic 20% surface coverage (compacted), the Vis-stage step time at
    reference constants, and the forward-only eval-render px/s (the
    relight path, surface-pixel compaction ON). Writes BENCH_extra.json
    next to this file and prints it as the JSON line."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    smoke = bool(os.environ.get("ROBIR_BENCH_SMOKE"))
    cfg, params, grid = _stage2_setup_bench()
    n_chips = len(jax.devices())
    extra = {}

    # 1+2: PBR train px/s, all-hit (dense) and 20%-surface (compacted)
    n = 256 if smoke else 1024
    best = _measure_pbr(cfg, params, grid, _pbr_batch(n), 0, n,
                        k_steps=2 if smoke else 8, reps=2 if smoke else 4)
    extra["pbr_train_px_per_sec_allhit_dense"] = round(n / best / n_chips, 1)
    best = _measure_pbr(cfg, params, grid,
                        _pbr_batch(n, surface_frac=0.2), 128, n,
                        k_steps=2 if smoke else 8, reps=2 if smoke else 4)
    extra["pbr_train_px_per_sec_20pct_compacted"] = round(
        n / best / n_chips, 1)

    # 3: Vis step at reference constants (256 px x 512 dirs)
    from robir_tpu.stages.stage2_runner import (StageOptConfig, make_adam,
                                                split_params)
    from robir_tpu.stages.vis import VisStageConfig, make_vis_step

    npx, nsamp = (64, 32) if smoke else (256, 512)
    vcfg = VisStageConfig(num_pixels=npx, nsamp=nsamp,
                          opt=StageOptConfig(lr=5e-4))
    vis_opt, illum_opt = make_adam(vcfg.opt), make_adam(vcfg.opt)
    vis_p, rest = split_params(params, ("visibility_network",))
    illum_p, frozen = split_params(rest, ("indirect_illum_network",))
    vstate, istate = vis_opt.init(vis_p), illum_opt.init(illum_p)
    step = make_vis_step(cfg, vcfg, vis_opt, illum_opt)
    b = _pbr_batch(npx, surface_frac=0.35, seed=2)
    batch = {"points": b["points"], "dirs": b["dirs"],
             "object_mask": b["object_mask"],
             "hdr_shift": jnp.full((npx, 1), 0.5)}

    # scan-chained (dispatch-loop timing through the relay is unreliable);
    # grid in the carry = a runtime input, as the runner passes it
    from robir_tpu.tools.profiler import time_scanned

    def one_vis(carry):
        vp, ip, vs, ist, k, g = carry
        k, sk = jax.random.split(k)
        vp, ip, vs, ist, _ = step(vp, ip, frozen, vs, ist, g, batch, sk)
        return vp, ip, vs, ist, k, g

    best = time_scanned(
        one_vis, (vis_p, illum_p, vstate, istate, jax.random.PRNGKey(1),
                  grid),
        n_steps=2 if smoke else 8, reps=2 if smoke else 4)
    extra["vis_step_ms"] = round(best * 1e3, 1)
    extra["vis_step_px"] = npx
    extra["vis_step_nsamp"] = nsamp

    # 4: eval-render px/s (forward-only, compaction ON — the relight path);
    # a realistic whole-frame chunk is mostly empty (object ~1/3 of rays)
    from robir_tpu.render.stage2 import Stage2Model, stage2_forward
    from robir_tpu.render.color import hdr2ldr

    ne = 1024 if smoke else 8192
    be = _pbr_batch(ne, surface_frac=0.33, seed=3)

    def one_eval(carry):
        acc, k, g = carry
        k, sk = jax.random.split(k)
        m = Stage2Model(params, cfg, g)
        inp = {"points": be["points"], "dirs": be["dirs"],
               "hdr_shift": jnp.full((ne, 1), 0.5)}
        o = stage2_forward(m, sk, inp, trainstage="Material",
                           compact_chunk=512)
        rgb = hdr2ldr(m.params["gamma"], cfg.tonemap,
                      o["sg_rgb"] + o["indir_rgb"])
        # sum over the full output so XLA cannot dead-code-eliminate the
        # per-pixel epilogue down to one consumed element
        return acc + jnp.sum(rgb), k, g

    best = time_scanned(
        one_eval, (jnp.float32(0.0), jax.random.PRNGKey(0), grid),
        n_steps=2 if smoke else 6, reps=2 if smoke else 4)
    extra["eval_render_px_per_sec"] = round(ne / best / n_chips, 1)

    extra["smoke"] = smoke
    extra["n_chips"] = n_chips
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_extra.json")
    with open(path, "w") as fp:
        json.dump(extra, fp, indent=1)
    print(json.dumps(extra))


def main_neus():
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from robir_tpu.fields.neus_model import NeuS, NeuSConfig, init_neus
    from robir_tpu.render.neus import NeusRenderConfig, Rays, render_neus

    # the shipped TPU training config (configs/neus_blender.json): bf16
    # activation storage on the HBM-bandwidth-bound trunks, fp32 weights
    # and accumulation — quality-neutral in the 1500-step A/B recorded in
    # STATUS.md; same workload semantics as the reference constants.
    cfg = NeuSConfig()
    cfg = dataclasses.replace(
        cfg,
        sdf=dataclasses.replace(cfg.sdf, storage_dtype="bfloat16"),
        color=dataclasses.replace(cfg.color, storage_dtype="bfloat16"))
    rcfg = NeusRenderConfig(n_samples=64, n_importance=64, up_sample_steps=4)
    params = init_neus(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(5e-4)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0, 0, 3.0]], np.float32), (BATCH, 1))
    d = rng.uniform(-0.3, 0.3, (BATCH, 3)).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((BATCH, 1), np.float32)
    rays = Rays(*[jnp.asarray(a) for a in
                  [o, d, d, 0 * ones, ones, 1.5 * ones, 4.5 * ones]])

    def multi_step(params, opt_state, r, key):
        def body(carry, k):
            p, s = carry

            def loss(pp):
                out = render_neus(k, r, NeuS(pp, cfg), 1.0, rcfg)
                return (jnp.mean((out["rgb"] - 0.5) ** 2)
                        + 0.1 * out["gradient_error"]
                        + jnp.mean(out["acc"] ** 2) * 0.0)

            g = jax.grad(loss)(p)
            u, s = opt.update(g, s)
            return (optax.apply_updates(p, u), s), None

        keys = jax.random.split(key, SCAN_STEPS)
        (p, s), _ = jax.lax.scan(body, (params, opt_state), keys)
        return p, s

    f = jax.jit(multi_step)
    out = f(params, opt_state, rays, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])

    best = float("inf")
    for rep in range(REPS):
        t0 = time.perf_counter()
        out = f(params, opt_state, rays, jax.random.PRNGKey(rep + 1))
        # host fetch forces real completion through the device tunnel
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)

    n_chips = len(jax.devices())
    per_chip = BATCH / best / n_chips

    print(json.dumps({
        "metric": "neus_train_rays_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(per_chip / REFERENCE_RAYS_PER_SEC, 3),
    }))


def _run_with_retries(max_tries: int = 5, timeout_s: int = 900,
                      retry_wait_s: int = 120) -> int:
    """Run the bench in a child process, retrying on hang/crash.

    The tunneled TPU link intermittently stalls for minutes — observed up
    to hours — or drops the backend entirely; a single in-process run
    would hang the whole round's benchmark. The child does the real work
    (ROBIR_BENCH_CHILD=1); the parent enforces a deadline, waits out the
    outage between tries, and forwards the child's final JSON line.
    """
    import subprocess

    env = dict(os.environ, ROBIR_BENCH_CHILD="1")
    last_err = ""
    for attempt in range(max_tries):
        if attempt:
            time.sleep(retry_wait_s)  # give a wedged tunnel time to recover
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True, text=True, timeout=timeout_s, env=env)
        except subprocess.TimeoutExpired:
            last_err = f"attempt {attempt + 1}: timed out after {timeout_s}s"
            print(last_err, file=sys.stderr, flush=True)
            continue
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1], flush=True)
            # secondary multi-metric record (BENCH_extra.json): best-effort,
            # after the headline is safely out — a tunnel stall here must
            # not cost the round its benchmark line
            if not os.environ.get("ROBIR_BENCH_STAGE") and \
                    not os.environ.get("ROBIR_BENCH_NO_EXTRA"):
                try:
                    subprocess.run(
                        [sys.executable, os.path.abspath(__file__)],
                        capture_output=True, text=True, timeout=1800,
                        env=dict(env, ROBIR_BENCH_STAGE="extra"))
                except Exception as e:  # noqa: BLE001
                    print(f"extra metrics skipped: {e}", file=sys.stderr,
                          flush=True)
            return 0
        last_err = (f"attempt {attempt + 1}: rc={proc.returncode} "
                    f"stderr tail: {proc.stderr[-500:]}")
        print(last_err, file=sys.stderr, flush=True)
    print(f"bench failed after {max_tries} attempts: {last_err}",
          file=sys.stderr, flush=True)
    return 1


if __name__ == "__main__":
    if os.environ.get("ROBIR_BENCH_CHILD"):
        sys.exit(main())
    sys.exit(_run_with_retries())
