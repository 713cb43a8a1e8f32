"""NeuS train-step performance study (VERDICT r1 item #1).

Measures, on the real TPU:
  1. MXU matmul throughput for fp32 operands at each matmul precision
     (DEFAULT / bfloat16 / tensorfloat32-ish "high" / HIGHEST) — on TPU an
     fp32 dot is implemented as 1/3/6 bf16 MXU passes depending on this
     setting, so it bounds everything else.
  2. Phase ablation of the bench NeuS train step (512 rays, 64+64 samples,
     reference constants — neus/config/blender.gin:19, sdf_render.py:241-244):
       full train step / fwd render only / sampling phase only /
       render_core only / sdf+grad sweep only / color sweep only.
  3. XLA's own FLOP estimate per phase (compiled cost_analysis) -> achieved
     TFLOP/s and MFU vs the measured matmul peak.

All timings use the scan+min methodology (CLAUDE.md: dispatch-loop timings
are meaningless through the axon relay).

Writes JSON to tools/perf_study_out.json and prints a readable table.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def time_jitted(f, args, n_inner=1, reps=4):
    """Best-of-reps seconds per call of jitted f. f MUST return a scalar
    (fetching anything bigger through the axon relay dominates the timing)."""
    out = f(*args)
    first = np.asarray(jax.tree_util.tree_leaves(out)[0])
    assert first.size == 1, f"timed fn must return a scalar, got {first.shape}"
    float(first.ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n_inner)
    return best


def flops_of(f, *args):
    import jax
    try:
        c = jax.jit(f).lower(*args).compile()
        an = c.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", float("nan")))
    except Exception as e:  # noqa: BLE001
        print("cost_analysis failed:", e, file=sys.stderr)
        return float("nan")


def measure_matmul_peaks(results):
    import jax
    import jax.numpy as jnp

    n = 4096
    L = 64
    a = jnp.ones((n, n), jnp.float32) * (1.0 / n)
    flops_per = 2 * n * n * n * L

    for prec in ["default", "tensorfloat32", "float32", "highest"]:
        try:
            def chain(x, _prec=prec):
                def body(c, _):
                    c = jax.lax.dot(c, c, precision=_prec)
                    c = c * (1.0 / n)  # keep magnitudes bounded, no reduction
                    return c, ()
                out, _ = jax.lax.scan(body, x, None, length=L)
                return jnp.sum(out) * 1e-9

            f = jax.jit(chain)
            t = time_jitted(f, (a,), reps=4)
            tf = flops_per / t / 1e12
            results[f"matmul_peak_{prec}_tflops"] = round(tf, 2)
            print(f"matmul fp32-in precision={prec:14s}: {tf:8.2f} TFLOP/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"precision {prec} failed: {e}", file=sys.stderr)

    # bf16 operands, default precision
    ab = a.astype(jnp.bfloat16)

    def chain_bf16(x):
        def body(c, _):
            c = jax.lax.dot(c, c, preferred_element_type=jnp.bfloat16)
            c = c * jnp.bfloat16(1.0 / n)
            return c, ()
        out, _ = jax.lax.scan(body, x, None, length=L)
        return jnp.sum(out.astype(jnp.float32)) * 1e-9

    t = time_jitted(jax.jit(chain_bf16), (ab,), reps=4)
    tf = flops_per / t / 1e12
    results["matmul_peak_bf16_operands_tflops"] = round(tf, 2)
    print(f"matmul bf16 operands                : {tf:8.2f} TFLOP/s", flush=True)


def neus_phases(results):
    import jax
    import jax.numpy as jnp
    import optax

    from robir_tpu.fields.neus_model import NeuS, NeuSConfig, init_neus
    from robir_tpu.render.neus import (NeusRenderConfig, Rays, render_core,
                                       render_neus)

    cfg = NeuSConfig()
    rcfg = NeusRenderConfig(n_samples=64, n_importance=64, up_sample_steps=4)
    params = init_neus(jax.random.PRNGKey(0), cfg)
    opt = optax.adam(5e-4)
    opt_state = opt.init(params)

    BATCH = 512
    rng = np.random.default_rng(0)
    o = np.tile(np.array([[0, 0, 3.0]], np.float32), (BATCH, 1))
    d = rng.uniform(-0.3, 0.3, (BATCH, 3)).astype(np.float32) - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ones = np.ones((BATCH, 1), np.float32)
    rays = Rays(*[jnp.asarray(x) for x in
                  [o, d, d, 0 * ones, ones, 1.5 * ones, 4.5 * ones]])

    K = 10

    def scan_over(fn, *xs):
        """Chain K calls of fn(key) -> pytree inside one jit."""
        def multi(key, *xs):
            def body(c, k):
                # scale, don't zero: x*0 would let XLA DCE the whole phase
                s = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b).astype(jnp.float32) * 1e-12,
                    fn(k, *xs), 0.0)
                return c + s, ()
            tot, _ = jax.lax.scan(body, 0.0, jax.random.split(key, K))
            return tot
        return jax.jit(multi), (jax.random.PRNGKey(0),) + xs

    def report(name, fn, *xs, flop_fn=None):
        f, args = scan_over(fn, *xs)
        t = time_jitted(f, args, n_inner=K, reps=4)
        fl = flops_of(fn, jax.random.PRNGKey(0), *xs) if flop_fn is None \
            else flop_fn
        tf = fl / t / 1e12 if fl == fl else float("nan")
        results[name] = {"ms": round(t * 1e3, 3), "xla_flops": fl,
                         "achieved_tflops": round(tf, 2) if tf == tf else None}
        print(f"{name:28s}: {t * 1e3:8.3f} ms  "
              f"{fl / 1e9 if fl == fl else float('nan'):8.2f} GF  "
              f"{tf:7.2f} TF/s")
        return t

    # --- full train step ---
    def train_step(key, params, opt_state):
        def loss(pp):
            out = render_neus(key, rays, NeuS(pp, cfg), 1.0, rcfg)
            return (jnp.mean((out["rgb"] - 0.5) ** 2)
                    + 0.1 * out["gradient_error"])
        g = jax.grad(loss)(params)
        u, s = opt.update(g, opt_state)
        return optax.apply_updates(params, u), s

    f, args = scan_over(lambda k, p, s: train_step(k, p, s)[0],
                        params, opt_state)
    t_full = time_jitted(f, args, n_inner=K, reps=4)
    fl_full = flops_of(lambda k: train_step(k, params, opt_state), jax.random.PRNGKey(0))
    results["full_train_step"] = {
        "ms": round(t_full * 1e3, 3), "xla_flops": fl_full,
        "achieved_tflops": round(fl_full / t_full / 1e12, 2)}
    print(f"{'full_train_step':28s}: {t_full * 1e3:8.3f} ms  "
          f"{fl_full / 1e9:8.2f} GF  {fl_full / t_full / 1e12:7.2f} TF/s")
    rays_per_s = BATCH / t_full
    results["rays_per_sec"] = round(rays_per_s, 1)
    print(f"  -> {rays_per_s:,.0f} rays/s")

    # --- forward render only ---
    report("fwd_render", lambda k: render_neus(k, rays, NeuS(params, cfg),
                                               1.0, rcfg)["rgb"])

    # --- sampling phase only (what render_neus does under stop_gradient) ---
    model = NeuS(params, cfg)

    def sampling_only(key, samp_dtype=None):
        near, far = rays.near, rays.far
        z_vals = jnp.linspace(0.0, 1.0, rcfg.n_samples)[None, :]
        z_vals = near + (far - near) * z_vals
        t_rand = jax.random.uniform(key, (BATCH, 1)) - 0.5
        z_vals = z_vals + t_rand * 2.0 / rcfg.n_samples
        from robir_tpu.render.neus import cat_z_vals, up_sample
        pts = rays.origins[:, None, :] + rays.directions[:, None, :] * z_vals[..., :, None]
        sdf = model.sdf(pts.reshape(-1, 3), samp_dtype).reshape(BATCH, rcfg.n_samples)
        for i in range(rcfg.up_sample_steps):
            new_z = up_sample(rays.origins, rays.directions, z_vals, sdf,
                              rcfg.n_importance // rcfg.up_sample_steps,
                              64 * 2 ** i, model.radius())
            z_vals, sdf = cat_z_vals(model, rays.origins, rays.directions,
                                     z_vals, new_z, sdf,
                                     last=(i + 1 == rcfg.up_sample_steps),
                                     compute_dtype=samp_dtype)
        return z_vals

    report("sampling_phase_fp32", sampling_only)
    report("sampling_phase_bf16",
           lambda k: sampling_only(k, jnp.bfloat16))

    # --- render_core fwd only at fixed z_vals ---
    z_fixed = jnp.broadcast_to(
        jnp.linspace(1.5, 4.5, 128)[None, :], (BATCH, 128))

    def core_only(key):
        del key
        return render_core(rays.origins, rays.directions, z_fixed,
                           2.0 / 64, model, background_rgb=jnp.ones((1, 3)),
                           cos_anneal_ratio=1.0)["color"]

    report("render_core_fwd", core_only)

    # --- render_core fwd+bwd (the second-order part) ---
    def core_loss(pp, key):
        m = NeuS(pp, cfg)
        out = render_core(rays.origins, rays.directions, z_fixed, 2.0 / 64,
                          m, background_rgb=jnp.ones((1, 3)),
                          cos_anneal_ratio=1.0)
        return jnp.mean((out["color"] - 0.5) ** 2) + 0.1 * out["gradient_error"]

    report("render_core_fwd_bwd",
           lambda k: jax.tree_util.tree_map(lambda g: jnp.sum(g) * 1e-12,
                                            jax.grad(core_loss)(params, k)))

    # --- sdf+grad sweep only (65k points) ---
    pts65 = jnp.asarray(rng.uniform(-1, 1, (BATCH * 128, 3)), jnp.float32)

    def sdf_grad_only(key):
        del key
        full, g = model.full_with_grad(pts65)
        return full[..., 0] + jnp.sum(g, -1)

    report("sdf_full_with_grad_fwd", sdf_grad_only)

    def sdf_only(key):
        del key
        return model.sdf(pts65)

    report("sdf_value_only_fwd", sdf_only)

    # --- color sweep only ---
    feat = jnp.ones((BATCH * 128, cfg.sdf.d_out - 1), jnp.float32) * 0.1
    nrm = jnp.tile(jnp.array([[0., 0., 1.]], jnp.float32), (BATCH * 128, 1))

    def color_only(key):
        del key
        return model.color(pts65, nrm, nrm, feat)

    report("color_net_fwd", color_only)

    return results


def main():
    import jax
    print("jax", jax.__version__, "devices", jax.devices(), flush=True)
    results = {"jax": jax.__version__,
               "device": str(jax.devices()[0])}
    measure_matmul_peaks(results)
    neus_phases(results)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "perf_study_out.json")
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
