"""Cached-SDF grid tracer: the TPU-native octree replacement.

The reference accelerates secondary-ray visibility with a CUDA-unfriendly
pointer-chased octree over cached per-leaf SDF values + finite-difference
normals, walked by a host-synchronized ``while k.any()`` loop
(``utils/octree.py:75-585``, facade ``model/octree_tracing.py``). Capability
and accuracy model: a piecewise-constant SDF cache at leaf size 0.05/2^4 ~=
0.003, marched to the first surface cell, refined one Newton step.

TPU-native design (SURVEY.md section 7.2 #1 fallback, deliberately chosen):
a *dense* SDF grid with trilinear interpolation, sphere-traced with a
fixed-iteration ``lax.while_loop`` — no host sync per step, pure gathers
that vectorize across rays. Trilinear interpolation is strictly more
accurate than the reference's per-leaf constant cache at similar memory
(256^3 fp32 = 64 MB in HBM), and the march is identical work per ray to
the octree DDA in the worst case while being branch-free.

Also provides the hard-visibility oracle (``OctreeVisModel``,
``model/octree_tracing.py:63-85``): one-hot [not-hit, hit] logits queried by
the SG renderer's visibility sweeps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class GridConfig:
    resolution: int = 256
    bbox_min: tuple[float, float, float] = (-1.0, -1.0, -1.0)
    bbox_max: tuple[float, float, float] = (1.0, 1.0, 1.0)
    max_steps: int = 128        # sphere-trace iterations (fixed, masked)
    relax: float = 0.9          # step = relax * |sdf| (under-stepping margin)
    # hit when sdf < eps = hit_eps_cells * cell; sign crossings always
    # trigger, so a tight eps mainly guards grazing secondary rays from
    # false self-hits (reference analog: surface cells are |sdf|<=1e-4,
    # utils/octree.py:407-409)
    hit_eps_cells: float = 0.25
    start_offset: float = 5e-3  # secondary-ray start bias (octree.py:503-505)
    # Active-ray compaction: after ``compact_after`` full-width march
    # iterations, rays are sorted by liveness and the tail of the march runs
    # only on chunks that still contain active rays (the TPU-native analog
    # of the reference octree's host-side ``while k.any()`` compaction,
    # utils/octree.py:493-585). Bit-exact — ray trajectories are
    # independent. 0 disables. Most secondary rays exit the bbox or hit
    # within ~16 steps; the full-width tail was the dominant cost of the
    # Vis-stage trace (measured 119 ms/step of row gathers at 131k rays).
    # Head-length sweeps on the chip (realistic Vis step ms). Round 3,
    # 4-row layout (closure-mode timing): 4 -> 67.9, 8 -> 59.6,
    # 16 -> 66.4, 24 -> 82.9. Round 4 re-sweep under the quad layout
    # with argument-mode timing: 2 -> 60.2, 4 -> 61.5/61.9, 6 -> 69.9,
    # 8 -> 73.6-75.0, 16 -> 108.3. Round 5, on the CANONICAL workload
    # (tools/vis_workload.py: the procedural camera batch, 18% surface)
    # with the interleaved 2-process protocol: 2 -> 61.1, 4 -> 65.3,
    # 8 -> 78.9 (spreads in docs/ROOFLINE_VIS.md) — quad makes compacted
    # tail chunks cheaper, so sorting earlier wins consistently; 2 is the
    # measured optimum on the workload the runners actually produce.
    compact_after: int = 2
    compact_chunk: int = 4096
    # Blocked z-gathers: gather 128-wide z-blocks instead of full R-wide
    # z-rows (overlapping blocks strided by 127 so any (z0, z0+1) pair
    # lives in one block). Halves the bytes per lookup at R=256 —
    # MEASURED NEUTRAL on the chip (Vis step 68.2 vs 66.4 ms): the march's
    # gather cost is per-row-fetch bound, not bandwidth bound, at 131k
    # random rows. Kept off; flip on only if a future workload shows
    # bandwidth-bound gathers.
    blocked_gather: bool = False
    # Over-relaxed sphere tracing (Keinert et al. 2014, "Enhanced Sphere
    # Tracing"): step omega*|sdf| with omega > 1, and REJECT a step when
    # the consecutive bounding spheres fail to overlap
    # (step > |s_prev| + |s|) — the ray reverts to the conservative
    # endpoint, so no crossing can be skipped. Helps exactly the
    # expensive tail population: grazing secondary rays whose step is
    # proportional to their small height above the surface. 0.0 = off
    # (plain relax-understepping, the round-1..3 behavior, bit-exact).
    # min_step-clamped rays are unaffected (their step was already above
    # the conservative bound; rejection only fires for genuinely
    # over-relaxed steps).
    over_relax: float = 0.0
    # Quad-row layout: pre-concatenate the four (x,y)-corner z-rows of
    # every cell into one [R*R, 4R] table so each trilinear lookup is ONE
    # row gather instead of four. The blocked experiment above showed the
    # march gather cost is per-row-FETCH bound (width-insensitive), so 4x
    # fewer fetches attacks exactly the binding constraint, at 4x grid
    # memory (268 MB at 256^3 fp32 — the layout is built once per jitted
    # region from the base grid by three shifted copies, no gathers).
    # Bit-exact with the 4-gather path (same blend association).
    quad_rows: bool = False
    # cached-grid element dtype. "bfloat16" halves the row-gather HBM
    # traffic that dominates the march (each trilinear lookup pulls four
    # full z-rows); interpolation math stays fp32. Near the surface the
    # bf16 quantization is RELATIVE (~0.4%), so hit/bisection precision —
    # driven by |sdf| << 1 values — degrades far less than the raw mantissa
    # width suggests (oracle-measured in tests/test_tracing.py).
    storage_dtype: str | None = None

    @property
    def store(self):
        return jnp.bfloat16 if self.storage_dtype == "bfloat16" else jnp.float32

    @property
    def bbox_lo(self) -> np.ndarray:
        return np.asarray(self.bbox_min, np.float32)

    @property
    def bbox_hi(self) -> np.ndarray:
        return np.asarray(self.bbox_max, np.float32)

    @property
    def cell(self) -> float:
        return float(np.max((self.bbox_hi - self.bbox_lo) / self.resolution))


def build_sdf_grid(sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
                   cfg: GridConfig, chunk: int = 65536) -> jnp.ndarray:
    """Bake sdf_fn over the bbox: [R, R, R] float32 at cell centers are NOT
    used — values sit on grid *nodes* so trilinear interpolation is exact at
    nodes (R nodes span [lo, hi] inclusive)."""
    R = cfg.resolution
    axes = [np.linspace(cfg.bbox_lo[i], cfg.bbox_hi[i], R, dtype=np.float32)
            for i in range(3)]
    pts = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    vals = []
    eval_fn = jax.jit(lambda x: sdf_fn(x).reshape(-1))
    for i in range(0, pts.shape[0], chunk):
        block = pts[i:i + chunk]
        pad = chunk - block.shape[0]
        if pad:
            block = np.concatenate([block, np.zeros((pad, 3), np.float32)])
        v = np.asarray(eval_fn(jnp.asarray(block)))
        vals.append(v[:chunk - pad] if pad else v)
    return jnp.asarray(np.concatenate(vals).reshape(R, R, R), dtype=cfg.store)


def _to_grid_coords(cfg: GridConfig, x: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.asarray(cfg.bbox_lo)
    hi = jnp.asarray(cfg.bbox_hi)
    return (x - lo) / (hi - lo) * (cfg.resolution - 1)


_BLOCK = 128     # z-block width (one TPU lane tile)
_STRIDE = 127    # block stride: any (z0, z0+1) pair fits one block


def _prologue(cfg: GridConfig, x: jnp.ndarray):
    R = cfg.resolution
    g = _to_grid_coords(cfg, x)
    g = jnp.clip(g, 0.0, R - 1 - 1e-6)
    # the 1e-6 inset can round back to R-1 in fp32 (spacing at 255 is
    # ~1.5e-5), so clamp the CELL index: at the boundary i0 = R-2 with
    # f = 1.0 lands exactly on node R-1 — same value, indices in bounds
    i0 = jnp.minimum(jnp.floor(g).astype(jnp.int32), R - 2)
    f = g - i0
    return i0, f


def _bilinear_rows(take_row, R, i0, f):
    """Blend the four (x, y)-corner z-rows. ``take_row(lin_xy) -> [N, W]``.
    i1 = i0 + 1 is always in bounds: the clip in _prologue keeps
    i0 <= R - 2."""
    x0, y0 = i0[:, 0], i0[:, 1]
    x1, y1 = x0 + 1, y0 + 1
    fx, fy = f[:, 0], f[:, 1]
    r00 = take_row(x0 * R + y0)
    r01 = take_row(x0 * R + y1)
    r10 = take_row(x1 * R + y0)
    r11 = take_row(x1 * R + y1)
    return (r00 * ((1 - fx) * (1 - fy))[:, None]
            + r01 * ((1 - fx) * fy)[:, None]
            + r10 * (fx * (1 - fy))[:, None]
            + r11 * (fx * fy)[:, None])


def grid_sdf(grid: jnp.ndarray, cfg: GridConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Trilinear SDF lookup, [N, 3] -> [N]. Outside the bbox, clamps to the
    boundary value (callers bound the march by the bbox anyway).

    TPU note: implemented as FOUR gathers of full z-rows ([R]-contiguous,
    lane-aligned) + a one-hot z-interpolation on the VPU, not eight scalar
    corner gathers — scalar gathers dominate the secondary-ray tracing
    profile (measured ~49 ms per 131k-point corner sweep; the row form is
    an order of magnitude cheaper and the z-select is dense vector math).
    The march uses the blocked variant below (same math, half the gather
    traffic at R=256); this full-row form is the reference lookup and the
    R<=128 path."""
    R = cfg.resolution
    i0, f = _prologue(cfg, x)
    z0, fz = i0[:, 2], f[:, 2]

    flat = grid.reshape(R * R, R)
    row = _bilinear_rows(lambda lin: jnp.take(flat, lin, axis=0), R, i0, f)

    # z-interp as a dense one-hot contraction (z1 = z0 + 1 is always in
    # bounds after the _prologue clip)
    cols = jnp.arange(R, dtype=jnp.int32)[None, :]
    wz = ((cols == z0[:, None]) * (1 - fz)[:, None]
          + (cols == (z0 + 1)[:, None]) * fz[:, None])
    return jnp.sum(row * wz, axis=-1)


def _n_blocks(R: int) -> int:
    return (R - 2) // _STRIDE + 1


def _to_blocked(grid: jnp.ndarray, cfg: GridConfig) -> jnp.ndarray:
    """[R, R, R] -> [R*R*NB, 128]: overlapping 128-wide z-blocks starting
    every 127 cells, so block ``z0 // 127`` always contains both z0 and
    z0 + 1. Built once per jitted region (pure slicing, no gathers)."""
    R = cfg.resolution
    nb = _n_blocks(R)
    flat = grid.reshape(R * R, R)
    pad = _STRIDE * (nb - 1) + _BLOCK - R
    if pad > 0:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    blocks = [flat[:, b * _STRIDE:b * _STRIDE + _BLOCK] for b in range(nb)]
    return jnp.stack(blocks, axis=1).reshape(R * R * nb, _BLOCK)


def _sdf_blocked(blocked: jnp.ndarray, cfg: GridConfig,
                 x: jnp.ndarray) -> jnp.ndarray:
    """Trilinear lookup against the blocked layout — bit-exact with
    grid_sdf (same blend order; the extra zero columns in the one-hot
    contraction add nothing)."""
    R = cfg.resolution
    nb = _n_blocks(R)
    i0, f = _prologue(cfg, x)
    z0, fz = i0[:, 2], f[:, 2]
    b = z0 // _STRIDE
    off = z0 - b * _STRIDE                      # in [0, 126]

    row = _bilinear_rows(
        lambda lin: jnp.take(blocked, lin * nb + b, axis=0), R, i0, f)
    cols = jnp.arange(_BLOCK, dtype=jnp.int32)[None, :]
    wz = ((cols == off[:, None]) * (1 - fz)[:, None]
          + (cols == (off + 1)[:, None]) * fz[:, None])
    return jnp.sum(row * wz, axis=-1)


def _quad_build(g, xp):
    """[R, R, R] -> [R*R, 4R]: row ``x*R + y`` holds the z-rows of the four
    (x, y) cell corners, ``[ (x,y) | (x,y+1) | (x+1,y) | (x+1,y+1) ]``.
    Edge rows are duplicated for x = R-1 / y = R-1 but never read — the
    ``_prologue`` clip keeps cell indices <= R-2. Built by shifted copies
    (pure slicing/concat, no gathers). ``xp`` is numpy or jax.numpy — the
    ONE definition both the in-graph and the host-baked layout share."""
    R = g.shape[0]
    gy = xp.concatenate([g[:, 1:, :], g[:, -1:, :]], axis=1)
    gx = xp.concatenate([g[1:, :, :], g[-1:, :, :]], axis=0)
    gxy = xp.concatenate([gx[:, 1:, :], gx[:, -1:, :]], axis=1)
    return xp.concatenate([g, gy, gx, gxy], axis=-1).reshape(R * R, 4 * R)


def _to_quad(grid: jnp.ndarray, cfg: GridConfig) -> jnp.ndarray:
    return _quad_build(grid, jnp)


def _sdf_quad(quad: jnp.ndarray, cfg: GridConfig,
              x: jnp.ndarray) -> jnp.ndarray:
    """Trilinear lookup against the quad-row layout — bit-exact with
    ``grid_sdf`` (identical corner values and blend association; only the
    number of gathers changes: one [4R]-row fetch per point)."""
    R = cfg.resolution
    i0, f = _prologue(cfg, x)
    z0, fz = i0[:, 2], f[:, 2]
    x0, y0 = i0[:, 0], i0[:, 1]
    fx, fy = f[:, 0], f[:, 1]
    row4 = jnp.take(quad, x0 * R + y0, axis=0)
    r00, r01 = row4[:, :R], row4[:, R:2 * R]
    r10, r11 = row4[:, 2 * R:3 * R], row4[:, 3 * R:]
    row = (r00 * ((1 - fx) * (1 - fy))[:, None]
           + r01 * ((1 - fx) * fy)[:, None]
           + r10 * (fx * (1 - fy))[:, None]
           + r11 * (fx * fy)[:, None])
    cols = jnp.arange(R, dtype=jnp.int32)[None, :]
    wz = ((cols == z0[:, None]) * (1 - fz)[:, None]
          + (cols == (z0 + 1)[:, None]) * fz[:, None])
    return jnp.sum(row * wz, axis=-1)


def _march_layout(grid: jnp.ndarray, cfg: GridConfig) -> jnp.ndarray:
    """Materialize the march's lookup buffer ONCE per jitted region (the
    compacted tail re-derives its sdf_fn per scan chunk, so the buffer —
    not the raw grid — must be what rides through ``compact_apply``'s
    consts). A 2-D input is already a baked layout (bake_march_layout)
    and passes through — the in-graph quad build lowers pathologically on
    TPU (measured 250 ms/call at 256^3), so runners bake it host-side."""
    if grid.ndim == 2:
        return grid
    if cfg.quad_rows:
        return _to_quad(grid, cfg)
    if cfg.blocked_gather and cfg.resolution > _BLOCK:
        return _to_blocked(grid, cfg)
    return grid


def bake_march_layout(grid, cfg: GridConfig):
    """Host-side one-time build of the march lookup buffer; returns the
    value runners should store as ``grid_values``. Identity for the plain
    row layout. For quad_rows the shifted-concat runs in numpy — on-device
    it is a 250 ms/call XLA lowering at 256^3, host-side a ~0.1 s memcpy
    done once per grid bake."""
    if hasattr(grid, "ndim") and grid.ndim == 2:
        return grid
    if cfg.quad_rows:
        return jnp.asarray(_quad_build(np.asarray(grid), np))
    if cfg.blocked_gather and cfg.resolution > _BLOCK:
        return _to_blocked(jnp.asarray(grid), cfg)
    return grid


def _layout_sdf_fn(buf: jnp.ndarray, cfg: GridConfig):
    """Lookup closure over a `_march_layout` buffer."""
    if cfg.quad_rows:
        return lambda x: _sdf_quad(buf, cfg, x)
    if cfg.blocked_gather and cfg.resolution > _BLOCK:
        return lambda x: _sdf_blocked(buf, cfg, x)
    return lambda x: grid_sdf(buf, cfg, x)


def _make_sdf_fn(grid: jnp.ndarray, cfg: GridConfig):
    """The march-internal lookup: quad-row / blocked when enabled."""
    return _layout_sdf_fn(_march_layout(grid, cfg), cfg)


def grid_normal(grid: jnp.ndarray, cfg: GridConfig, x: jnp.ndarray,
                eps: float | None = None, sdf_fn=None) -> jnp.ndarray:
    """Central-difference normal of the interpolated SDF (equivalent of the
    octree's cached ``prox_gradients`` normals, utils/octree.py:385-390)."""
    eps = eps or cfg.cell
    sdf_fn = sdf_fn or (lambda p: grid_sdf(grid, cfg, p))
    offs = jnp.eye(3) * eps
    grads = [(sdf_fn(x + offs[i]) - sdf_fn(x - offs[i]))
             / (2 * eps) for i in range(3)]
    n = jnp.stack(grads, -1)
    return n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-4, None)


def _ray_bbox(cfg: GridConfig, o: jnp.ndarray, d: jnp.ndarray):
    lo = jnp.asarray(cfg.bbox_lo)
    hi = jnp.asarray(cfg.bbox_hi)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    valid = tmax > jnp.maximum(tmin, 0.0)
    return valid, jnp.maximum(tmin, 0.0), tmax


def _march(sdf_fn, cfg: GridConfig, max_iters: int,
           rays_o, rays_d, t, t_prev, active, hit, t_far,
           s_prev=None, step_prev=None):
    """Masked sphere-trace for up to ``max_iters`` steps; early-exits when
    no ray in the batch is active. Per-ray trajectories are independent, so
    splitting the march into phases (full-width head, compacted tail) is
    bit-exact — with ``over_relax`` the rejection state (``s_prev``,
    ``step_prev``) must also cross the phase boundary.

    Returns ``(t, t_prev, active, hit, extra)`` where ``extra`` is the
    ``(s_prev, step_prev)`` pair when over-relaxation is on, else None."""
    eps_hit = cfg.hit_eps_cells * cfg.cell
    min_step = 0.5 * cfg.cell
    over = cfg.over_relax > 1.0
    omega = cfg.over_relax if over else cfg.relax
    if over:
        if s_prev is None:
            s_prev = jnp.zeros_like(t)
        if step_prev is None:
            step_prev = jnp.zeros_like(t)

    def body(state):
        if over:
            t, t_prev, s_prev, step_prev, active, hit, it = state
        else:
            t, t_prev, active, hit, it = state
        x = rays_o + t[:, None] * rays_d
        s = sdf_fn(x)
        if over:
            # reject when the previous step was over-relaxed AND the
            # consecutive bounding spheres do not overlap — a crossing
            # may hide in the uncovered gap; revert to the conservative
            # endpoint (plain relax step from t_prev), whose sdf the
            # next iteration evaluates. A rejected step never chains:
            # the reverted step IS conservative, so was_over is False
            # on the following check.
            cons_prev = jnp.maximum(cfg.relax * s_prev, min_step)
            was_over = step_prev > cons_prev * (1 + 1e-6)
            fail = active & was_over & (step_prev
                                        > jnp.abs(s_prev) + jnp.abs(s))
        else:
            fail = jnp.zeros_like(active)
        new_hit = active & ~fail & (s < eps_hit)
        step = jnp.maximum(omega * s, min_step)
        if over:
            # the conservative exit is safe (relax*s > t_far - t implies
            # s > t_far - t: no crossing before the bbox), but an
            # over-relaxed exit is NOT — the ray would deactivate before
            # the next iteration's rejection check could fire and a
            # crossing inside the bbox could be skipped. If the over
            # step exits while the conservative one does not, take the
            # conservative step (next check then sees was_over False).
            cons_now = jnp.maximum(cfg.relax * s, min_step)
            step = jnp.where((t + step > t_far) & (t + cons_now <= t_far),
                             cons_now, step)
        adv = active & ~new_hit & ~fail
        t_next = jnp.where(adv, t + step, t)
        if over:
            t_fail = t_prev + cons_prev
            t_next = jnp.where(fail, t_fail, t_next)
        inside = t_next <= t_far
        active = active & ~new_hit & inside
        t_prev_n = jnp.where(adv, t, t_prev)
        if over:
            s_prev_n = jnp.where(adv, s, s_prev)
            step_prev_n = jnp.where(adv, step,
                                    jnp.where(fail, cons_prev, step_prev))
            return (t_next, t_prev_n, s_prev_n, step_prev_n, active,
                    hit | new_hit, it + 1)
        return t_next, t_prev_n, active, hit | new_hit, it + 1

    def cond(state):
        active, it = state[-3], state[-1]
        return jnp.any(active) & (it < max_iters)

    if over:
        t, t_prev, s_prev, step_prev, active, hit, _ = jax.lax.while_loop(
            cond, body,
            (t, t_prev, s_prev, step_prev, active, hit, jnp.int32(0)))
        return t, t_prev, active, hit, (s_prev, step_prev)
    t, t_prev, active, hit, _ = jax.lax.while_loop(
        cond, body, (t, t_prev, active, hit, jnp.int32(0)))
    return t, t_prev, active, hit, None


def _refine(sdf_fn, cfg: GridConfig, rays_o, rays_d, t, t_prev,
            hit):
    """Bisection on [t_prev, t] + one Newton step along the normal
    (octree.py:428-436). The surface crossing is bracketed by the last
    march step whenever the march overshot (s(t) < 0); for early stops
    (0 <= s < eps) the bracket degenerates to t and the Newton step does
    the work. Tightens grazing-ray hits well past the cell-scale accuracy
    of the reference octree's surface cells."""
    min_step = 0.5 * cfg.cell
    lo = t_prev
    hi = t
    s_hi = sdf_fn(rays_o + hi[:, None] * rays_d)
    bracketed = hit & (s_hi < 0.0)
    for _ in range(8):
        mid = 0.5 * (lo + hi)
        s_mid = sdf_fn(rays_o + mid[:, None] * rays_d)
        go_lo = s_mid > 0.0
        lo = jnp.where(bracketed & go_lo, mid, lo)
        hi = jnp.where(bracketed & ~go_lo, mid, hi)
    t = jnp.where(bracketed, 0.5 * (lo + hi), t)

    # one Newton refinement along the normal (octree.py:428-436)
    x = rays_o + t[:, None] * rays_d
    n = grid_normal(None, cfg, x, sdf_fn=sdf_fn)
    s = sdf_fn(x)
    speed = jnp.sum(rays_d * n, axis=-1)
    speed = jnp.where(jnp.abs(speed) < 1e-4, 1e-4, speed)
    # want sdf(x + dt d) ~ s + dt (d . n) = 0  ->  dt = -s / (d . n)
    dt = jnp.clip(-s / speed, -10 * min_step, 10 * min_step)
    return jnp.where(hit, t + dt, t)


def grid_cast(grid: jnp.ndarray, cfg: GridConfig, rays_o: jnp.ndarray,
              rays_d: jnp.ndarray, mesh=None):
    """Sphere-trace the cached SDF. [N,3],[N,3] -> (t [N], hit [N], x [N,3]).

    Equivalent of ``OctreeSDF.cast``/``multi_step_cast``
    (utils/octree.py:421-438,493-585) with the host-synced loop replaced by
    fixed-iteration masked while_loops, in two phases: a full-width head of
    ``cfg.compact_after`` steps (where most rays hit or exit), then a
    liveness-compacted tail that only spends gather bandwidth on chunks
    with surviving rays — the reference's ``while k.any()`` host
    compaction, rebuilt with sorts instead of boolean indexing. The final
    bisection+Newton refinement runs compacted over hit rays only.

    With ``mesh`` (rays sharded over 'data'), the compaction sorts/scans
    per shard under shard_map — no cross-device collective.
    """
    valid, t_near, t_far = _ray_bbox(cfg, rays_o, rays_d)
    t0 = t_near + cfg.start_offset
    hit0 = jnp.zeros_like(valid)

    buf = _march_layout(grid, cfg)
    sdf_fn = _layout_sdf_fn(buf, cfg)
    from ..core.compact import compact_apply, effective_chunk
    chunk = (effective_chunk(rays_o.shape[0], cfg.compact_chunk, mesh)
             if 0 < cfg.compact_after < cfg.max_steps else 0)
    do_compact = chunk > 0
    head = cfg.compact_after if do_compact else cfg.max_steps
    t, t_prev, active, hit, extra = _march(sdf_fn, cfg, head, rays_o,
                                           rays_d, t0, t0, valid, hit0,
                                           t_far)
    over = extra is not None

    if do_compact:
        # the lookup BUFFER rides as an explicit compact_apply const (NOT
        # a closure): under a mesh every array entering the shard_map
        # region must come through in_specs — see compact_apply. It is
        # the materialized layout, not the raw grid, so per-chunk sdf_fn
        # reconstruction inside the scan is free. The over-relaxation
        # rejection state crosses the phase boundary as two extra args —
        # only when over-relaxation is on (dead placeholders would add
        # sort/gather traffic to the default path for nothing).
        if over:
            s_prev, step_prev = extra

            def tail(t, t_prev, active, hit, sp, stp, o, d, tf, g):
                tt, tp, _, h, _ = _march(_layout_sdf_fn(g, cfg), cfg,
                                         cfg.max_steps - head, o, d,
                                         t, t_prev, active, hit, tf,
                                         s_prev=sp, step_prev=stp)
                return tt, tp, h

            args = [t, t_prev, active, hit, s_prev, step_prev,
                    rays_o, rays_d, t_far]
        else:
            def tail(t, t_prev, active, hit, o, d, tf, g):
                tt, tp, _, h, _ = _march(_layout_sdf_fn(g, cfg), cfg,
                                         cfg.max_steps - head, o, d,
                                         t, t_prev, active, hit, tf)
                return tt, tp, h

            args = [t, t_prev, active, hit, rays_o, rays_d, t_far]

        tt, tp, h = compact_apply(tail, active, args, chunk, mesh=mesh,
                                  consts=buf)
        t = jnp.where(active, tt, t)
        t_prev = jnp.where(active, tp, t_prev)
        hit = jnp.where(active, h, hit)

        def refine(t, t_prev, h, o, d, g):
            return (_refine(_layout_sdf_fn(g, cfg), cfg, o, d, t, t_prev,
                            h),)

        (t_ref,) = compact_apply(
            refine, hit, [t, t_prev, hit, rays_o, rays_d],
            chunk, mesh=mesh, consts=buf)
        t = jnp.where(hit, t_ref, t)
    else:
        t = _refine(sdf_fn, cfg, rays_o, rays_d, t, t_prev, hit)

    x = rays_o + t[:, None] * rays_d
    return t, hit, x


def grid_visibility_logits(grid: jnp.ndarray, cfg: GridConfig,
                           points: jnp.ndarray, dirs: jnp.ndarray,
                           mag: float = 10.0) -> jnp.ndarray:
    """Hard visibility oracle: [..., 3],[...,3] -> [..., 2] logits
    (occluded, visible). Parity contract: ``OctreeVisModel.forward``
    (model/octree_tracing.py:63-85) returns one-hot [is_hit, ~is_hit]; we
    return +-mag logits so softmax matches one-hot to machine precision.

    Queries are surface points in practice, so the origin is pushed along
    the LOCAL SDF NORMAL by max(start_offset, 2*hit_eps) before casting:
    the along-ray 5e-3 bias alone leaves grazing/tangent directions inside
    the tracer's hit-epsilon band and labels them falsely occluded — the
    round-1 Vis label-noise class, measured at 34% false self-hits at grid
    resolution 64. (The push happens only where |sdf| is within the band,
    so off-surface queries are untouched.)"""
    shape = points.shape[:-1]
    p = points.reshape(-1, 3)
    d = dirs.reshape(-1, 3)
    d = d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9, None)
    eps_hit = cfg.hit_eps_cells * cfg.cell
    offset = jnp.maximum(cfg.start_offset, 2.0 * eps_hit)
    sdf_fn = _make_sdf_fn(grid, cfg)
    s = sdf_fn(p)
    n = grid_normal(None, cfg, p, sdf_fn=sdf_fn)
    near_surface = s < offset
    p = jnp.where(near_surface[:, None],
                  p + n * jnp.clip(offset - s, 0.0, None)[:, None], p)
    _, hit, _ = grid_cast(grid, cfg, p, d)
    logits = jnp.stack([jnp.where(hit, mag, -mag),
                        jnp.where(hit, -mag, mag)], axis=-1)
    return logits.reshape(shape + (2,))


@dataclasses.dataclass
class SDFGrid:
    """Bundled (grid values, config) — the stage-2 secondary-ray tracer.

    ``values`` stays the raw 3-D grid (``sdf``/``normal`` need it); the
    march lookup buffer is baked lazily on first ``cast`` so quad_rows
    configs never rebuild the layout in-graph."""

    values: jnp.ndarray
    cfg: GridConfig
    _march_buf: jnp.ndarray | None = None

    @classmethod
    def build(cls, sdf_fn, cfg: GridConfig = GridConfig()) -> "SDFGrid":
        return cls(build_sdf_grid(sdf_fn, cfg), cfg)

    def sdf(self, x):
        return grid_sdf(self.values, self.cfg, x)

    def normal(self, x):
        return grid_normal(self.values, self.cfg, x)

    def cast(self, rays_o, rays_d):
        if self._march_buf is None:
            self._march_buf = bake_march_layout(self.values, self.cfg)
        return grid_cast(self._march_buf, self.cfg, rays_o, rays_d)

    def visibility_logits(self, points, dirs):
        return grid_visibility_logits(self.values, self.cfg, points, dirs)
