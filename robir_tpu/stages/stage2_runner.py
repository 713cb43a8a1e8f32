"""Shared stage-2 runner infrastructure.

Replaces the duplicated plumbing of the four reference runners
(``training/train_{normal,visibility,pbr,cesr}.py``): experiment dirs +
checkpoints with cross-stage surgical restore, per-subtree Adam optimizers
with MultiStep LR, and the host training loop around jitted pure steps.

TPU-native: parameters are split into (trainable, frozen) sub-pytrees by
path prefix; the jitted step differentiates only the trainable part. LR
schedules are optax piecewise-constant (the reference's MultiStepLR).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core import checkpoint as ckpt_lib
from ..core.tree import drop_prefixes, keep_prefixes
from ..fields.envmap_material import init_envmap_material
from ..fields.neus_model import init_neus
from ..fields.visibility import init_indirect, init_visnet
from ..render.color import init_tonemap
from ..render.stage2 import Stage2Config, Stage2Model
from ..tracing.grid import build_sdf_grid


@dataclasses.dataclass(frozen=True)
class StageOptConfig:
    lr: float = 5e-4
    sched_milestones: tuple[int, ...] = ()
    sched_factor: float = 0.5


def multistep_lr(cfg: StageOptConfig):
    """torch MultiStepLR equivalent."""
    if not cfg.sched_milestones:
        return cfg.lr
    return optax.piecewise_constant_schedule(
        cfg.lr, {int(m): cfg.sched_factor for m in cfg.sched_milestones})


def make_adam(cfg: StageOptConfig) -> optax.GradientTransformation:
    return optax.adam(learning_rate=multistep_lr(cfg))


def init_stage2_params(key: jax.Array, cfg: Stage2Config) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "envmap_material_network": init_envmap_material(k2, cfg.envmap),
        "indirect_illum_network": init_indirect(k3, cfg.indirect),
        "visibility_network": init_visnet(k4, cfg.visnet),
        "gamma": init_tonemap(cfg.tonemap),
    }
    if cfg.use_neus:
        params["implicit_network"] = init_neus(k1, cfg.neus)
    else:
        # plain IDR pair (implicit_differentiable_renderer.py:280-282)
        from ..fields.radiance import init_rendering
        from ..fields.sdf import init_sdf
        params["implicit_network"] = init_sdf(k1, cfg.neus.sdf)
        params["rendering_network"] = init_rendering(k5, cfg.neus.color)
    return params


def split_params(params: dict, trainable_prefixes: Sequence[str]):
    """(trainable, frozen) sub-pytrees by top-level path prefix."""
    t = keep_prefixes(params, tuple(trainable_prefixes))
    f = drop_prefixes(params, tuple(trainable_prefixes))
    return t, f


def join_params(trainable: dict, frozen: dict) -> dict:
    """Inverse of :func:`split_params` (shallow two-level merge)."""
    out = {}
    for src in (frozen, trainable):
        for k, v in src.items():
            if k in out and isinstance(v, dict) and isinstance(out[k], dict):
                out[k] = {**out[k], **v}
            else:
                out[k] = v
    return out


class Stage2RunnerBase:
    """Host-side loop: data, checkpoints, jitted steps, grid baking.

    With a ``mesh``, pixel batches are sharded over the 'data' axis and
    parameters/optimizer state are replicated — jit then runs each stage
    data-parallel with gradient psums over ICI. The Vis-stage secondary-ray
    fan ([pixels, nsamp] tensors) shards on the pixel axis, which also
    distributes its memory footprint (SURVEY.md 7.3).
    """

    stage_name = "Base"

    def __init__(self, cfg: Stage2Config, params: dict, log_dir: str | None = None,
                 seed: int = 0, mesh=None):
        self.cfg = cfg
        self.params = params
        self.log_dir = log_dir
        self.key = jax.random.PRNGKey(seed)
        self.rng = np.random.default_rng(seed)
        self.cur_iter = 0
        self.grid_values = None
        self.mesh = mesh
        if mesh is not None:
            from ..core.mesh import replicated
            self.params = jax.device_put(self.params, replicated(mesh))

    def shard_batch(self, batch: dict) -> dict:
        """Leading axis over 'data' when a mesh is present."""
        if self.mesh is None:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        from ..core.mesh import batch_sharding
        sh = batch_sharding(self.mesh)
        return {k: jax.device_put(np.asarray(v), sh) for k, v in batch.items()}

    def place_replicated(self, tree):
        if self.mesh is None:
            return tree
        from ..core.mesh import replicated
        return jax.device_put(tree, replicated(self.mesh))

    # -- tracer -------------------------------------------------------------

    def bake_grid(self) -> None:
        """Bake the cached-SDF grid from the frozen NeuS (the reference's
        ``ray_tracer.generate``), then the march lookup layout (host-side,
        once — see tracing.grid.bake_march_layout)."""
        from ..tracing.grid import bake_march_layout
        model = Stage2Model(self.params, self.cfg)
        self.grid_values = self.place_replicated(bake_march_layout(
            build_sdf_grid(model.sdf, self.cfg.grid), self.cfg.grid))

    def model(self) -> Stage2Model:
        return Stage2Model(self.params, self.cfg, self.grid_values,
                           mesh=self.mesh)

    def next_key(self) -> jax.Array:
        self.key, k = jax.random.split(self.key)
        return k

    # -- checkpointing ------------------------------------------------------

    def ckpt_dir(self) -> str:
        assert self.log_dir
        return os.path.join(self.log_dir, self.stage_name, "checkpoints")

    def save(self, extra: dict | None = None) -> str:
        path = ckpt_lib.step_path(self.ckpt_dir(), self.cur_iter)
        ckpt_lib.save(path, self.params, step=self.cur_iter, extra=extra)
        latest = os.path.join(self.ckpt_dir(), "latest.npz")
        ckpt_lib.save(latest, self.params, step=self.cur_iter, extra=extra)
        return path

    def restore_surgical(self, path: str, keep: Callable[[str], bool]) -> None:
        """Path-filtered partial restore (the reference's cross-stage
        checkpoint surgery, e.g. train_pbr.py:122-203)."""
        self.params, _ = ckpt_lib.restore_into(self.params, path, keep=keep)
        self._refresh_after_restore()

    def restore_latest(self) -> bool:
        path = os.path.join(self.ckpt_dir(), "latest.npz")
        if not os.path.exists(path):
            return False
        self.params, meta = ckpt_lib.restore_into(self.params, path)
        self.cur_iter = meta.get("step", 0)
        self._refresh_after_restore()
        return True

    def _refresh_after_restore(self) -> None:
        """Re-derive cached parameter partitions from ``self.params``.

        Without this, a restore updates self.params but training continues
        from the stale pre-restore split and the next save() overwrites the
        checkpoint with from-scratch weights — the silent stage-surgery
        degradation class. The default covers the standard
        (TRAINABLE-split, single optimizer) runners; VisRunner overrides
        for its dual-optimizer split. Optimizer moments restart (stage-2
        checkpoints carry params only)."""
        if hasattr(self, "_trainable") and hasattr(self, "TRAINABLE"):
            self._trainable, self._frozen = split_params(
                self.params, self.TRAINABLE)
            self.opt_state = self.optimizer.init(self._trainable)


def render_view(model: Stage2Model, dataset, idx: int, sg_render_fn=None,
                key=None, chunk: int = 8000, train_spec: bool = False,
                lin_diff: bool = False, compact_chunk: int = 512,
                **sg_kwargs) -> dict:
    """Chunked whole-image stage-2 eval render (the reference's
    plot-time ``split_input`` loop, utils/general.py:27-69 +
    train_pbr.py:240-276). Returns flat [H*W, .] buffers including the
    hdr2ldr'd ``pred_rgb``."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..render.color import as_input, hdr2ldr
    from ..render.stage2 import stage2_forward

    key = key if key is not None else jax.random.PRNGKey(0)
    dirs, cam_loc = dataset.camera_rays(idx)
    n = dirs.shape[0]

    from ..render.stage2 import Stage2Model

    # the grid enters as a jit ARGUMENT: closing over a baked quad-layout
    # buffer (GridConfig.quad_rows) embeds a ~262 MB HLO constant and the
    # axon relay rejects the compile request (HTTP 413)
    @jax.jit
    def render_chunk(d, o, k, grid_values):
        m = Stage2Model(model.params, model.cfg, grid_values,
                        mesh=model.mesh)
        hdr_shift = jnp.broadcast_to(as_input(m.params["gamma"]),
                                     (d.shape[0], 1))
        inp = {"points": o, "dirs": d, "hdr_shift": hdr_shift}
        # eval is forward-only, so surface-pixel compaction has no remat
        # cost and whole-image chunks are mostly empty (object covers
        # ~1/3 of the frame). CESR's dense render fn returns batch-scalar
        # supervision and must stay dense — callers pass compact_chunk=0.
        out = stage2_forward(m, k, inp, trainstage="Material",
                             sg_render_fn=sg_render_fn,
                             train_spec=train_spec, lin_diff=lin_diff,
                             compact_chunk=compact_chunk,
                             **sg_kwargs)
        pred = hdr2ldr(m.params["gamma"], m.cfg.tonemap,
                       out["sg_rgb"] + out["indir_rgb"])
        mask = out["network_object_mask"]
        return {
            "pred_rgb": jnp.where(mask[:, None], pred, 1.0),
            "sg_rgb": out["sg_rgb"],
            "indir_rgb": out["indir_rgb"],
            "sg_specular_rgb": out["sg_specular_rgb"],
            "diffuse_albedo": out["diffuse_albedo"],
            "roughness": jnp.broadcast_to(out["roughness"], pred.shape),
            "normal_map": out["normal_map"],
            "normals": out["normals"],
            "vis_shadow": out["vis_shadow"],
            "mask": mask,
        }

    outs = []
    for i in range(0, n, chunk):
        d = dirs[i:i + chunk]
        pad = chunk - d.shape[0]
        if pad:
            d = np.concatenate([d, np.repeat(d[-1:], pad, 0)])
        o = np.broadcast_to(cam_loc, d.shape).copy()
        key, k = jax.random.split(key)
        out = render_chunk(jnp.asarray(d), jnp.asarray(o), k,
                           model.grid_values)
        cut = chunk - pad if pad else chunk
        outs.append({kk: np.asarray(v)[:cut] for kk, v in out.items()})
    return {k: np.concatenate([o[k] for o in outs], 0) for k in outs[0]}
