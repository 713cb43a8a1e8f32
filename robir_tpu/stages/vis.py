"""Stage Vis: visibility MLP + indirect-illumination SG field.

Parity: ``training/train_visibility.py`` (VisTrainRunner): Energy-net
prefit at startup (``:274``), per-step random ``hdr_shift`` (``:297``),
forward in 'Illum' mode + 512-direction secondary-ray tracing through the
frozen NeuS (``:298-299``), IllumLoss split into a radiance loss stepping
the indirect net and a cross-entropy visibility loss stepping the vis net,
with two separate Adam optimizers (``:99-112, :306-313``).

TPU-native: both losses and both optimizer updates run in ONE jitted step,
with a single combined forward+backward — the per-subtree gradients equal
the reference's two independent backward passes because the visibility CE
touches only the vis net and the radiance loss only the indirect net
(cross-gradients are structurally zero).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.syn_dataset import SynDataset
from ..render.color import fit_energy, ldr2hdr
from ..render.stage2 import Stage2Config, Stage2Model, stage2_forward, trace_radiance
from .losses import IllumLossConfig, illum_loss
from .stage2_runner import (Stage2RunnerBase, StageOptConfig, join_params,
                            make_adam, split_params)


@dataclasses.dataclass(frozen=True)
class VisStageConfig:
    num_pixels: int = 256
    nsamp: int = 512
    max_iters: int = 200_001
    opt: StageOptConfig = StageOptConfig(lr=5e-4)
    loss: IllumLossConfig = IllumLossConfig(loss_type="L1")
    anneal_t: float = 0.0
    shard_fan: bool = False  # shard the [pixels*nsamp] fan over 'data'
    # chunk size for the borrowed-color fan compaction (0 = dense); only
    # hit & front-facing & on-surface secondary rays run the 16-sample
    # mini render (reference: hit-only boolean indexing)
    fan_compact_chunk: int = 4096


def make_vis_step(cfg: Stage2Config, stage_cfg: VisStageConfig,
                  vis_opt: optax.GradientTransformation,
                  illum_opt: optax.GradientTransformation, mesh=None):

    @jax.jit
    def step(vis_params, illum_params, frozen, vis_state, illum_state,
             grid_values, batch, key):
        k_fwd, k_trace = jax.random.split(key)

        def run_model(vp, ip):
            params = join_params(join_params(vp, ip), frozen)
            model = Stage2Model(params, cfg, grid_values, mesh=mesh)
            inp = {"points": batch["points"], "dirs": batch["dirs"],
                   "object_mask": batch["object_mask"],
                   "hdr_shift": batch["hdr_shift"]}
            fwd = stage2_forward(model, k_fwd, inp, trainstage="Illum")
            trace = trace_radiance(model, k_trace, fwd, nsamp=stage_cfg.nsamp,
                                   shard_fan=stage_cfg.shard_fan,
                                   compact_chunk=stage_cfg.fan_compact_chunk)
            rad, vis = illum_loss(
                stage_cfg.loss,
                indirect_sgs=fwd["indirect_sgs"],
                indir_integral=fwd["indir_integral"],
                network_object_mask=fwd["network_object_mask"],
                trace_radiance=trace["trace_radiance"],
                sample_dirs=trace["sample_dirs"],
                gt_vis=trace["gt_vis"],
                pred_vis=trace["pred_vis"],
                indir_mask=trace["indir_mask"],
                gt_integral=trace["gt_integral"],
                anneal_t=stage_cfg.anneal_t)

            # confidence diagnostics (round-1 pathology was an invisible
            # ~0.35 mean vis at lit points): mean P(visible) over labeled
            # front-facing lit dirs and labeled occluded dirs
            p_vis = jax.nn.softmax(trace["pred_vis"], axis=-1)[..., 1]
            nrm = fwd["normals"]
            nrm = nrm / jnp.clip(
                jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-4, None)
            front = jnp.sum(nrm[:, None, :] * trace["sample_dirs"], -1) > 0
            surf = fwd["network_object_mask"][:, None]
            lit = surf & front & ~trace["gt_vis"]
            occ = surf & trace["gt_vis"]
            mean_in = lambda m: (jnp.sum(p_vis * m) /      # noqa: E731
                                 jnp.clip(jnp.sum(m), 1.0, None))
            diag = {"vis_conf_lit": mean_in(lit.astype(jnp.float32)),
                    "vis_conf_occ": mean_in(occ.astype(jnp.float32))}
            return rad, vis, diag

        # ONE forward+backward over both subtrees: the summed loss yields
        # gradients identical to the reference's two independent backwards
        # because the cross-terms are structurally zero — the CE visibility
        # loss touches only visibility_network (its labels are traced
        # through the frozen NeuS), and the radiance loss touches only
        # indirect_illum_network. The split formulation re-ran the full
        # 512-dir secondary trace and a second backward for nothing.
        def loss_fn(both):
            rad, vis, diag = run_model(*both)
            return rad + vis, (rad, vis, diag)

        (_, (rad_loss, vis_loss, diag)), (vis_grads, illum_grads) = \
            jax.value_and_grad(loss_fn, has_aux=True)(
                (vis_params, illum_params))

        v_updates, vis_state = vis_opt.update(vis_grads, vis_state, vis_params)
        vis_params = optax.apply_updates(vis_params, v_updates)
        i_updates, illum_state = illum_opt.update(illum_grads, illum_state,
                                                  illum_params)
        illum_params = optax.apply_updates(illum_params, i_updates)
        return vis_params, illum_params, vis_state, illum_state, {
            "radiance_loss": rad_loss, "visibility_loss": vis_loss, **diag}

    return step


class VisRunner(Stage2RunnerBase):
    stage_name = "Vis"
    VIS_PREFIX = ("visibility_network",)
    ILLUM_PREFIX = ("indirect_illum_network",)

    def __init__(self, cfg: Stage2Config, params: dict, dataset: SynDataset,
                 stage_cfg: VisStageConfig = VisStageConfig(),
                 log_dir: str | None = None, seed: int = 0, mesh=None):
        super().__init__(cfg, params, log_dir, seed, mesh=mesh)
        if stage_cfg.shard_fan and mesh is None:
            # with_sharding_constraint needs a mesh context; single-device
            # runs simply don't shard the fan.
            stage_cfg = dataclasses.replace(stage_cfg, shard_fan=False)
        self.stage_cfg = stage_cfg
        self.dataset = dataset
        self.vis_opt = make_adam(stage_cfg.opt)
        self.illum_opt = make_adam(stage_cfg.opt)
        self._vis, rest = split_params(params, self.VIS_PREFIX)
        self._illum, self._frozen = split_params(rest, self.ILLUM_PREFIX)
        self.vis_state = self.vis_opt.init(self._vis)
        self.illum_state = self.illum_opt.init(self._illum)
        self._step = make_vis_step(cfg, stage_cfg, self.vis_opt,
                                   self.illum_opt, mesh=self.mesh)

    def _refresh_after_restore(self) -> None:
        # dual split: restored params must re-partition into vis/illum/frozen
        self._vis, rest = split_params(self.params, self.VIS_PREFIX)
        self._illum, self._frozen = split_params(rest, self.ILLUM_PREFIX)
        self.vis_state = self.vis_opt.init(self._vis)
        self.illum_state = self.illum_opt.init(self._illum)

    def fit_energy_prologue(self, n_steps: int = 1000) -> None:
        """Energy-net inner fit on the dataset's masked pixels
        (train_visibility.py:274 -> energy_integral.py:51-77)."""
        px = jnp.asarray(np.clip(self.dataset.masked_pixels(), 1e-4, 1.0))
        gamma = self.params["gamma"]

        def l2h(x, shift):
            return ldr2hdr(gamma, self.cfg.tonemap, x, shift)

        energy = fit_energy(self.next_key(), px, l2h, n_steps=n_steps)
        self.params["gamma"]["energy"] = energy
        self._frozen["gamma"]["energy"] = energy

    def _batch(self):
        idx = int(self.rng.integers(self.dataset.n_cameras))
        b = self.dataset.sample_pixels(self.rng, idx, self.stage_cfg.num_pixels)
        n = b["dirs"].shape[0]
        hdr_shift = self.rng.random((n, 1)).astype(np.float32)  # :297
        return self.shard_batch({"points": b["points"], "dirs": b["dirs"],
                                 "object_mask": b["object_mask"],
                                 "hdr_shift": hdr_shift})

    def run(self, n_iters: int, log_every: int = 0, log_fn=None) -> dict:
        import contextlib
        ctx = self.mesh if self.mesh is not None else contextlib.nullcontext()
        with ctx:
            return self._run(n_iters, log_every, log_fn)

    def _run(self, n_iters: int, log_every: int = 0, log_fn=None) -> dict:
        metrics = {}
        for _ in range(n_iters):
            batch = self._batch()
            (self._vis, self._illum, self.vis_state, self.illum_state,
             m) = self._step(self._vis, self._illum, self._frozen,
                             self.vis_state, self.illum_state,
                             self.grid_values, batch, self.next_key())
            self.cur_iter += 1
            if log_every and self.cur_iter % log_every == 0:
                metrics = {k: float(v) for k, v in m.items()}
                if log_fn:
                    log_fn(self.cur_iter, metrics)
        self.params = join_params(join_params(self._vis, self._illum),
                                  self._frozen)
        if not metrics and n_iters > 0:
            metrics = {k: float(v) for k, v in m.items()}
        return metrics


def vis_plot_to_disk(runner, dataset, idx: int = 0, plots_dir: str | None = None,
                     chunk: int = 2048, nsamp: int = 8):
    """Predicted vs traced visibility for one view
    (train_visibility.py plot_to_disk -> utils/plots.py plot_illum)."""
    import os

    import numpy as np

    from ..render.stage2 import Stage2Model, stage2_forward, trace_radiance
    from ..tools import plots

    dirs, cam_loc = dataset.camera_rays(idx)
    n = dirs.shape[0]

    # grid as a jit argument, not a closure (quad-layout buffers embedded
    # as constants blow the relay's compile-request limit, HTTP 413)
    @jax.jit
    def chunk_fn(d, o, k, g):
        model = Stage2Model(runner.params, runner.cfg, g)
        # independent keys: forward and trace both split their key first,
        # so sharing k would correlate the indirect net's noise with the
        # traced sample directions (the train step splits k_fwd/k_trace)
        k_fwd, k_trace = jax.random.split(k)
        inp = {"points": o, "dirs": d,
               "hdr_shift": jnp.full((d.shape[0], 1), 0.5)}
        fwd = stage2_forward(model, k_fwd, inp, trainstage="Illum")
        tr = trace_radiance(model, k_trace, fwd, nsamp=nsamp)
        pred = jax.nn.softmax(tr["pred_vis"], -1)[..., 1].mean(-1)
        gt = 1.0 - tr["gt_vis"].astype(jnp.float32).mean(-1)
        m = fwd["network_object_mask"]
        return jnp.where(m, pred, 1.0), jnp.where(m, gt, 1.0)

    key = runner.next_key()
    outs = []
    for i in range(0, n, chunk):
        d = dirs[i:i + chunk]
        pad = chunk - d.shape[0]
        if pad:
            d = np.concatenate([d, np.repeat(d[-1:], pad, 0)])
        o = np.broadcast_to(cam_loc, d.shape).copy()
        key, k = jax.random.split(key)
        a, b = chunk_fn(jnp.asarray(d), jnp.asarray(o), k,
                        runner.grid_values)
        cut = chunk - pad if pad else chunk
        outs.append((np.asarray(a)[:cut], np.asarray(b)[:cut]))
    out = {"pred_vis": np.concatenate([o[0] for o in outs]),
           "gt_vis": np.concatenate([o[1] for o in outs])}
    plots_dir = plots_dir or os.path.join(runner.log_dir or ".",
                                          runner.stage_name, "plots")
    gt = dataset.rgb_images[idx]
    return plots.plot_illum(out, gt, plots_dir, runner.cur_iter, dataset.img_res)
