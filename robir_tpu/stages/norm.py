"""Stage Norm: distill geometry normals into the AE normal map.

Parity: ``training/train_normal.py`` (NormalTrainRunner, minimum_mem path —
the shipped configuration): per iteration, sample texture-space surface
points with their mesh normals (``simple_data_batch``), train the
``normal_decoder_layer`` SparseAE with MSE against the mesh normals plus
(after iter 500) an L1 smoothness pair loss (``pbr_step:302-345``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..fields.envmap_material import EnvmapMaterialConfig
from ..fields.sparse_ae import sparse_ae_apply
from ..fields.encoding import integrated_pos_enc
from ..render.stage2 import Stage2Config
from ..texture.focus_sampler import TexSpaceSampler
from .stage2_runner import (Stage2RunnerBase, StageOptConfig, join_params,
                            make_adam, split_params)


@dataclasses.dataclass(frozen=True)
class NormStageConfig:
    num_pixels: int = 1024
    max_iters: int = 200_001
    smooth_after: int = 500
    opt: StageOptConfig = StageOptConfig(lr=5e-4)


def make_norm_step(cfg: Stage2Config, stage_cfg: NormStageConfig,
                   optimizer: optax.GradientTransformation):
    env_cfg: EnvmapMaterialConfig = cfg.envmap

    @jax.jit
    def step(trainable, frozen, opt_state, batch, cur_iter, key):
        points = batch["points"]
        normals_gt = batch["normals"]
        mask = batch["object_mask"].astype(jnp.float32)[:, None]

        def loss_fn(tp):
            params = join_params(tp, frozen)
            ae = params["envmap_material_network"]["normal_decoder_layer"]
            pts_ipe = integrated_pos_enc(points, jnp.full_like(points, 1e-5),
                                         env_cfg.ipe)
            normal, xi_normal = sparse_ae_apply(ae, env_cfg.normal_ae,
                                                pts_ipe, key)
            normal = normal / jnp.clip(
                jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-4, None)
            xi_normal = xi_normal / jnp.clip(
                jnp.linalg.norm(xi_normal, axis=-1, keepdims=True), 1e-4, None)

            denom = jnp.clip(jnp.sum(mask) * 3, 1.0, None)
            normal_loss = jnp.sum(mask * (normal - normals_gt) ** 2) / denom
            smooth_loss = jnp.sum(mask * jnp.abs(normal - xi_normal)) / denom
            use_smooth = (cur_iter > stage_cfg.smooth_after).astype(jnp.float32)
            loss = normal_loss + use_smooth * smooth_loss
            return loss, {"loss": loss, "normal_loss": normal_loss,
                          "smooth_loss": smooth_loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    return step


class NormRunner(Stage2RunnerBase):
    stage_name = "Norm"
    TRAINABLE = ("envmap_material_network/normal_decoder_layer",)

    def __init__(self, cfg: Stage2Config, params: dict,
                 tex_space_sampler: TexSpaceSampler,
                 stage_cfg: NormStageConfig = NormStageConfig(),
                 log_dir: str | None = None, seed: int = 0, mesh=None):
        super().__init__(cfg, params, log_dir, seed, mesh=mesh)
        self.stage_cfg = stage_cfg
        self.sampler = tex_space_sampler
        self.optimizer = make_adam(stage_cfg.opt)
        self._trainable, self._frozen = split_params(params, self.TRAINABLE)
        self.opt_state = self.optimizer.init(self._trainable)
        self._step = make_norm_step(cfg, stage_cfg, self.optimizer)

    def _batch(self):
        b = self.sampler.simple_data_batch(self.rng, self.stage_cfg.num_pixels)
        return self.shard_batch(b)

    def run(self, n_iters: int, log_every: int = 0, log_fn=None) -> dict:
        metrics = {}
        for _ in range(n_iters):
            batch = self._batch()
            self._trainable, self.opt_state, m = self._step(
                self._trainable, self._frozen, self.opt_state, batch,
                jnp.asarray(self.cur_iter, jnp.int32), self.next_key())
            self.cur_iter += 1
            if log_every and self.cur_iter % log_every == 0:
                metrics = {k: float(v) for k, v in m.items()}
                if log_fn:
                    log_fn(self.cur_iter, metrics)
        self.params = join_params(self._trainable, self._frozen)
        if not metrics and n_iters > 0:
            metrics = {k: float(v) for k, v in m.items()}
        return metrics


def get_neus_surface(model, points, view_dirs, pred_normals, n_samp: int = 32,
                     dist: float = 0.05):
    """Short-segment NeuS integration of surface position and normal.

    Parity: NormalTrainRunner.get_neus_surface (train_normal.py:239-286):
    march backward along the view ray from each surface point, composite
    position/normal with the NeuS alpha weights (alpha clipped to
    [0.01, 0.99]), fall back to (points, pred_normals) for residual weight.
    ``model`` is a Stage2Model (the frozen bridge). Returns
    (final_x [N,3], final_normal [N,3], gradient_error scalar).
    """
    t = jnp.linspace(0.0, dist, n_samp)[:, None]
    xs = points[:, None, :] - t[None, :, :] * view_dirs[:, None, :]
    flat = xs.reshape(-1, 3)

    sdfs = model.sdf(flat).reshape(-1, n_samp, 1)
    normals = model.sdf_gradient(flat).reshape(-1, n_samp, 3)

    next_sdf = jnp.concatenate([sdfs[:, 1:], sdfs[:, -1:]], 1).reshape(-1, 1)
    prev_sdf = jnp.concatenate([sdfs[:, :-1], sdfs[:, -1:]], 1).reshape(-1, 1)
    if model.neus is None:
        raise ValueError(
            "get_neus_surface needs the frozen NeuS bridge (its alpha uses "
            "the deviation network's inv_s); the Norm stage's short-segment "
            "integration is undefined with model.use_neus=false")
    inv_s = model.neus.inv_s()
    prev_cdf = jax.nn.sigmoid(prev_sdf * inv_s)
    next_cdf = jax.nn.sigmoid(next_sdf * inv_s)
    alpha = jnp.clip(((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
                      ).reshape(-1, n_samp), 0.01, 0.99)
    trans = jnp.cumprod(jnp.concatenate(
        [jnp.ones((alpha.shape[0], 1)), 1.0 - alpha + 1e-10], -1), -1)
    weight = (alpha * trans[:, :-1])[..., None]
    res = 1 - jnp.sum(weight, axis=-2)

    final_x = jnp.sum(xs * weight, axis=-2) + res * points
    final_normal = jnp.sum(normals * weight, axis=-2) + res * pred_normals

    pts_norm = jnp.linalg.norm(flat, axis=-1).reshape(-1, n_samp)
    relax = jax.lax.stop_gradient((pts_norm < 1.2).astype(jnp.float32))
    grad_err = jnp.sum(relax * (jnp.linalg.norm(normals, axis=-1) - 1.0) ** 2
                       ) / (jnp.sum(relax) + 1e-5)
    return final_x, final_normal, grad_err


def norm_plot_to_disk(runner, dataset, idx: int = 0, plots_dir: str | None = None,
                      chunk: int = 8000):
    """AE normals vs NeuS short-segment normals for one view
    (train_normal.py plot_to_disk -> utils/plots.py plot_norm)."""
    import os

    import numpy as np

    from ..fields.encoding import integrated_pos_enc
    from ..render.stage2 import Stage2Model
    from ..tools import plots

    dirs, cam_loc = dataset.camera_rays(idx)
    n = dirs.shape[0]

    # grid as a jit argument, not a closure: a baked quad-layout buffer
    # (GridConfig.quad_rows) as an embedded constant blows the relay's
    # compile-request size limit (HTTP 413)
    @jax.jit
    def chunk_fn(d, o, g):
        model = Stage2Model(runner.params, runner.cfg, g)
        t, hit, x = model.trace(o, d)
        pts_ipe = integrated_pos_enc(x, jnp.full_like(x, 1e-5),
                                     runner.cfg.envmap.ipe)
        ae = runner.params["envmap_material_network"]["normal_decoder_layer"]
        normal, _ = sparse_ae_apply(ae, runner.cfg.envmap.normal_ae, pts_ipe)
        normal = normal / jnp.clip(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-4, None)
        _, neus_n, _ = get_neus_surface(model, x, d, normal)
        m = hit[:, None]
        return jnp.where(m, normal, 1.0), jnp.where(m, neus_n, 1.0)

    outs = []
    for i in range(0, n, chunk):
        d = dirs[i:i + chunk]
        pad = chunk - d.shape[0]
        if pad:
            d = np.concatenate([d, np.repeat(d[-1:], pad, 0)])
        o = np.broadcast_to(cam_loc, d.shape).copy()
        a, b = chunk_fn(jnp.asarray(d), jnp.asarray(o), runner.grid_values)
        cut = chunk - pad if pad else chunk
        outs.append((np.asarray(a)[:cut], np.asarray(b)[:cut]))
    out = {"normals": np.concatenate([o[0] for o in outs]),
           "normal_neus": np.concatenate([o[1] for o in outs])}
    plots_dir = plots_dir or os.path.join(runner.log_dir or ".",
                                          runner.stage_name, "plots")
    gt = dataset.rgb_images[idx]
    return plots.plot_norm(out, gt, plots_dir, runner.cur_iter, dataset.img_res)
