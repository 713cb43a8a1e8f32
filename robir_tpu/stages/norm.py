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
        if not metrics:
            metrics = {k: float(v) for k, v in m.items()}
        return metrics
