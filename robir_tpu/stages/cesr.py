"""Stage CESR (RVE): shadow/illumination removal.

Parity: ``training/train_cesr.py`` (ClusteredAlbedoTrainRunner): adds a
fresh per-light diffuse-visibility ``shadow_net`` (SDF-style 8x512 MLP, in =
PE10(x) (+) 128-dim one-hot light label -> 2 logits, ``:106-110``) and a
refined ``normal_net`` (PE10(x) -> 3); the SG render runs with lin_diff=True
and the per-SG diffuse visibility (softmax[..., 1]) replacing the sampled
visibility (``get_sg_render:465-544``); rgb recomposed as
``diffuse_lgt * albedo / pi + specular`` (``:523-524``); explore / project /
warmup schedule drives the KL supervision weights (``is_explore_step /
prefit_option:546-559``); latent dropout resamples the spec-AE ``var`` mask
every ``dropout_iter`` steps (``:639-641``).

TPU-native: the explore/project phase is a static argument (two jitted step
variants), the dropout mask is explicit state passed into the step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.syn_dataset import SynDataset
from ..fields.encoding import PEConfig, positional_encoding
from ..fields.sdf import SDFConfig, init_sdf, sdf_apply
from ..render import sg as sg_lib
from ..render.color import as_input, hdr2ldr
from ..render.stage2 import Stage2Config, Stage2Model, stage2_forward
from .losses import (InvLossConfig, latent_smooth_loss, masked_spec_kl,
                     rgb_loss)
from .pbr import white_loss
from .stage2_runner import (Stage2RunnerBase, StageOptConfig, join_params,
                            make_adam, split_params)

SHADOW_PE = PEConfig(num_freqs=10, input_dims=3)


@dataclasses.dataclass(frozen=True)
class CESRStageConfig:
    num_pixels: int = 1024
    max_iters: int = 200_001
    opt: StageOptConfig = StageOptConfig(lr=5e-4)
    loss: InvLossConfig = InvLossConfig()
    explore_smooth: float = 0.1
    explore_kl: float = 1.0
    proj_smooth: float = 0.01
    proj_kl: float = 0.01
    explore_iter: int = 1000
    proj_iter: int = 0
    dropout_iter: int = 0
    warmup_iters: int = 500
    normal_switch_iter: int = 1000
    white_light: bool = False
    argmax_vis: bool = False
    num_lights: int = 128  # set to envmap num_lgt_sgs (one-hot label size)
    # shade only chunks holding surface pixels (reference shades
    # points[surface_mask] only); 0 = dense. Uses the row-output render
    # with the KL/white/normal-consistency reductions in the step — the
    # weighted means equal the dense ones exactly.
    # CAVEAT: on high-surface batches compaction is SLOWER than dense
    # (remat replay with nothing to skip); the runner auto-switches to a
    # dense step above compact_max_surface_frac, like the PBR runner.
    compact_chunk: int = 128
    compact_max_surface_frac: float = 0.6
    guard_every: int = 8
    # ambient_anchor > 0 reweights the diffuse-vis KL per LIGHT LOBE:
    # broad (small-lambda, ambient-carrying) lobes get weight
    # 1 + ambient_anchor / (1 + lambda), sharp lobes ~1. Motivated by the
    # round-5 drift mechanism (tools/cesr_diag.py): the shadow net's cast-
    # shadow detection on the KEY lobes is correct, but it over-suppresses
    # the broad ambient lobes at shadow points (all-lobe vis 0.25 vs ~1
    # physical) — anchoring exactly those lobes harder to the sampled
    # visibility targets the failure without touching the key-lobe
    # dynamics. 0.0 = reference weighting (uniform lobe mean).
    ambient_anchor: float = 0.0
    # scales the diffuse-visibility supervision (the KL anchoring
    # shadow_net_vis to the Vis-stage sampled visibility). 1.0 keeps the
    # reference weighting (train_cesr.py:397-403 factors). The round-5
    # drift study measured the shadow/lit albedo ratio GROWING with CESR
    # iterations (1.169 @ 600 -> 1.280 @ 1800 on the plain scene) as the
    # rgb term pulls the shadow net to suppress ambient lobes at shadow
    # points past physical occlusion (tools/cesr_diag.py: all-lobe vis
    # 0.25 in shadow); raising this anchors harder.
    sv_weight: float = 1.0

    @property
    def shadow_cfg(self) -> SDFConfig:
        # SDFNetwork(PE + one-hot, 2, 512, 8, [4], multires=0)
        return SDFConfig(d_in=SHADOW_PE.out_dim + self.num_lights, d_out=2,
                         d_hidden=512, n_layers=8, skip_in=(4,), multires=0)

    @property
    def normal_cfg(self) -> SDFConfig:
        return SDFConfig(d_in=SHADOW_PE.out_dim, d_out=3, d_hidden=512,
                         n_layers=8, skip_in=(4,), multires=0)

    def prefit_option(self, cur_iter: int) -> str:
        """train_cesr.py:546-559."""
        if cur_iter <= self.warmup_iters:
            return "warmup"
        cycle = self.explore_iter + self.proj_iter
        if cycle > 0 and (cur_iter % cycle) >= self.proj_iter:
            return "explore"
        return "project"


def shadow_net_vis(shadow_params, cfg: CESRStageConfig, points: jnp.ndarray,
                   num_lights: int) -> jnp.ndarray:
    """Per-light diffuse visibility: [N, 3] -> [N, L] softmax[..., 1]
    (train_cesr.py:492-504).

    Factorized over (points) x (labels) like visnet_outer_apply: the input
    to the trunk is PE(x) (+) one-hot(l), so in the first layer (and the
    skip layer's input half) the PE projection is identical across all L
    labels — compute it once per point — and the one-hot projection is a
    row of the weight matrix. Exact same math as materializing the
    [N*L, pe+L] concat, without the (N, L, pe+L) broadcast input or the
    N*L redundant PE-half MACs."""
    n = points.shape[0]
    L = num_lights
    scfg = cfg.shadow_cfg
    pe = positional_encoding(jax.lax.stop_gradient(points), SHADOW_PE)
    d_pe = pe.shape[-1]

    def eff_w(p):
        if "v" in p:
            return p["v"] * (p["g"] / (jnp.linalg.norm(p["v"], axis=0) + 0.0))
        return p["w"]

    num_layers = len(scfg.dims)
    inv_sqrt2 = 1.0 / np.sqrt(2)
    h = None
    for layer in range(num_layers - 1):
        p = shadow_params[f"lin{layer}"]
        w, b = eff_w(p), p["b"]
        if layer == 0:
            # w rows: [pe (d_pe), one-hot (L)]
            pe_part = pe @ w[:d_pe]                      # [n, out]
            lab_part = w[d_pe:d_pe + L]                  # [L, out]
            h = pe_part[:, None, :] + lab_part[None] + b
        elif layer in scfg.skip_in:
            # concat([h, inputs]) / sqrt(2) @ w, with inputs = pe (+) onehot
            d_h = h.shape[-1]
            h = (h @ w[:d_h]
                 + (pe @ w[d_h:d_h + d_pe])[:, None, :]
                 + w[d_h + d_pe:d_h + d_pe + L][None]) * inv_sqrt2 + b
        else:
            h = h @ w + b
        if layer < num_layers - 2:
            h = jax.nn.softplus(h * 100.0) / 100.0
    return jax.nn.softmax(h, -1)[..., 1]


def normal_net_apply(normal_params, cfg: CESRStageConfig,
                     points: jnp.ndarray) -> jnp.ndarray:
    pe = positional_encoding(jax.lax.stop_gradient(points), SHADOW_PE)
    n = sdf_apply(normal_params, cfg.normal_cfg, pe)
    return n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-4, None)


def cesr_sg_render(model: Stage2Model, key, points, view_dirs, indir_lgt_sgs,
                   indir_integral=None, *, shadow_params, normal_params,
                   stage_cfg: CESRStageConfig, prefit: str, use_new_normal: bool,
                   spec_var=None, train_spec=True, surface_mask=None,
                   row_outputs: bool = False, chunk_key=None, **_) -> dict:
    """CESR get_sg_render (train_cesr.py:465-544).

    ``surface_mask`` ([N] bool, from the dense stage2_forward) weights the
    batch-statistic supervision terms (shadow-net KL, normal-consistency):
    the reference shades surface points only, so its versions never see
    miss rays (whose dense lanes collapse to the camera origin).

    ``row_outputs=True`` returns only per-row arrays — the supervision
    SCALARS are replaced by their per-row ingredients (``supervise_x``
    [N, M] |gt - vis| and ``normal_sq`` [N, 3]) for the step to reduce
    outside a surface-pixel compaction; white_loss (params-only) moves to
    the step too. The weighted batch means are row-separable, so the
    reduced losses equal the dense ones exactly."""
    view_dirs = view_dirs / (jnp.linalg.norm(view_dirs, axis=-1, keepdims=True) + 1e-6)
    normals = model.sdf_gradient(points)
    normals = normals / jnp.clip(jnp.linalg.norm(normals, axis=-1, keepdims=True),
                                 1e-4, None)

    k_mat, k_sg = jax.random.split(key)
    if chunk_key is not None:   # per-row draws: per-chunk stream
        k_mat = chunk_key
    mat = model.material(points, key=k_mat, train_spec=train_spec,
                         spec_var=spec_var)
    indir_integral = indir_integral * 2 * np.pi
    normal_map = jax.lax.stop_gradient(mat.normal_map)

    num_lights = mat.lgt_sgs.shape[0]
    diffuse_vis = shadow_net_vis(shadow_params, stage_cfg, points, num_lights)
    normal_new = normal_net_apply(normal_params, stage_cfg, points)
    shade_normal = normal_new if use_new_normal else normal_map

    sv_weight = (None if surface_mask is None
                 else surface_mask.astype(jnp.float32))
    sg_ret = sg_lib.render_with_all_sg(
        k_sg, jax.lax.stop_gradient(points), shade_normal, view_dirs,
        mat.lgt_sgs, jnp.abs(mat.specular_reflectance), mat.roughness,
        mat.diffuse_albedo, indir_lgt_sgs=indir_lgt_sgs,
        indir_integral=indir_integral, vis_fn=model.vis_logits,
        vis_outer_fn=model.vis_logits_outer,
        lin_diff=True, diffuse_vis=diffuse_vis, prefit=prefit,
        argmax_vis=stage_cfg.argmax_vis,
        diffuse_sweep_chunk=model.cfg.sweep_light_chunk,
        supervise_weight=sv_weight, supervise_rows=row_outputs,
        spec_key=(None if chunk_key is None
                  else jax.random.fold_in(chunk_key, 2)))

    # recompose rgb: diffuse light x albedo / pi + specular (:523-524)
    sg_rgb = sg_ret.sg_diffuse_rgb * mat.diffuse_albedo / np.pi + sg_ret.sg_specular_rgb
    indir_rgb = (sg_ret.indir_diffuse_rgb * mat.diffuse_albedo / np.pi
                 + sg_ret.indir_specular_rgb)

    out = {
        "normals": normals, "sg_rgb": sg_rgb, "indir_rgb": indir_rgb,
        "sg_diffuse_rgb": sg_ret.sg_diffuse_rgb,
        "sg_specular_rgb": sg_ret.sg_specular_rgb,
        "indir_diffuse_rgb": sg_ret.indir_diffuse_rgb,
        "indir_specular_rgb": sg_ret.indir_specular_rgb,
        "vis_shadow": sg_ret.vis_shadow,
        "diffuse_albedo": mat.diffuse_albedo, "roughness": mat.roughness,
        "metallic": mat.metallic, "normal_map": normal_new,
        "random_xi_roughness": mat.random_xi_roughness,
        "random_xi_metallic": mat.random_xi_metallic,
        "random_xi_diffuse_albedo": mat.random_xi_diffuse_albedo,
    }
    if row_outputs:
        out["supervise_x"] = sg_ret.supervise        # [N, M] |gt - vis|
        out["normal_sq"] = (normal_map - normal_new) ** 2
        return out

    supervise = sg_ret.supervise
    if stage_cfg.white_light and prefit != "warmup":
        supervise = supervise + white_loss(mat.lgt_sgs)
    # normal-consistency over surface points only (train_cesr.py:524 runs
    # on the masked subset)
    if sv_weight is None:
        supervise = supervise + jnp.mean((normal_map - normal_new) ** 2)
    else:
        w = sv_weight[:, None]
        supervise = supervise + jnp.sum(
            w * (normal_map - normal_new) ** 2) / jnp.clip(
            jnp.sum(w) * 3, 1.0, None)
    out["gradient_error"] = supervise
    out["supervise"] = supervise
    return out


def make_cesr_step(cfg: Stage2Config, stage_cfg: CESRStageConfig,
                   optimizer: optax.GradientTransformation, mesh=None):
    import functools

    @functools.partial(jax.jit, static_argnames=("prefit", "use_new_normal",
                                                 "use_rgb_loss"))
    def step(trainable, frozen, opt_state, grid_values, spec_var, batch, key,
             prefit: str, use_new_normal: bool, use_rgb_loss: bool):
        def loss_fn(tp):
            params = join_params(tp, frozen)
            model_params = {k: v for k, v in params.items()
                            if k not in ("shadow_net", "normal_net")}
            model = Stage2Model(model_params, cfg, grid_values, mesh=mesh)
            n = batch["dirs"].shape[0]
            hdr_shift = jnp.broadcast_to(as_input(params["gamma"]), (n, 1))
            inp = {"points": batch["points"], "dirs": batch["dirs"],
                   "object_mask": batch["object_mask"], "hdr_shift": hdr_shift}

            compact = int(getattr(stage_cfg, "compact_chunk", 0))
            row_mode = 0 < compact < n
            # static config in the partial; ARRAY deps (shadow/normal nets,
            # spec_var) go through sg_kwargs so stage2_forward can route
            # them as explicit compact_apply consts — a closure over them
            # breaks under the per-shard (shard_map) compaction
            render = functools.partial(
                cesr_sg_render, stage_cfg=stage_cfg,
                prefit=prefit, use_new_normal=use_new_normal,
                row_outputs=row_mode)
            out = stage2_forward(model, key, inp, trainstage="Material",
                                 sg_render_fn=render, train_spec=True,
                                 compact_chunk=compact if row_mode else 0,
                                 shadow_params=params["shadow_net"],
                                 normal_params=params["normal_net"],
                                 spec_var=spec_var)

            metrics = {}
            if row_mode:
                # sv_loss from the compacted per-row ingredients — the
                # weighted means are over surface rows only, exactly the
                # dense computation (miss rows carry weight 0)
                w = out["surface_mask"].astype(jnp.float32)
                factor = {"warmup": 0.1, "project": 0.2}.get(prefit, 1.0)
                lobe_w = None
                if stage_cfg.ambient_anchor > 0:
                    lam = jnp.abs(jax.lax.stop_gradient(
                        params["envmap_material_network"]["lgtSGs"][:, 3]))
                    lobe_w = 1.0 + stage_cfg.ambient_anchor / (1.0 + lam)
                sv = sg_lib.kl_divergence(out["supervise_x"], 0.01,
                                          weight=w,
                                          lobe_weight=lobe_w) * factor
                if stage_cfg.white_light and prefit != "warmup":
                    sv = sv + white_loss(
                        params["envmap_material_network"]["lgtSGs"])
                w1 = w[:, None]
                sv = sv + jnp.sum(w1 * out["normal_sq"]) / jnp.clip(
                    jnp.sum(w1) * 3, 1.0, None)
                total = sv * stage_cfg.sv_weight
            else:
                # sv_loss (train_cesr.py:433)
                total = out["supervise"] * stage_cfg.sv_weight
            metrics["sv_loss"] = total

            if use_rgb_loss:
                pred = out["sg_rgb"] + out["indir_rgb"]
                pred = hdr2ldr(params["gamma"], cfg.tonemap, pred)
                mask = out["network_object_mask"] & out["object_mask"]
                sg_rgb_loss = rgb_loss(stage_cfg.loss, pred, batch["rgb"], mask)

                if prefit == "project":
                    smooth_w, kl_w = stage_cfg.proj_smooth, stage_cfg.proj_kl
                else:
                    smooth_w, kl_w = stage_cfg.explore_smooth, stage_cfg.explore_kl

                # reference weighting: loss = sg_rgb_weight*rgb
                # + (kl_weight*kl)*kl_w + (latent_smooth_weight*smooth)*smooth_w
                # (model/loss.py:116-124 composed with train_cesr.py:409-412)
                kl = masked_spec_kl(
                    params["envmap_material_network"], cfg.envmap,
                    out["points"], mask,
                    var=spec_var) * stage_cfg.loss.kl_weight * kl_w
                smooth = latent_smooth_loss(
                    out["diffuse_albedo"], out["roughness"],
                    out["random_xi_diffuse_albedo"], out["random_xi_roughness"]
                ) * stage_cfg.loss.latent_smooth_weight * smooth_w
                total = (total + stage_cfg.loss.sg_rgb_weight * sg_rgb_loss
                         + kl + smooth)
                w = mask.astype(jnp.float32)[:, None]
                mse = jnp.sum(w * (pred - batch["rgb"]) ** 2) / jnp.clip(
                    jnp.sum(w) * 3, 1.0, None)
                metrics.update({"rgb_loss": sg_rgb_loss, "kl": kl,
                                "smooth": smooth,
                                "psnr": -10 / np.log(10) * jnp.log(mse + 1e-12)})
            metrics["loss"] = total
            mask_f = (out["network_object_mask"]
                      & out["object_mask"]).astype(jnp.float32)
            metrics["surface_frac"] = jnp.mean(mask_f)
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, metrics

    return step


class CESRRunner(Stage2RunnerBase):
    stage_name = "CESR"
    TRAINABLE = ("gamma", "envmap_material_network", "shadow_net", "normal_net")

    def __init__(self, cfg: Stage2Config, params: dict, dataset: SynDataset,
                 stage_cfg: CESRStageConfig = CESRStageConfig(),
                 log_dir: str | None = None, seed: int = 0, mesh=None):
        # fresh shadow/normal nets (train_cesr.py:106-110).
        # num_lights is the one-hot label width over the envmap's SG lights
        # — any value other than num_lgt_sgs is wrong by construction
        # (shadow_net_vis sizes its labels from lgt_sgs at trace time), so
        # always reconcile rather than failing with a shape error inside jit.
        if stage_cfg.num_lights != cfg.envmap.num_lgt_sgs:
            print(f"[CESR] num_lights {stage_cfg.num_lights} != "
                  f"envmap num_lgt_sgs {cfg.envmap.num_lgt_sgs}; using "
                  f"{cfg.envmap.num_lgt_sgs}")
            stage_cfg = dataclasses.replace(
                stage_cfg, num_lights=cfg.envmap.num_lgt_sgs)
        if stage_cfg.dropout_iter == -2:
            # truck-config variant: softplus latent activation on the
            # specular-BRDF encoder (train_cesr.py:186-188)
            cfg = dataclasses.replace(
                cfg, envmap=dataclasses.replace(cfg.envmap,
                                                spec_lc_act="softplus"))
        params = dict(params)
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 77))
        params["shadow_net"] = init_sdf(k1, stage_cfg.shadow_cfg)
        params["normal_net"] = init_sdf(k2, stage_cfg.normal_cfg)
        super().__init__(cfg, params, log_dir, seed, mesh=mesh)
        self.stage_cfg = stage_cfg
        self.dataset = dataset
        self.optimizer = make_adam(stage_cfg.opt)
        self._trainable, self._frozen = split_params(params, self.TRAINABLE)
        self.opt_state = self.optimizer.init(self._trainable)
        self._step = make_cesr_step(cfg, stage_cfg, self.optimizer,
                                      mesh=self.mesh)
        # dense twin for the high-surface auto-guard (built lazily)
        self._dense_step = None
        self._surface_frac = None
        self.spec_var = jnp.zeros((cfg.envmap.latent_dim,))

    def load_pbr_checkpoint(self, path: str) -> None:
        """Drop cluster/spec_brdf keys unless dropout disabled
        (train_cesr.py:136-139)."""
        no_discard = self.stage_cfg.dropout_iter == -1
        self.restore_surgical(
            path,
            keep=lambda p: (not p.startswith(("shadow_net", "normal_net")))
            and ("spec_brdf" not in p or no_discard))
        self._trainable, self._frozen = split_params(self.params, self.TRAINABLE)
        self.opt_state = self.optimizer.init(self._trainable)

    def _batch(self):
        idx = int(self.rng.integers(self.dataset.n_cameras))
        b = self.dataset.sample_pixels(self.rng, idx, self.stage_cfg.num_pixels)
        return self.shard_batch({"points": b["points"], "dirs": b["dirs"],
                                 "object_mask": b["object_mask"],
                                 "rgb": b["rgb"]})

    def _pick_step(self):
        """Dense/compacted switch on the measured surface fraction —
        compaction only pays when there are miss rows to skip."""
        sc = self.stage_cfg
        if (sc.compact_chunk > 0 and self._surface_frac is not None
                and self._surface_frac > sc.compact_max_surface_frac):
            if self._dense_step is None:
                self._dense_step = make_cesr_step(
                    self.cfg, dataclasses.replace(sc, compact_chunk=0),
                    self.optimizer, mesh=self.mesh)
            return self._dense_step
        return self._step

    def run(self, n_iters: int, log_every: int = 0, log_fn=None) -> dict:
        sc = self.stage_cfg
        metrics = {}
        for _ in range(n_iters):
            batch = self._batch()
            prefit = sc.prefit_option(self.cur_iter)
            self._trainable, self.opt_state, m = self._pick_step()(
                self._trainable, self._frozen, self.opt_state,
                self.grid_values, self.spec_var, batch, self.next_key(),
                prefit=prefit,
                use_new_normal=self.cur_iter > sc.normal_switch_iter,
                use_rgb_loss=self.cur_iter > sc.warmup_iters)
            self.cur_iter += 1
            if self.cur_iter % sc.guard_every == 0:
                self._surface_frac = float(m["surface_frac"])
            # latent dropout resample (train_cesr.py:639-641)
            if sc.dropout_iter > 0 and self.cur_iter % sc.dropout_iter == 0:
                self.spec_var = (jax.random.uniform(
                    self.next_key(), self.spec_var.shape) > 0.8).astype(jnp.float32)
            if log_every and self.cur_iter % log_every == 0:
                metrics = {k: float(v) for k, v in m.items()}
                if log_fn:
                    log_fn(self.cur_iter, metrics)
        self.params = join_params(self._trainable, self._frozen)
        if not metrics and n_iters > 0:
            metrics = {k: float(v) for k, v in m.items()}
        return metrics


def cesr_plot_to_disk(runner, dataset, idx: int = 0, plots_dir: str | None = None,
                      chunk: int = 8000):
    """Render the CESR grid for one view (train_cesr.py plot_to_disk ->
    utils/plots.py plot_cesr)."""
    import functools
    import os

    from ..tools import plots
    from .stage2_runner import render_view
    from ..render.stage2 import Stage2Model

    sc = runner.stage_cfg
    model_params = {k: v for k, v in runner.params.items()
                    if k not in ("shadow_net", "normal_net")}
    model = Stage2Model(model_params, runner.cfg, runner.grid_values)
    render = functools.partial(
        cesr_sg_render, stage_cfg=sc,
        prefit=sc.prefit_option(runner.cur_iter),
        use_new_normal=runner.cur_iter > sc.normal_switch_iter,
        row_outputs=True)
    out = render_view(model, dataset, idx, sg_render_fn=render,
                      key=runner.next_key(), chunk=chunk,
                      shadow_params=runner.params["shadow_net"],
                      normal_params=runner.params["normal_net"],
                      spec_var=runner.spec_var)
    plots_dir = plots_dir or os.path.join(runner.log_dir or ".",
                                          runner.stage_name, "plots")
    gt = dataset.rgb_images[idx]
    return plots.plot_cesr(out, gt, plots_dir, runner.cur_iter,
                           dataset.img_res, idx)
