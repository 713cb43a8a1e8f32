"""Command-line entry points for the RobIR-TPU pipeline.

Replaces the reference's two CLIs (``training/exp_runner.py`` argparse for
stage 2, ``neus/exp_runner.py`` absl+gin for stage 1) with one front end:

    python -m robir_tpu.cli neus   --conf configs/hotdog.json --data DIR
    python -m robir_tpu.cli mesh   --conf ... --ckpt ... --out mesh.ply
    python -m robir_tpu.cli norm   --conf ... --data DIR --mesh mesh.ply
    python -m robir_tpu.cli vis    --conf ... --data DIR
    python -m robir_tpu.cli pbr    --conf ... --data DIR
    python -m robir_tpu.cli cesr   --conf ... --data DIR
    python -m robir_tpu.cli relight --conf ... --envmap envmaps/envmap6
    python -m robir_tpu.cli sgfit  --envmap_path envmaps/envmap3.exr

Stage sequencing uses explicit ``--log_dir`` artifacts (no import-time
global path registry like ``confs_sg/env_path.py``).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--conf", type=str, required=True)
    p.add_argument("--data", type=str, default=None)
    p.add_argument("--log_dir", type=str, default="logs")
    p.add_argument("--n_iters", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   help="dotted config override, e.g. --set model.grid.resolution=128")
    p.add_argument("--is_continue", action="store_true")
    p.add_argument("--plot_freq", type=int, default=0,
                   help="render the stage's diagnostic grid every N iters "
                        "(0 = only once, after training)")
    p.add_argument("--no_plot", action="store_true",
                   help="skip diagnostic plots entirely")


def _filter_fields(dc_type, d: dict) -> dict:
    """Subset of ``d`` accepted by dataclass ``dc_type`` (the dataset dict
    is shared between the stage-1 and stage-2 loaders; each takes its own
    fields). Keys belonging to NO known loader are rejected — silent
    typo-drops degrade runs invisibly (the stage-surgery failure class)."""
    import dataclasses as _dc
    names = {f.name for f in _dc.fields(dc_type)}
    unknown = set(d) - _known_dataset_keys()
    if unknown:
        raise KeyError(
            f"unknown dataset config key(s) {sorted(unknown)}; no loader "
            "accepts them (check for typos)")
    return {k: v for k, v in d.items() if k in names}


def _known_dataset_keys() -> set:
    """Union of every dataset-loader config's field names + 'type'."""
    import dataclasses as _dc

    from .data.blender import BlenderConfig
    from .data.llff import LLFFConfig
    from .data.multicam import MulticamConfig
    from .data.neus_npz import DTUConfig, NeuSNpzSceneConfig
    from .data.syn_dataset import SynDatasetConfig
    keys = {"type"}
    for dc in (BlenderConfig, LLFFConfig, MulticamConfig, NeuSNpzSceneConfig,
               DTUConfig, SynDatasetConfig):
        keys |= {f.name for f in _dc.fields(dc)}
    return keys


def _load(args):
    from .core.config import apply_overrides, load_config
    cfg = load_config(args.conf)
    apply_overrides(cfg, args.overrides)
    return cfg


def _stage2_dataset(data_dir, cfg_dict):
    """Stage-2 dataset dispatch on the config's ``dataset.type``
    ("syn" -> SynDataset, "dtu" -> DTUSceneDataset) — replaces the
    reference's dotted-path ``train.dataset_class`` reflection
    (confs_sg/dtu.conf ``dataset_class = datasets.DTU.SceneDataset``,
    utils/general.py:11-17)."""
    ds_cfg = dict(cfg_dict.get("dataset", {}))
    kind = ds_cfg.pop("type", "syn")
    if kind == "dtu":
        from .data.neus_npz import DTUConfig, DTUSceneDataset
        return DTUSceneDataset(DTUConfig(
            data_dir=data_dir, **_filter_fields(DTUConfig, ds_cfg)))
    if kind == "syn":
        from .data.syn_dataset import SynDataset, SynDatasetConfig
        return SynDataset(SynDatasetConfig(
            instance_dir=data_dir, **_filter_fields(SynDatasetConfig,
                                                    ds_cfg)))
    raise KeyError(f"unknown dataset.type {kind!r} (expected 'syn' or 'dtu')")


def _stage2_setup(args, cfg_dict):
    import jax

    from .core.config import build_stage2_config
    from .core import checkpoint as ckpt_lib
    from .stages.stage2_runner import init_stage2_params

    cfg = build_stage2_config(cfg_dict["model"])
    dataset = _stage2_dataset(args.data, cfg_dict)
    params = init_stage2_params(jax.random.PRNGKey(args.seed), cfg)
    if not cfg.use_neus:
        # IDR mode: the implicit/rendering networks are trained in stage 2
        # itself (reference use_neus=False wiring,
        # implicit_differentiable_renderer.py:277-282) — there is no
        # stage-1 NeuS tree to graft, and grafting one would clobber the
        # IDR param structure.
        print("[stage2] IDR mode (use_neus=false): fresh implicit network, "
              "no stage-1 graft")
        return cfg, dataset, params
    # frozen stage-1 geometry: the NeuS trainer checkpoint stores the model
    # under 'params/...'; it becomes the stage-2 'implicit_network' bridge
    # (the reference's ImplicitNetworkMy tarball load, neus_model.py:770-782)
    neus_ckpt = cfg_dict.get("neus_checkpoint") or os.path.join(
        args.log_dir, "NeuS")
    path = neus_ckpt if os.path.isfile(neus_ckpt) else \
        ckpt_lib.latest_path(neus_ckpt)
    if path:
        import jax.numpy as jnp
        loaded, _ = ckpt_lib.load(path)
        params["implicit_network"] = jax.tree_util.tree_map(
            jnp.asarray, loaded["params"])
        print(f"[stage2] frozen NeuS geometry from {path}")
    else:
        print("[stage2] warning: no NeuS checkpoint found; using fresh init")
    return cfg, dataset, params


_STAGE_PLOTTERS = {
    "Norm": "robir_tpu.stages.norm:norm_plot_to_disk",
    "Vis": "robir_tpu.stages.vis:vis_plot_to_disk",
    "PBR": "robir_tpu.stages.pbr:pbr_plot_to_disk",
    "CESR": "robir_tpu.stages.cesr:cesr_plot_to_disk",
}


def _plot_stage(runner, dataset, log_name):
    """Render the stage's diagnostic grid (the reference plots every
    train.plot_freq iters; e.g. train_pbr.py:435) and, for the material
    stages, dump the current SG envmap image (train_cesr.py:363-369)."""
    import importlib
    if dataset is None:
        return
    mod_name, fn_name = _STAGE_PLOTTERS[log_name].split(":")
    fn = getattr(importlib.import_module(mod_name), fn_name)
    try:
        out = fn(runner, dataset)
        print(f"[{log_name}] plot -> {out}", flush=True)
    except Exception as e:  # plots are diagnostics; never kill training
        print(f"[{log_name}] plot failed: {e}", flush=True)
    if log_name in ("PBR", "CESR"):
        try:
            import jax.numpy as jnp
            import numpy as np
            from PIL import Image

            from .render.sg import compute_envmap
            mat = runner.model().material(jnp.zeros((1, 3)))
            env = np.asarray(compute_envmap(mat.lgt_sgs, 128, 256))
            img = np.clip(np.power(np.clip(env, 0, None), 1 / 2.2), 0, 1)
            path = os.path.join(runner.log_dir or ".", runner.stage_name,
                                "plots", f"envmap_{runner.cur_iter}.png")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            Image.fromarray((img * 255).astype(np.uint8)).save(path)
        except Exception as e:
            print(f"[{log_name}] envmap dump failed: {e}", flush=True)


def _run_stage(runner, args, stage_cfg_iters, log_name, dataset=None):
    if args.is_continue:
        runner.restore_latest()
    if runner.grid_values is None:
        runner.bake_grid()
    n = args.n_iters or stage_cfg_iters

    # console + tensorboard scalars (train_visibility.py:319-320)
    tb = None
    if runner.log_dir:
        try:
            from .tools.logger import Logger
            tb = Logger(os.path.join(runner.log_dir, log_name), log_name)
        except Exception:
            tb = None

    def log(it, m):
        line = ", ".join(f"{k}={v:.5g}" for k, v in m.items())
        print(f"[{log_name}] iter {it}: {line}", flush=True)
        if tb is not None:
            tb.log_scalars(it, tag_prefix=log_name.lower(), **m)

    plot_freq = 0 if args.no_plot else args.plot_freq
    if plot_freq > 0:
        done = 0
        while done < n:
            step = min(plot_freq, n - done)
            runner.run(step, log_every=50, log_fn=log)
            done += step
            _plot_stage(runner, dataset, log_name)
    else:
        runner.run(n, log_every=50, log_fn=log)
        if not args.no_plot:
            _plot_stage(runner, dataset, log_name)
    path = runner.save()
    print(f"[{log_name}] saved {path}")


def cmd_neus(args):
    from .core.config import build_stage1_configs
    from .data.blender import BlenderConfig, BlenderScene
    from .stages.neus_stage import (NeusTrainConfig, NeusTrainer,
                                    make_stage1_bindings)
    cfg_dict = _load(args)
    model_type, render_type, model_cfg, render_cfg = \
        build_stage1_configs(cfg_dict)
    bindings = make_stage1_bindings(model_type, render_type,
                                    model_cfg, render_cfg)
    tc = cfg_dict.get("train", {})
    train_cfg = NeusTrainConfig(**tc)
    # one config tree serves both stages; the dataset dict may carry
    # stage-2 (SynDataset) keys — each loader takes its own fields.
    # dataset.type dispatch mirrors the reference gin Data.version
    # ('naive' blender json vs 'neus' cameras_sphere.npz,
    # neus/dataset/interface.py:34-44)
    ds_dict = dict(cfg_dict.get("dataset", {}))
    ds_kind = ds_dict.pop("type", "blender")
    if ds_kind in ("neus_npz", "dtu", "neus"):
        from .data.neus_npz import NeuSNpzScene, NeuSNpzSceneConfig
        ds = _filter_fields(NeuSNpzSceneConfig, ds_dict)
        _base_cache = []
        def make_scene(split):
            sc = NeuSNpzScene(
                NeuSNpzSceneConfig(dataset_dir=args.data, **ds), split,
                base=_base_cache[0] if _base_cache else None)
            if not _base_cache:
                _base_cache.append(sc.base)
            return sc
    elif ds_kind in ("blender", "syn"):
        ds = _filter_fields(BlenderConfig, ds_dict)
        def make_scene(split):
            return BlenderScene(
                BlenderConfig(dataset_dir=args.data, **ds), split)
    elif ds_kind in ("multicam", "mip"):
        from .data.multicam import MulticamConfig, MulticamScene
        ds = _filter_fields(MulticamConfig, ds_dict)
        def make_scene(split):
            return MulticamScene(
                MulticamConfig(dataset_dir=args.data, **ds), split)
    elif ds_kind == "llff":
        from .data.llff import LLFFConfig, LLFFScene
        ds = _filter_fields(LLFFConfig, ds_dict)
        def make_scene(split):
            return LLFFScene(LLFFConfig(data_dir=args.data, **ds), split)
    else:
        raise KeyError(f"unknown stage-1 dataset.type {ds_kind!r} (expected "
                       "'blender', 'neus_npz', 'multicam', or 'llff')")
    scene = make_scene("train")
    trainer = NeusTrainer(scene, model_cfg, render_cfg, train_cfg,
                          log_dir=os.path.join(args.log_dir, "NeuS"),
                          seed=args.seed, bindings=bindings)
    test_only = getattr(args, "test_only", False)
    if args.is_continue or test_only:
        trainer.restore()
    n = args.n_iters or train_cfg.max_steps

    def log(it, m):
        print(f"[NeuS] step {it}: " + ", ".join(
            f"{k}={v:.5g}" for k, v in m.items()), flush=True)

    # test split + logger for the reference train/eval protocol
    # (in-train renders/meshes, trainer.py:75-81; final test pass with
    # video + mean PSNR + description.json, exp_runner.py:49-50)
    from .tools.logger import Logger
    logger = Logger(os.path.join(args.log_dir, "NeuS"), exp_name="neus")
    try:
        test_scene = make_scene("test")
    except (FileNotFoundError, KeyError, OSError) as e:
        print(f"[NeuS] no test split ({e}); in-train eval and the final "
              "test pass are disabled")
        test_scene = None

    if not test_only:
        trainer.run(n, log_every=50, metrics_cb=log,
                    test_scene=test_scene, logger=logger)
        print("[NeuS] saved", trainer.save())
    elif test_scene is None:
        raise FileNotFoundError(
            "--test_only needs a test split (none could be loaded)")
    if test_scene is not None:
        metrics = trainer.test(test_scene, logger=logger)
        print("[NeuS] test: " + ", ".join(
            f"{k}={v:.5g}" for k, v in metrics.items()), flush=True)
    logger.close()


def cmd_mesh(args):
    import jax

    from .core import checkpoint as ckpt_lib
    from .core.config import build_stage1_configs
    from .fields.neus_model import (HashNeuS, NeuS, init_hash_neus, init_neus)
    from .texture.mesh import extract_mesh
    cfg_dict = _load(args)
    model_type, _, model_cfg, _ = build_stage1_configs(cfg_dict)
    if model_type == "hash":
        params = init_hash_neus(jax.random.PRNGKey(0), model_cfg)
    elif model_type == "neus":
        params = init_neus(jax.random.PRNGKey(0), model_cfg)
    else:
        raise SystemExit(f"mesh extraction needs an SDF model, got "
                         f"model.type={model_type!r}")
    state = {"params": params}
    state, _ = ckpt_lib.restore_into(
        state, args.ckpt, keep=lambda p: p.startswith("params"))
    model = (HashNeuS if model_type == "hash" else NeuS)(
        state["params"], model_cfg)
    mcfg = cfg_dict.get("mesh", {})
    mesh = extract_mesh(model.sdf, resolution=mcfg.get("resolution", 256),
                        bbox_min=tuple(mcfg.get("bbox_min", (-1.2,) * 3)),
                        bbox_max=tuple(mcfg.get("bbox_max", (1.2,) * 3)))
    mesh.export_ply(args.out)
    print(f"[mesh] {len(mesh.verts)} verts, {len(mesh.tris)} tris -> {args.out}")


def cmd_norm(args):
    import jax

    from .stages.norm import NormRunner, NormStageConfig
    from .texture.focus_sampler import (TexSpaceSampler,
                                        focus_sampler_from_dataset)
    from .texture.pipeline import TexSampler
    from .tracing.grid import grid_cast
    cfg_dict = _load(args)
    cfg, dataset, params = _stage2_setup(args, cfg_dict)
    from .core.config import build_stage_config
    stage_cfg = build_stage_config(NormStageConfig, cfg_dict.get("norm"))
    runner = NormRunner(cfg, params, None, stage_cfg,
                        log_dir=args.log_dir, seed=args.seed)
    runner.bake_grid()
    ts = TexSampler(args.mesh, cfg_dict.get("texture_resolution", 2048))
    fs = focus_sampler_from_dataset(dataset)
    # grid as an explicit jit argument: closing over a baked quad-layout
    # buffer would embed a ~262 MB HLO constant (relay rejects the
    # compile request with HTTP 413)
    _trace = jax.jit(lambda g, o, d: grid_cast(g, cfg.grid, o, d))
    trace = lambda o, d: _trace(runner.grid_values, o, d)
    runner.sampler = TexSpaceSampler(
        ts, fs, trace, offset=TexSpaceSampler.offset_for_grid(cfg.grid))
    _run_stage(runner, args, stage_cfg.max_iters, "Norm", dataset=dataset)


def cmd_vis(args):
    from .core import checkpoint as ckpt_lib
    from .stages.vis import VisRunner, VisStageConfig
    cfg_dict = _load(args)
    cfg, dataset, params = _stage2_setup(args, cfg_dict)
    from .core.config import build_stage_config
    stage_cfg = build_stage_config(VisStageConfig, cfg_dict.get("vis"))
    # The Illum forward offsets secondary-ray origins along the AE normal
    # map, so the Norm stage's trained decoder must be loaded first (the
    # reference continues from the norm checkpoint, train_visibility.py:
    # 116-123); a random decoder poisons the visibility labels.
    norm_ckpt = os.path.join(args.log_dir, "Norm", "checkpoints", "latest.npz")
    if os.path.exists(norm_ckpt):
        params, _ = ckpt_lib.restore_into(
            params, norm_ckpt, keep=lambda p: "normal_decoder_layer" in p)
        print(f"[Vis] normal decoder from {norm_ckpt}")
    else:
        print("[Vis] warning: no Norm checkpoint; AE normals are untrained")
    runner = VisRunner(cfg, params, dataset, stage_cfg,
                       log_dir=args.log_dir, seed=args.seed)
    runner.bake_grid()
    runner.fit_energy_prologue()
    _run_stage(runner, args, stage_cfg.max_iters, "Vis", dataset=dataset)


def cmd_pbr(args):
    from .stages.pbr import PBRRunner, PBRStageConfig
    cfg_dict = _load(args)
    cfg, dataset, params = _stage2_setup(args, cfg_dict)
    from .core.config import build_stage_config
    stage_cfg = build_stage_config(PBRStageConfig, cfg_dict.get("pbr"))
    runner = PBRRunner(cfg, params, dataset, stage_cfg,
                       log_dir=args.log_dir, seed=args.seed)
    norm_ckpt = os.path.join(args.log_dir, "Norm", "checkpoints", "latest.npz")
    vis_ckpt = os.path.join(args.log_dir, "Vis", "checkpoints", "latest.npz")
    if os.path.exists(norm_ckpt):
        runner.load_norm_checkpoint(norm_ckpt)
    else:
        print("[PBR] warning: no Norm checkpoint, shading with geometry normals")
    if os.path.exists(vis_ckpt):
        runner.load_vis_checkpoint(vis_ckpt)
    else:
        raise SystemExit("[PBR] missing Vis checkpoint; train Vis first")
    _run_stage(runner, args, stage_cfg.max_iters, "PBR", dataset=dataset)


def cmd_cesr(args):
    from .stages.cesr import CESRRunner, CESRStageConfig
    cfg_dict = _load(args)
    cfg, dataset, params = _stage2_setup(args, cfg_dict)
    from .core.config import build_stage_config
    stage_cfg = build_stage_config(CESRStageConfig, cfg_dict.get("cesr"))
    runner = CESRRunner(cfg, params, dataset, stage_cfg,
                        log_dir=args.log_dir, seed=args.seed)
    pbr_ckpt = os.path.join(args.log_dir, "PBR", "checkpoints", "latest.npz")
    if not os.path.exists(pbr_ckpt):
        raise SystemExit("[CESR] missing PBR checkpoint; train PBR first")
    runner.load_pbr_checkpoint(pbr_ckpt)
    _run_stage(runner, args, stage_cfg.max_iters, "CESR", dataset=dataset)


def cmd_relight(args):
    from .core import checkpoint as ckpt_lib
    from .stages.stage2_runner import init_stage2_params
    from .tools.relight import relight_views
    from .tracing.grid import bake_march_layout, build_sdf_grid
    from .render.stage2 import Stage2Model
    import jax
    cfg_dict = _load(args)
    cfg, dataset, params = _stage2_setup(args, cfg_dict)
    ckpt = args.ckpt or os.path.join(args.log_dir, "CESR", "checkpoints",
                                     "latest.npz")
    if not os.path.exists(ckpt):
        ckpt = os.path.join(args.log_dir, "PBR", "checkpoints", "latest.npz")
    params, _ = ckpt_lib.restore_into(params, ckpt, ignore_unknown=True)
    # bake the march layout host-side like the runners do — a raw 3-D
    # grid with quad_rows on would rebuild the quad table in-graph per
    # render chunk (~250 ms/call)
    grid = bake_march_layout(
        build_sdf_grid(Stage2Model(params, cfg).sdf, cfg.grid), cfg.grid)
    out_dir = args.out or os.path.join(args.log_dir, "relight",
                                       os.path.basename(args.envmap))
    # relit ground truth ships with the TEST split (syn_dataset.py:101-115)
    if os.path.exists(os.path.join(args.data, "transforms_test.json")):
        from .data.syn_dataset import SynDataset, SynDatasetConfig
        test_cfg = _filter_fields(SynDatasetConfig,
                                  dict(cfg_dict.get("dataset", {})))
        test_cfg["split"] = "test"
        dataset = SynDataset(SynDatasetConfig(instance_dir=args.data,
                                              **test_cfg))
    _, metrics = relight_views(
        params, cfg, grid, dataset, args.envmap, out_dir,
        view_indices=range(min(dataset.n_cameras, args.n_views)),
        light_origin=args.light_origin, background=args.background)
    if "mean_relit_psnr" in metrics:
        for i, p in enumerate(metrics["relit_psnr"]):
            print(f"[relight] view {i}: relit_psnr={p:.3f}")
        print(f"[relight] mean_relit_psnr={metrics['mean_relit_psnr']:.3f}"
              + (f" masked={metrics['mean_relit_psnr_masked']:.3f}"
                 if "mean_relit_psnr_masked" in metrics else ""))
        with open(os.path.join(out_dir, "metrics.json"), "w") as fp:
            json.dump(metrics, fp, indent=1)
    print("[relight] wrote", out_dir)


def cmd_textures(args):
    """Bake PBR texture maps + OBJ/MTL from the latest CESR (or PBR)
    checkpoint (the reference's scripts/tex_extract.py)."""
    from .core import checkpoint as ckpt_lib
    from .stages.stage2_runner import init_stage2_params
    from .tools.tex_extract import extract_textures
    import jax
    cfg_dict = _load(args)
    cfg, dataset, params = _stage2_setup(args, cfg_dict)
    ckpt = args.ckpt or os.path.join(args.log_dir, "CESR", "checkpoints",
                                     "latest.npz")
    if not os.path.exists(ckpt):
        ckpt = os.path.join(args.log_dir, "PBR", "checkpoints", "latest.npz")
    params, _ = ckpt_lib.restore_into(params, ckpt, ignore_unknown=True)
    out_dir = args.out or os.path.join(args.log_dir, "textures")
    extract_textures(params, cfg, args.mesh, out_dir,
                     resolution=args.resolution)
    print("[textures] wrote", out_dir)


def cmd_import_ref(args):
    """Import reference-trained checkpoints (the torch artifacts the
    reference pipeline writes) into this framework's npz layout, so a
    reference scene can be rendered/relit/parity-scored here.

    - ``--stage1_tar {step:06d}.tar`` -> ``<log_dir>/NeuS/ckpt_*.npz``
      (the tarball the stage-2 bridge reloads, neus_model.py:770-782)
    - ``--stage2_pth ModelParameters/*.pth --stage CESR`` ->
      ``<log_dir>/<stage>/checkpoints/latest.npz``, grafted onto a fresh
      init with the reference's own surgery filters available via
      ``--filter`` (train_pbr.py:122-203)
    """
    from .core import import_ref

    did = False
    if args.stage1_tar:
        out_dir = os.path.join(args.log_dir, "NeuS")
        path = import_ref.import_stage1(args.stage1_tar, out_dir)
        print(f"[import-ref] stage-1 {args.stage1_tar} -> {path}")
        did = True
    if args.stage2_pth:
        cfg_dict = _load(args)
        cfg, _, params = _stage2_setup(args, cfg_dict)
        stage_dir = os.path.join(args.log_dir, args.stage, "checkpoints")
        os.makedirs(stage_dir, exist_ok=True)
        out = import_ref.import_stage2(
            args.stage2_pth, params, os.path.join(stage_dir, "latest.npz"),
            filter_name=args.filter, ignore_unknown=args.ignore_unknown)
        print(f"[import-ref] stage-2 {args.stage2_pth} "
              f"(filter={args.filter}) -> {out}")
        did = True
    if not did:
        raise SystemExit("import-ref: pass --stage1_tar and/or --stage2_pth")


def cmd_sgfit(args):
    from .stages import sg_fit
    sg_fit.main(["--envmap_path", args.envmap_path,
                 "--num_sg", str(args.num_sg),
                 "--n_iters", str(args.n_iters)]
                + (["--out_dir", args.out_dir] if args.out_dir else []))


def main(argv=None):
    parser = argparse.ArgumentParser(prog="robir_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for name, fn in [("neus", cmd_neus), ("norm", cmd_norm), ("vis", cmd_vis),
                     ("pbr", cmd_pbr), ("cesr", cmd_cesr)]:
        p = sub.add_parser(name)
        _add_common(p)
        if name == "norm":
            p.add_argument("--mesh", type=str, required=True)
        if name == "neus":
            p.add_argument("--test_only", action="store_true",
                           help="skip training; restore the latest "
                                "checkpoint and run the test pass "
                                "(reference exp_runner.py --test)")
        p.set_defaults(fn=fn)

    p = sub.add_parser("mesh")
    _add_common(p)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.set_defaults(fn=cmd_mesh)

    p = sub.add_parser("relight")
    _add_common(p)
    p.add_argument("--envmap", type=str, required=True,
                   help="dir containing sg_128.npy, with sibling <dir>.exr")
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--n_views", type=int, default=4)
    p.add_argument("--light_origin", action="store_true",
                   help="render under the training light (sg+indir; "
                        "scripts/relight.py:78-81)")
    p.add_argument("--background", choices=["envmap", "white"],
                   default="envmap",
                   help="background compositing for relit frames")
    p.set_defaults(fn=cmd_relight)

    p = sub.add_parser("textures")
    _add_common(p)
    p.add_argument("--mesh", type=str, required=True)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--resolution", type=int, default=1024)
    p.set_defaults(fn=cmd_textures)

    p = sub.add_parser("import-ref")
    _add_common(p)
    p.add_argument("--stage1_tar", type=str, default=None,
                   help="reference {step:06d}.tar stage-1 checkpoint")
    p.add_argument("--stage2_pth", type=str, default=None,
                   help="reference ModelParameters/*.pth stage-2 checkpoint")
    p.add_argument("--stage", type=str, default="CESR",
                   choices=["Norm", "Vis", "PBR", "CESR"],
                   help="which stage directory the stage-2 import lands in")
    p.add_argument("--filter", type=str, default="all",
                   choices=["all", "pbr_resume", "norm_only", "illum"],
                   help="reference surgery filter (train_pbr.py:122-203)")
    p.add_argument("--ignore_unknown", action="store_true",
                   help="drop imported paths missing from this config's "
                        "param tree instead of raising")
    p.set_defaults(fn=cmd_import_ref)

    p = sub.add_parser("sgfit")
    p.add_argument("--envmap_path", type=str, required=True)
    p.add_argument("--num_sg", type=int, default=128)
    p.add_argument("--n_iters", type=int, default=100_000)
    p.add_argument("--out_dir", type=str, default=None)
    p.set_defaults(fn=cmd_sgfit)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
