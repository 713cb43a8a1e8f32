"""Config system + CLI plumbing tests."""

import json
import os

import numpy as np
import pytest

from robir_tpu.core.config import (apply_overrides, build_neus_config,

                                   build_stage2_config, build_stage_config,
                                   config_to_dict, load_config)


pytestmark = pytest.mark.slow


def test_load_config_with_comments(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('// a comment\n{\n  // another\n  "a": {"b": 1}\n}\n')
    assert load_config(str(p)) == {"a": {"b": 1}}


def test_overrides():
    cfg = {"a": {"b": 1}}
    apply_overrides(cfg, ["a.b=2", "a.c=[1,2]", 'd=hello'])
    assert cfg == {"a": {"b": 2, "c": [1, 2]}, "d": "hello"}


def test_build_reference_configs():
    """The shipped configs build valid dataclass trees at reference scale."""
    hotdog = load_config("configs/hotdog.json")
    cfg = build_stage2_config(hotdog["model"])
    assert cfg.envmap.num_lgt_sgs == 128
    assert cfg.indirect.num_lgt_sgs == 24
    assert cfg.visnet.dims == (256, 256, 256, 256)
    assert cfg.neus.sdf.d_hidden == 256
    # confs_sg/hotdog.conf:66-67: hdr_mode = 0, gamma = 1.0
    assert cfg.tonemap.hdr_mode == 0 and cfg.tonemap.gamma == 1.0

    truck = load_config("configs/truck.json")
    tcfg = build_stage2_config(truck["model"])
    assert tcfg.tonemap.hdr_mode == 0
    tcesr = truck["cesr"]
    # confs_sg/truck.conf: explore/proj swap + softplus latent (dropout_iter=-2)
    assert tcesr["explore_iter"] == 0 and tcesr["proj_iter"] == 1000
    assert tcesr["dropout_iter"] == -2

    neus = load_config("configs/neus_blender.json")
    mcfg = build_neus_config(neus["model"])
    assert mcfg.sdf.n_layers == 8 and mcfg.background is None
    assert neus["train"]["batch_size"] == 512
    # shipped TPU training config: bf16 activation storage on the trunks
    assert mcfg.sdf.storage_dtype == "bfloat16"
    assert mcfg.color.storage_dtype == "bfloat16"
    assert cfg.visnet.storage_dtype == "bfloat16"  # hotdog sweep trunk
    # frozen-bridge + cached-grid bf16 storage (stage-2 secondary-ray path)
    assert cfg.neus.sdf.storage_dtype == "bfloat16"
    assert cfg.neus.color.storage_dtype == "bfloat16"
    assert cfg.grid.storage_dtype == "bfloat16"
    assert tcfg.grid.storage_dtype == "bfloat16"

    from robir_tpu.stages.pbr import PBRStageConfig
    from robir_tpu.stages.vis import VisStageConfig
    pbr = build_stage_config(PBRStageConfig, hotdog["pbr"])
    assert pbr.num_pixels == 1024 and pbr.loss.kl_weight == 1.0
    vis = build_stage_config(VisStageConfig, hotdog["vis"])
    assert vis.nsamp == 512 and vis.loss.loss_type == "L1"


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        build_stage2_config({"envmap_material_network": {"bogus_key": 1}})


def test_config_to_dict_roundtrip():
    cfg = build_stage2_config(load_config("configs/sphere_smoke.json")["model"])
    d = config_to_dict(cfg)
    assert d["envmap"]["num_lgt_sgs"] == 16
    json.dumps(d)  # serializable for run-dir snapshots


def test_cli_parser_smoke():
    from robir_tpu import cli
    import argparse
    with pytest.raises(SystemExit):
        cli.main(["--help"])
    with pytest.raises(SystemExit):
        cli.main([])  # missing subcommand


def test_run_stage_plot_scheduling(monkeypatch, tmp_path):
    """--plot_freq N plots every N iters plus implicitly covers the tail;
    default plots once at the end; --no_plot never plots."""
    import argparse
    from robir_tpu import cli

    calls = []

    class FakeRunner:
        grid_values = object()  # skip bake
        log_dir = str(tmp_path)
        stage_name = "Vis"
        cur_iter = 0

        def run(self, n, log_every=0, log_fn=None):
            self.cur_iter += n
            return {}

        def save(self):
            return "ckpt"

        def restore_latest(self):
            return False

    monkeypatch.setattr(cli, "_plot_stage",
                        lambda runner, dataset, name: calls.append(runner.cur_iter))

    def args(**kw):
        base = dict(is_continue=False, n_iters=None, plot_freq=0,
                    no_plot=False)
        base.update(kw)
        return argparse.Namespace(**base)

    r = FakeRunner()
    cli._run_stage(r, args(plot_freq=4), 10, "Vis", dataset=object())
    assert calls == [4, 8, 10]

    calls.clear()
    r = FakeRunner()
    cli._run_stage(r, args(), 7, "Vis", dataset=object())
    assert calls == [7]

    calls.clear()
    r = FakeRunner()
    cli._run_stage(r, args(no_plot=True, plot_freq=3), 7, "Vis", dataset=object())
    assert calls == []


def test_cmd_vis_restores_norm_decoder(tmp_path, capsys):
    """Regression: the vis command must restore the Norm stage's trained
    normal decoder before training — the Illum forward offsets secondary
    rays along the AE normal map, and a random decoder poisons the
    visibility labels."""
    import jax
    import jax.numpy as jnp
    from robir_tpu import cli
    from robir_tpu.core import checkpoint as ckpt_lib
    from robir_tpu.core.config import build_stage2_config, load_config
    from robir_tpu.data.synthetic import make_sphere_dataset
    from robir_tpu.stages.stage2_runner import init_stage2_params

    scene = str(tmp_path / "scene")
    make_sphere_dataset(scene, n_train=2, n_test=1, h=24, w=24)
    log_dir = str(tmp_path / "logs")

    # a 'Norm' checkpoint whose decoder leaves are distinctively offset
    cfgd = load_config("configs/sphere_smoke.json")
    cfg = build_stage2_config(cfgd["model"])
    marked = init_stage2_params(jax.random.PRNGKey(9), cfg)
    marked = jax.tree_util.tree_map(lambda x: x + 0.125, marked)
    norm_dir = os.path.join(log_dir, "Norm", "checkpoints")
    os.makedirs(norm_dir)
    ckpt_lib.save(os.path.join(norm_dir, "latest.npz"), marked, step=1)

    captured = {}
    import robir_tpu.stages.vis as vis_mod

    class SpyRunner:
        def __init__(self, cfg, params, dataset, stage_cfg, log_dir=None,
                     seed=0, mesh=None):
            captured["params"] = params
            raise RuntimeError("stop-after-capture")

    orig = vis_mod.VisRunner
    vis_mod.VisRunner = SpyRunner
    try:
        with pytest.raises(RuntimeError, match="stop-after-capture"):
            cli.main(["vis", "--conf", "configs/sphere_smoke.json",
                      "--data", scene, "--log_dir", log_dir, "--n_iters", "1"])
    finally:
        vis_mod.VisRunner = orig

    got = captured["params"]["envmap_material_network"]["normal_decoder_layer"]
    want = marked["envmap_material_network"]["normal_decoder_layer"]
    flat_g = jax.tree_util.tree_leaves(got)
    flat_w = jax.tree_util.tree_leaves(want)
    assert all(np.allclose(g, w) for g, w in zip(flat_g, flat_w)), \
        "normal decoder was not restored from the Norm checkpoint"
    # and everything else must NOT come from the marked checkpoint
    fresh = captured["params"]["visibility_network"]
    markd = marked["visibility_network"]
    assert not np.allclose(jax.tree_util.tree_leaves(fresh)[0],
                           jax.tree_util.tree_leaves(markd)[0])


def _make_npz_scene(tmp_path, n=6, h=40, w=48):
    """Procedural cameras_sphere.npz scene (shared shape with
    test_neus_npz._make_scene)."""
    import cv2
    rng = np.random.default_rng(0)
    K = np.array([[60.0, 0, w / 2], [0, 60.0, h / 2], [0, 0, 1]], np.float32)
    os.makedirs(tmp_path / "image", exist_ok=True)
    os.makedirs(tmp_path / "mask", exist_ok=True)
    cams = {}
    for i in range(n):
        theta = 2 * np.pi * i / n
        center = 3.0 * np.array([np.cos(theta), np.sin(theta), 0.4], np.float32)
        z = -center / np.linalg.norm(center)
        x = np.cross(np.array([0, 0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_w2c = np.stack([x, y, z], 0).astype(np.float32)
        t_w2c = (-R_w2c @ center).astype(np.float32)
        P = K @ np.concatenate([R_w2c, t_w2c[:, None]], 1)
        world_mat = np.eye(4, dtype=np.float32)
        world_mat[:3, :4] = P
        cams[f"world_mat_{i}"] = world_mat
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / "image" / f"{i:03d}.png"), img)
        cv2.imwrite(str(tmp_path / "mask" / f"{i:03d}.png"),
                    np.full((h, w, 3), 255, np.uint8))
    np.savez(tmp_path / "cameras_sphere.npz", **cams)


def test_dtu_config_pipeline_smoke(tmp_path):
    """configs/dtu.json routes to DTUSceneDataset and drives a real PBR
    train step on a procedural cameras_sphere.npz scene (VERDICT r1 #3)."""
    import jax
    from robir_tpu import cli
    from robir_tpu.fields.envmap_material import EnvmapMaterialConfig
    from robir_tpu.fields.neus_model import NeuSConfig
    from robir_tpu.fields.radiance import RenderingConfig
    from robir_tpu.fields.sdf import SDFConfig
    from robir_tpu.fields.visibility import IndirIllumConfig, VisNetConfig
    from robir_tpu.render.stage2 import Stage2Config
    from robir_tpu.stages.pbr import PBRRunner, PBRStageConfig
    from robir_tpu.stages.stage2_runner import (StageOptConfig,
                                                init_stage2_params)
    from robir_tpu.tracing.grid import GridConfig

    _make_npz_scene(tmp_path)
    conf = load_config("configs/dtu.json")
    assert conf["dataset"]["type"] == "dtu"
    dataset = cli._stage2_dataset(str(tmp_path), conf)
    from robir_tpu.data.neus_npz import DTUSceneDataset
    assert isinstance(dataset, DTUSceneDataset)
    assert dataset.n_cameras == 6 and dataset.total_pixels == 40 * 48

    # reference-shaped but tiny stage-2 model over the DTU dataset
    cfg = Stage2Config(
        neus=NeuSConfig(
            sdf=SDFConfig(d_out=33, d_hidden=32, n_layers=3, skip_in=(),
                          multires=3, bias=0.5),
            color=RenderingConfig(d_feature=32, d_hidden=32, n_layers=2)),
        envmap=EnvmapMaterialConfig(multires=4, num_lgt_sgs=16,
                                    encoder_dims=(64, 64), decoder_dims=(32,)),
        indirect=IndirIllumConfig(multires=4, dims=(32, 32), num_lgt_sgs=8),
        visnet=VisNetConfig(points_multires=4, dirs_multires=4, dims=(32, 32)),
        tonemap=build_stage2_config(conf["model"]).tonemap,  # dtu: mode 0
        grid=GridConfig(resolution=48, bbox_min=(-0.45,) * 3,
                        bbox_max=(0.45,) * 3))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    pbr = PBRRunner(cfg, params, dataset,
                    PBRStageConfig(num_pixels=32, opt=StageOptConfig(lr=1e-3)),
                    log_dir=str(tmp_path / "logs"))
    pbr.bake_grid()
    m = pbr.run(3, log_every=1)
    assert np.isfinite(m["loss"])


def test_stage2_setup_keeps_idr_params(tmp_path):
    """use_neus=false from the CLI must NOT graft a stage-1 NeuS tree over
    the IDR implicit network (it has a different param structure)."""
    import argparse

    import jax
    from robir_tpu import cli
    from robir_tpu.core import checkpoint as ckpt_lib

    _make_npz_scene(tmp_path)
    # a stage-1 NeuS checkpoint exists in the log dir (the normal pipeline
    # state that used to trigger the graft unconditionally)
    neus_dir = tmp_path / "logs" / "NeuS"
    neus_dir.mkdir(parents=True)
    ckpt_lib.save(str(neus_dir / "ckpt_000010.npz"),
                  {"params": {"sdf_network": {"w": np.zeros(3, np.float32)}}})

    conf = load_config("configs/dtu.json")
    conf["model"]["use_neus"] = False
    conf["model"]["tracer"] = "sphere"
    args = argparse.Namespace(data=str(tmp_path), log_dir=str(tmp_path / "logs"),
                              seed=0)
    cfg, dataset, params = cli._stage2_setup(args, conf)
    assert not cfg.use_neus
    # IDR structure intact: per-layer linears, plus the rendering network
    assert "lin0" in params["implicit_network"]
    assert "rendering_network" in params
    assert "sdf_network" not in params["implicit_network"]


def test_mip_sdf_mode_rejected_for_density_fields():
    """render.mode='sdf' under the vnerf binding raises an actionable error
    instead of crashing on model=None inside the first train step."""
    from robir_tpu.fields.vnerf import VNeRFConfig
    from robir_tpu.render.mip import MipRenderConfig
    from robir_tpu.stages.neus_stage import mip_render_binding

    with pytest.raises(ValueError, match="density-only"):
        mip_render_binding(VNeRFConfig(), MipRenderConfig(mode="sdf"))


def test_unknown_dataset_key_rejected():
    """Typos in the shared dataset dict fail loudly instead of being
    silently dropped by the per-loader field filter."""
    from robir_tpu.cli import _filter_fields
    from robir_tpu.data.blender import BlenderConfig

    with pytest.raises(KeyError, match="frame_skp"):
        _filter_fields(BlenderConfig, {"frame_skp": 2})
    # keys of OTHER loaders pass through the union check (shared dict)
    out = _filter_fields(BlenderConfig, {"near": 1.0, "frame_skip": 2})
    assert out == {"near": 1.0}


def test_neus_test_only_flag_parses():
    from robir_tpu.cli import main
    import argparse
    # parser accepts the flag; a bogus conf path fails later, at _load
    with pytest.raises((FileNotFoundError, OSError)):
        main(["neus", "--conf", "/nonexistent.json", "--test_only"])
