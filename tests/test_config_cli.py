"""Config system + CLI plumbing tests."""

import json

import numpy as np
import pytest

from robir_tpu.core.config import (apply_overrides, build_neus_config,
                                   build_stage2_config, build_stage_config,
                                   config_to_dict, load_config)


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
    assert cfg.tonemap.hdr_mode == 2

    neus = load_config("configs/neus_blender.json")
    mcfg = build_neus_config(neus["model"])
    assert mcfg.sdf.n_layers == 8 and mcfg.background is None
    assert neus["train"]["batch_size"] == 512

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
