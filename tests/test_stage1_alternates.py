"""Stage-1 alternate model/render paths driven from the CLI (VERDICT r1 #4).

The reference selects ``Trainer.model_class`` (VNeRF / NeuSModel / Hash) and
``render in {mip, neus}`` via gin (neus/optimization/trainer.py:39-48,
neus/volume_render/interface.py:37-40). Here the same dispatch comes from
config keys ``model.type`` / ``render.type``; these tests train each
alternate a short burst from the CLI and assert finite, decreasing loss.
"""

import json
import re

import numpy as np
import pytest

from robir_tpu import cli
from robir_tpu.data.synthetic import make_sphere_dataset

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sphere"))
    make_sphere_dataset(d, n_train=8, n_test=2, h=32, w=32)
    return d


def _run_cli_neus(tmp_path, scene_dir, capsys, conf: dict, n_iters=120):
    p = tmp_path / "conf.json"
    p.write_text(json.dumps(conf))
    cli.main(["neus", "--conf", str(p), "--data", scene_dir,
              "--log_dir", str(tmp_path / "logs"),
              "--n_iters", str(n_iters)])
    out = capsys.readouterr().out
    mses = [float(m) for m in re.findall(r"mse=([0-9.e+-]+)", out)]
    assert len(mses) >= 2, out
    assert np.isfinite(mses).all()
    return mses


def test_vnerf_mip_cli(tmp_path, scene_dir, capsys):
    conf = {
        "model": {"type": "vnerf", "depth": 3, "width": 48, "multires": 4,
                  "multires_view": 2, "skips": [], "use_ipe": False},
        "render": {"type": "mip", "n_levels": 2, "num_samples": 16},
        "train": {"batch_size": 128, "max_steps": 400, "lr_init": 5e-4,
                  "lr_delay_steps": 0, "eval_chunk": 256,
                  "eikonal_weight": 0.0, "silhouette_weight": 1.0},
        "dataset": {"batch_size": 128},
    }
    mses = _run_cli_neus(tmp_path, scene_dir, capsys, conf)
    assert mses[-1] < mses[0], mses


def test_mipnerf_ipe_cli(tmp_path, scene_dir, capsys):
    conf = {
        "model": {"type": "vnerf", "depth": 3, "width": 48, "multires": 4,
                  "multires_view": 2, "skips": [], "use_ipe": True,
                  "ipe_max_deg": 6},
        "render": {"type": "mip", "n_levels": 2, "num_samples": 16},
        "train": {"batch_size": 128, "max_steps": 400, "lr_init": 5e-4,
                  "lr_delay_steps": 0, "eval_chunk": 256,
                  "eikonal_weight": 0.0},
        "dataset": {"batch_size": 128},
    }
    mses = _run_cli_neus(tmp_path, scene_dir, capsys, conf)
    assert mses[-1] < mses[0], mses


def test_hash_sdf_cli(tmp_path, scene_dir, capsys):
    conf = {
        "model": {"type": "hash",
                  "hash_sdf": {"width": 32, "depth": 2, "d_out": 33,
                               "grid": {"n_levels": 4, "n_features": 2,
                                        "log2_hashmap_size": 12,
                                        "base_resolution": 4}},
                  "color": {"d_feature": 32, "d_hidden": 32, "n_layers": 2},
                  "radius": 2.0},
        "render": {"type": "neus", "n_samples": 16, "n_importance": 16,
                   "up_sample_steps": 2},
        "train": {"batch_size": 128, "max_steps": 400, "lr_init": 1e-3,
                  "lr_delay_steps": 0, "eval_chunk": 256, "anneal_end": 50},
        "dataset": {"batch_size": 128},
    }
    mses = _run_cli_neus(tmp_path, scene_dir, capsys, conf)
    assert mses[-1] < mses[0], mses


def test_unknown_types_rejected(tmp_path, scene_dir):
    from robir_tpu.core.config import build_stage1_configs
    with pytest.raises(KeyError, match="model.type"):
        build_stage1_configs({"model": {"type": "nope"}})
    with pytest.raises(KeyError, match="render.type"):
        build_stage1_configs({"model": {}, "render": {"type": "nope"}})
    from robir_tpu.stages.neus_stage import make_stage1_bindings
    with pytest.raises(KeyError, match="unsupported"):
        make_stage1_bindings("vnerf", "neus", None, None)


def test_mip_sim_mode_with_similarity_reg(tmp_path, scene_dir, capsys):
    """render.mode='sim' routes through similarity_process and the
    previously-dormant similarity regularizer goes live (reference
    trainer.py:129 similarity_reg over ret['sim_or_grad'])."""
    import re
    conf = {
        "model": {"type": "vnerf", "depth": 3, "width": 48, "multires": 4,
                  "multires_view": 2, "skips": [], "use_ipe": False},
        "render": {"type": "mip", "n_levels": 2, "num_samples": 16,
                   "mode": "sim"},
        "train": {"batch_size": 128, "max_steps": 300, "lr_init": 5e-4,
                  "lr_delay_steps": 0, "eval_chunk": 256,
                  "eikonal_weight": 0.0, "silhouette_weight": 0.0,
                  "similarity_weight": 1e-4},
        "dataset": {"batch_size": 128},
    }
    import json as jsonlib
    cp = tmp_path / "conf.json"
    cp.write_text(jsonlib.dumps(conf))
    cli.main(["neus", "--conf", str(cp), "--data", scene_dir,
              "--log_dir", str(tmp_path / "logs"), "--n_iters", "150"])
    out = capsys.readouterr().out
    mses = [float(m) for m in re.findall(r"mse=([0-9.e+-]+)", out)]
    sims = [float(m) for m in re.findall(r"similarity=([0-9.e+-]+)", out)]
    assert np.isfinite(mses).all() and len(sims) >= 1, out
    assert np.isfinite(sims).all()
