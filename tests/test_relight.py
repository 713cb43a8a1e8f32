"""Relighting-parity harness (VERDICT r1 #2).

The reference test split ships relit ground truth (envmap6/12 renders,
``datasets/syn_dataset.py:101-115``) and ``scripts/relight.py`` renders
swapped-light frames + an mp4 (:62-116). These tests drive the metric path
end-to-end on the procedural sphere scene: relit PSNR is computed against
the dataset's relit GT and a video is written.
"""

import glob
import os

import jax
import numpy as np
import pytest

from robir_tpu.data.syn_dataset import SynDataset, SynDatasetConfig
from robir_tpu.data.synthetic import make_sphere_dataset
from robir_tpu.fields.envmap_material import EnvmapMaterialConfig
from robir_tpu.fields.neus_model import NeuSConfig
from robir_tpu.fields.radiance import RenderingConfig
from robir_tpu.fields.sdf import SDFConfig
from robir_tpu.fields.visibility import IndirIllumConfig, VisNetConfig
from robir_tpu.render.color import ToneMapConfig
from robir_tpu.render.stage2 import Stage2Config, Stage2Model
from robir_tpu.stages.stage2_runner import init_stage2_params
from robir_tpu.tools.relight import relight_views
from robir_tpu.tracing.grid import GridConfig, build_sdf_grid
from robir_tpu.utils.exr import write_exr

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    scene_dir = str(tmp_path_factory.mktemp("syn"))
    make_sphere_dataset(scene_dir, n_train=4, n_test=2, h=24, w=24,
                        radius=0.5)
    dataset = SynDataset(SynDatasetConfig(instance_dir=scene_dir,
                                          split="test"))

    cfg = Stage2Config(
        neus=NeuSConfig(
            sdf=SDFConfig(d_out=33, d_hidden=32, n_layers=3, skip_in=(),
                          multires=3, bias=0.5),
            color=RenderingConfig(d_feature=32, d_hidden=32, n_layers=2)),
        envmap=EnvmapMaterialConfig(multires=4, num_lgt_sgs=16,
                                    encoder_dims=(64, 64),
                                    decoder_dims=(32,)),
        indirect=IndirIllumConfig(multires=4, dims=(32, 32), num_lgt_sgs=8),
        visnet=VisNetConfig(points_multires=4, dirs_multires=4,
                            dims=(32, 32)),
        tonemap=ToneMapConfig(hdr_mode=0, gamma=1.0),
        grid=GridConfig(resolution=32, bbox_min=(-0.55,) * 3,
                        bbox_max=(0.55,) * 3))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    grid = build_sdf_grid(Stage2Model(params, cfg).sdf, cfg.grid)

    # prefit-envmap artifacts named after the dataset's relit GT condition
    env_dir = str(tmp_path_factory.mktemp("env"))
    env_path = os.path.join(env_dir, "envmap6")
    os.makedirs(env_path)
    rng = np.random.default_rng(0)
    sgs = np.concatenate([rng.standard_normal((16, 3)).astype(np.float32),
                          np.full((16, 1), 30.0, np.float32),
                          np.full((16, 3), 0.5, np.float32)], -1)
    np.save(os.path.join(env_path, "sg_128.npy"), sgs)
    write_exr(env_path + ".exr",
              np.full((8, 16, 3), 0.4, np.float32))
    return dataset, cfg, params, grid, env_path


def test_dataset_loads_relit_gt(setup):
    dataset = setup[0]
    assert set(dataset.relit_images) == {"envmap6", "envmap12"}
    assert len(dataset.relit_images["envmap6"]) == dataset.n_cameras
    assert dataset.relit_images["envmap6"][0].shape == (24 * 24, 3)


def test_relight_metrics_and_video(setup, tmp_path):
    dataset, cfg, params, grid, env_path = setup
    out_dir = str(tmp_path / "relight")
    results, metrics = relight_views(params, cfg, grid, dataset, env_path,
                                     out_dir, view_indices=[0, 1],
                                     chunk=24 * 24)
    assert len(results) == 2
    # relit-PSNR metric path (VERDICT r1 missing #1)
    assert len(metrics["relit_psnr"]) == 2
    assert np.isfinite(metrics["mean_relit_psnr"])
    assert np.isfinite(metrics["mean_relit_psnr_masked"])
    # mp4/gif output (scripts/relight.py:116)
    assert os.path.exists(metrics["video"])
    assert glob.glob(os.path.join(out_dir, "rgb_*.png"))


def test_swapped_light_drops_stale_indirect(setup, tmp_path):
    """Under a swapped envmap only sg_rgb composes the relit image
    (scripts/relight.py:78-81); under the origin light indir is added."""
    dataset, cfg, params, grid, env_path = setup
    r_swap, _ = relight_views(params, cfg, grid, dataset, env_path,
                              str(tmp_path / "a"), view_indices=[0],
                              chunk=24 * 24, write_video=False)
    r_orig, _ = relight_views(params, cfg, grid, dataset, env_path,
                              str(tmp_path / "b"), view_indices=[0],
                              chunk=24 * 24, write_video=False,
                              light_origin=True)
    m = r_swap[0]["mask"]
    assert m.any(), "sphere must be visible in the test view"
    # the indirect term itself (fresh init) is nonzero on the object, so
    # origin-light rendering (sg+indir) must differ from swapped (sg only)
    # unless tonemapping clipped both to the same saturated value
    diff = np.abs(r_swap[0]["rgb"][m] - r_orig[0]["rgb"][m])
    both_clipped = (r_swap[0]["rgb"][m] >= 1.0) & (r_orig[0]["rgb"][m] >= 1.0)
    assert (diff[~both_clipped] > 0).any()
