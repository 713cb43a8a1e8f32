"""Logger, distributed helpers, and DTU/logger smoke tests."""

import os

import numpy as np

from robir_tpu.core.mesh import local_batch_slice
from robir_tpu.tools.logger import Logger


def test_logger_sinks(tmp_path):
    log = Logger(str(tmp_path), "exp1")
    log.log_scalars(1, loss=0.5, psnr=20.0)
    log.log_rays_per_sec(1, 12345.0)
    img_path = log.log_image(1, "render", np.random.rand(8, 8, 3))
    assert os.path.exists(img_path)
    vid_path = log.log_video("orbit", [np.random.rand(8, 8, 3)] * 4, fps=4)
    assert os.path.exists(vid_path)
    log.log_json(render_time=1.5, mean_psnr=21.0)
    log.snapshot_config({"a": 1})
    log.close()
    assert os.path.exists(os.path.join(log.log_dir, "description.json"))
    assert os.path.exists(os.path.join(log.log_dir, "config.json"))
    # tensorboard event file exists
    assert any(f.startswith("events") for f in os.listdir(log.log_dir))


def test_logger_mesh(tmp_path):
    from robir_tpu.texture.mesh import Mesh
    mesh = Mesh(np.zeros((3, 3), np.float32), np.array([[0, 1, 2]], np.int32))
    log = Logger(str(tmp_path), "exp2")
    p = log.log_mesh(7, mesh)
    assert os.path.exists(p) and p.endswith("mesh_000007.ply")


def test_local_batch_slice_single_process():
    s = local_batch_slice(64)
    assert s == slice(0, 64)


def test_time_scanned():
    import jax.numpy as jnp
    from robir_tpu.tools.profiler import time_scanned
    dt = time_scanned(lambda c: c * 0.999 + 1e-4, jnp.ones((64, 64)),
                      n_steps=5, reps=2)
    assert 0 < dt < 1.0


def test_mutual_info_metric():
    """Correlated edge maps show higher MI than independent ones."""
    from robir_tpu.tools.tex_extract import mutual_information
    rng = np.random.default_rng(0)
    base = rng.random((64, 64, 3)).astype(np.float32)
    mi_same = mutual_information(base, base * 0.5 + 0.2)
    mi_indep = mutual_information(base, rng.random((64, 64, 3)).astype(np.float32))
    assert mi_same > mi_indep
