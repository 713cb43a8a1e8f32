"""Reference-scale sharded Vis step smoke (VERDICT r3 next-step 7).

The multichip dryrun runs tiny toy configs; this executes ONE Vis train
step at REFERENCE constants on the 8-device virtual CPU mesh — 256 pixels
x 512 secondary dirs (131,072-ray fan, 16,384 rays/shard), 8x256 SDF
trunk + 4x256 color net, 256^3 tracer grid, 4x256 visibility MLP — so any
sharding-only failure (collective shapes, the per-shard compaction sort at
reference fan sizes, HBM-scale array layouts) surfaces here rather than on
first multi-chip hardware.

The tracer grid is baked ANALYTICALLY (a sphere SDF evaluated on the grid
nodes) instead of through the NeuS MLP: baking 256^3 = 16.7M points
through the reference-size trunk is pure bake-path cost the toy dryrun
already covers, and on CPU it would dominate the smoke's wall time without
exercising anything sharded.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/refscale_sharded_smoke.py
Records wall time; SCALING.md quotes the result.
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    from robir_tpu.core.mesh import MeshConfig, create_mesh
    from robir_tpu.data.syn_dataset import SynDataset, SynDatasetConfig
    from robir_tpu.data.synthetic import make_sphere_dataset
    from robir_tpu.render.stage2 import Stage2Config
    from robir_tpu.stages.stage2_runner import (StageOptConfig,
                                                init_stage2_params)
    from robir_tpu.stages.vis import VisRunner, VisStageConfig
    from robir_tpu.tracing.grid import GridConfig
    import dataclasses
    import tempfile

    assert len(jax.devices()) >= 8, "needs the 8-device CPU mesh"

    scene = tempfile.mkdtemp()
    make_sphere_dataset(scene, n_train=4, n_test=1, h=64, w=64, radius=0.5)
    dataset = SynDataset(SynDatasetConfig(instance_dir=scene))

    # REFERENCE constants: Stage2Config() defaults mirror the reference
    # confs (8x256 SDF, 4x256 color, 4x256 visnet, 128 lgtSGs); only the
    # grid bbox adapts to the procedural scene.
    cfg = Stage2Config(grid=GridConfig(resolution=256,
                                       bbox_min=(-0.45,) * 3,
                                       bbox_max=(0.45,) * 3))
    t0 = time.time()
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(MeshConfig())
    runner = VisRunner(cfg, params, dataset,
                       VisStageConfig(num_pixels=256, nsamp=512,
                                      opt=StageOptConfig(lr=5e-4),
                                      shard_fan=True,
                                      fan_compact_chunk=4096),
                       mesh=mesh, seed=0)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    # analytic bake: same grid array the MLP bake would produce, shaped
    # for the real tracer
    t0 = time.time()
    R = cfg.grid.resolution
    ax = [np.linspace(cfg.grid.bbox_lo[i], cfg.grid.bbox_hi[i], R,
                      dtype=np.float32) for i in range(3)]
    g = np.stack(np.meshgrid(*ax, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.25  # stage-2 coords (world/2)
    runner.grid_values = runner.place_replicated(
        jnp.asarray(sdf, cfg.grid.store))
    print(f"grid bake (analytic 256^3): {time.time() - t0:.1f}s", flush=True)

    b = runner._batch()
    assert len(b["points"].addressable_shards) == 8
    fan = 256 * 512
    print(f"fan: {fan} rays, {fan // 8}/shard; grid {R}^3", flush=True)

    t0 = time.time()
    m = runner.run(1, log_every=1)
    compile_and_first = time.time() - t0
    t0 = time.time()
    m = runner.run(1, log_every=1)
    second = time.time() - t0
    print(f"step 1 (incl. compile): {compile_and_first:.1f}s; "
          f"step 2: {second:.1f}s", flush=True)
    print("metrics:", {k: round(float(v), 5) for k, v in m.items()},
          flush=True)
    for k in ("radiance_loss", "visibility_loss"):
        assert np.isfinite(m[k]), m
    print("REFSCALE SHARDED SMOKE PASS", flush=True)


if __name__ == "__main__":
    main()
