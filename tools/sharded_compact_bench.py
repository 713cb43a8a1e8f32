"""CPU-mesh step-time ratio for the per-shard (shard_map) compaction.

Runs the REAL Vis train step on the 8-device virtual CPU mesh three ways:
dense (compaction off), round-3 global-sort compaction, and the round-4
per-shard shard_map compaction — the number SCALING.md quotes. CPU timings
are not TPU timings, but the comparison isolates exactly the collective /
serialization structure the per-shard design removes, on the only
multi-device configuration this environment has.

Usage: python tools/sharded_compact_bench.py [--pixels 256] [--nsamp 128]
"""

import argparse
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses  # noqa: E402
import tempfile  # noqa: E402

import numpy as np  # noqa: E402


def build(mesh, fan_chunk, grid_chunk, pershard, pixels, nsamp, params, cfg,
          dataset):
    """A VisRunner wired for one of the three compaction modes.

    ``pershard=False`` recreates the round-3 behavior (global sort) by
    hiding the mesh from the model while keeping the batch sharded."""
    from robir_tpu.stages.stage2_runner import StageOptConfig
    from robir_tpu.stages.vis import VisRunner, VisStageConfig

    cfg = dataclasses.replace(cfg, grid=dataclasses.replace(
        cfg.grid, compact_chunk=grid_chunk))
    r = VisRunner(cfg, params, dataset,
                  VisStageConfig(num_pixels=pixels, nsamp=nsamp,
                                 opt=StageOptConfig(lr=1e-3),
                                 shard_fan=True,
                                 fan_compact_chunk=fan_chunk),
                  mesh=mesh, seed=3)
    if not pershard and fan_chunk:
        # round-3 shape: global-sort compaction over the sharded fan.
        # shard_fan forced the chunk to 0 back then; emulate "global
        # compaction on sharded data" by stripping the mesh from the
        # model inside the step (the batch stays sharded).
        from robir_tpu.stages.vis import make_vis_step
        r._step = make_vis_step(r.cfg, r.stage_cfg, r.vis_opt, r.illum_opt,
                                mesh=None)
    r.bake_grid()
    return r


def time_steps(r, n=8):
    b = r._batch()
    k = r.next_key()
    args = (r._vis, r._illum, r._frozen, r.vis_state, r.illum_state,
            r.grid_values, b, k)
    # the r3-emulation (mesh stripped from the model) relies on the
    # ambient mesh context for its bare-PartitionSpec fan constraint,
    # exactly as round 3 ran it
    with r.mesh:
        out = r._step(*args)
        jax.block_until_ready(out)
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = r._step(*args)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pixels", type=int, default=256)
    ap.add_argument("--nsamp", type=int, default=128)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from robir_tpu.core.mesh import MeshConfig, create_mesh
    from robir_tpu.data.syn_dataset import SynDataset, SynDatasetConfig
    from robir_tpu.data.synthetic import make_sphere_dataset
    from robir_tpu.fields.envmap_material import EnvmapMaterialConfig
    from robir_tpu.fields.neus_model import NeuSConfig
    from robir_tpu.fields.radiance import RenderingConfig
    from robir_tpu.fields.sdf import SDFConfig
    from robir_tpu.fields.visibility import IndirIllumConfig, VisNetConfig
    from robir_tpu.render.color import ToneMapConfig
    from robir_tpu.render.stage2 import Stage2Config
    from robir_tpu.stages.stage2_runner import init_stage2_params
    from robir_tpu.tracing.grid import GridConfig

    scene = tempfile.mkdtemp()
    make_sphere_dataset(scene, n_train=4, n_test=1, h=64, w=64, radius=0.5)
    dataset = SynDataset(SynDatasetConfig(instance_dir=scene))
    cfg = Stage2Config(
        neus=NeuSConfig(
            sdf=SDFConfig(d_out=65, d_hidden=64, n_layers=4, skip_in=(),
                          multires=4, bias=0.5),
            color=RenderingConfig(d_feature=64, d_hidden=64, n_layers=3)),
        envmap=EnvmapMaterialConfig(multires=2, num_lgt_sgs=16,
                                    encoder_dims=(64,), decoder_dims=(32,)),
        indirect=IndirIllumConfig(multires=2, dims=(64, 64), num_lgt_sgs=8),
        visnet=VisNetConfig(points_multires=4, dirs_multires=4,
                            dims=(64, 64)),
        tonemap=ToneMapConfig(hdr_mode=2),
        grid=GridConfig(resolution=64, bbox_min=(-0.45,) * 3,
                        bbox_max=(0.45,) * 3))
    params = init_stage2_params(jax.random.PRNGKey(0), cfg)
    mesh = create_mesh(MeshConfig())

    fan = args.pixels * args.nsamp
    print(f"pixels={args.pixels} nsamp={args.nsamp} fan={fan} "
          f"({fan // 8}/shard)")
    rows = []
    for label, fan_chunk, grid_chunk, pershard in [
            ("dense", 0, 0, True),
            ("global-sort compact (r3)", 2048, 2048, False),
            ("per-shard compact (r4)", 2048, 2048, True)]:
        r = build(mesh, fan_chunk, grid_chunk, pershard, args.pixels,
                  args.nsamp, params, cfg, dataset)
        t = time_steps(r, args.reps)
        rows.append((label, t))
        print(f"  {label:28s} {t * 1e3:8.1f} ms/step")
    base = rows[0][1]
    for label, t in rows[1:]:
        print(f"  {label:28s} {base / t:5.2f}x vs dense")


if __name__ == "__main__":
    main()
