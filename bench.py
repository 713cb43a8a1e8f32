"""Benchmark: NeuS stage-1 training throughput (rays/sec/chip).

The reference publishes no numbers (BASELINE.md); the per-chip baseline is
the upstream NeuS workload on its reference single GPU: batch 512 rays x
64+64 samples at the commonly reported ~11 steps/s, i.e. ~5.6k rays/s.
``vs_baseline`` is measured rays/s/chip divided by that estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys

import numpy as np

REFERENCE_RAYS_PER_SEC = 5600.0  # see module docstring


def main():
    import jax

    from robir_tpu.data.blender import BlenderConfig, BlenderScene
    from robir_tpu.data.synthetic import make_sphere_dataset
    from robir_tpu.fields.neus_model import NeuSConfig
    from robir_tpu.render.neus import NeusRenderConfig
    from robir_tpu.stages.neus_stage import NeusTrainConfig, NeusTrainer

    import tempfile
    tmp = tempfile.mkdtemp(prefix="robir_bench_")
    make_sphere_dataset(tmp, n_train=8, n_test=1, h=128, w=128)
    scene = BlenderScene(BlenderConfig(dataset_dir=tmp, batch_size=512), "train")

    # Reference workload constants: 512 rays/step, 64 coarse + 64 importance
    # samples, 4 upsample rounds, 8x256 SDF + 4x256 color (blender.gin:19,
    # sdf_render.py:241-244).
    model_cfg = NeuSConfig()
    render_cfg = NeusRenderConfig(n_samples=64, n_importance=64,
                                  up_sample_steps=4)
    train_cfg = NeusTrainConfig(batch_size=512, lr_delay_steps=0)

    trainer = NeusTrainer(scene, model_cfg, render_cfg, train_cfg, mesh=None)
    rays_per_sec = trainer.throughput(n_steps=30, warmup=5)
    n_chips = len(jax.devices())
    per_chip = rays_per_sec / n_chips

    print(json.dumps({
        "metric": "neus_train_rays_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(per_chip / REFERENCE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
