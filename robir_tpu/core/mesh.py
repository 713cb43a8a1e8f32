"""Device mesh and sharding setup.

The reference is single-GPU with a vestigial, never-used DDP helper
(``utils/dist_util.py:14-74``). Here multi-chip is first-class: one
``jax.sharding.Mesh`` with a ``data`` axis over all chips; ray/pixel batches
are sharded over ``data``; the tiny MLP parameters are replicated and their
gradients all-reduce over ICI (inserted automatically by jit from the
shardings).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """How to lay devices out. The default single-axis data mesh is correct
    for this workload (params are KB-MB scale, so no TP/PP is warranted —
    see SURVEY.md section 7.3)."""

    data: int = -1  # -1 = all available devices


def create_mesh(cfg: MeshConfig | int = MeshConfig(), devices=None) -> Mesh:
    if isinstance(cfg, int):
        cfg = MeshConfig(data=cfg)
    devices = list(devices if devices is not None else jax.devices())
    n = cfg.data if cfg.data > 0 else len(devices)
    if n > len(devices):
        raise ValueError(f"mesh wants {n} devices, only {len(devices)} present")
    return Mesh(np.array(devices[:n]).reshape(n), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host pytree so its leading axis is split over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up: call once per process before creating the mesh.

    With all arguments None, jax auto-detects the TPU pod environment. After
    this, ``jax.devices()`` spans every chip in the slice; ``create_mesh()``
    lays one 'data' axis over all of them (ICI within a host, DCN across),
    parameters stay replicated, and jit inserts the gradient psum — the
    design SURVEY.md 5.8 calls for in place of the reference's dead
    NCCL/SLURM helper (``utils/dist_util.py:14-74``).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def local_batch_slice(global_batch: int) -> slice:
    """Each host loads only its shard of the global batch
    (per-host data loading for multi-host training)."""
    n_proc = jax.process_count()
    per_host = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per_host, (i + 1) * per_host)
