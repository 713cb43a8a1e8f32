"""Checkpoint save/restore with partial ("surgical") loading.

Replaces both reference schemes:
- stage-1 single tarball ``{step:06d}.tar`` of model+optimizer state
  (``neus/optimization/log.py:75-88``),
- stage-2 directory-per-module ``ModelParameters/{epoch|latest}.pth`` plus
  key-filtered cross-stage surgery (``training/train_pbr.py:122-203``).

Format: one ``.npz`` per checkpoint holding path-flattened leaves plus a
JSON metadata blob. Partial restore is explicit path filtering via
:mod:`robir_tpu.core.tree` — the same semantics as the reference's
``strict=False`` filtered ``load_state_dict``, but impossible to get
silently wrong (unknown paths raise).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable

import jax
import numpy as np

from .tree import (Params, flatten_with_paths, from_plain, merge_trees,
                   to_plain, unflatten_paths)

_META_KEY = "__meta__"


def save(path: str, tree: Params, *, step: int = 0, extra: dict | None = None) -> None:
    """Write pytree to ``path`` (.npz). Accepts arbitrary pytrees (dicts,
    NamedTuples, optax states). Atomic via temp-file rename."""
    flat = flatten_with_paths(to_plain(tree))
    arrays = {k: np.asarray(jax.device_get(v))
              for k, v in flat.items() if v is not None}
    meta = {"step": int(step), "extra": extra or {}}
    arrays[_META_KEY] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load(path: str) -> tuple[Params, dict]:
    """Load pytree + metadata from ``path``."""
    with np.load(path) as data:
        meta = json.loads(bytes(data[_META_KEY]).decode()) if _META_KEY in data else {}
        flat = {k: data[k] for k in data.files if k != _META_KEY}
    return unflatten_paths(flat), meta


def restore_into(base: Params, path: str,
                 keep: Callable[[str], bool] | None = None,
                 ignore_unknown: bool = False) -> tuple[Params, dict]:
    """Partial restore: load ``path``, optionally filter leaf paths with
    ``keep``, and merge into ``base`` (paths absent from the file keep their
    ``base`` values; paths in the file but not in ``base`` raise unless
    ``ignore_unknown``). ``base`` may be an arbitrary pytree; the result has
    ``base``'s structure."""
    loaded, meta = load(path)
    flat = flatten_with_paths(loaded)
    if keep is not None:
        flat = {k: v for k, v in flat.items() if keep(k)}
    plain_base = to_plain(base)
    if ignore_unknown:
        known = set(flatten_with_paths(plain_base))
        flat = {k: v for k, v in flat.items() if k in known}
    merged = merge_trees(plain_base, unflatten_paths(flat))
    return from_plain(base, merged), meta


_STEP_RE = re.compile(r"^ckpt_(\d+)\.npz$")


def step_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"ckpt_{step:06d}.npz")


def latest_path(ckpt_dir: str) -> str | None:
    """Newest checkpoint in a directory (reference resume semantics:
    ``neus/optimization/log.py:44-73`` picks the last sorted ``.tar``)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return step_path(ckpt_dir, max(steps))
