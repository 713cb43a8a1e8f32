"""Profiling hooks: jax.profiler traces + in-scan step timing.

Replaces the reference's ad-hoc instrumentation (autograd profiler wrap,
``neus/optimization/trainer.py:110-113``; commented tick() timers,
``utils/octree.py:294-300``) with first-class utilities. The scan-based
timer is the only reliable way to measure steps on a tunneled device
(per-dispatch latency and transient link stalls otherwise dominate).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an xprof/tensorboard trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_scanned(step_fn: Callable, init_carry, n_steps: int = 20,
                 reps: int = 4) -> float:
    """Best-of-``reps`` seconds/step for ``carry -> carry`` chained inside
    one jitted lax.scan, timed to a host fetch."""

    def multi(carry):
        def body(c, _):
            return step_fn(c), None

        out, _ = jax.lax.scan(body, carry, None, length=n_steps)
        return out

    f = jax.jit(multi)
    out = f(init_carry)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(init_carry)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n_steps)
    return best
