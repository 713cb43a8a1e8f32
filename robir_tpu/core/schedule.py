"""Scalar schedules, usable host-side or traced inside jit.

Capability parity with the reference schedule family
(``utils/schedule.py:23-157`` and ``neus/misc/schedule.py``):
constant / linear / exponential / cosine-easing / step / piecewise / delayed,
plus the mip-NeRF log-lerp learning-rate decay used by the stage-1 trainer
(``neus/misc/math.py:91-124``).

TPU-native design: schedules are *pure functions of the step*, not stateful
``Curve`` objects walked through module attributes
(``utils/schedule.py:200-209``). A step value can be a Python int (host-side)
or a traced jnp scalar (inside a jitted train step) — all math is jnp.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping, Sequence, Union

import jax.numpy as jnp
import numpy as np

ScheduleFn = Callable[[Any], jnp.ndarray]


def constant(value: float) -> ScheduleFn:
    return lambda step: jnp.float32(value) + 0.0 * jnp.asarray(step, jnp.float32)


def linear(initial_value: float, final_value: float, num_steps: int) -> ScheduleFn:
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        if num_steps == 0:
            return jnp.full_like(s, final_value)
        alpha = jnp.minimum(s / num_steps, 1.0)
        return (1.0 - alpha) * initial_value + alpha * final_value

    return fn


def exponential(initial_value: float, final_value: float, num_steps: int,
                eps: float = 1e-10) -> ScheduleFn:
    if initial_value <= final_value:
        raise ValueError("final value must be less than initial value")
    fv = max(final_value, eps)
    base = fv / initial_value

    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        exponent = s / max(num_steps - 1, 1)
        val = initial_value * base ** exponent
        return jnp.where(s >= num_steps, jnp.float32(final_value), val)

    return fn


def cosine_easing(initial_value: float, final_value: float, num_steps: int) -> ScheduleFn:
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        x = jnp.clip(s / num_steps, 0.0, 1.0)
        scale = final_value - initial_value
        return initial_value + scale * 0.5 * (1 + jnp.cos(jnp.pi * x + jnp.pi))

    return fn


def step_decay(initial_value: float, decay_interval: int, decay_factor: float,
               max_decays: int, final_value: float | None = None) -> ScheduleFn:
    if final_value is None:
        final_value = initial_value * decay_factor ** max_decays

    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        phase = jnp.floor(s / decay_interval)
        val = initial_value * decay_factor ** phase
        return jnp.where(phase >= max_decays, jnp.float32(final_value), val)

    return fn


def piecewise(segments: Sequence[tuple[int, Any]]) -> ScheduleFn:
    """``segments`` = [(num_steps, schedule_config), ...]; each sub-schedule
    sees a step counted from its own start."""
    fns = [from_config(cfg) for _, cfg in segments]
    milestones = np.cumsum([n for n, _ in segments])[:-1]

    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        out = fns[0](s)
        base = 0.0
        for i, m in enumerate(milestones):
            out = jnp.where(s >= m, fns[i + 1](s - m), out)
        del base
        return out

    return fn


def delayed(base: Any, delay_steps: int, delay_mult: float) -> ScheduleFn:
    base_fn = from_config(base)

    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        delay_rate = delay_mult + (1 - delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(s / delay_steps, 0, 1))
        return delay_rate * base_fn(s)

    return fn


_SCHEDULE_MAP = {
    "constant": constant,
    "linear": linear,
    "exponential": exponential,
    "cosine_easing": cosine_easing,
    "step": step_decay,
    "piecewise": piecewise,
    "delayed": delayed,
}


def from_config(cfg: Union[float, int, Sequence, Mapping, ScheduleFn]) -> ScheduleFn:
    """Build a schedule fn from a scalar, ('type', *args) tuple, or dict."""
    if callable(cfg):
        return cfg
    if isinstance(cfg, (int, float)):
        return constant(float(cfg))
    if isinstance(cfg, (tuple, list)):
        kind, *args = cfg
        return _SCHEDULE_MAP[kind](*args)
    if isinstance(cfg, Mapping):
        d = dict(cfg)
        kind = d.pop("type")
        return _SCHEDULE_MAP[kind](**d)
    raise ValueError(f"unknown schedule config: {cfg!r}")


def log_lerp_lr(lr_init: float, lr_final: float, max_steps: int,
                lr_delay_steps: int = 0, lr_delay_mult: float = 1.0) -> ScheduleFn:
    """Mip-NeRF continuous LR decay (reference ``neus/misc/math.py:91-124``):
    log-linear interpolation from lr_init to lr_final with an optional
    reverse-cosine warmup. Traceable, so it plugs into optax as a schedule."""

    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(s / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = jnp.clip(s / max_steps, 0, 1)
        log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
        return delay_rate * log_lerp

    return fn


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    """Hashable wrapper so schedule configs can ride in static jit args."""

    kind: str
    args: tuple = ()

    def build(self) -> ScheduleFn:
        return _SCHEDULE_MAP[self.kind](*self.args)
