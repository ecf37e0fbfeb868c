"""DDIM sampler — pure functions over (schedule, step index).

Math follows Song et al. 2020 / the DDIM scheduler semantics the reference
relies on (UI labels its steps "DDIM steps", reference app.py:675).  eta=0
deterministic path; ``clip_sample=False`` (SD convention).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from powerpaint_tpu.schedulers.common import (
    DiffusionSchedule,
    alpha_at,
    to_eps_x0,
)


class DDIMState(NamedTuple):
    """DDIM is memoryless; state is a placeholder for API uniformity."""

    dummy: jnp.ndarray


def init_state(sched: DiffusionSchedule, shape, dtype) -> DDIMState:
    del shape, dtype
    return DDIMState(dummy=jnp.zeros((), jnp.float32))


def scale_model_input(sched: DiffusionSchedule, x, i):
    del sched, i
    return x


def step(
    sched: DiffusionSchedule,
    state: DDIMState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
):
    """x_t -> x_{t-1} (deterministic, eta=0)."""
    t = sched.timesteps[i]
    t_prev = sched.prev_timesteps[i]
    a_t = alpha_at(sched, t).astype(jnp.float32)
    a_prev = alpha_at(sched, t_prev).astype(jnp.float32)

    eps, x0 = to_eps_x0(sched, model_out, x, t)
    x_prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
    return x_prev.astype(x.dtype), state
