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
    add_noise,
    alpha_at,
    to_eps_x0,
)


def add_noise_at(sched: DiffusionSchedule, x0, noise, i):
    """q(x_t|x0) at step index i of the (possibly truncated) schedule —
    the sampler-space noising used for strength<1 init and known-region
    blending (reference pipeline_PowerPaint.py:713-720, 1025-1035)."""
    t = sched.timesteps[jnp.clip(i, 0, sched.num_steps - 1)]
    return add_noise(sched, x0, noise, t)


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
    *,
    eta: float = 0.0,
    noise: "jnp.ndarray | None" = None,
):
    """x_t -> x_{t-1}; eta>0 adds the DDIM stochastic term
    (Song et al. eq. 12; the reference exposes it as the ``eta`` call arg,
    pipeline_PowerPaint.py:996 extra_step_kwargs)."""
    t = sched.timesteps[i]
    t_prev = sched.prev_timesteps[i]
    a_t = alpha_at(sched, t).astype(jnp.float32)
    a_prev = alpha_at(sched, t_prev).astype(jnp.float32)

    eps, x0 = to_eps_x0(sched, model_out, x, t)
    if eta > 0.0 and noise is not None:
        var = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        sigma = eta * jnp.sqrt(var)
        x_prev = (
            jnp.sqrt(a_prev) * x0
            + jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
            + sigma * noise.astype(jnp.float32)
        )
    else:
        x_prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
    return x_prev.astype(x.dtype), state
