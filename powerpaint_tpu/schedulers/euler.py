"""Euler discrete sampler (Karras-style sigma formulation).

Not shipped in the reference's default configs but accepted by its pipelines
(any ``KarrasDiffusionSchedulers``, reference pipeline_PowerPaint.py:198);
included so users migrating sampler settings find it.  Uses the
sigma = sqrt((1-acp)/acp) parameterization with ``scale_model_input``
dividing by sqrt(sigma^2+1) — unlike DDIM/PNDM/UniPC this family has
init_noise_sigma = sigma_max.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers.common import alphas_cumprod, kept_timesteps


class EulerState(NamedTuple):
    dummy: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class EulerSchedule:
    config: SchedulerConfig
    timesteps: jnp.ndarray  # (S,) int32 descending
    sigmas: jnp.ndarray  # (S+1,) fp32, sigmas[-1] = 0
    num_steps: int
    init_noise_sigma_val: float

    @property
    def init_noise_sigma(self) -> float:
        return self.init_noise_sigma_val


def make_euler_schedule(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None
) -> EulerSchedule:
    acp = alphas_cumprod(cfg)
    ts = kept_timesteps(cfg, num_steps, keep_steps)
    sig = np.sqrt((1.0 - acp[ts]) / acp[ts])
    sigmas = np.concatenate([sig, [0.0]]).astype(np.float32)
    init_sigma = float(np.sqrt(sigmas[0] ** 2 + 1.0))
    return EulerSchedule(
        config=cfg,
        timesteps=jnp.asarray(ts, jnp.int32),
        sigmas=jnp.asarray(sigmas),
        num_steps=len(ts),
        init_noise_sigma_val=init_sigma,
    )


def add_noise_at(sched: EulerSchedule, x0, noise, i):
    """Euler latents live in UNSCALED sigma space (diffusers
    EulerDiscreteScheduler.add_noise): x = x0 + sigma_i * noise.  At
    i == num_steps, sigma is 0 and this returns x0 exactly."""
    s = sched.sigmas[jnp.clip(i, 0, sched.num_steps)]
    return (x0.astype(jnp.float32)
            + s * noise.astype(jnp.float32)).astype(x0.dtype)


def init_state(sched, shape, dtype) -> EulerState:
    return EulerState(dummy=jnp.zeros((), jnp.float32))


def scale_model_input(sched: EulerSchedule, x, i):
    s = sched.sigmas[i]
    return (x.astype(jnp.float32) / jnp.sqrt(s * s + 1.0)).astype(x.dtype)


def step(
    sched: EulerSchedule,
    state: EulerState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
) -> Tuple[jnp.ndarray, EulerState]:
    """Euler step in sigma space; epsilon prediction."""
    s = sched.sigmas[i]
    s_next = sched.sigmas[i + 1]
    xf = x.astype(jnp.float32)
    eps = model_out.astype(jnp.float32)
    # x0 = x - sigma*eps ; derivative d = (x - x0)/sigma = eps
    x_next = xf + (s_next - s) * eps
    return x_next.astype(x.dtype), state
