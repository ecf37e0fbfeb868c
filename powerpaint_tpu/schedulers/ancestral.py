"""Euler-ancestral sampler (stochastic, sigma space).

The k-diffusion/A1111 "Euler a" sampler — member of the
``KarrasDiffusionSchedulers`` family the reference pipelines accept
(reference pipeline_PowerPaint.py:198).  Each step takes a deterministic
Euler sub-step down to ``sigma_down`` and re-injects fresh Gaussian noise
at ``sigma_up``, preserving the marginal variance exactly:

    sigma_up^2   = sigma_next^2 * (sigma^2 - sigma_next^2) / sigma^2
    sigma_down^2 = sigma_next^2 - sigma_up^2
    x' = x + (sigma_down - sigma) * eps + sigma_up * z,  z ~ N(0, I)

Stochastic: the pipeline supplies per-iteration noise keyed on the
per-image seed, so batched results reproduce standalone runs bit-exactly
(the same per-image-threefry discipline as the v1 latent noise).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers.common import (
    alphas_cumprod,
    kept_timesteps,
    sigma_add_noise_at,
    sigma_scale_model_input,
)

stochastic = True


class AncestralState(NamedTuple):
    dummy: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class AncestralSchedule:
    config: SchedulerConfig
    timesteps: jnp.ndarray  # (S,) int32
    sigmas: jnp.ndarray  # (S+1,) fp32, sigmas[-1] = 0
    sigma_down: jnp.ndarray  # (S,) fp32
    sigma_up: jnp.ndarray  # (S,) fp32
    num_steps: int
    init_noise_sigma_val: float

    @property
    def init_noise_sigma(self) -> float:
        return self.init_noise_sigma_val


def make_ancestral_schedule(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None
) -> AncestralSchedule:
    acp = alphas_cumprod(cfg)
    ts = kept_timesteps(cfg, num_steps, keep_steps)
    S = len(ts)
    sig = np.sqrt((1.0 - acp[ts]) / acp[ts])
    sigmas = np.concatenate([sig, [0.0]])
    up = np.zeros(S)
    down = np.zeros(S)
    for i in range(S):
        s, sn = sigmas[i], sigmas[i + 1]
        up2 = sn ** 2 * (s ** 2 - sn ** 2) / s ** 2
        up[i] = np.sqrt(up2)
        down[i] = np.sqrt(max(sn ** 2 - up2, 0.0))
    return AncestralSchedule(
        config=cfg,
        timesteps=jnp.asarray(ts, jnp.int32),
        sigmas=jnp.asarray(sigmas, jnp.float32),
        sigma_down=jnp.asarray(down, jnp.float32),
        sigma_up=jnp.asarray(up, jnp.float32),
        num_steps=S,
        init_noise_sigma_val=float(np.sqrt(sigmas[0] ** 2 + 1.0)),
    )


add_noise_at = sigma_add_noise_at


def init_state(sched, shape, dtype) -> AncestralState:
    return AncestralState(dummy=jnp.zeros((), jnp.float32))


scale_model_input = sigma_scale_model_input


def step(
    sched: AncestralSchedule,
    state: AncestralState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, AncestralState]:
    s = sched.sigmas[i]
    xf = x.astype(jnp.float32)
    eps = model_out.astype(jnp.float32)
    x_next = xf + (sched.sigma_down[i] - s) * eps
    if noise is not None:
        x_next = x_next + sched.sigma_up[i] * noise.astype(jnp.float32)
    return x_next.astype(x.dtype), state
