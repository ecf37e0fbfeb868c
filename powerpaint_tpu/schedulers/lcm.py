"""LCM sampler (latent consistency model, arXiv 2310.04378).

Companion to the v2 pipeline's LCM guidance-embedding path (reference
``StableDiffusionPowerPaintBrushNetPipeline`` accepts a
``guidance_scale_embedding``-conditioned UNet; LCM-LoRA merged via io/lora
turns the base model into a consistency model sampled in 2-8 steps).

Semantics (diffusers LCMScheduler):
- Timesteps are drawn from the coarse ``original_inference_steps`` grid
  the consistency distillation trained on (k = T / origin; grid
  ``k-1, 2k-1, ...``), subsampled evenly for the requested step count.
- Each step computes the epsilon->x0 prediction, applies the consistency
  boundary conditions

      c_skip = sd^2 / (s^2 + sd^2),   c_out = s / sqrt(s^2 + sd^2),
      s = timestep * timestep_scaling,  sd = 0.5,
      denoised = c_out * x0_pred + c_skip * x,

  and — on every step but the last — re-noises ``denoised`` to the next
  timestep with FRESH Gaussian noise (consistency sampling is a chain of
  jump-to-x0 + renoise, not an ODE).
- CFG should be OFF (guidance is embedded); the pipeline's
  guidance_scale=1 path applies.

Stochastic: the pipeline supplies per-iteration noise keyed on the
per-image seed (batched == standalone reproducibility).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers.common import alphas_cumprod, vp_add_noise_at

stochastic = True

SIGMA_DATA = 0.5


class LCMState(NamedTuple):
    dummy: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LCMSchedule:
    config: SchedulerConfig
    timesteps: jnp.ndarray  # (S,) int32 descending
    alphas_cumprod_j: jnp.ndarray
    c_skip: jnp.ndarray  # (S,)
    c_out: jnp.ndarray  # (S,)
    a_next: jnp.ndarray  # (S,) alphas_cumprod at t_{i+1} (last: 1 -> no-op)
    num_steps: int

    @property
    def init_noise_sigma(self) -> float:
        return 1.0


def make_lcm_schedule(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None
) -> LCMSchedule:
    acp = alphas_cumprod(cfg)
    T = cfg.num_train_timesteps
    origin = cfg.original_inference_steps
    if num_steps > origin:
        raise ValueError(
            f"LCM supports at most original_inference_steps={origin} steps, "
            f"got {num_steps}"
        )
    k = T // origin
    grid_desc = (np.arange(1, origin + 1) * k - 1)[::-1]  # descending
    idx = np.floor(
        np.linspace(0, len(grid_desc), num=num_steps, endpoint=False)
    ).astype(np.int64)
    ts = grid_desc[idx]
    if keep_steps is not None and keep_steps < len(ts):
        ts = ts[len(ts) - keep_steps:]
    S = len(ts)

    scaled = ts.astype(np.float64) * cfg.timestep_scaling
    c_skip = SIGMA_DATA ** 2 / (scaled ** 2 + SIGMA_DATA ** 2)
    c_out = scaled / np.sqrt(scaled ** 2 + SIGMA_DATA ** 2)
    a_next = np.ones(S)
    for i in range(S - 1):
        a_next[i] = acp[int(ts[i + 1])]

    return LCMSchedule(
        config=cfg,
        timesteps=jnp.asarray(ts, jnp.int32),
        alphas_cumprod_j=jnp.asarray(acp, jnp.float32),
        c_skip=jnp.asarray(c_skip, jnp.float32),
        c_out=jnp.asarray(c_out, jnp.float32),
        a_next=jnp.asarray(a_next, jnp.float32),
        num_steps=S,
    )


add_noise_at = vp_add_noise_at


def init_state(sched, shape, dtype) -> LCMState:
    return LCMState(dummy=jnp.zeros((), jnp.float32))


def scale_model_input(sched, x, i):
    return x


def step(
    sched: LCMSchedule,
    state: LCMState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, LCMState]:
    t = sched.timesteps[i]
    a = sched.alphas_cumprod_j[t]
    alpha_t, sigma_t = jnp.sqrt(a), jnp.sqrt(1.0 - a)
    xf = x.astype(jnp.float32)
    x0 = (xf - sigma_t * model_out.astype(jnp.float32)) / alpha_t
    denoised = sched.c_out[i] * x0 + sched.c_skip[i] * xf
    is_last = i >= sched.num_steps - 1
    an = sched.a_next[i]
    renoised = jnp.sqrt(an) * denoised
    if noise is not None:
        renoised = renoised + jnp.sqrt(1.0 - an) * noise.astype(jnp.float32)
    x_next = jnp.where(is_last, denoised, renoised)
    return x_next.astype(x.dtype), state
