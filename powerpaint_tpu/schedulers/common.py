"""Diffusion schedule tables + timestep spacing (functional, fp32).

Equivalent of the scheduler configuration the reference inherits from
diffusers (SD1.5 scaled-linear betas; "leading" timestep spacing with
steps_offset=1 — reference pipeline_PowerPaint.py:906, app.py:197).  All
tables are precomputed as fp32 jnp arrays; step functions gather by STEP
INDEX so the denoise loop is a clean ``lax.scan`` over ``i``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Static per-run tables (host-computed numpy -> jnp on first use)."""

    config: SchedulerConfig
    alphas_cumprod: jnp.ndarray  # (T,) fp32
    final_alpha_cumprod: float
    timesteps: jnp.ndarray  # (S,) int32, descending
    prev_timesteps: jnp.ndarray  # (S,) int32 (t - T//S), may go negative
    num_steps: int

    @property
    def init_noise_sigma(self) -> float:
        return 1.0  # DDIM/PNDM/UniPC family (variance-preserving)


def betas(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(
                cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                cfg.num_train_timesteps, dtype=np.float64,
            )
            ** 2
        )
    if cfg.beta_schedule == "linear":
        return np.linspace(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps,
            dtype=np.float64,
        )
    raise ValueError(cfg.beta_schedule)


def alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    return np.cumprod(1.0 - betas(cfg), axis=0)


def spaced_timesteps(cfg: SchedulerConfig, num_steps: int) -> np.ndarray:
    """Descending inference timesteps (diffusers 'leading' spacing +
    steps_offset, the SD1.5 default)."""
    T = cfg.num_train_timesteps
    if cfg.timestep_spacing == "leading":
        ratio = T // num_steps
        ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64)
        ts = ts + cfg.steps_offset
    elif cfg.timestep_spacing == "trailing":
        ts = np.round(np.arange(T, 0, -T / num_steps)).astype(np.int64) - 1
    elif cfg.timestep_spacing == "linspace":
        ts = np.linspace(0, T - 1, num_steps).round()[::-1].astype(np.int64)
    else:
        raise ValueError(cfg.timestep_spacing)
    return np.clip(ts, 0, T - 1)


def custom_timesteps_array(cfg: SchedulerConfig, custom) -> np.ndarray:
    """Validate a user-supplied timestep list (the reference v2 surface's
    ``timesteps`` argument, resolved through diffusers retrieve_timesteps,
    pipeline_PowerPaint_Brushnet_CA.py:87-127): strictly descending ints
    in [0, T)."""
    ts = np.asarray(custom, dtype=np.int64)
    if ts.ndim != 1 or len(ts) < 1:
        raise ValueError("timesteps must be a non-empty 1-D sequence")
    if (np.diff(ts) >= 0).any():
        raise ValueError("timesteps must be strictly descending")
    if ts[0] >= cfg.num_train_timesteps or ts[-1] < 0:
        raise ValueError(
            f"timesteps must lie in [0, {cfg.num_train_timesteps})"
        )
    return ts


def kept_timesteps(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None, custom=None
) -> np.ndarray:
    """Descending inference timesteps, truncated to the LAST ``keep_steps``
    for strength<1 (the reference's get_timesteps slicing,
    pipeline_PowerPaint.py:713-720).  ``custom`` overrides the spacing
    formula with an explicit list (arbitrary-spacing support)."""
    ts = (custom_timesteps_array(cfg, custom) if custom is not None
          else spaced_timesteps(cfg, num_steps))
    num_steps = len(ts)
    if keep_steps is not None and keep_steps < num_steps:
        ts = ts[num_steps - keep_steps:]
    return ts


def make_schedule(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None, custom=None
) -> DiffusionSchedule:
    acp = alphas_cumprod(cfg)
    ts = kept_timesteps(cfg, num_steps, keep_steps, custom=custom)
    if custom is not None:
        # arbitrary spacing: prev is the NEXT entry in the list (the
        # convention diffusers' custom-timestep schedulers use); the final
        # step transitions below 0 -> final_alpha_cumprod via alpha_at
        prev = np.append(ts[1:], -1)
    else:
        prev = ts - cfg.num_train_timesteps // num_steps
    final = 1.0 if cfg.set_alpha_to_one else float(acp[0])
    return DiffusionSchedule(
        config=cfg,
        alphas_cumprod=jnp.asarray(acp, dtype=jnp.float32),
        final_alpha_cumprod=final,
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        prev_timesteps=jnp.asarray(prev, dtype=jnp.int32),
        num_steps=len(ts),
    )


def alpha_at(sched: DiffusionSchedule, t: jnp.ndarray) -> jnp.ndarray:
    """alphas_cumprod[t], mapping t<0 to final_alpha_cumprod."""
    safe = jnp.clip(t, 0)
    val = sched.alphas_cumprod[safe]
    return jnp.where(t < 0, sched.final_alpha_cumprod, val)


def add_noise(
    sched: DiffusionSchedule, x0: jnp.ndarray, noise: jnp.ndarray,
    t: jnp.ndarray,
) -> jnp.ndarray:
    """q(x_t | x_0) sample (reference scheduler.add_noise,
    pipeline_PowerPaint.py:1030)."""
    a = sched.alphas_cumprod[t].astype(jnp.float32)
    while a.ndim < x0.ndim:
        a = a[..., None]
    out = jnp.sqrt(a) * x0.astype(jnp.float32) + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)
    return out.astype(x0.dtype)


def vp_add_noise_at(sched, x0, noise, i):
    """q(x_t|x0) at STEP INDEX i for VP-space schedules exposing
    ``timesteps`` + ``alphas_cumprod_j`` (dpm/deis/sde/lcm share this)."""
    t = sched.timesteps[jnp.clip(i, 0, sched.num_steps - 1)]
    a = sched.alphas_cumprod_j[jnp.clip(t, 0)].astype(jnp.float32)
    while a.ndim < x0.ndim:
        a = a[..., None]
    out = jnp.sqrt(a) * x0.astype(jnp.float32) \
        + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)
    return out.astype(x0.dtype)


def sigma_add_noise_at(sched, x0, noise, i):
    """x = x0 + sigma_i * noise for sigma-space schedules exposing a
    ``sigmas`` table with sigmas[num_steps] == 0 (euler family/lms)."""
    s = sched.sigmas[jnp.clip(i, 0, sched.num_steps)]
    return (x0.astype(jnp.float32)
            + s * noise.astype(jnp.float32)).astype(x0.dtype)


def sigma_scale_model_input(sched, x, i):
    """x / sqrt(sigma_i^2 + 1) (the Karras input scaling); reads
    ``sched.sigmas``."""
    s = sched.sigmas[i]
    return (x.astype(jnp.float32) / jnp.sqrt(s * s + 1.0)).astype(x.dtype)


def pred_x0_from_eps(x_t, eps, alpha_t):
    return (x_t - jnp.sqrt(1.0 - alpha_t) * eps) / jnp.sqrt(alpha_t)


def to_eps_x0(
    sched: DiffusionSchedule, model_out: jnp.ndarray, x_t: jnp.ndarray,
    t: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Normalize a model output into (eps, x0) per prediction_type."""
    a = alpha_at(sched, t).astype(jnp.float32)
    x_t = x_t.astype(jnp.float32)
    model_out = model_out.astype(jnp.float32)
    p = sched.config.prediction_type
    if p == "epsilon":
        eps = model_out
        x0 = pred_x0_from_eps(x_t, eps, a)
    elif p == "sample":
        x0 = model_out
        eps = (x_t - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)
    elif p == "v_prediction":
        x0 = jnp.sqrt(a) * x_t - jnp.sqrt(1.0 - a) * model_out
        eps = jnp.sqrt(a) * model_out + jnp.sqrt(1.0 - a) * x_t
    else:
        raise ValueError(p)
    return eps, x0
