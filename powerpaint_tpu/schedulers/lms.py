"""LMS discrete sampler (linear multistep, order <= 4, sigma space).

The classic k-diffusion/A1111 "LMS" sampler — another member of the
``KarrasDiffusionSchedulers`` family the reference pipelines accept
(reference pipeline_PowerPaint.py:198).  Adams-Bashforth-style multistep
on the probability-flow ODE in sigma space (where for epsilon prediction
the derivative is the model output itself):

    x_{i+1} = x_i + sum_k C[i, k] * d_{i-k},
    C[i, k] = integral_{s_i}^{s_{i+1}} L_k(s) ds,

with L_k the Lagrange basis over the last ``order`` sigma points.  The
basis polynomials have degree <= 3, so the integrals are computed EXACTLY
on the host via polynomial antiderivatives (no quadrature error — unlike
diffusers' scipy ``integrate.quad``); the scan body is four fused
multiply-adds over a fixed-size derivative history.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers.common import (
    alphas_cumprod,
    kept_timesteps,
    sigma_add_noise_at,
    sigma_scale_model_input,
)

ORDER = 4


class LMSState(NamedTuple):
    d1: jnp.ndarray  # derivative history, newest first
    d2: jnp.ndarray
    d3: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class LMSSchedule:
    config: SchedulerConfig
    timesteps: jnp.ndarray  # (S,) int32
    sigmas: jnp.ndarray  # (S+1,) fp32, sigmas[-1] = 0
    coeffs: jnp.ndarray  # (S, ORDER) fp32 — integrated Lagrange weights
    num_steps: int
    init_noise_sigma_val: float

    @property
    def init_noise_sigma(self) -> float:
        return self.init_noise_sigma_val


def _lagrange_integral(points: np.ndarray, k: int, a: float, b: float):
    """Exact integral over [a, b] of the k-th Lagrange basis polynomial
    through ``points`` (degree len(points)-1 <= 3)."""
    others = np.delete(points, k)
    # numerator polynomial prod (s - p_j); np.poly builds it from roots
    num = np.poly(others) if len(others) else np.array([1.0])
    den = np.prod(points[k] - others) if len(others) else 1.0
    anti = np.polyint(num / den)
    return float(np.polyval(anti, b) - np.polyval(anti, a))


def make_lms_schedule(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None
) -> LMSSchedule:
    acp = alphas_cumprod(cfg)
    ts = kept_timesteps(cfg, num_steps, keep_steps)
    S = len(ts)
    sig = np.sqrt((1.0 - acp[ts]) / acp[ts])
    sigmas = np.concatenate([sig, [0.0]])

    C = np.zeros((S, ORDER))
    for i in range(S):
        order = min(i + 1, ORDER)
        pts = np.array([sigmas[i - k] for k in range(order)])
        for k in range(order):
            C[i, k] = _lagrange_integral(pts, k, sigmas[i], sigmas[i + 1])

    return LMSSchedule(
        config=cfg,
        timesteps=jnp.asarray(ts, jnp.int32),
        sigmas=jnp.asarray(sigmas, jnp.float32),
        coeffs=jnp.asarray(C, jnp.float32),
        num_steps=S,
        init_noise_sigma_val=float(np.sqrt(sigmas[0] ** 2 + 1.0)),
    )


add_noise_at = sigma_add_noise_at


def init_state(sched: LMSSchedule, shape, dtype) -> LMSState:
    z = jnp.zeros(shape, jnp.float32)
    return LMSState(d1=z, d2=z, d3=z)


scale_model_input = sigma_scale_model_input


def step(
    sched: LMSSchedule,
    state: LMSState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
) -> Tuple[jnp.ndarray, LMSState]:
    d0 = model_out.astype(jnp.float32)
    c = sched.coeffs[i]
    x_next = (x.astype(jnp.float32)
              + c[0] * d0 + c[1] * state.d1
              + c[2] * state.d2 + c[3] * state.d3)
    return x_next.astype(x.dtype), LMSState(d1=d0, d2=state.d1, d3=state.d2)
