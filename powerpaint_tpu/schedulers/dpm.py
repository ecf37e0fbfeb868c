"""DPM-Solver++ (2M, multistep, data prediction) — scan-compatible.

Another member of the ``KarrasDiffusionSchedulers`` family the reference
pipelines accept (pipeline_PowerPaint.py:198).  Second-order multistep on
lambda = log(alpha/sigma), popular low-step sampler for SD1.5.

As with UniPC/PNDM here, per-step coefficients (including the first-order
warmup step and the optional lower-order final step) are host-precomputed
into tables; the scan body is two fused multiply-adds.

Update (2M, x0-prediction):
  x_{i+1} = (sigma_{t+1}/sigma_t) * x - alpha_{t+1} * expm1(-h) * D
  D = (1 + 1/(2 r)) * m0 - (1/(2 r)) * m1,   r = h_{i-1}/h_i
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
    vp_add_noise_at,
)


class DPMCoeffs(NamedTuple):
    A: jnp.ndarray  # sigma ratio
    B: jnp.ndarray  # alpha_{t+1} * expm1(-h)
    c0: jnp.ndarray  # weight on m0 (newest x0 pred)
    c1: jnp.ndarray  # weight on m1


class DPMState(NamedTuple):
    m0: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DPMSchedule:
    config: SchedulerConfig
    alphas_cumprod_j: jnp.ndarray
    timesteps: jnp.ndarray
    coeffs: DPMCoeffs
    num_steps: int

    @property
    def init_noise_sigma(self) -> float:
        return 1.0


def make_dpm_schedule(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None
) -> DPMSchedule:
    """``keep_steps`` truncates to the last steps for strength<1; the
    first-order warmup re-primes at the truncated start (diffusers
    lower_order_nums counts from the first executed step)."""
    acp = alphas_cumprod(cfg)
    ts = kept_timesteps(cfg, num_steps, keep_steps)
    S = len(ts)
    alpha = np.sqrt(acp)
    sigma = np.sqrt(1.0 - acp)
    lam = np.log(alpha) - np.log(sigma)

    def bnd(t):
        t = max(int(t), 0)
        return alpha[t], sigma[t], lam[t]

    A = np.zeros(S)
    B = np.zeros(S)
    c0 = np.zeros(S)
    c1 = np.zeros(S)
    for i in range(S):
        t_s = int(ts[i])
        t_t = int(ts[i + 1]) if i + 1 < S else 0
        a_t, s_t, l_t = bnd(t_t)
        a_s, s_s, l_s = bnd(t_s)
        h = l_t - l_s
        A[i] = s_t / s_s
        B[i] = a_t * np.expm1(-h)
        # order: first step and (lower_order_final) last step are 1st order
        first_order = i == 0 or (cfg.lower_order_final and i == S - 1)
        if first_order:
            c0[i], c1[i] = 1.0, 0.0
        else:
            t_s1 = int(ts[i - 1])
            l_s1 = bnd(t_s1)[2]
            h_prev = l_s - l_s1
            r = h_prev / h
            c0[i] = 1.0 + 1.0 / (2.0 * r)
            c1[i] = -1.0 / (2.0 * r)

    return DPMSchedule(
        config=cfg,
        alphas_cumprod_j=jnp.asarray(acp, jnp.float32),
        timesteps=jnp.asarray(ts, jnp.int32),
        coeffs=DPMCoeffs(
            A=jnp.asarray(A, jnp.float32), B=jnp.asarray(B, jnp.float32),
            c0=jnp.asarray(c0, jnp.float32), c1=jnp.asarray(c1, jnp.float32),
        ),
        num_steps=S,
    )


add_noise_at = vp_add_noise_at


def init_state(sched: DPMSchedule, shape, dtype) -> DPMState:
    return DPMState(m0=jnp.zeros(shape, jnp.float32))


def scale_model_input(sched, x, i):
    return x


def step(
    sched: DPMSchedule,
    state: DPMState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
) -> Tuple[jnp.ndarray, DPMState]:
    c = sched.coeffs
    t = sched.timesteps[i]
    a = sched.alphas_cumprod_j[jnp.clip(t, 0)]
    alpha_t, sigma_t = jnp.sqrt(a), jnp.sqrt(1.0 - a)
    xf = x.astype(jnp.float32)
    m_t = (xf - sigma_t * model_out.astype(jnp.float32)) / alpha_t  # x0 pred
    D = c.c0[i] * m_t + c.c1[i] * state.m0
    x_next = c.A[i] * xf - c.B[i] * D
    return x_next.astype(x.dtype), DPMState(m0=m_t)
