"""DPM-Solver++ 2M SDE (stochastic multistep, data prediction).

The "DPM++ 2M SDE" sampler (diffusers ``algorithm_type='sde-dpmsolver++'``)
— stochastic counterpart of schedulers/dpm.py, in the family the reference
pipelines accept (reference pipeline_PowerPaint.py:198).  Update in
lambda = log(alpha/sigma) space with h = lambda_next - lambda_cur > 0:

    x' = A x + B (m0 + (m0 - m1) / (2 r)) + N z,   z ~ N(0, I)
    A  = (sigma_next / sigma_cur) exp(-h)
    B  = alpha_next (1 - exp(-2h))
    N  = sigma_next sqrt(1 - exp(-2h))
    r  = h_prev / h   (first step / lower-order-final: midpoint term off)

All coefficients are host-precomputed tables.  The marginal variance is
preserved exactly: A^2 sigma_cur^2 + N^2 = sigma_next^2 (pinned as a table
identity in tests), and with z = 0 the x0-residual contracts by
exp(-2h) sigma_next / sigma_cur per step.

Stochastic: the pipeline supplies per-iteration noise keyed on the
per-image seed (batched == standalone reproducibility).
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
    vp_add_noise_at,
)

stochastic = True


class SDEState(NamedTuple):
    m0: jnp.ndarray  # previous x0 prediction


@dataclasses.dataclass(frozen=True)
class SDESchedule:
    config: SchedulerConfig
    alphas_cumprod_j: jnp.ndarray
    timesteps: jnp.ndarray
    A: jnp.ndarray
    B0: jnp.ndarray  # weight on m0 (incl. midpoint share)
    B1: jnp.ndarray  # weight on m1
    N: jnp.ndarray  # noise scale
    num_steps: int

    @property
    def init_noise_sigma(self) -> float:
        return 1.0


def make_sde_schedule(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None
) -> SDESchedule:
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
    B0 = np.zeros(S)
    B1 = np.zeros(S)
    N = np.zeros(S)
    for i in range(S):
        t_s = int(ts[i])
        t_t = int(ts[i + 1]) if i + 1 < S else 0
        a_t, s_t, l_t = bnd(t_t)
        a_s, s_s, l_s = bnd(t_s)
        h = l_t - l_s
        em2h = np.exp(-2.0 * h)
        A[i] = (s_t / s_s) * np.exp(-h)
        B = a_t * (1.0 - em2h)
        N[i] = s_t * np.sqrt(max(1.0 - em2h, 0.0))
        first_order = i == 0 or (cfg.lower_order_final and i == S - 1)
        if first_order:
            B0[i], B1[i] = B, 0.0
        else:
            l_s1 = bnd(int(ts[i - 1]))[2]
            r = (l_s - l_s1) / h
            B0[i] = B * (1.0 + 0.5 / r)
            B1[i] = -B * 0.5 / r

    return SDESchedule(
        config=cfg,
        alphas_cumprod_j=jnp.asarray(acp, jnp.float32),
        timesteps=jnp.asarray(ts, jnp.int32),
        A=jnp.asarray(A, jnp.float32),
        B0=jnp.asarray(B0, jnp.float32),
        B1=jnp.asarray(B1, jnp.float32),
        N=jnp.asarray(N, jnp.float32),
        num_steps=S,
    )


add_noise_at = vp_add_noise_at


def init_state(sched: SDESchedule, shape, dtype) -> SDEState:
    return SDEState(m0=jnp.zeros(shape, jnp.float32))


def scale_model_input(sched, x, i):
    return x


def step(
    sched: SDESchedule,
    state: SDEState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, SDEState]:
    t = sched.timesteps[i]
    a = sched.alphas_cumprod_j[jnp.clip(t, 0)]
    alpha_t, sigma_t = jnp.sqrt(a), jnp.sqrt(1.0 - a)
    xf = x.astype(jnp.float32)
    m_t = (xf - sigma_t * model_out.astype(jnp.float32)) / alpha_t
    x_next = sched.A[i] * xf + sched.B0[i] * m_t + sched.B1[i] * state.m0
    if noise is not None:
        x_next = x_next + sched.N[i] * noise.astype(jnp.float32)
    return x_next.astype(x.dtype), SDEState(m0=m_t)
