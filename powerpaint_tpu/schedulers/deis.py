"""DEIS multistep sampler (logrho exponential integrator, order 2).

Diffusion-Exponential-Integrator-Sampler (arXiv 2204.13902), the
``DEISMultistepScheduler`` member of the family the reference pipelines
accept (reference pipeline_PowerPaint.py:198).  Derivation (paper-faithful,
epsilon form): with rho = sigma/alpha the probability-flow ODE becomes

    d(x / alpha) / d rho = eps(x, t),

so each step integrates a polynomial extrapolation of eps in log-rho:

    x_{t+1} = alpha_{t+1} * ( x_t / alpha_t + sum_k C[i,k] * eps_{i-k} ),
    C[i,k]  = integral_{rho_i}^{rho_{i+1}} L_k(log rho) d rho.

The log-space Lagrange basis integrals have the closed form
``ind(x, b, c) = x (log x - log c - 1) / (log b - log c)`` (order 2), so
all coefficients are exact host-precomputed tables.  The first step (and,
with lower_order_final, the last) is first order, where the update is
algebraically identical to DDIM.  On a constant-x0 model eps is constant
and sum_k C[i,k] = rho_{i+1} - rho_i, making the sampler exact — pinned in
tests/test_new_samplers.py.
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


class DEISState(NamedTuple):
    e1: jnp.ndarray  # previous eps


@dataclasses.dataclass(frozen=True)
class DEISSchedule:
    config: SchedulerConfig
    timesteps: jnp.ndarray
    alpha_cur: jnp.ndarray  # (S,) alpha at t_i
    alpha_next: jnp.ndarray  # (S,) alpha at t_{i+1} (t<0 -> final acp)
    c0: jnp.ndarray  # (S,) weight on current eps
    c1: jnp.ndarray  # (S,) weight on previous eps
    alphas_cumprod_j: jnp.ndarray  # for add_noise_at
    num_steps: int

    @property
    def init_noise_sigma(self) -> float:
        return 1.0


def _ind(x: float, b: float, c: float) -> float:
    """Antiderivative at x of the log-space Lagrange basis
    (log t - log c)/(log b - log c): equals 1 at t=b, 0 at t=c."""
    return x * (np.log(x) - np.log(c) - 1.0) / (np.log(b) - np.log(c))


def make_deis_schedule(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None
) -> DEISSchedule:
    acp = alphas_cumprod(cfg)
    ts = kept_timesteps(cfg, num_steps, keep_steps)
    S = len(ts)
    final = 1.0 if cfg.set_alpha_to_one else float(acp[0])

    def avals(t):
        a = final if t < 0 else float(acp[int(t)])
        alpha = np.sqrt(a)
        sigma = np.sqrt(1.0 - a)
        return alpha, sigma / max(alpha, 1e-12)

    a_cur = np.zeros(S)
    a_next = np.zeros(S)
    c0 = np.zeros(S)
    c1 = np.zeros(S)
    for i in range(S):
        t_s = int(ts[i])
        t_t = int(ts[i + 1]) if i + 1 < S else -1
        al_s, rho_s = avals(t_s)
        al_t, rho_t = avals(t_t)
        a_cur[i], a_next[i] = al_s, al_t
        first_order = i == 0 or (cfg.lower_order_final and i == S - 1)
        # rho_t = 0 at the clean endpoint makes log(rho_t) singular in the
        # 2nd-order basis — the lower_order_final guard covers it; if a
        # custom config disables it, fall back to first order there too
        if not first_order and rho_t <= 0:
            first_order = True
        if first_order:
            c0[i], c1[i] = rho_t - rho_s, 0.0
        else:
            t_s1 = int(ts[i - 1])
            _, rho_s1 = avals(t_s1)
            c0[i] = _ind(rho_t, rho_s, rho_s1) - _ind(rho_s, rho_s, rho_s1)
            c1[i] = _ind(rho_t, rho_s1, rho_s) - _ind(rho_s, rho_s1, rho_s)

    return DEISSchedule(
        config=cfg,
        timesteps=jnp.asarray(ts, jnp.int32),
        alpha_cur=jnp.asarray(a_cur, jnp.float32),
        alpha_next=jnp.asarray(a_next, jnp.float32),
        c0=jnp.asarray(c0, jnp.float32),
        c1=jnp.asarray(c1, jnp.float32),
        alphas_cumprod_j=jnp.asarray(acp, jnp.float32),
        num_steps=S,
    )


add_noise_at = vp_add_noise_at


def init_state(sched: DEISSchedule, shape, dtype) -> DEISState:
    return DEISState(e1=jnp.zeros(shape, jnp.float32))


def scale_model_input(sched, x, i):
    return x


def step(
    sched: DEISSchedule,
    state: DEISState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
) -> Tuple[jnp.ndarray, DEISState]:
    e0 = model_out.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    x_next = sched.alpha_next[i] * (
        xf / sched.alpha_cur[i] + sched.c0[i] * e0 + sched.c1[i] * state.e1
    )
    return x_next.astype(x.dtype), DEISState(e1=e0)
