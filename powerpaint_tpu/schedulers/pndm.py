"""PNDM (PLMS variant, skip_prk_steps=True) — the reference ppt-v1 default.

The SD-inpainting checkpoint ships a PNDMScheduler with skip_prk_steps
(reference pipeline_PowerPaint.py:198 accepts any Karras scheduler; the
shipped config is PNDM).  PLMS = linear-multistep Adams-Bashforth on the
epsilon trajectory with a warmup quirk: the second-to-last train timestep is
visited twice (S+1 model evaluations for S steps) and step 1 reuses the
step-0 sample with an averaged epsilon.

As with UniPC, everything index-dependent (timesteps, multistep combination
weights, transition coefficients) is host-precomputed into (S+1,)-tables;
the scan body is a gather + fused multiply-adds.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers.common import alphas_cumprod, kept_timesteps


class PNDMCoeffs(NamedTuple):
    sample_coeff: jnp.ndarray  # (S+1,)
    eps_coeff: jnp.ndarray  # (S+1,)  -(a_prev - a_t)/denom
    comb: jnp.ndarray  # (S+1, 4) weights over [m_t, e1, e2, e3]
    push: jnp.ndarray  # (S+1,) 1 -> m_t enters history
    use_cur: jnp.ndarray  # (S+1,) 1 -> integrate from saved step-0 sample


class PNDMState(NamedTuple):
    ets: jnp.ndarray  # (3, ...) newest-first epsilon history
    cur_sample: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class PNDMSchedule:
    config: SchedulerConfig
    alphas_cumprod_j: jnp.ndarray
    timesteps: jnp.ndarray  # (S+1,) int32 — the PLMS visit sequence
    coeffs: PNDMCoeffs
    num_steps: int  # S+1 loop iterations

    @property
    def init_noise_sigma(self) -> float:
        return 1.0


def make_pndm_schedule(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None
) -> PNDMSchedule:
    """``keep_steps`` truncates to the last (lowest-t) steps for strength<1,
    re-priming the PLMS warmup at the truncated start.  (diffusers' sliced
    PNDM instead keeps its counter quirk and silently skips one transition;
    re-priming is the coherent generalization of the same warmup.)"""
    acp = alphas_cumprod(cfg)
    ratio = cfg.num_train_timesteps // num_steps
    asc = kept_timesteps(cfg, num_steps, keep_steps)[::-1].copy()  # ascending
    # PLMS visit sequence: [...,:-1] ++ [-2:-1] ++ [-1:], reversed
    visits = np.concatenate([asc[:-1], asc[-2:-1], asc[-1:]])[::-1].copy()
    n = len(visits)  # S+1
    final_alpha = 1.0 if cfg.set_alpha_to_one else float(acp[0])

    def a_at(t):
        return float(acp[t]) if t >= 0 else final_alpha

    sample_coeff = np.zeros(n)
    eps_coeff = np.zeros(n)
    comb = np.zeros((n, 4))
    push = np.zeros(n)
    use_cur = np.zeros(n)

    for i in range(n):
        t = int(visits[i])
        prev_t = t - ratio
        if i == 1:
            # counter==1: reuse step-0 sample; integrate t+ratio -> t
            prev_t = t
            t = t + ratio
            use_cur[i] = 1.0
            comb[i] = [0.5, 0.5, 0.0, 0.0]
        else:
            push[i] = 1.0
            if i == 0:
                comb[i] = [1.0, 0.0, 0.0, 0.0]
            elif i == 2:
                comb[i] = [1.5, -0.5, 0.0, 0.0]
            elif i == 3:
                comb[i] = [23 / 12, -16 / 12, 5 / 12, 0.0]
            else:
                comb[i] = [55 / 24, -59 / 24, 37 / 24, -9 / 24]

        a_t = a_at(t)
        a_prev = a_at(prev_t)
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        sample_coeff[i] = (a_prev / a_t) ** 0.5
        denom = a_t * b_prev ** 0.5 + (a_t * b_t * a_prev) ** 0.5
        eps_coeff[i] = -(a_prev - a_t) / denom

    return PNDMSchedule(
        config=cfg,
        alphas_cumprod_j=jnp.asarray(acp, jnp.float32),
        timesteps=jnp.asarray(visits, jnp.int32),
        coeffs=PNDMCoeffs(
            sample_coeff=jnp.asarray(sample_coeff, jnp.float32),
            eps_coeff=jnp.asarray(eps_coeff, jnp.float32),
            comb=jnp.asarray(comb, jnp.float32),
            push=jnp.asarray(push, jnp.float32),
            use_cur=jnp.asarray(use_cur, jnp.float32),
        ),
        num_steps=n,
    )


def add_noise_at(sched: PNDMSchedule, x0, noise, i):
    """q(x_t|x0) at visit index i (VP space)."""
    t = sched.timesteps[jnp.clip(i, 0, sched.num_steps - 1)]
    a = sched.alphas_cumprod_j[jnp.clip(t, 0)].astype(jnp.float32)
    while a.ndim < x0.ndim:
        a = a[..., None]
    out = jnp.sqrt(a) * x0.astype(jnp.float32) \
        + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)
    return out.astype(x0.dtype)


def init_state(sched: PNDMSchedule, shape, dtype) -> PNDMState:
    z = jnp.zeros((3,) + tuple(shape), jnp.float32)
    return PNDMState(ets=z, cur_sample=jnp.zeros(shape, jnp.float32))


def scale_model_input(sched: PNDMSchedule, x, i):
    del sched, i
    return x


def step(
    sched: PNDMSchedule,
    state: PNDMState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
) -> Tuple[jnp.ndarray, PNDMState]:
    c = sched.coeffs
    m = model_out.astype(jnp.float32)
    xf = x.astype(jnp.float32)

    # step 0 saves its sample; step 1 restarts from it
    cur = jnp.where(i == 0, xf, state.cur_sample)
    base = jnp.where(c.use_cur[i] > 0, cur, xf)

    eps = (
        c.comb[i, 0] * m
        + c.comb[i, 1] * state.ets[0]
        + c.comb[i, 2] * state.ets[1]
        + c.comb[i, 3] * state.ets[2]
    )
    x_prev = c.sample_coeff[i] * base + c.eps_coeff[i] * eps

    pushed = jnp.stack([m, state.ets[0], state.ets[1]])
    ets = jnp.where(c.push[i] > 0, pushed, state.ets)
    return x_prev.astype(x.dtype), PNDMState(ets=ets, cur_sample=cur)
