"""Heun discrete sampler (2nd-order Karras predictor-corrector).

Member of the ``KarrasDiffusionSchedulers`` family the reference pipelines
accept (reference pipeline_PowerPaint.py:198).  Heun needs TWO model
evaluations per step; rather than a data-dependent inner loop (which would
break ``lax.scan``), the schedule interleaves predictor/corrector
iterations into one flat iteration axis — the same flattening diffusers'
HeunDiscreteScheduler does with its repeated-timestep table — so the
pipeline's scan body stays "one model eval per iteration".

For S user steps the iteration count is 2S-1: each step from sigma_j to
sigma_{j+1} > 0 runs a predictor (Euler, eval at sigma_j) then a corrector
(trapezoid, eval at sigma_{j+1}); the final step to sigma = 0 is plain
Euler (the corrector's eps at sigma = 0 is undefined — k-diffusion's
convention).  All per-iteration coefficients are host-precomputed tables;
the step function is branch-free (``jnp.where`` on an is-predictor table).

Sigma space: x = x0 + sigma * eps, so for epsilon prediction the ODE
derivative IS the model output.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers.common import alphas_cumprod, kept_timesteps


class HeunState(NamedTuple):
    anchor: jnp.ndarray  # x at the start of the current 2nd-order step
    d1: jnp.ndarray  # predictor derivative


@dataclasses.dataclass(frozen=True)
class HeunSchedule:
    config: SchedulerConfig
    timesteps: jnp.ndarray  # (R,) int32 — eval timestep per iteration
    eval_sigmas: jnp.ndarray  # (R,) fp32 — sigma the model is evaluated at
    dts: jnp.ndarray  # (R,) fp32 — sigma increment of the owning step
    is_pred: jnp.ndarray  # (R,) fp32 — 1.0 predictor / final Euler
    blend_sigmas: jnp.ndarray  # (R+1,) fp32 — carry sigma before iter i
    num_steps: int  # = R (iterations, what the scan runs over)
    init_noise_sigma_val: float

    @property
    def init_noise_sigma(self) -> float:
        return self.init_noise_sigma_val


def make_heun_schedule(
    cfg: SchedulerConfig, num_steps: int, keep_steps=None
) -> HeunSchedule:
    acp = alphas_cumprod(cfg)
    ts = kept_timesteps(cfg, num_steps, keep_steps)
    S = len(ts)
    sig = np.sqrt((1.0 - acp[ts]) / acp[ts])
    sigmas = np.concatenate([sig, [0.0]])  # (S+1,), sigmas[S] = 0

    R = 2 * S - 1
    t_it = np.zeros(R, np.int64)
    ev = np.zeros(R, np.float64)
    dts = np.zeros(R, np.float64)
    isp = np.zeros(R, np.float64)
    blend = np.zeros(R + 1, np.float64)
    blend[0] = sigmas[0]
    for j in range(S - 1):  # 2nd-order steps sigma_j -> sigma_{j+1} > 0
        dt = sigmas[j + 1] - sigmas[j]
        rp, rc = 2 * j, 2 * j + 1
        t_it[rp], ev[rp], dts[rp], isp[rp] = ts[j], sigmas[j], dt, 1.0
        t_it[rc], ev[rc], dts[rc], isp[rc] = ts[j + 1], sigmas[j + 1], dt, 0.0
        blend[rp + 1] = sigmas[j + 1]
        blend[rc + 1] = sigmas[j + 1]
    # final Euler step to sigma = 0
    t_it[R - 1], ev[R - 1] = ts[S - 1], sigmas[S - 1]
    dts[R - 1], isp[R - 1] = -sigmas[S - 1], 1.0
    blend[R] = 0.0

    return HeunSchedule(
        config=cfg,
        timesteps=jnp.asarray(t_it, jnp.int32),
        eval_sigmas=jnp.asarray(ev, jnp.float32),
        dts=jnp.asarray(dts, jnp.float32),
        is_pred=jnp.asarray(isp, jnp.float32),
        blend_sigmas=jnp.asarray(blend, jnp.float32),
        num_steps=R,
        init_noise_sigma_val=float(np.sqrt(sigmas[0] ** 2 + 1.0)),
    )


def iteration_step_map(num_user_steps: int) -> np.ndarray:
    """Iteration index -> owning user step.  Pipelines expand per-USER-step
    gating tables (control_guidance_start/end) onto the interleaved
    iteration axis with this map."""
    S = num_user_steps
    return np.minimum(np.arange(2 * S - 1) // 2, S - 1)


def add_noise_at(sched: HeunSchedule, x0, noise, i):
    s = sched.blend_sigmas[jnp.clip(i, 0, sched.num_steps)]
    return (x0.astype(jnp.float32)
            + s * noise.astype(jnp.float32)).astype(x0.dtype)


def init_state(sched: HeunSchedule, shape, dtype) -> HeunState:
    return HeunState(
        anchor=jnp.zeros(shape, jnp.float32),
        d1=jnp.zeros(shape, jnp.float32),
    )


def scale_model_input(sched: HeunSchedule, x, i):
    s = sched.eval_sigmas[i]
    return (x.astype(jnp.float32) / jnp.sqrt(s * s + 1.0)).astype(x.dtype)


def step(
    sched: HeunSchedule,
    state: HeunState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
) -> Tuple[jnp.ndarray, HeunState]:
    d = model_out.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    dt = sched.dts[i]
    is_p = sched.is_pred[i]
    pred = xf + dt * d  # Euler predictor (x IS the step anchor here)
    corr = state.anchor + dt * 0.5 * (state.d1 + d)  # trapezoid corrector
    x_next = is_p * pred + (1.0 - is_p) * corr
    anchor = is_p * xf + (1.0 - is_p) * state.anchor
    d1 = is_p * d + (1.0 - is_p) * state.d1
    return x_next.astype(x.dtype), HeunState(anchor=anchor, d1=d1)
