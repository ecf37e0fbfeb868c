"""Scheduler registry — uniform functional interface.

Every scheduler module exposes:
    make(config, num_steps) -> schedule      (name varies; normalized here)
    init_state(sched, shape, dtype) -> state
    scale_model_input(sched, x, i) -> x
    step(sched, state, model_out, i, x) -> (x_next, state)
    sched.timesteps / sched.num_steps / sched.init_noise_sigma

``get(name)`` returns (module, make_fn) for pipeline wiring — the TPU
equivalent of diffusers' swap-any-KarrasDiffusionScheduler surface
(reference pipeline_PowerPaint.py:198, app.py:197).
"""

from __future__ import annotations

from typing import Callable, Tuple

from powerpaint_tpu.schedulers import (
    ancestral,
    ddim,
    deis,
    dpm,
    euler,
    heun,
    lcm,
    lms,
    pndm,
    sde,
    unipc,
)
from powerpaint_tpu.schedulers.common import make_schedule as _make_ddim


def get(name: str) -> Tuple[object, Callable]:
    name = name.lower()
    if name == "ddim":
        return ddim, _make_ddim
    if name in ("pndm", "plms"):
        return pndm, pndm.make_pndm_schedule
    if name == "unipc":
        return unipc, unipc.make_unipc_schedule
    if name in ("dpm", "dpm++", "dpmsolver", "dpmsolver++"):
        return dpm, dpm.make_dpm_schedule
    if name == "euler":
        return euler, euler.make_euler_schedule
    if name in ("euler_a", "euler_ancestral", "euler-ancestral"):
        return ancestral, ancestral.make_ancestral_schedule
    if name == "heun":
        return heun, heun.make_heun_schedule
    if name == "lms":
        return lms, lms.make_lms_schedule
    if name == "deis":
        return deis, deis.make_deis_schedule
    if name in ("dpm_sde", "dpm++sde", "sde-dpmsolver++", "dpm++_2m_sde"):
        return sde, sde.make_sde_schedule
    if name == "lcm":
        return lcm, lcm.make_lcm_schedule
    raise ValueError(
        f"unknown scheduler {name!r}; one of {'/'.join(SCHEDULERS)}"
    )


def is_stochastic(name: str) -> bool:
    """True if the sampler injects fresh noise every step (the pipeline
    then threads per-image step-noise keys through the scan)."""
    mod, _ = get(name)
    return bool(getattr(mod, "stochastic", False))


SCHEDULERS = (
    "ddim", "pndm", "unipc", "dpm", "euler",
    "euler_a", "heun", "lms", "deis", "dpm_sde", "lcm",
)
