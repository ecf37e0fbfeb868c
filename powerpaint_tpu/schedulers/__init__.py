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

from powerpaint_tpu.schedulers import ddim, dpm, euler, pndm, unipc
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
    raise ValueError(
        f"unknown scheduler {name!r}; one of ddim/pndm/unipc/dpm/euler"
    )


SCHEDULERS = ("ddim", "pndm", "unipc", "dpm", "euler")
