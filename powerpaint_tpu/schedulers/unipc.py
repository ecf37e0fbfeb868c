"""UniPC multistep sampler (predictor-corrector, bh2), scan-compatible.

The ppt-v2 pipeline runs UniPC (reference app.py:197).  The torch scheduler
carries Python-side mutable history and per-step order logic; here the whole
order schedule (warmup ramp, lower_order_final) and every R/b linear solve
is HOST-PRECOMPUTED into per-step coefficient tables, because the inference
timestep grid is static.  The jitted step is then three fused multiply-adds
gathered by step index — ideal for ``lax.scan`` on TPU.

Math (UniPC, Zhao et al. 2023, data-prediction variant):
  x_{t} = (sigma_t/sigma_s0) * x_{s0}
          - alpha_t * h_phi_1 * m0
          - alpha_t * B_h * sum_k rho_k * D1_k          (predictor)
and the corrector adds the D1_t = (m_t - m0) term with its own rhos.
Supports solver_order 1-2 (the reference operating point; order 2 default)
with bh1/bh2.  Prediction types: epsilon / v_prediction / sample.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.schedulers.common import (
    DiffusionSchedule,
    alphas_cumprod,
    kept_timesteps,
    make_schedule,
)


class UniPCCoeffs(NamedTuple):
    """Per-step static tables, each (S,) fp32 (device)."""

    # predictor: x_{i+1} = pA*x - pB*m0 - pC*(m1 - m0)
    pA: jnp.ndarray
    pB: jnp.ndarray
    pC: jnp.ndarray
    # corrector (applied at step i>=1 to the sample predicted at i-1):
    # x_i^c = cA*last - cB*m0 - cC*(m1 - m0) - cD*(m_t - m0)
    cA: jnp.ndarray
    cB: jnp.ndarray
    cC: jnp.ndarray
    cD: jnp.ndarray
    use_corrector: jnp.ndarray  # (S,) 0/1


class UniPCState(NamedTuple):
    m0: jnp.ndarray  # x0-pred at the latest step
    m1: jnp.ndarray  # x0-pred one step older
    last_sample: jnp.ndarray  # sample BEFORE the latest predictor step


@dataclasses.dataclass(frozen=True)
class UniPCSchedule:
    base: DiffusionSchedule
    coeffs: UniPCCoeffs

    @property
    def timesteps(self):
        return self.base.timesteps

    @property
    def num_steps(self):
        return self.base.num_steps

    @property
    def init_noise_sigma(self) -> float:
        return 1.0


def _phi_terms(hh: float, solver_type: str):
    """(h_phi_1, b1, b2, B_h) for the bh family; hh may be +/-inf-safe."""
    h_phi_1 = np.expm1(hh)
    if solver_type == "bh1":
        B_h = hh
    elif solver_type == "bh2":
        B_h = np.expm1(hh)
    else:
        raise ValueError(solver_type)
    h_phi_k1 = h_phi_1 / hh - 1.0  # phi_2-ish
    b1 = h_phi_k1 * 1.0 / B_h
    h_phi_k2 = h_phi_k1 / hh - 0.5
    b2 = h_phi_k2 * 2.0 / B_h
    return h_phi_1, b1, b2, B_h


def make_unipc_schedule(cfg, num_steps: int, keep_steps=None,
                        custom_timesteps=None) -> UniPCSchedule:
    """Precompute all per-step coefficients on host (float64).
    ``keep_steps`` truncates to the last steps for strength<1, with the
    multistep warmup (order ramp) re-primed at the truncated start — the
    same behavior diffusers gets from its from-zero lower_order_nums.
    ``custom_timesteps`` (descending ints) overrides the spacing formula —
    arbitrary-spacing support the torch UniPCMultistepScheduler lacks
    (its set_timesteps takes no timestep list, so the reference v2's
    ``timesteps`` argument raises there); the coefficient tables here are
    built from consecutive list entries, so any grid works."""
    base = make_schedule(cfg, num_steps, keep_steps,
                         custom=custom_timesteps)
    acp = alphas_cumprod(cfg)
    ts = kept_timesteps(cfg, num_steps, keep_steps,
                        custom=custom_timesteps)
    num_steps = len(ts)
    S = len(ts)
    order = min(cfg.solver_order, 2)
    solver_type = cfg.solver_type

    alpha = np.sqrt(acp)
    sigma = np.sqrt(1.0 - acp)
    lam = np.log(alpha) - np.log(sigma)

    def lam_at(t):
        return lam[t] if t >= 0 else lam[0]

    def boundary(t):  # (alpha, sigma, lambda) with t<0 -> t=0
        t = max(int(t), 0)
        return alpha[t], sigma[t], lam[t]

    # effective predictor order at step i (diffusers warmup + lower_order_final)
    def order_p(i):
        o = order
        if cfg.lower_order_final:
            o = min(o, S - i)
        return max(1, min(o, i + 1))

    pA = np.zeros(S)
    pB = np.zeros(S)
    pC = np.zeros(S)
    cA = np.zeros(S)
    cB = np.zeros(S)
    cC = np.zeros(S)
    cD = np.zeros(S)
    use_c = np.zeros(S)

    for i in range(S):
        # ---- predictor: transition t_i -> t_{i+1} (last step -> t=0 floor)
        t_s0 = int(ts[i])
        t_t = int(ts[i + 1]) if i + 1 < S else 0
        a_t, s_t, l_t = boundary(t_t)
        a_s0, s_s0, l_s0 = boundary(t_s0)
        h = l_t - l_s0
        hh = -h  # data-prediction
        h_phi_1, b1, b2, B_h = _phi_terms(hh, solver_type)
        o = order_p(i)
        pA[i] = s_t / s_s0
        pB[i] = a_t * h_phi_1
        if o >= 2:
            t_s1 = int(ts[i - 1])
            l_s1 = lam_at(t_s1)
            r1 = (l_s1 - l_s0) / h
            rho_p = 0.5  # diffusers hardcodes the order-2 predictor weight
            pC[i] = a_t * B_h * rho_p / r1
        else:
            pC[i] = 0.0

        # ---- corrector at step i (i>=1): corrects t_{i-1} -> t_i using the
        # fresh model output at t_i; order = predictor order used at i-1
        if i >= 1:
            use_c[i] = 1.0
            oc = order_p(i - 1)
            t_s0c = int(ts[i - 1])
            t_tc = int(ts[i])
            a_t, s_t, l_t = boundary(t_tc)
            a_s0, s_s0, l_s0 = boundary(t_s0c)
            h = l_t - l_s0
            hh = -h
            h_phi_1, b1, b2, B_h = _phi_terms(hh, solver_type)
            cA[i] = s_t / s_s0
            cB[i] = a_t * h_phi_1
            if oc == 1:
                rhos = np.array([0.5])  # diffusers order-1 corrector weight
                cC[i] = 0.0
                cD[i] = a_t * B_h * rhos[-1]
            else:
                t_s1 = int(ts[i - 2]) if i >= 2 else int(ts[0])
                l_s1 = lam_at(t_s1)
                r1 = (l_s1 - l_s0) / h
                R = np.array([[1.0, 1.0], [r1, 1.0]])
                b = np.array([b1, b2])
                rhos = np.linalg.solve(R, b)
                cC[i] = a_t * B_h * rhos[0] / r1
                cD[i] = a_t * B_h * rhos[1]

    coeffs = UniPCCoeffs(
        pA=jnp.asarray(pA, jnp.float32),
        pB=jnp.asarray(pB, jnp.float32),
        pC=jnp.asarray(pC, jnp.float32),
        cA=jnp.asarray(cA, jnp.float32),
        cB=jnp.asarray(cB, jnp.float32),
        cC=jnp.asarray(cC, jnp.float32),
        cD=jnp.asarray(cD, jnp.float32),
        use_corrector=jnp.asarray(use_c, jnp.float32),
    )
    return UniPCSchedule(base=base, coeffs=coeffs)


def add_noise_at(sched: UniPCSchedule, x0, noise, i):
    """q(x_t|x0) at step index i (VP space)."""
    from powerpaint_tpu.schedulers.common import add_noise

    t = sched.timesteps[jnp.clip(i, 0, sched.num_steps - 1)]
    return add_noise(sched.base, x0, noise, t)


def init_state(sched: UniPCSchedule, shape, dtype) -> UniPCState:
    z = jnp.zeros(shape, jnp.float32)
    return UniPCState(m0=z, m1=z, last_sample=z)


def scale_model_input(sched: UniPCSchedule, x, i):
    del sched, i
    return x


def _to_x0(sched: UniPCSchedule, model_out, x, t):
    acp = sched.base.alphas_cumprod
    a = acp[jnp.clip(t, 0)].astype(jnp.float32)
    alpha_t, sigma_t = jnp.sqrt(a), jnp.sqrt(1.0 - a)
    p = sched.base.config.prediction_type
    x = x.astype(jnp.float32)
    model_out = model_out.astype(jnp.float32)
    if p == "epsilon":
        return (x - sigma_t * model_out) / alpha_t
    if p == "sample":
        return model_out
    if p == "v_prediction":
        return alpha_t * x - sigma_t * model_out
    raise ValueError(p)


def step(
    sched: UniPCSchedule,
    state: UniPCState,
    model_out: jnp.ndarray,
    i: jnp.ndarray,
    x: jnp.ndarray,
) -> Tuple[jnp.ndarray, UniPCState]:
    """One UniPC step: corrector (if i>0) then predictor."""
    c = sched.coeffs
    t = sched.base.timesteps[i]
    xf = x.astype(jnp.float32)

    m_t = _to_x0(sched, model_out, xf, t)

    # corrector — rewrites the current sample using the fresh model output
    d1c = state.m1 - state.m0
    x_corr = (
        c.cA[i] * state.last_sample
        - c.cB[i] * state.m0
        - c.cC[i] * d1c
        - c.cD[i] * (m_t - state.m0)
    )
    xf = jnp.where(c.use_corrector[i] > 0, x_corr, xf)

    # predictor t_i -> t_{i+1}
    d1p = state.m0 - m_t  # (m1 - m0) with the new history [m_t, old m0]
    x_next = c.pA[i] * xf - c.pB[i] * m_t - c.pC[i] * d1p

    new_state = UniPCState(m0=m_t, m1=state.m0, last_sample=xf)
    return x_next.astype(x.dtype), new_state
