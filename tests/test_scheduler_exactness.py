"""Closed-form exactness pins for the scheduler step math.

For a constant-x0 epsilon model — eps(x, t) = (x - alpha_t * c) / sigma_t —
the TRUE probability-flow trajectory is x_t = alpha_t * c + sigma_t * K
(K set by the start point), and every correct VP sampler must track it
EXACTLY at any step count: predictor/corrector terms built from x0
differences all vanish.  This pins, independently of diffusers:

- the eps <-> x0 conversion and pA/pB (sigma-ratio / alpha*phi) signs;
- the corrector's algebra (UniPC) and multistep history handling
  (PNDM/DPM) — any leakage of wrong-order terms breaks exactness;
- the FINAL-step boundary (ROADMAP flagged UniPC `prev_t = ts[i+1]` tail
  semantics): the terminal value must equal
  alpha_end * c + sigma_end * K with alphas_cumprod[0] at the t<=0 floor
  (set_alpha_to_one=False, the SD1.5 config);
- strength<1 truncated schedules (same invariant, truncated start).

Euler's sigma-space analog: with x0 constant, x_sigma = c + sigma * K.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from powerpaint_tpu import schedulers as registry
from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers.common import alphas_cumprod

CFG = SchedulerConfig()
ACP = alphas_cumprod(CFG)
C = 0.37  # the constant x0
K = -1.21  # noise direction coefficient

VP = ("ddim", "pndm", "unipc", "dpm")


def a_s(t):
    t = max(int(t), 0)
    return float(np.sqrt(ACP[t])), float(np.sqrt(1.0 - ACP[t]))


@pytest.mark.parametrize("name", VP)
@pytest.mark.parametrize("steps,keep", [(5, None), (10, None), (10, 6)])
def test_vp_sampler_exact_on_constant_x0(name, steps, keep):
    mod, make = registry.get(name)
    sched = make(CFG, steps, keep_steps=keep)

    ts = np.asarray(sched.timesteps)
    a0, s0 = a_s(ts[0])
    x = jnp.full((1, 4, 4, 1), a0 * C + s0 * K, jnp.float32)
    state = mod.init_state(sched, x.shape, x.dtype)

    for i in range(sched.num_steps):
        t = int(ts[i])
        # PNDM's visit sequence revisits a timestep at i==1 with its
        # use_cur quirk; the model is evaluated at the CURRENT x and the
        # listed t — exactly what the pipeline does
        a_t, s_t = a_s(t)
        # model sees scale_model_input(x) (identity for VP samplers)
        xin = mod.scale_model_input(sched, x, i)
        eps = (xin - a_t * C) / s_t
        x, state = mod.step(sched, state, eps, jnp.int32(i), x)

    # terminal boundary: t <= 0 maps to alphas_cumprod[0]
    # (set_alpha_to_one=False in the SD1.5 config)
    a_end, s_end = a_s(0)
    expected = a_end * C + s_end * K
    np.testing.assert_allclose(
        np.asarray(x), expected, rtol=2e-4,
        err_msg=f"{name} steps={steps} keep={keep}",
    )


@pytest.mark.parametrize("steps,keep", [(5, None), (10, 6)])
def test_euler_exact_on_constant_x0(steps, keep):
    mod, make = registry.get("euler")
    sched = make(CFG, steps, keep_steps=keep)
    sig = np.asarray(sched.sigmas)

    x = jnp.full((1, 4, 4, 1), C + sig[0] * K, jnp.float32)
    state = mod.init_state(sched, x.shape, x.dtype)
    for i in range(sched.num_steps):
        # euler latents are unscaled: x = x0 + sigma * K; the eps estimate
        # the model must emit is (x - x0)/sigma = K
        eps = (x - C) / sig[i]
        x, state = mod.step(sched, state, eps, jnp.int32(i), x)
    # sigma ends at exactly 0 -> x == x0
    np.testing.assert_allclose(np.asarray(x), C, rtol=1e-5, atol=1e-5)


def test_unipc_final_step_uses_t0_boundary():
    """Direct pin of the flagged tail semantics: the last predictor
    transition targets t=0 (alphas_cumprod[0]), not ts[i+1] wraparound."""
    from powerpaint_tpu.schedulers import unipc

    sched = unipc.make_unipc_schedule(CFG, 5)
    c = sched.coeffs
    i = sched.num_steps - 1
    t_s = int(np.asarray(sched.timesteps)[i])
    a_t, s_t = a_s(0)  # target boundary
    a_s0, s_s0 = a_s(t_s)
    # pA = sigma_t / sigma_s0 for the FINAL transition
    np.testing.assert_allclose(float(c.pA[i]), s_t / s_s0, rtol=1e-6)
    # pB = alpha_t * h_phi_1 with h = lambda_t - lambda_s0, hh = -h
    lam = lambda a, s: np.log(a) - np.log(s)  # noqa: E731
    hh = -(lam(a_t, s_t) - lam(a_s0, s_s0))
    np.testing.assert_allclose(
        float(c.pB[i]), a_t * np.expm1(hh), rtol=1e-6
    )
    # lower_order_final: the last step is order 1 -> no D1 term
    assert float(c.pC[i]) == 0.0
