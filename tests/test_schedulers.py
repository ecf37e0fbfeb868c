"""Scheduler math: schedule tables, spacing, DDIM closed-form properties."""

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers import ddim
from powerpaint_tpu.schedulers.common import (
    add_noise,
    alpha_at,
    make_schedule,
    spaced_timesteps,
)

CFG = SchedulerConfig()


def test_leading_spacing_matches_sd_defaults():
    ts = spaced_timesteps(CFG, 20)
    # leading: arange(20)*50 reversed + offset 1
    expected = (np.arange(20) * 50)[::-1] + 1
    np.testing.assert_array_equal(ts, expected)


def test_alphas_cumprod_monotone():
    s = make_schedule(CFG, 20)
    acp = np.asarray(s.alphas_cumprod)
    assert acp.shape == (1000,)
    assert (np.diff(acp) < 0).all()
    assert 0 < acp[-1] < acp[0] < 1


def test_add_noise_interpolates():
    s = make_schedule(CFG, 10)
    x0 = jnp.ones((1, 4, 4, 4))
    noise = jnp.zeros_like(x0)
    # with zero noise, x_t = sqrt(acp[t]) * x0
    t = jnp.array([500])
    out = add_noise(s, x0, noise, t)
    np.testing.assert_allclose(
        np.asarray(out), np.sqrt(np.asarray(s.alphas_cumprod[500])),
        rtol=1e-6,
    )


def test_ddim_perfect_eps_recovers_x0():
    """If the model predicts the exact noise, DDIM must retrace the forward
    trajectory: from x_T built with known (x0, eps), the full reverse pass
    lands on x0."""
    s = make_schedule(CFG, 20)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 4), dtype=jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 4, 4), dtype=jnp.float32)

    x = add_noise(s, x0, eps, s.timesteps[0])
    state = ddim.init_state(s, x.shape, x.dtype)
    for i in range(s.num_steps):
        # exact eps for current x along the (x0, eps) line:
        a_t = alpha_at(s, s.timesteps[i])
        model_eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        x, state = ddim.step(s, state, model_eps, jnp.int32(i), x)
    # with set_alpha_to_one=False (SD convention) the reverse pass lands on
    # sqrt(acp[0])*x0 + sqrt(1-acp[0])*eps, not exactly x0
    a_final = s.final_alpha_cumprod
    expected = np.sqrt(a_final) * np.asarray(x0) + np.sqrt(1 - a_final) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-4)

    # and with set_alpha_to_one=True it recovers x0 exactly
    s1 = make_schedule(CFG.replace(set_alpha_to_one=True), 20)
    x = add_noise(s1, x0, eps, s1.timesteps[0])
    state = ddim.init_state(s1, x.shape, x.dtype)
    for i in range(s1.num_steps):
        a_t = alpha_at(s1, s1.timesteps[i])
        model_eps = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        x, state = ddim.step(s1, state, model_eps, jnp.int32(i), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddim_final_alpha_not_one():
    s = make_schedule(CFG, 20)
    # set_alpha_to_one=False (SD convention): final alpha = acp[0]
    assert abs(s.final_alpha_cumprod - float(s.alphas_cumprod[0])) < 1e-6
    a = alpha_at(s, jnp.array(-49))
    np.testing.assert_allclose(np.asarray(a), s.final_alpha_cumprod, rtol=1e-6)
