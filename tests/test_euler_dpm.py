"""Euler + DPM-Solver++ scheduler properties."""

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers import ddim, dpm, euler
from powerpaint_tpu.schedulers.common import make_schedule

CFG = SchedulerConfig()


def _curved_model(target, acp):
    def model_eps(x, t_int):
        a = np.sqrt(np.asarray(acp[max(t_int, 0)]))
        sg = np.sqrt(1 - a * a)
        x0_t = target * (1.0 - 0.3 * (t_int / 1000.0))
        return (x - a * x0_t) / sg
    return model_eps


def test_euler_constant_eps_reaches_x0():
    """sigma-space: x = x0 + sigma*eps; with exact eps Euler is exact and
    sigma_final = 0 -> lands on x0 exactly (in sigma parameterization)."""
    s = euler.make_euler_schedule(CFG, 20)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    x = x0 + float(s.sigmas[0]) * eps
    st = euler.init_state(s, x.shape, x.dtype)
    for i in range(s.num_steps):
        x, st = euler.step(s, st, eps, jnp.int32(i), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_euler_scale_model_input():
    s = euler.make_euler_schedule(CFG, 10)
    x = jnp.ones((1, 2, 2, 2))
    scaled = euler.scale_model_input(s, x, jnp.int32(0))
    expected = 1.0 / np.sqrt(float(s.sigmas[0]) ** 2 + 1)
    np.testing.assert_allclose(np.asarray(scaled)[0, 0, 0, 0], expected,
                               rtol=1e-5)
    assert abs(s.init_noise_sigma - np.sqrt(float(s.sigmas[0])**2 + 1)) < 1e-6


def test_dpm_constant_x0_exact():
    s = dpm.make_dpm_schedule(CFG, 20)
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    acp = np.asarray(s.alphas_cumprod_j)
    t0 = int(s.timesteps[0])
    x = np.sqrt(acp[t0]) * x0 + np.sqrt(1 - acp[t0]) * eps
    st = dpm.init_state(s, x.shape, x.dtype)
    for i in range(s.num_steps):
        t = int(s.timesteps[i])
        a = np.sqrt(acp[max(t, 0)])
        model_eps = (x - a * x0) / np.sqrt(1 - a * a)
        x, st = dpm.step(s, st, model_eps, jnp.int32(i), x)
    a_f = acp[0]
    expected = np.sqrt(a_f) * np.asarray(x0) + np.sqrt(1 - a_f) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x), expected, atol=5e-3)


def test_dpm_converges_second_order():
    """2M overtakes first-order DDIM once away from the coarse-grid tail
    (the midpoint extrapolation pays off as h shrinks)."""
    rng = np.random.RandomState(2)
    target = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    eps0 = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)

    def run_ddim(n):
        s = make_schedule(CFG, n)
        model = _curved_model(target, s.alphas_cumprod)
        x = jnp.asarray(eps0)
        st = ddim.init_state(s, x.shape, x.dtype)
        for i in range(n):
            x, st = ddim.step(s, st, model(x, int(s.timesteps[i])),
                              jnp.int32(i), x)
        return np.asarray(x)

    def run_dpm(n):
        s = dpm.make_dpm_schedule(CFG, n)
        model = _curved_model(target, s.alphas_cumprod_j)
        x = jnp.asarray(eps0)
        st = dpm.init_state(s, x.shape, x.dtype)
        for i in range(n):
            x, st = dpm.step(s, st, model(x, int(s.timesteps[i])),
                             jnp.int32(i), x)
        return np.asarray(x)

    ref = run_ddim(1000)
    err_d = np.abs(run_ddim(100) - ref).mean()
    err_p = np.abs(run_dpm(100) - ref).mean()
    assert err_p < err_d, (err_p, err_d)
    # and the coarse grid is still sane
    assert np.abs(run_dpm(10) - ref).mean() < 0.05
