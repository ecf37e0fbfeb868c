"""UniPC: exact-integration property and corrector behavior."""

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers import unipc
from powerpaint_tpu.schedulers.common import add_noise

CFG = SchedulerConfig()


def _alpha_sigma(s, t):
    a = np.asarray(s.base.alphas_cumprod[max(t, 0)])
    return np.sqrt(a), np.sqrt(1 - a)


def test_unipc_constant_x0_is_exact():
    """With a model whose x0-prediction is constant, the data-prediction UniPC
    update integrates the probability-flow ODE exactly: the trajectory stays
    on x_t = alpha_t*x0 + sigma_t*eps all the way to t=0."""
    s = unipc.make_unipc_schedule(CFG, 20)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)

    t0 = int(s.timesteps[0])
    a0, s0_ = _alpha_sigma(s, t0)
    x = a0 * x0 + s0_ * eps

    state = unipc.init_state(s, x.shape, x.dtype)
    for i in range(s.num_steps):
        t = int(s.timesteps[i])
        a_t, sg_t = _alpha_sigma(s, t)
        # exact epsilon for the CURRENT x along its own (x0, eps') line
        model_eps = (x - a_t * x0) / sg_t
        x, state = unipc.step(s, state, model_eps, jnp.int32(i), x)

    a_f, sg_f = _alpha_sigma(s, 0)
    expected = a_f * np.asarray(x0) + sg_f * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x), expected, atol=5e-3)


def test_unipc_more_accurate_than_ddim_few_steps():
    """2nd-order UniPC at 5 steps should beat 1st-order DDIM at 5 steps on a
    curved model (x0-prediction varying with t)."""
    from powerpaint_tpu.schedulers import ddim
    from powerpaint_tpu.schedulers.common import alpha_at, make_schedule

    rng = np.random.RandomState(1)
    target = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    eps0 = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)

    def model_eps(x, t_int, acp):
        # a model whose implied x0 drifts with t -> curvature in lambda
        a = np.sqrt(np.asarray(acp[max(t_int, 0)]))
        sg = np.sqrt(1 - a * a)
        x0_t = target * (1.0 - 0.3 * (t_int / 1000.0))
        return (x - a * x0_t) / sg

    def run_many_step_reference(n=400):
        s = make_schedule(CFG, n)
        x = jnp.asarray(eps0)
        st = ddim.init_state(s, x.shape, x.dtype)
        for i in range(n):
            e = model_eps(x, int(s.timesteps[i]), s.alphas_cumprod)
            x, st = ddim.step(s, st, e, jnp.int32(i), x)
        return np.asarray(x)

    ref = run_many_step_reference()

    def run_ddim(n):
        s = make_schedule(CFG, n)
        x = jnp.asarray(eps0)
        st = ddim.init_state(s, x.shape, x.dtype)
        for i in range(n):
            e = model_eps(x, int(s.timesteps[i]), s.alphas_cumprod)
            x, st = ddim.step(s, st, e, jnp.int32(i), x)
        return np.asarray(x)

    def run_unipc(n):
        s = unipc.make_unipc_schedule(CFG, n)
        x = jnp.asarray(eps0)
        st = unipc.init_state(s, x.shape, x.dtype)
        for i in range(n):
            e = model_eps(x, int(s.timesteps[i]), s.base.alphas_cumprod)
            x, st = unipc.step(s, st, e, jnp.int32(i), x)
        return np.asarray(x)

    err_ddim = np.abs(run_ddim(5) - ref).mean()
    err_unipc = np.abs(run_unipc(5) - ref).mean()
    assert err_unipc < err_ddim, (err_unipc, err_ddim)


def test_unipc_coeff_tables_finite():
    for steps in (1, 2, 5, 20, 50):
        s = unipc.make_unipc_schedule(CFG, steps)
        for name, arr in s.coeffs._asdict().items():
            assert np.isfinite(np.asarray(arr)).all(), (steps, name)
