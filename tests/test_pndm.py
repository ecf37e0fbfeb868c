"""PNDM/PLMS: visit sequence, exactness on constant-eps, accuracy ordering."""

import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers import ddim, pndm
from powerpaint_tpu.schedulers.common import make_schedule

CFG = SchedulerConfig()


def test_visit_sequence_repeats_second_timestep():
    s = pndm.make_pndm_schedule(CFG, 10)
    ts = np.asarray(s.timesteps)
    assert len(ts) == 11
    # descending, with the second visit repeating (the PLMS warmup quirk)
    assert ts[1] == ts[2]
    assert ts[0] == 901 and ts[-1] == 1


def test_constant_eps_tracks_line():
    """With eps constant, every multistep combination equals that constant and
    PLMS reduces to its one-step rule; trajectory stays on the (x0, eps)
    line determined by the transition formula."""
    s = pndm.make_pndm_schedule(CFG, 20)
    rng = np.random.RandomState(0)
    eps = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    x0 = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)

    acp = np.asarray(s.alphas_cumprod_j)
    t0 = int(s.timesteps[0])
    x = np.sqrt(acp[t0]) * x0 + np.sqrt(1 - acp[t0]) * eps

    st = pndm.init_state(s, x.shape, x.dtype)
    for i in range(s.num_steps):
        x, st = pndm.step(s, st, eps, jnp.int32(i), x)
    # final alpha = acp[t=1-50<0 -> acp[0]]
    a_f = acp[0]
    expected = np.sqrt(a_f) * np.asarray(x0) + np.sqrt(1 - a_f) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-3)


def test_plms_beats_ddim_few_steps():
    rng = np.random.RandomState(1)
    target = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)
    eps0 = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)

    def model_eps(x, t_int, acp):
        a = np.sqrt(np.asarray(acp[max(t_int, 0)]))
        sg = np.sqrt(1 - a * a)
        x0_t = target * (1.0 - 0.3 * (t_int / 1000.0))
        return (x - a * x0_t) / sg

    def run_ddim(n):
        s = make_schedule(CFG, n)
        x = jnp.asarray(eps0)
        st = ddim.init_state(s, x.shape, x.dtype)
        for i in range(n):
            e = model_eps(x, int(s.timesteps[i]), s.alphas_cumprod)
            x, st = ddim.step(s, st, e, jnp.int32(i), x)
        return np.asarray(x)

    def run_plms(n):
        s = pndm.make_pndm_schedule(CFG, n)
        x = jnp.asarray(eps0)
        st = pndm.init_state(s, x.shape, x.dtype)
        acp = s.alphas_cumprod_j
        for i in range(s.num_steps):
            e = model_eps(x, int(s.timesteps[i]), acp)
            x, st = pndm.step(s, st, e, jnp.int32(i), x)
        return np.asarray(x)

    ref = run_ddim(400)
    err_d = np.abs(run_ddim(8) - ref).mean()
    err_p = np.abs(run_plms(8) - ref).mean()
    assert err_p < err_d, (err_p, err_d)
