"""Round-3 sampler-family completion: heun / lms / euler_a / deis /
dpm_sde / lcm.

Exactness strategy (see tests/test_scheduler_exactness.py): on a
constant-x0 epsilon model every correct ODE sampler tracks the true
trajectory exactly at any step count — this pins heun (both predictor and
corrector algebra), lms (the integrated Lagrange weights must sum to the
sigma increment), and deis (the log-rho basis integrals must sum to the
rho increment).  The stochastic samplers are pinned by closed-form table
identities derived independently here (variance preservation, mean
consistency) plus zero-noise recurrences, and all samplers get tiny
end-to-end pipeline coverage including the batched == standalone
per-image-seed contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu import schedulers as registry
from powerpaint_tpu.core.config import SchedulerConfig
from powerpaint_tpu.schedulers.common import alphas_cumprod

CFG = SchedulerConfig()
ACP = alphas_cumprod(CFG)
C = 0.37
K = -1.21


def a_s(t):
    t = max(int(t), 0)
    return float(np.sqrt(ACP[t])), float(np.sqrt(1.0 - ACP[t]))


# --------------------------------------------------------------- exactness


@pytest.mark.parametrize("steps,keep", [(5, None), (10, None), (10, 6)])
def test_deis_exact_on_constant_x0(steps, keep):
    mod, make = registry.get("deis")
    sched = make(CFG, steps, keep_steps=keep)
    ts = np.asarray(sched.timesteps)

    a0, s0 = a_s(ts[0])
    x = jnp.full((1, 4, 4, 1), a0 * C + s0 * K, jnp.float32)
    state = mod.init_state(sched, x.shape, x.dtype)
    for i in range(sched.num_steps):
        a_t, s_t = a_s(ts[i])
        eps = (x - a_t * C) / s_t
        x, state = mod.step(sched, state, eps, jnp.int32(i), x)
    a_end, s_end = a_s(0)
    np.testing.assert_allclose(
        np.asarray(x), a_end * C + s_end * K, rtol=2e-4
    )


def test_deis_first_order_step_equals_ddim():
    """Order-1 DEIS is algebraically DDIM (same exponential integrator)."""
    from powerpaint_tpu.schedulers import ddim
    from powerpaint_tpu.schedulers.common import make_schedule

    mod, make = registry.get("deis")
    sched_d = make(CFG, 6)
    sched_ddim = make_schedule(CFG, 6)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 1), jnp.float32)
    eps = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 1), jnp.float32)
    # step 0 is first order in DEIS
    xd, _ = mod.step(sched_d, mod.init_state(sched_d, x.shape, x.dtype),
                     eps, jnp.int32(0), x)
    st = ddim.init_state(sched_ddim, x.shape, x.dtype)
    xr, _ = ddim.step(sched_ddim, st, eps, jnp.int32(0), x)
    np.testing.assert_allclose(np.asarray(xd), np.asarray(xr), rtol=3e-5,
                               atol=3e-5)


@pytest.mark.parametrize("steps,keep", [(5, None), (10, None), (10, 6)])
def test_heun_exact_on_constant_x0(steps, keep):
    mod, make = registry.get("heun")
    sched = make(CFG, steps, keep_steps=keep)
    ev = np.asarray(sched.eval_sigmas)
    assert sched.num_steps == 2 * (steps if keep is None else keep) - 1

    x = jnp.full((1, 4, 4, 1), C + ev[0] * K, jnp.float32)
    state = mod.init_state(sched, x.shape, x.dtype)
    for i in range(sched.num_steps):
        # on the true trajectory the carry sits exactly at the eval sigma
        # for every iteration (incl. correctors)
        np.testing.assert_allclose(
            np.asarray(x)[0, 0, 0, 0], C + ev[i] * K, rtol=1e-4
        )
        eps = (x - C) / ev[i]
        x, state = mod.step(sched, state, eps, jnp.int32(i), x)
    np.testing.assert_allclose(np.asarray(x), C, rtol=1e-5, atol=1e-5)


def test_heun_corrector_differs_from_euler_on_curved_model():
    """On a model whose eps varies with sigma the trapezoid correction must
    change the result vs plain Euler (guards against the corrector
    silently reducing to the predictor)."""
    mod, make = registry.get("heun")
    emod, emake = registry.get("euler")
    sched = make(CFG, 4)
    esched = emake(CFG, 4)

    def run(m, s, n_iter, sig_of):
        x = jnp.full((1, 2, 2, 1), 3.0, jnp.float32)
        st = m.init_state(s, x.shape, x.dtype)
        for i in range(n_iter):
            sig = sig_of(i)
            eps = x * 0.01 * sig  # sigma-dependent curvature
            x, st = m.step(s, st, eps, jnp.int32(i), x)
        return np.asarray(x)

    xh = run(mod, sched, sched.num_steps,
             lambda i: float(np.asarray(sched.eval_sigmas)[i]))
    xe = run(emod, esched, esched.num_steps,
             lambda i: float(np.asarray(esched.sigmas)[i]))
    assert not np.allclose(xh, xe)


@pytest.mark.parametrize("steps,keep", [(5, None), (10, None), (10, 6)])
def test_lms_exact_on_constant_x0(steps, keep):
    mod, make = registry.get("lms")
    sched = make(CFG, steps, keep_steps=keep)
    sig = np.asarray(sched.sigmas)

    x = jnp.full((1, 4, 4, 1), C + sig[0] * K, jnp.float32)
    state = mod.init_state(sched, x.shape, x.dtype)
    for i in range(sched.num_steps):
        eps = (x - C) / sig[i]
        x, state = mod.step(sched, state, eps, jnp.int32(i), x)
    np.testing.assert_allclose(np.asarray(x), C, rtol=1e-5, atol=1e-5)


def test_lms_weights_sum_to_sigma_increment():
    """Lagrange basis sums to 1 identically, so each row of the integrated
    coefficient table must sum to sigma_{i+1} - sigma_i EXACTLY (we
    integrate polynomials analytically — no quadrature tolerance)."""
    _, make = registry.get("lms")
    sched = make(CFG, 8)
    sig = np.asarray(sched.sigmas, np.float64)
    c = np.asarray(sched.coeffs, np.float64)
    np.testing.assert_allclose(c.sum(axis=1), sig[1:] - sig[:-1], rtol=1e-5)


def test_lms_is_higher_order_than_euler_on_curved_model():
    mod, make = registry.get("lms")
    emod, emake = registry.get("euler")
    sched, esched = make(CFG, 6), emake(CFG, 6)
    sig = np.asarray(sched.sigmas)

    def run(m, s):
        x = jnp.full((1, 2, 2, 1), 3.0, jnp.float32)
        st = m.init_state(s, x.shape, x.dtype)
        for i in range(s.num_steps):
            eps = x * 0.01 * float(sig[i])
            x, st = m.step(s, st, eps, jnp.int32(i), x)
        return np.asarray(x)

    assert not np.allclose(run(mod, sched), run(emod, esched))


# ------------------------------------------------ stochastic table algebra


def test_ancestral_variance_split():
    """sigma_up^2 + sigma_down^2 == sigma_next^2 (exact marginal
    preservation) and sigma_up < sigma_next (some signal survives)."""
    _, make = registry.get("euler_a")
    sched = make(CFG, 12)
    sig = np.asarray(sched.sigmas, np.float64)
    up = np.asarray(sched.sigma_up, np.float64)
    down = np.asarray(sched.sigma_down, np.float64)
    np.testing.assert_allclose(up ** 2 + down ** 2, sig[1:] ** 2,
                               rtol=1e-5, atol=1e-12)
    assert (up[:-1] < sig[1:-1]).all()
    # independent re-derivation of the k-diffusion split
    ref_up = sig[1:] * np.sqrt(
        np.maximum(sig[:-1] ** 2 - sig[1:] ** 2, 0.0)) / sig[:-1]
    np.testing.assert_allclose(up, ref_up, rtol=1e-5, atol=1e-12)


def test_ancestral_zero_noise_recurrence():
    """With z = 0 the update is x' = x + (sigma_down - sigma) * eps —
    mirrored here in numpy from the published k-diffusion formula."""
    mod, make = registry.get("euler_a")
    sched = make(CFG, 5)
    sig = np.asarray(sched.sigmas, np.float64)
    down = np.asarray(sched.sigma_down, np.float64)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 3, 1).astype(np.float32)
    eps = rng.randn(1, 3, 3, 1).astype(np.float32)
    got, _ = mod.step(sched, mod.init_state(sched, x.shape, x.dtype),
                      jnp.asarray(eps), jnp.int32(2), jnp.asarray(x),
                      noise=jnp.zeros_like(jnp.asarray(x)))
    want = x + (down[2] - sig[2]) * eps
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_sde_table_identities():
    """DPM++ 2M SDE tables: (a) variance preservation
    A^2 sigma^2 + N^2 = sigma_next^2; (b) mean consistency
    alpha_next - A alpha = B0 + B1 (a constant-x0 point stays on the data
    manifold in expectation); (c) the midpoint split B1 = -B/(2r)."""
    _, make = registry.get("dpm_sde")
    sched = make(CFG, 8)
    ts = np.asarray(sched.timesteps, np.int64)
    A = np.asarray(sched.A, np.float64)
    B0 = np.asarray(sched.B0, np.float64)
    B1 = np.asarray(sched.B1, np.float64)
    N = np.asarray(sched.N, np.float64)
    S = sched.num_steps

    def asl(t):
        t = max(int(t), 0)
        a = ACP[t]
        al, si = np.sqrt(a), np.sqrt(1 - a)
        return al, si, np.log(al) - np.log(si)

    for i in range(S):
        t_next = ts[i + 1] if i + 1 < S else 0
        a_c, s_c, l_c = asl(ts[i])
        a_n, s_n, l_n = asl(t_next)
        np.testing.assert_allclose(A[i] ** 2 * s_c ** 2 + N[i] ** 2,
                                   s_n ** 2, rtol=1e-6)
        np.testing.assert_allclose(a_n - A[i] * a_c, B0[i] + B1[i],
                                   rtol=1e-6)
        if 0 < i < S - 1:
            h = l_n - l_c
            h_prev = l_c - asl(ts[i - 1])[2]
            r = h_prev / h
            B = a_n * (1 - np.exp(-2 * h))
            np.testing.assert_allclose(B1[i], -B / (2 * r), rtol=1e-6)


def test_sde_zero_noise_contracts_to_data_manifold():
    """Constant-x0 model, z = 0: the x0-residual contracts by
    exp(-2h) sigma_next / sigma_cur each step, so the terminal state is
    closer to alpha*C than the start (in residual units)."""
    mod, make = registry.get("dpm_sde")
    sched = make(CFG, 8)
    ts = np.asarray(sched.timesteps)
    a0, s0 = a_s(ts[0])
    x = jnp.full((1, 4, 4, 1), a0 * C + s0 * K, jnp.float32)
    state = mod.init_state(sched, x.shape, x.dtype)
    for i in range(sched.num_steps):
        a_t, s_t = a_s(ts[i])
        eps = (x - a_t * C) / s_t
        x, state = mod.step(sched, state, eps, jnp.int32(i), x,
                            noise=jnp.zeros_like(x))
    a_end, s_end = a_s(0)
    res_start = abs(K)  # residual in sigma units at start
    res_end = abs(float(np.asarray(x)[0, 0, 0, 0]) - a_end * C) / s_end
    assert res_end < res_start * 0.1


def test_lcm_schedule_and_step():
    mod, make = registry.get("lcm")
    sched = make(CFG, 4)
    ts = np.asarray(sched.timesteps, np.int64)
    # timesteps come from the coarse origin grid (k*i - 1), descending
    k = CFG.num_train_timesteps // CFG.original_inference_steps
    assert ((ts + 1) % k == 0).all()
    assert (np.diff(ts) < 0).all()
    # boundary conditions (sigma_data = 0.5, timestep_scaling = 10)
    scaled = ts * CFG.timestep_scaling
    np.testing.assert_allclose(
        np.asarray(sched.c_skip, np.float64),
        0.25 / (scaled ** 2 + 0.25), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.c_out, np.float64),
        scaled / np.sqrt(scaled ** 2 + 0.25), rtol=1e-6)

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 3, 1).astype(np.float32)
    eps = rng.randn(1, 3, 3, 1).astype(np.float32)
    z = rng.randn(1, 3, 3, 1).astype(np.float32)
    st = mod.init_state(sched, x.shape, x.dtype)

    # non-final step: denoise + renoise to the NEXT timestep with fresh z
    i = 1
    a_i = ACP[ts[i]]
    x0 = (x - np.sqrt(1 - a_i) * eps) / np.sqrt(a_i)
    den = float(sched.c_out[i]) * x0 + float(sched.c_skip[i]) * x
    a_n = ACP[ts[i + 1]]
    want = np.sqrt(a_n) * den + np.sqrt(1 - a_n) * z
    got, _ = mod.step(sched, st, jnp.asarray(eps), jnp.int32(i),
                      jnp.asarray(x), noise=jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)

    # final step returns the denoised sample, ignoring noise
    i = sched.num_steps - 1
    a_i = ACP[ts[i]]
    x0 = (x - np.sqrt(1 - a_i) * eps) / np.sqrt(a_i)
    den = float(sched.c_out[i]) * x0 + float(sched.c_skip[i]) * x
    got, _ = mod.step(sched, st, jnp.asarray(eps), jnp.int32(i),
                      jnp.asarray(x), noise=jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(got), den, rtol=2e-4, atol=2e-5)


def test_lcm_rejects_too_many_steps():
    _, make = registry.get("lcm")
    with pytest.raises(ValueError):
        make(CFG, CFG.original_inference_steps + 1)


def test_heun_iteration_step_map():
    from powerpaint_tpu.schedulers import heun

    np.testing.assert_array_equal(
        heun.iteration_step_map(4), [0, 0, 1, 1, 2, 2, 3]
    )


def test_registry_knows_all_new_names():
    for name in ("heun", "lms", "euler_a", "deis", "dpm_sde", "lcm"):
        mod, make = registry.get(name)
        assert callable(make)
    assert registry.is_stochastic("euler_a")
    assert registry.is_stochastic("dpm_sde")
    assert registry.is_stochastic("lcm")
    assert not registry.is_stochastic("heun")
    assert not registry.is_stochastic("ddim")


# --------------------------------------------------------------- pipelines


@pytest.fixture(scope="module")
def v1_pipe():
    import jax.numpy as jnp

    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.testing import tiny_v1_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    return InpaintPipeline(cfg, params, tok, dtype=jnp.float32)


@pytest.fixture(scope="module")
def img_mask():
    rng = np.random.RandomState(0)
    image = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    return image, mask


@pytest.mark.parametrize(
    "name", ["heun", "lms", "euler_a", "deis", "dpm_sde", "lcm"]
)
def test_v1_pipeline_runs_every_new_sampler(v1_pipe, img_mask, name):
    image, mask = img_mask
    out = v1_pipe(image, mask, prompt="a cat", num_inference_steps=3,
                  seed=11, scheduler=name)
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8
    # deterministic given the seed (incl. the stochastic samplers: their
    # step noise is threefry-keyed off the per-image seed)
    out2 = v1_pipe(image, mask, prompt="a cat", num_inference_steps=3,
                   seed=11, scheduler=name)
    np.testing.assert_array_equal(out, out2)


@pytest.mark.parametrize("name", ["euler_a", "dpm_sde"])
def test_v1_stochastic_batched_equals_standalone(v1_pipe, img_mask, name):
    image, mask = img_mask
    solo = v1_pipe(image, mask, prompt="x", num_inference_steps=2, seed=5,
                   scheduler=name)
    batch = v1_pipe(image, mask, prompt="x", num_inference_steps=2, seed=5,
                    num_images_per_prompt=2, scheduler=name)
    # identical per-image noise streams; batch-1 vs batch-2 are different
    # XLA programs, so allow last-bit uint8 rounding drift (same slack as
    # the sharded==single dryrun parity check)
    diff = np.abs(batch[0].astype(np.int32) - solo[0].astype(np.int32))
    assert diff.max() <= 1, diff.max()
    assert not np.array_equal(batch[0], batch[1])  # distinct noise streams


@pytest.mark.parametrize("name", ["euler_a", "lcm"])
def test_v1_stochastic_seed_changes_output(v1_pipe, img_mask, name):
    image, mask = img_mask
    a = v1_pipe(image, mask, prompt="x", num_inference_steps=2, seed=1,
                scheduler=name)
    b = v1_pipe(image, mask, prompt="x", num_inference_steps=2, seed=2,
                scheduler=name)
    assert not np.array_equal(a, b)


def test_v1_strength_with_heun(v1_pipe, img_mask):
    image, mask = img_mask
    out = v1_pipe(image, mask, prompt="a cat", num_inference_steps=4,
                  strength=0.5, seed=3, scheduler="heun")
    assert out.shape == (1, 64, 64, 3)


def test_v2_pipeline_accepts_lcm_scheduler():
    import jax.numpy as jnp

    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline
    from powerpaint_tpu.testing import tiny_v2_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v2_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    image = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    # LCM: few steps, guidance off (embedded); also exercise heun's
    # expanded gating table on the v2 path
    a = pipe(image, mask, prompt="a cat", num_inference_steps=4,
             guidance_scale=1.0, seed=2, scheduler="lcm")
    assert a.shape == (1, 64, 64, 3) and a.dtype == np.uint8
    b = pipe(image, mask, prompt="a cat", num_inference_steps=4,
             guidance_scale=1.0, seed=2, scheduler="lcm")
    np.testing.assert_array_equal(a, b)
    h = pipe(image, mask, prompt="a cat", num_inference_steps=2,
             seed=2, scheduler="heun",
             control_guidance_start=0.0, control_guidance_end=0.5)
    assert h.shape == (1, 64, 64, 3)

    from powerpaint_tpu.core.validation import InputValidationError

    with pytest.raises(InputValidationError):
        pipe(image, mask, prompt="x", scheduler="nope")
    with pytest.raises(InputValidationError):
        pipe(image, mask, prompt="x", scheduler="lcm", timesteps=[981, 1])


def test_cli_scheduler_choices_match_registry():
    """serve/cli hardcodes the sampler list (importing the registry would
    pull jax into --help); this pins the copy to the canonical tuple."""
    from powerpaint_tpu.serve.cli import build_parser

    parser = build_parser()
    action = next(a for a in parser._actions if a.dest == "scheduler")
    assert tuple(action.choices) == registry.SCHEDULERS
