"""LCM consistency distillation: solver exactness, boundary scalings,
loss trains the LoRA factors, and the distilled artifact serves with
scheduler='lcm'."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.schedulers.common import alphas_cumprod
from powerpaint_tpu.testing import tiny_v1_config
from powerpaint_tpu.text.tokenizer import (
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)
from powerpaint_tpu.train.distill import (
    boundary_scalings,
    ddim_solver_step,
    make_lcm_distill_loss,
    uncond_ids,
)

CFG = tiny_v1_config()
ACP = alphas_cumprod(CFG.scheduler)


def test_ddim_solver_step_exact_on_constant_x0():
    C, K = 0.37, -1.21
    acp = jnp.asarray(ACP, jnp.float32)
    t = jnp.asarray([981], jnp.int32)
    t_prev = jnp.asarray([761], jnp.int32)
    a_t, a_p = float(ACP[981]), float(ACP[761])
    x = jnp.full((1, 4, 4, 1),
                 np.sqrt(a_t) * C + np.sqrt(1 - a_t) * K, jnp.float32)
    eps = jnp.full_like(x, K)
    out = ddim_solver_step(x, eps, acp, t, t_prev)
    np.testing.assert_allclose(
        np.asarray(out), np.sqrt(a_p) * C + np.sqrt(1 - a_p) * K,
        rtol=1e-5)


def test_boundary_scalings_match_lcm_schedule():
    from powerpaint_tpu.schedulers.lcm import make_lcm_schedule

    sched = make_lcm_schedule(CFG.scheduler, 4)
    c_skip, c_out = boundary_scalings(
        sched.timesteps, CFG.scheduler.timestep_scaling)
    np.testing.assert_allclose(np.asarray(c_skip),
                               np.asarray(sched.c_skip), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_out),
                               np.asarray(sched.c_out), rtol=1e-6)


@pytest.fixture(scope="module")
def setup():
    from powerpaint_tpu.train import SyntheticSource, batches

    params = init_params(CFG, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    data = batches(SyntheticSource(hw=32, seed=5), tok, batch_size=2,
                   version="ppt-v1", seed=6)
    uc = uncond_ids(tok)

    def with_uncond(b):
        b = dict(b)
        b["ids_uncond"] = np.tile(uc[None], (b["ids"].shape[0], 1))
        return b

    return params, tok, (with_uncond(next(data)) for _ in iter(int, 1))


def test_distill_loss_trains_lora(setup):
    from powerpaint_tpu.train.lora import init_lora_tree
    from powerpaint_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    import optax

    from powerpaint_tpu.train.lora import init_lora_tree

    params, tok, data = setup
    loss_fn = make_lcm_distill_loss(CFG, params, dtype=jnp.float32,
                                    w_range=(4.0, 8.0))
    lora = init_lora_tree(params["unet"], rank=2,
                          rng=jax.random.PRNGKey(7))
    batch = next(data)
    # FIXED draw (same batch, same rng): x_t / t / x_prev are constant, so
    # repeated GD on the consistency residual must overfit it.  (Across
    # fresh draws the stop-grad target moves with the student, so a
    # two-point decrease check is not a sound contract.)
    rng0 = jax.random.PRNGKey(3)
    vg = jax.jit(jax.value_and_grad(
        lambda lt: loss_fn(lt, batch, rng0)[0]))
    opt = optax.adam(1e-3)
    opt_state = opt.init(lora)
    l0, g = vg(lora)
    assert np.isfinite(float(l0)) and float(l0) > 0
    gn = optax.global_norm(g)
    assert float(gn) > 0  # gradient reaches the factors
    losses = [float(l0)]
    for _ in range(8):
        l, g = vg(lora)
        updates, opt_state = opt.update(g, opt_state)
        lora = optax.apply_updates(lora, updates)
        losses.append(float(l))
    l_end, _ = vg(lora)
    assert float(l_end) < losses[0], (losses, float(l_end))


def test_v2_distill_loss_runs_and_grads_flow():
    import optax

    from powerpaint_tpu.testing import tiny_v2_config
    from powerpaint_tpu.train import SyntheticSource, batches
    from powerpaint_tpu.train.distill import make_lcm_distill_loss_v2
    from powerpaint_tpu.train.lora import init_lora_tree

    cfg2 = tiny_v2_config()
    params = init_params(cfg2, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    data = batches(SyntheticSource(hw=32, seed=9), tok, batch_size=2,
                   version="ppt-v2", seed=10)
    batch = next(data)
    loss_fn = make_lcm_distill_loss_v2(cfg2, params, dtype=jnp.float32)
    lora = init_lora_tree(params["unet"], rank=2,
                          rng=jax.random.PRNGKey(11))
    rng0 = jax.random.PRNGKey(4)
    vg = jax.jit(jax.value_and_grad(
        lambda lt: loss_fn(lt, batch, rng0)[0]))
    l0, g = vg(lora)
    assert np.isfinite(float(l0)) and float(l0) > 0
    assert float(optax.global_norm(g)) > 0
    # the objective is self-referential (the stop-grad TARGET's value also
    # moves with the factors), so pointwise descent is not a contract —
    # assert the update stays finite and actually moves the factors
    opt = optax.adam(1e-3)
    opt_state = opt.init(lora)
    lora0 = lora
    for _ in range(3):
        l, g = vg(lora)
        assert np.isfinite(float(l))
        updates, opt_state = opt.update(g, opt_state)
        lora = optax.apply_updates(lora, updates)
    moved = max(jax.tree_util.tree_leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), lora0, lora)))
    assert moved > 0


def test_distilled_lora_serves_with_lcm_scheduler(setup):
    """Export a (briefly) distilled LoRA, merge through io/lora, and run
    the v1 pipeline with scheduler='lcm' — the full LCM-LoRA loop."""
    from powerpaint_tpu.io.lora import merge_lora
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.train.lora import export_lora_sd, init_lora_tree
    from powerpaint_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    params, tok, data = setup
    loss_fn = make_lcm_distill_loss(CFG, params, dtype=jnp.float32)
    lora = init_lora_tree(params["unet"], rank=2,
                          rng=jax.random.PRNGKey(8))
    tx = make_optimizer(1e-3, weight_decay=0.0)
    state = init_train_state(lora, tx)
    step = make_train_step(loss_fn, tx, donate=False)
    batch = next(data)
    for _ in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(1))

    sd = export_lora_sd(jax.device_get(state.params), target="unet")
    merged, unmatched = merge_lora(params, sd)
    assert unmatched == []
    pipe = InpaintPipeline(CFG, merged, tok, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    out = pipe(img, mask, prompt="a cat", num_inference_steps=4,
               guidance_scale=1.0, seed=3, scheduler="lcm")
    assert out.shape == (1, 64, 64, 3) and out.dtype == np.uint8


def test_boundary_anchor_identity_at_t0():
    """f(x, 0) = x (c_skip(0)=1, c_out(0)=0): the structural identity that
    anchors the consistency chain when the sampled pair hits the grid
    boundary (i=0 -> t_prev=0)."""
    c_skip, c_out = boundary_scalings(
        jnp.asarray([0], jnp.int32), CFG.scheduler.timestep_scaling)
    assert float(c_skip[0]) == 1.0 and float(c_out[0]) == 0.0
