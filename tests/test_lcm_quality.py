"""LCM few-step quality gate (round-3 verdict #4).

Pins PSNR floors for 2/4/8-step ``scheduler='lcm'`` sampling vs the
20-step exact output, the ``test_cache_drift.py`` pattern applied to the
few-step mode.  Measured on the tiny random-weight stack
(scripts/exp_lcm_quality.py, 2026-08):

    undistilled base   lcm4: 12.75 dB
    300-step LCM-LoRA  lcm2: 11.64  lcm4: 11.51  lcm8: 10.40 dB

HONEST SCOPE: with a random-weight teacher there is no coherent
trajectory to distill, so these numbers are a *wiring tripwire*, not a
quality claim — a broken LCM schedule/boundary-scaling/merge path drops
PSNR to ~0-6 dB, which is what the floors catch.  Real few-step quality
numbers require real teacher weights (the golden-eval harness covers
that day); PARITY.md quotes this table with the same caveat.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from powerpaint_tpu.io.params import init_params  # noqa: E402
from powerpaint_tpu.testing import tiny_v1_config  # noqa: E402
from powerpaint_tpu.text.tokenizer import (  # noqa: E402
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2))
    return 10 * np.log10(4.0 / mse) if mse > 0 else np.inf


_IMG = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
_MASK = np.zeros((64, 64), np.float32)
_MASK[16:48, 16:48] = 1.0


@pytest.fixture(scope="module")
def stack():
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline

    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)
    exact = np.asarray(pipe(_IMG, _MASK, prompt="a cat",
                            num_inference_steps=20, seed=3,
                            output_type="float32"))
    return cfg, params, tok, pipe, exact


def test_lcm_fewstep_psnr_floor_base_weights(stack):
    """Few-step LCM sampling through the base weights: PSNR vs the
    20-step exact output must clear the measured floor (12.75 dB measured
    for 4 steps; floor set with platform slack).  Catches schedule /
    boundary-scaling / guidance-path regressions in the LCM sampler."""
    cfg, params, tok, pipe, exact = stack
    psnrs = {}
    for steps, floor in ((2, 8.0), (4, 9.0), (8, 7.5)):
        out = np.asarray(pipe(
            _IMG, _MASK, prompt="a cat", num_inference_steps=steps,
            guidance_scale=1.0, seed=3, scheduler="lcm",
            output_type="float32"))
        psnrs[steps] = _psnr(out, exact)
        assert psnrs[steps] >= floor, (steps, psnrs)
    # shape/range sanity: the few-step path produces in-range output
    assert np.isfinite(list(psnrs.values())).all()


def test_lcm_fewstep_psnr_floor_distilled_lora(stack):
    """Brief LCM-LoRA distillation, merge, then 4-step LCM serve: the
    distilled artifact's PSNR vs exact must clear the same tripwire floor
    (11.51 dB measured after 300 steps; brief training stays in the same
    band).  Guards the full distill -> export -> merge -> serve loop."""
    import optax

    from powerpaint_tpu.io.lora import merge_lora
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.train import SyntheticSource, batches
    from powerpaint_tpu.train.distill import (
        make_lcm_distill_loss,
        uncond_ids,
    )
    from powerpaint_tpu.train.lora import export_lora_sd, init_lora_tree

    cfg, params, tok, _, exact = stack
    data = batches(SyntheticSource(hw=32, seed=5), tok, batch_size=2,
                   version="ppt-v1", seed=6)
    uc = uncond_ids(tok)
    loss_fn = make_lcm_distill_loss(cfg, params, dtype=jnp.float32,
                                    w_range=(6.0, 9.0))
    lora = init_lora_tree(params["unet"], rank=4, rng=jax.random.PRNGKey(7))
    opt = optax.adam(1e-3)
    opt_state = opt.init(lora)
    vg = jax.jit(jax.value_and_grad(lambda lt, b, r: loss_fn(lt, b, r)[0]))
    key = jax.random.PRNGKey(11)
    for _ in range(10):
        b = dict(next(data))
        b["ids_uncond"] = np.tile(uc[None], (b["ids"].shape[0], 1))
        key, sub = jax.random.split(key)
        _, g = vg(lora, b, sub)
        updates, opt_state = opt.update(g, opt_state)
        lora = optax.apply_updates(lora, updates)

    sd = export_lora_sd(jax.device_get(lora), target="unet")
    merged, unmatched = merge_lora(params, sd)
    assert unmatched == []
    pipe_lcm = InpaintPipeline(cfg, merged, tok, dtype=jnp.float32)
    out = np.asarray(pipe_lcm(
        _IMG, _MASK, prompt="a cat", num_inference_steps=4,
        guidance_scale=1.0, seed=3, scheduler="lcm",
        output_type="float32"))
    assert _psnr(out, exact) >= 8.5
