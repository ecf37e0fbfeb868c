"""End-to-end ppt-v1 pipeline on the tiny stack (CPU-runnable,
BASELINE.json config #1)."""

import jax
import numpy as np
import pytest

from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
from powerpaint_tpu.testing import tiny_v1_config
from powerpaint_tpu.text.tokenizer import HashTokenizer, TokenizerWrapper, add_task_tokens

import jax.numpy as jnp


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)  # placeholders get ids 1024..1053 -> external rows
    return InpaintPipeline(cfg, params, tok, dtype=jnp.float32)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    image = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    return image, mask


def test_text_guided_inpaint(pipe, inputs):
    image, mask = inputs
    out = pipe(image, mask, prompt="a red ball", task="text-guided",
               num_inference_steps=3, seed=7)
    assert out.shape == (1, 64, 64, 3)
    assert out.dtype == np.uint8


def test_deterministic_given_seed(pipe, inputs):
    image, mask = inputs
    a = pipe(image, mask, prompt="x", num_inference_steps=2, seed=3)
    b = pipe(image, mask, prompt="x", num_inference_steps=2, seed=3)
    np.testing.assert_array_equal(a, b)
    c = pipe(image, mask, prompt="x", num_inference_steps=2, seed=4)
    assert not np.array_equal(a, c)


def test_fitting_degree_blends(pipe, inputs):
    image, mask = inputs
    lo = pipe(image, mask, prompt="a dog", task="shape-guided",
              fitting_degree=0.2, num_inference_steps=2, seed=1)
    hi = pipe(image, mask, prompt="a dog", task="shape-guided",
              fitting_degree=0.9, num_inference_steps=2, seed=1)
    assert not np.array_equal(lo, hi)


def test_object_removal_task(pipe, inputs):
    image, mask = inputs
    out = pipe(image, mask, task="object-removal", guidance_scale=12.0,
               num_inference_steps=2, seed=0)
    assert out.shape == (1, 64, 64, 3)


@pytest.mark.parametrize("sampler", ["ddim", "pndm", "unipc", "dpm", "euler"])
def test_strength_truncates(pipe, inputs, sampler):
    """strength<1 works with EVERY sampler (reference supports any Karras
    scheduler with strength, pipeline_PowerPaint.py:713-720)."""
    image, mask = inputs
    out = pipe(image, mask, prompt="y", strength=0.5,
               num_inference_steps=4, seed=0, scheduler=sampler)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out.astype(np.float32)).all()
    # strength<1 must differ from the full-schedule run (truncated + renoised)
    full = pipe(image, mask, prompt="y", strength=1.0,
                num_inference_steps=4, seed=0, scheduler=sampler)
    assert not np.array_equal(out, full)


@pytest.mark.parametrize("sampler", ["ddim", "pndm", "unipc", "dpm", "euler"])
def test_known_region_blending_4ch(sampler):
    """4-channel UNets blend the known region every step with ANY sampler
    (reference pipeline_PowerPaint.py:1025-1035)."""
    from powerpaint_tpu.testing import tiny_unet, tiny_v1_config

    cfg = tiny_v1_config().replace(unet=tiny_unet(4))
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    p = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = p(img, mask, prompt="x", num_inference_steps=3, seed=0,
            scheduler=sampler)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(out.astype(np.float32)).all()


def test_outpainting_canvas(pipe):
    from powerpaint_tpu.tasks.preprocess import outpaint_canvas

    rng = np.random.RandomState(1)
    img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    canvas, mask = outpaint_canvas(img, 1.5, 1.5)
    assert canvas.shape[0] == 72 and canvas.shape[1] == 72
    # center keeps original, border is masked
    assert mask[0, 0] == 1.0
    assert mask[36, 36] == 0.0
    canvas8 = canvas[: canvas.shape[0] - canvas.shape[0] % 8,
                     : canvas.shape[1] - canvas.shape[1] % 8]
    mask8 = mask[: mask.shape[0] - mask.shape[0] % 8,
                 : mask.shape[1] - mask.shape[1] % 8]
    out = pipe(canvas8, mask8, task="image-outpainting",
               num_inference_steps=2, seed=0)
    assert out.shape == (1, 72, 72, 3)


def test_eta_stochastic_path(pipe, inputs):
    image, mask = inputs
    det = pipe(image, mask, prompt="x", num_inference_steps=2, seed=3)
    sto = pipe(image, mask, prompt="x", num_inference_steps=2, seed=3,
               eta=1.0)
    # eta adds noise -> different output, but same seed reproducible
    assert not np.array_equal(det, sto)
    sto2 = pipe(image, mask, prompt="x", num_inference_steps=2, seed=3,
                eta=1.0)
    np.testing.assert_array_equal(sto, sto2)


def test_step_callback_invoked():
    from powerpaint_tpu.io.params import init_params as _ip
    from powerpaint_tpu.testing import tiny_v1_config as _cfg

    cfg = _cfg()
    params = _ip(cfg, jax.random.PRNGKey(0), sample_hw=8, dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    seen = []
    p = InpaintPipeline(cfg, params, tok, dtype=jnp.float32,
                        step_callback=lambda i, lat: seen.append(int(i)))
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    p(img, mask, prompt="x", num_inference_steps=3, seed=0)
    assert sorted(seen) == [0, 1, 2]


def test_scheduler_choice(pipe, inputs):
    image, mask = inputs
    outs = {}
    for name in ("ddim", "pndm", "unipc", "dpm", "euler"):
        outs[name] = pipe(image, mask, prompt="x", num_inference_steps=2,
                          seed=3, scheduler=name)
        assert outs[name].shape == (1, 64, 64, 3)
    # different samplers take different trajectories
    assert not np.array_equal(outs["ddim"], outs["unipc"])
    assert not np.array_equal(outs["ddim"], outs["euler"])


def test_encoder_cache_interval(pipe, inputs):
    """Encoder propagation (Faster Diffusion): interval=1 is exact; N>1
    runs, is deterministic, differs from exact (approximation), and
    interval >= steps caches everything after step 0."""
    image, mask = inputs
    exact = pipe(image, mask, prompt="a dog", num_inference_steps=4, seed=2)
    c2 = pipe(image, mask, prompt="a dog", num_inference_steps=4, seed=2,
              encoder_cache_interval=2)
    c2b = pipe(image, mask, prompt="a dog", num_inference_steps=4, seed=2,
               encoder_cache_interval=2)
    np.testing.assert_array_equal(c2, c2b)
    assert not np.array_equal(exact, c2)
    assert np.isfinite(c2.astype(np.float32)).all()
    call = pipe(image, mask, prompt="a dog", num_inference_steps=4, seed=2,
                encoder_cache_interval=4)
    assert np.isfinite(call.astype(np.float32)).all()
    # interval=1 goes through the uncached code path and stays bitwise
    # identical to the default
    e1 = pipe(image, mask, prompt="a dog", num_inference_steps=4, seed=2,
              encoder_cache_interval=1)
    np.testing.assert_array_equal(exact, e1)
