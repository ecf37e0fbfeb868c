"""Quality guardrails for the cached accelerations (round-3 verdict #6).

``encoder_cache_interval`` (v1, Faster-Diffusion-style encoder
propagation) and ``branch_cache_interval`` (v2, BrushNet branch
propagation) are APPROXIMATIONS; any throughput claim for them needs an
error bar.  Measured on the tiny random-weight stack, 20 steps, 64px
(2026-08, XLA:CPU; PSNR over float output in [-1,1], peak=2):

    v1 encoder_cache  N=2: 27.7 dB   N=3: 23.1 dB   N=4: 20.4 dB
    v2 branch_cache   N=2: 40.4 dB   N=3: 35.3 dB   N=4: 32.5 dB

The v2 branch cache is an order of magnitude gentler than the v1 encoder
cache (taps drift slower than encoder features).  These tests pin the
floors (with platform slack) and the monotone decline; PARITY.md quotes
the same table next to the cached-mode throughput numbers.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from powerpaint_tpu.io.params import init_params  # noqa: E402
from powerpaint_tpu.testing import tiny_v1_config, tiny_v2_config  # noqa: E402
from powerpaint_tpu.text.tokenizer import (  # noqa: E402
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float32) - b.astype(np.float32)) ** 2))
    return 10 * np.log10(4.0 / mse) if mse > 0 else np.inf


def _tok():
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    return tok


_IMG = (np.random.RandomState(0).rand(64, 64, 3) * 255).astype(np.uint8)
_MASK = np.zeros((64, 64), np.float32)
_MASK[16:48, 16:48] = 1.0


def test_v1_encoder_cache_drift_bounded():
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline

    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    pipe = InpaintPipeline(cfg, params, _tok(), dtype=jnp.float32)
    exact = pipe(_IMG, _MASK, prompt="x", num_inference_steps=20, seed=3,
                 output_type="float32")
    floors = {2: 24.0, 3: 20.0, 4: 17.0}
    psnrs = {}
    for n, floor in floors.items():
        cached = pipe(_IMG, _MASK, prompt="x", num_inference_steps=20,
                      seed=3, output_type="float32",
                      encoder_cache_interval=n)
        psnrs[n] = _psnr(exact, cached)
        assert psnrs[n] > floor, (n, psnrs[n])
    assert psnrs[2] > psnrs[3] > psnrs[4], psnrs


def test_v2_branch_cache_drift_bounded():
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline

    cfg = tiny_v2_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    key = jax.random.PRNGKey(7)
    for name, sub in params["brushnet"].items():
        if name.startswith("brushnet_"):
            key, k = jax.random.split(key)
            sub["kernel"] = 0.05 * jax.random.normal(
                k, sub["kernel"].shape, jnp.float32
            )
    pipe = BrushNetPipeline(cfg, params, _tok(), dtype=jnp.float32)
    exact = pipe(_IMG, _MASK, prompt="x", num_inference_steps=20, seed=3,
                 output_type="float32")
    floors = {2: 35.0, 3: 30.0, 4: 27.0}
    psnrs = {}
    for n, floor in floors.items():
        cached = pipe(_IMG, _MASK, prompt="x", num_inference_steps=20,
                      seed=3, output_type="float32",
                      branch_cache_interval=n)
        psnrs[n] = _psnr(exact, cached)
        assert psnrs[n] > floor, (n, psnrs[n])
    assert psnrs[2] > psnrs[3] > psnrs[4], psnrs
