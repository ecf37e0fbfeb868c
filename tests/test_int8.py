"""W8A8 int8 quantized compute mode (ops/int8.py + models/layers.py).

Pins: (1) the quantizer math against a float reference, (2) that the new
Conv2D/DenseGeneral float path is BIT-IDENTICAL to flax nn.Conv/nn.Dense
(the whole model zoo runs on them), (3) that a quantized UNet forward
stays close to the bf16 one, (4) the pipeline-level opt-in.
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from powerpaint_tpu.models.layers import Conv2D, DenseGeneral
from powerpaint_tpu.ops import int8


def test_int8_matmul_close_to_float():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((512, 320)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((320, 640)) * 0.05, jnp.float32)
    ref = np.asarray(x) @ np.asarray(w)
    out = np.asarray(int8.int8_matmul(x, w))
    # symmetric 8-bit error budget: ~1% relative on random gaussians
    rel = np.abs(out - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_int8_conv_close_to_float():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.05, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = np.asarray(int8.int8_conv(x, w, (1, 1), ((1, 1), (1, 1))))
    rel = np.abs(out - np.asarray(ref)).mean() / np.abs(np.asarray(ref)).mean()
    assert rel < 0.02, rel


def test_per_channel_weight_scales():
    # one output channel 100x larger must not destroy the others' precision
    rng = np.random.default_rng(2)
    w = rng.standard_normal((320, 8)).astype(np.float32) * 0.01
    w[:, 3] *= 100.0
    x = jnp.asarray(rng.standard_normal((512, 320)), jnp.float32)
    ref = np.asarray(x) @ w
    out = np.asarray(int8.int8_matmul(x, jnp.asarray(w)))
    for c in range(8):
        rel = np.abs(out[:, c] - ref[:, c]).mean() / np.abs(ref[:, c]).mean()
        assert rel < 0.02, (c, rel)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_conv2d_bitwise_matches_flax_conv(dtype):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 16), jnp.float32)
    ours = Conv2D(24, (3, 3), strides=(2, 2), dtype=dtype)
    theirs = nn.Conv(24, (3, 3), strides=(2, 2),
                     padding=((1, 1), (1, 1)), dtype=dtype)
    p_ours = ours.init(rng, x)
    p_theirs = theirs.init(rng, x)
    chex = jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), p_ours, p_theirs
    )
    del chex
    np.testing.assert_array_equal(
        np.asarray(ours.apply(p_ours, x)),
        np.asarray(theirs.apply(p_theirs, x)),
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_dense_bitwise_matches_flax_dense(dtype):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 7, 16), jnp.float32)
    ours = DenseGeneral(24, dtype=dtype)
    theirs = nn.Dense(24, dtype=dtype)
    p_ours = ours.init(rng, x)
    p_theirs = theirs.init(rng, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(a, b), p_ours, p_theirs
    )
    np.testing.assert_array_equal(
        np.asarray(ours.apply(p_ours, x)),
        np.asarray(theirs.apply(p_theirs, x)),
    )


def test_quantized_context_gates_compute():
    rng = jax.random.PRNGKey(0)
    # large enough to pass the MIN_ROWS guard
    x = jax.random.normal(rng, (1, 32, 32, 16), jnp.float32)
    m = Conv2D(16, (3, 3), dtype=jnp.float32)
    p = m.init(rng, x)
    base = np.asarray(m.apply(p, x))
    with int8.quantized():
        q = np.asarray(jax.jit(lambda p, x: m.apply(p, x))(p, x))
    assert not np.array_equal(base, q)  # int8 mode actually engaged
    rel = np.abs(q - base).mean() / np.abs(base).mean()
    assert rel < 0.02, rel
    # tiny inputs stay on the float path
    x_small = jax.random.normal(rng, (1, 4, 4, 16), jnp.float32)
    base_s = np.asarray(m.apply(p, x_small))
    with int8.quantized():
        q_s = np.asarray(m.apply(p, x_small))
    np.testing.assert_array_equal(base_s, q_s)


def test_quantized_unet_forward_close_to_bf16():
    from powerpaint_tpu.models.unet import UNet2DConditionModel
    from powerpaint_tpu.testing import tiny_v1_config

    cfg = tiny_v1_config().unet
    unet = UNet2DConditionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (2, 16, 16, cfg.in_channels))
    ctx = jax.random.normal(rng, (2, 77, cfg.cross_attention_dim))
    params = unet.init(rng, sample, jnp.array([3]), ctx)

    base = np.asarray(unet.apply(params, sample, jnp.array([3]), ctx))
    qunet = int8.quantize_module(unet)
    q = np.asarray(
        jax.jit(lambda p, s, c: qunet.apply(p, s, jnp.array([3]), c))(
            params, sample, ctx
        )
    )
    # tiny-config spatial dims are below MIN_ROWS for convs, but the
    # attention/ff projections quantize; outputs must stay close
    rel = np.abs(q - base).mean() / (np.abs(base).mean() + 1e-8)
    assert np.isfinite(q).all()
    assert rel < 0.15, rel


def test_pipeline_int8_opt_in_runs():
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
    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    img = np.zeros((64, 64, 3), np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0

    pipe_q = InpaintPipeline(cfg, params, tok, dtype=jnp.float32,
                             quantize="int8")
    out1 = pipe_q(img, mask, prompt="a dog", num_inference_steps=2, seed=3)
    out2 = pipe_q(img, mask, prompt="a dog", num_inference_steps=2, seed=3)
    assert out1.shape == (1, 64, 64, 3) and out1.dtype == np.uint8
    np.testing.assert_array_equal(out1, out2)  # still deterministic


def test_im2col_conv_matches_xla_conv(monkeypatch):
    """POWERPAINT_CONV_IM2COL=1 reformulates small 3x3 convs as im2col
    GEMM — same math to fp32 reduction order (layers.Conv2D._im2col)."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 24), jnp.float32)
    m = Conv2D(32, (3, 3), dtype=jnp.float32)
    p = m.init(rng, x)
    monkeypatch.setenv("POWERPAINT_CONV_IM2COL", "1")
    y_im2col = np.asarray(jax.jit(lambda p, x: m.apply(p, x))(p, x))
    monkeypatch.setenv("POWERPAINT_CONV_IM2COL", "0")
    y_conv = np.asarray(jax.jit(lambda p, x: m.apply(p, x))(p, x))
    np.testing.assert_allclose(y_im2col, y_conv, rtol=2e-5, atol=2e-5)
    # strided / large-spatial convs stay on the conv path regardless
    xs = jax.random.normal(rng, (1, 64, 64, 8), jnp.float32)
    ms = Conv2D(8, (3, 3), strides=(2, 2), dtype=jnp.float32)
    ps = ms.init(rng, xs)
    monkeypatch.setenv("POWERPAINT_CONV_IM2COL", "1")
    a = np.asarray(ms.apply(ps, xs))
    monkeypatch.setenv("POWERPAINT_CONV_IM2COL", "0")
    b = np.asarray(ms.apply(ps, xs))
    np.testing.assert_array_equal(a, b)
