"""Implicit-GEMM Pallas conv parity (interpret mode, CPU).

Covers ops/conv_pallas.py: plain conv3x3 (+bias), the fused
GroupNorm+SiLU-prologue variant, channel/width padding inertness, and the
ResnetBlock2D rewiring (gn= prologue) being bit-identical to the original
GroupNorm->conv chain when the fused path is off.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from powerpaint_tpu.ops.conv_pallas import conv3x3, conv3x3_gn_silu


def _xla_conv(x, w, bias=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)


def _gn_silu(x, gamma, beta, groups, eps=1e-5):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    y = y * gamma + beta
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


# (B, H, W, Cin, Cout): exercises channel padding (64->128), width padding
# (W+2 -> 8-multiple), multi-row grid cells, and Cout != Cin.
SHAPES = [(1, 8, 8, 128, 128), (2, 8, 8, 64, 128), (1, 16, 8, 128, 256)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("use_bias", [False, True])
def test_conv3x3_matches_xla(shape, use_bias):
    b, h, w, cin, cout = shape
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (b, h, w, cin), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                           jnp.float32) / np.sqrt(9 * cin)
    bias = (jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
            if use_bias else None)
    ref = np.asarray(_xla_conv(x, wt, bias))
    got = np.asarray(conv3x3(x, wt, bias=bias, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("use_bias", [False, True])
def test_fused_gn_silu_conv_matches_chain(shape, use_bias):
    b, h, w, cin, cout = shape
    groups = 16
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (b, h, w, cin), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(4), (3, 3, cin, cout),
                           jnp.float32) / np.sqrt(9 * cin)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(5), (cin,))
    beta = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (cin,))
    bias = (jax.random.normal(jax.random.PRNGKey(7), (cout,), jnp.float32)
            if use_bias else None)
    ref = np.asarray(_xla_conv(_gn_silu(x, gamma, beta, groups), wt, bias))
    got = np.asarray(conv3x3_gn_silu(x, wt, gamma, beta, groups,
                                     bias=bias, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def _fake_quant_ref(x, w, x_scale, bias=None):
    """Reference for the int8 path: fake-quantize activations and weights
    in f32, exact conv — the Pallas kernel must match this bit-for-bit up
    to accumulation order (int8 dots are exact in int32)."""
    from powerpaint_tpu.ops.conv_pallas import quantize_weights_int8

    w_q, w_s = quantize_weights_int8(w)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / x_scale), -127, 127)
    y = jax.lax.conv_general_dilated(
        xq, w_q.astype(jnp.float32), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * (w_s * x_scale)
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("use_bias", [False, True])
def test_conv3x3_int8_matches_fake_quant(shape, use_bias):
    from powerpaint_tpu.ops.conv_pallas import (
        conv3x3_int8,
        quantize_weights_int8,
    )

    b, h, w, cin, cout = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                           jnp.float32) / np.sqrt(9 * cin)
    bias = (jax.random.normal(jax.random.PRNGKey(2), (cout,), jnp.float32)
            if use_bias else None)
    x_scale = float(np.abs(np.asarray(x)).max()) / 127.0
    w_q, w_s = quantize_weights_int8(wt)
    ref = np.asarray(_fake_quant_ref(x, wt, x_scale, bias))
    got = np.asarray(conv3x3_int8(x, w_q, w_s, x_scale, bias=bias,
                                  interpret=True))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)
    # quantization error itself is small: int8 conv vs exact f32 conv
    exact = np.asarray(_xla_conv(x, wt, bias))
    rel = np.abs(got - exact).mean() / (np.abs(exact).mean() + 1e-8)
    assert rel < 0.02, f"int8 quantization error too large: {rel}"


def test_conv3x3_gn_silu_int8_matches_fake_quant():
    from powerpaint_tpu.ops.conv_pallas import (
        conv3x3_gn_silu_int8,
        quantize_weights_int8,
    )

    b, h, w, cin, cout = 2, 8, 8, 64, 128
    groups = 16
    x = jax.random.normal(jax.random.PRNGKey(3), (b, h, w, cin), jnp.float32)
    wt = jax.random.normal(jax.random.PRNGKey(4), (3, 3, cin, cout),
                           jnp.float32) / np.sqrt(9 * cin)
    gamma = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(5), (cin,))
    beta = 0.1 * jax.random.normal(jax.random.PRNGKey(6), (cin,))
    act = _gn_silu(x, gamma, beta, groups)
    x_scale = float(np.abs(np.asarray(act)).max()) / 127.0
    w_q, w_s = quantize_weights_int8(wt)
    ref = np.asarray(_fake_quant_ref(act, wt, x_scale))
    got = np.asarray(conv3x3_gn_silu_int8(
        x, w_q, w_s, gamma, beta, groups, x_scale, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=3e-5)


def test_resnet_gn_prologue_rewire_is_exact():
    """ResnetBlock2D now routes GroupNorm+SiLU through Conv2D's gn=
    prologue; with the fused kernel off (default / non-TPU) the output and
    the param tree must be identical to the pre-rewire chain."""
    from powerpaint_tpu.models.resnet import ResnetBlock2D

    blk = ResnetBlock2D(out_channels=64, groups=8, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 8, 8, 32), jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(9), (1, 128), jnp.float32)
    params = blk.init(jax.random.PRNGKey(10), x, temb)
    # param tree unchanged: norm params still live under norm1/norm2
    p = params["params"]
    assert set(p.keys()) == {"norm1", "conv1", "time_emb_proj", "norm2",
                             "conv2", "conv_shortcut"}
    assert set(p["norm1"].keys()) == {"scale", "bias"}
    out = blk.apply(params, x, temb)

    # manual original chain from the same params
    from powerpaint_tpu.ops.groupnorm import group_norm

    def chain(x):
        h = group_norm(x, p["norm1"]["scale"], p["norm1"]["bias"],
                       num_groups=8, eps=1e-5, silu=True)
        h = _xla_conv_generic(h, p["conv1"])
        t = jnp.dot(jax.nn.silu(temb), p["time_emb_proj"]["kernel"])
        t = t + p["time_emb_proj"]["bias"]
        h = h + t[:, None, None, :]
        h = group_norm(h, p["norm2"]["scale"], p["norm2"]["bias"],
                       num_groups=8, eps=1e-5, silu=True)
        h = _xla_conv_generic(h, p["conv2"])
        sc = jax.lax.conv_general_dilated(
            x, p["conv_shortcut"]["kernel"], (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["conv_shortcut"]["bias"]
        return sc + h

    def _xla_conv_generic(h, cp):
        return jax.lax.conv_general_dilated(
            h, cp["kernel"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + cp["bias"]

    np.testing.assert_array_equal(np.asarray(out), np.asarray(chain(x)))


def test_int8_fused_feasible_gate():
    """The VMEM gate admits the measured-winner UNet latent levels and
    rejects the VAE 512^2/128^2 sites (measured compile OOM: 23.4 MB
    scoped allocation vs the 20.5 MB stack limit at 512x512x128) and the
    1920-ch concat rows that also OOM'd the bf16 fused path."""
    from powerpaint_tpu.ops.conv_pallas import int8_fused_feasible

    # measured winners (scripts/results_int8_conv.json)
    assert int8_fused_feasible(2, 64, 64, 320, 320)
    assert int8_fused_feasible(2, 32, 32, 640, 640)
    assert int8_fused_feasible(2, 16, 16, 1280, 1280)
    assert int8_fused_feasible(2, 8, 8, 1280, 1280)
    # measured OOM: VAE encoder/decoder spatial sites
    assert not int8_fused_feasible(1, 512, 512, 128, 128)
    assert not int8_fused_feasible(1, 128, 128, 256, 256)
    # wide concat rows (bf16 fused path OOM class, _igemm_profitable)
    assert not int8_fused_feasible(2, 32, 32, 1920, 640)
