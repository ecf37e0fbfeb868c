"""Model forward-pass tests: shapes, tap topology, zero-init injection identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.core.config import SD15_INPAINT_UNET
from powerpaint_tpu.models.brushnet import BrushNetModel
from powerpaint_tpu.models.controlnet import ControlNetModel
from powerpaint_tpu.models.clip_text import CLIPTextModel
from powerpaint_tpu.models.unet import UNet2DConditionModel
from powerpaint_tpu.models.vae import AutoencoderKL
from powerpaint_tpu.testing import (
    tiny_unet,
    tiny_v1_controlnet_config,
    tiny_v2_config,
    tiny_vae,
    tiny_text,
)

F32 = jnp.float32


def test_tap_schedule_sd15():
    cfg = SD15_INPAINT_UNET
    assert len(cfg.down_tap_channels()) == 12
    assert len(cfg.up_tap_channels()) == 15
    assert cfg.down_tap_channels() == (
        320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280, 1280, 1280
    )
    assert cfg.up_tap_channels() == (
        1280, 1280, 1280, 1280, 1280, 1280, 1280, 1280,
        640, 640, 640, 640, 320, 320, 320,
    )
    assert cfg.down_tap_strides() == (1, 1, 1, 2, 2, 2, 4, 4, 4, 8, 8, 8)


@pytest.fixture(scope="module")
def unet_setup():
    cfg = tiny_unet(9)
    m = UNet2DConditionModel(cfg, dtype=F32)
    x = jnp.ones((1, 16, 16, 9)) * 0.1
    t = jnp.array([10])
    ctx = jnp.ones((1, 77, 32)) * 0.1
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, ctx)
    return cfg, m, params, x, t, ctx


def test_unet_forward_shape(unet_setup):
    cfg, m, params, x, t, ctx = unet_setup
    out = jax.jit(m.apply)(params, x, t, ctx)
    assert out.shape == (1, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_brushnet_zero_taps_identity(unet_setup):
    """Injecting all-zero taps must equal no injection (the zero-conv init
    state of BrushNet — reference BrushNet_CA.py:955-958)."""
    cfg, m, params, x, t, ctx = unet_setup
    base = m.apply(params, x, t, ctx)
    down_taps = tuple(
        jnp.zeros((1, 16 // s, 16 // s, c))
        for c, s in zip(cfg.down_tap_channels(), cfg.down_tap_strides())
    )
    up_taps = tuple(
        jnp.zeros((1, 16 // s, 16 // s, c))
        for c, s in zip(cfg.up_tap_channels(), cfg.up_tap_strides())
    )
    mid = jnp.zeros((1, 2, 2, cfg.mid_tap_channels()))
    out = m.apply(
        params, x, t, ctx,
        down_block_add_samples=down_taps,
        mid_block_add_sample=mid,
        up_block_add_samples=up_taps,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(out), atol=1e-6)


def test_brushnet_tap_shapes_feed_unet():
    """BrushNet emissions must match the UNet consumption contract exactly."""
    cfg = tiny_v2_config()
    bn = BrushNetModel(cfg.brushnet, dtype=F32)
    rng = jax.random.PRNGKey(1)
    sample = jax.random.normal(rng, (1, 16, 16, 4))
    cond = jax.random.normal(rng, (1, 16, 16, 5))
    t = jnp.array([3])
    ctx = jnp.ones((1, 77, 32)) * 0.1
    bn_params = jax.jit(bn.init)(rng, sample, t, ctx, cond)
    down, mid, up = jax.jit(bn.apply)(bn_params, sample, t, ctx, cond)
    assert len(down) == 12 and len(up) == 15

    ucfg = cfg.unet
    assert tuple(x.shape[-1] for x in down) == ucfg.down_tap_channels()
    assert tuple(x.shape[-1] for x in up) == ucfg.up_tap_channels()

    unet = UNet2DConditionModel(ucfg, dtype=F32)
    up_arams = jax.jit(unet.init)(rng, sample, t, ctx)
    out = unet.apply(
        up_arams, sample, t, ctx,
        down_block_add_samples=down,
        mid_block_add_sample=mid,
        up_block_add_samples=up,
    )
    assert out.shape == (1, 16, 16, 4)

    # zero-init zero convs -> all taps are exactly zero at init
    for tap in list(down) + [mid] + list(up):
        assert float(jnp.abs(tap).max()) == 0.0


def test_controlnet_residuals_feed_unet():
    cfg = tiny_v1_controlnet_config()
    cn = ControlNetModel(cfg.controlnet, dtype=F32)
    rng = jax.random.PRNGKey(2)
    sample = jax.random.normal(rng, (1, 16, 16, 4))
    cond_img = jnp.ones((1, 128, 128, 3)) * 0.5
    t = jnp.array([7])
    ctx = jnp.ones((1, 77, 32)) * 0.1
    cn_params = jax.jit(cn.init)(rng, sample, t, ctx, cond_img)
    down, mid = jax.jit(cn.apply)(cn_params, sample, t, ctx, cond_img)
    assert len(down) == 12

    unet = UNet2DConditionModel(cfg.unet, dtype=F32)
    x9 = jax.random.normal(rng, (1, 16, 16, 9))
    u_params = jax.jit(unet.init)(rng, x9, t, ctx)
    out = unet.apply(
        u_params, x9, t, ctx,
        down_block_additional_residuals=down,
        mid_block_additional_residual=mid,
    )
    assert out.shape == (1, 16, 16, 4)


def test_vae_roundtrip_shapes():
    cfg = tiny_vae()
    vae = AutoencoderKL(cfg, dtype=F32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 64, 64, 3)) * 0.5
    params = jax.jit(vae.init)(rng, x, rng)
    z = jax.jit(lambda p, x, r: vae.apply(p, x, r, method="sample"))(
        params, x, rng
    )
    assert z.shape == (1, 8, 8, 4)
    dec = jax.jit(lambda p, z: vae.apply(p, z, method="decode"))(params, z)
    assert dec.shape == (1, 64, 64, 3)
    # deterministic encode path
    z1 = vae.apply(params, x, method="encode_mode")
    z2 = vae.apply(params, x, method="encode_mode")
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))


def test_clip_text_external_embeddings():
    cfg = tiny_text(num_external=30)
    m = CLIPTextModel(cfg, dtype=F32)
    ids = jnp.array([[1023, 5, 6, 1022] + [0] * 73])  # in-vocab row
    params = jax.jit(m.init)(jax.random.PRNGKey(0), ids)
    out = m.apply(params, ids)
    assert out.shape == (1, 77, 32)

    # external ids (>= vocab_size) must be addressable
    ids_ext = jnp.array([[1023, 1024, 1053, 1022] + [0] * 73])
    out_ext = m.apply(params, ids_ext)
    assert np.isfinite(np.asarray(out_ext)).all()
    assert not np.allclose(np.asarray(out), np.asarray(out_ext))


def test_vae_tiled_decode_matches_full():
    from powerpaint_tpu.models.vae import decode_tiled

    cfg = tiny_vae()
    vae = AutoencoderKL(cfg, dtype=F32)
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (1, 64, 64, 3)) * 0.3
    params = jax.jit(vae.init)(rng, x, rng)["params"]
    z = jax.random.normal(rng, (1, 24, 24, 4)) * 0.5

    full = vae.apply({"params": params}, z, method="decode")
    tiled = decode_tiled(vae, params, z, tile=16, overlap=8)
    assert tiled.shape == full.shape
    # tiled decode is approximate (GroupNorm stats are per-tile, as in
    # diffusers' tiling); with a random-weight VAE allow a generous relative
    # tolerance and check basic sanity
    diff = np.abs(np.asarray(tiled) - np.asarray(full))
    rel = diff.mean() / (np.abs(np.asarray(full)).mean() + 1e-6)
    assert rel < 0.5, rel
    assert np.isfinite(np.asarray(tiled)).all()

    # small canvas short-circuits to the plain decode
    z_small = z[:, :8, :8]
    a = decode_tiled(vae, params, z_small, tile=16)
    b = vae.apply({"params": params}, z_small, method="decode")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_freeu_changes_output_same_params():
    from powerpaint_tpu.ops.freeu import FreeUConfig

    cfg = tiny_unet(9)
    m = UNet2DConditionModel(cfg, dtype=F32)
    m_freeu = UNet2DConditionModel(cfg, dtype=F32,
                                   freeu=FreeUConfig(1.5, 1.6, 0.9, 0.2))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 9))
    t = jnp.array([10])
    ctx = jnp.ones((1, 77, 32)) * 0.1
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, ctx)
    base = m.apply(params, x, t, ctx)
    fu = m_freeu.apply(params, x, t, ctx)  # same params, different forward
    assert fu.shape == base.shape
    assert not np.allclose(np.asarray(base), np.asarray(fu))
    assert np.isfinite(np.asarray(fu)).all()
