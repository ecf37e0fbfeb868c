"""Sequence-parallel (ring attention) UNet forward on a virtual mesh.

SURVEY.md §5.7: for >1k² outpaint canvases, shard the latent-pixel axis of
self-attention across the mesh.  ``ops.attention.ring_context`` routes the
UNet's long self-attention through ``ops.ring_attention`` (sequence sharded
over the data axis, K/V rotating via ppermute); convs/GroupNorm are handled
by GSPMD (halo exchange / cross-shard reductions).  This pins value parity
of the whole spatially-sharded UNet forward against the single-device one.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from powerpaint_tpu.models.unet import UNet2DConditionModel
from powerpaint_tpu.ops.attention import attention, ring_context
from powerpaint_tpu.ops.ring_attention import ring_self_attention
from powerpaint_tpu.testing import tiny_v1_config


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_attention_dispatch_routes_self_attn_through_ring():
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (2, 64, 2, 8), jnp.float32)
    kv77 = jax.random.normal(rng, (2, 77, 2, 8), jnp.float32)

    ref = attention(q, q, q)
    with ring_context(mesh, min_seq=64):
        out = attention(q, q, q)  # self, S=64 >= min_seq -> ring
        cross = attention(q, kv77, kv77)  # kv=77 != 64 -> einsum path
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cross), np.asarray(attention(q, kv77, kv77)),
        rtol=1e-5, atol=1e-5,
    )
    # direct ring call agrees too (sanity on the dispatch target)
    direct = ring_self_attention(q, q, q, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_unet_forward_sequence_parallel_matches_single_device():
    cfg = tiny_v1_config().unet
    unet = UNet2DConditionModel(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (2, 16, 16, cfg.in_channels), jnp.float32)
    ctx = jax.random.normal(rng, (2, 77, cfg.cross_attention_dim), jnp.float32)
    t = jnp.array([500])
    params = jax.jit(unet.init)(rng, sample, t, ctx)

    ref = np.asarray(unet.apply(params, sample, t, ctx))

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(None, "data"))  # latent rows over the mesh

    def fwd(p, s, c):
        # ring for the top levels (S=256, 64); deeper levels (S=16, 4)
        # stay on the einsum path under plain GSPMD
        with ring_context(mesh, min_seq=64):
            return unet.apply(p, s, t, c)

    jfwd = jax.jit(fwd, in_shardings=(repl, row, repl), out_shardings=repl)
    out = np.asarray(
        jfwd(jax.device_put(params, repl), jax.device_put(sample, row),
             jax.device_put(ctx, repl))
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sequence_parallel_pipeline_matches_single_device():
    """Whole v1 pipeline in sequence-parallel mode: one canvas, latent
    rows sharded over a data-only mesh, ring attention on the long levels."""
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.parallel.mesh import build_mesh
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
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

    rng = np.random.RandomState(0)
    # every latent level (32/16/8/4) must divide the 4-way mesh axis —
    # SP mode validates this (non-divisible levels force GSPMD padding,
    # which XLA:CPU miscompiles inside the scan; at the production target
    # of 2048px canvases all levels divide)
    img = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
    mask = np.zeros((256, 256), np.float32)
    mask[64:192, 64:192] = 1.0

    single = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)
    ref = single(img, mask, prompt="a cat", num_inference_steps=2, seed=1)

    mesh = build_mesh(jax.devices()[:4], model_parallel=1)
    sp = InpaintPipeline(cfg, params, tok, dtype=jnp.float32, mesh=mesh,
                         sequence_parallel=True, sp_min_seq=16)
    out = sp(img, mask, prompt="a cat", num_inference_steps=2, seed=1)

    assert out.shape == ref.shape
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 2, diff.max()

    # undersized canvas -> clear validation error, not silent corruption
    from powerpaint_tpu.core.validation import InputValidationError

    with pytest.raises(InputValidationError, match="sequence_parallel"):
        sp(img[:64, :64], mask[:64, :64], prompt="a cat",
           num_inference_steps=2, seed=1)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sequence_parallel_v2_pipeline_matches_single_device():
    """BrushNet (v2) pipeline in sequence-parallel mode: both UNet-scale
    forwards (base + branch) run with latent rows sharded + ring attention."""
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.parallel.mesh import build_mesh
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

    rng = np.random.RandomState(0)
    img = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
    mask = np.zeros((256, 256), np.float32)
    mask[64:192, 64:192] = 1.0

    single = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32)
    ref = single(img, mask, prompt="a cat", num_inference_steps=2, seed=1)

    mesh = build_mesh(jax.devices()[:4], model_parallel=1)
    sp = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32, mesh=mesh,
                          sequence_parallel=True, sp_min_seq=16)
    out = sp(img, mask, prompt="a cat", num_inference_steps=2, seed=1)

    assert out.shape == ref.shape
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 2, diff.max()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_sequence_parallel_controlnet_pipeline_matches_single_device():
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.parallel.mesh import build_mesh
    from powerpaint_tpu.pipelines.controlnet import ControlNetPipeline
    from powerpaint_tpu.testing import tiny_v1_controlnet_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v1_controlnet_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)

    rng = np.random.RandomState(0)
    img = (rng.rand(256, 256, 3) * 255).astype(np.uint8)
    mask = np.zeros((256, 256), np.float32)
    mask[64:192, 64:192] = 1.0
    control = np.zeros((256, 256, 3), np.uint8)
    control[::16, :] = 255

    single = ControlNetPipeline(cfg, params, tok, dtype=jnp.float32)
    ref = single(img, mask, control_image=control, prompt="a cat",
                 num_inference_steps=2, seed=1)

    mesh = build_mesh(jax.devices()[:4], model_parallel=1)
    sp = ControlNetPipeline(cfg, params, tok, dtype=jnp.float32, mesh=mesh,
                            sequence_parallel=True, sp_min_seq=16)
    out = sp(img, mask, control_image=control, prompt="a cat",
             num_inference_steps=2, seed=1)

    assert out.shape == ref.shape
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 2, diff.max()
