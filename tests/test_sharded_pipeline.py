"""Mesh-sharded pipeline execution on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.parallel.mesh import build_mesh
from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
from powerpaint_tpu.testing import tiny_v1_config
from powerpaint_tpu.text.tokenizer import (
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_pipeline_matches_single_device():
    cfg = tiny_v1_config()
    # head/hidden dims divisible by tp=2
    cfg = cfg.replace(
        unet=cfg.unet.replace(
            block_out_channels=(32, 64, 64, 64), attention_head_dim=2
        )
    )
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)

    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0

    single = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)
    # batch 4 -> CFG batch 8, sharded over data=4 x model=2 mesh
    ref = single(img, mask, prompt="a cat", num_inference_steps=2, seed=1,
                 num_images_per_prompt=4)

    mesh = build_mesh(jax.devices()[:8], model_parallel=2)
    sharded = InpaintPipeline(cfg, params, tok, dtype=jnp.float32, mesh=mesh)
    out = sharded(img, mask, prompt="a cat", num_inference_steps=2, seed=1,
                  num_images_per_prompt=4)

    assert out.shape == ref.shape
    # identical math up to reduction-order noise; uint8 quantization gives a
    # small tolerance window
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 2, diff.max()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_v2_pipeline_matches_single_device():
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline
    from powerpaint_tpu.testing import tiny_v2_config

    cfg = tiny_v2_config()
    cfg = cfg.replace(
        unet=cfg.unet.replace(block_out_channels=(32, 64, 64, 64),
                              attention_head_dim=2),
        brushnet=cfg.brushnet.replace(
            base=cfg.brushnet.base.replace(
                block_out_channels=(32, 64, 64, 64), attention_head_dim=2
            )
        ),
    )
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)

    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0

    single = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32)
    ref = single(img, mask, prompt="a cat", num_inference_steps=2, seed=1,
                 num_images_per_prompt=4)

    mesh = build_mesh(jax.devices()[:8], model_parallel=2)
    pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32, mesh=mesh)
    out = pipe(img, mask, prompt="a cat", num_inference_steps=2, seed=1,
               num_images_per_prompt=4)
    assert out.shape == (4, 32, 32, 3)
    # value parity with the single-device run (reduction-order noise +
    # uint8 quantization window)
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 2, diff.max()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_controlnet_matches_single_device():
    from powerpaint_tpu.pipelines.controlnet import ControlNetPipeline
    from powerpaint_tpu.tasks.control import canny
    from powerpaint_tpu.testing import tiny_v1_controlnet_config

    cfg = tiny_v1_controlnet_config()
    cfg = cfg.replace(
        unet=cfg.unet.replace(block_out_channels=(32, 64, 64, 64),
                              attention_head_dim=2),
        controlnet=cfg.controlnet.replace(
            base=cfg.controlnet.base.replace(
                block_out_channels=(32, 64, 64, 64), attention_head_dim=2
            )
        ),
    )
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)

    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    ctrl = canny(img)

    single = ControlNetPipeline(cfg, params, tok, dtype=jnp.float32)
    ref = single(img, mask, control_image=ctrl, prompt="a cat",
                 num_inference_steps=2, seed=1, num_images_per_prompt=4)

    mesh = build_mesh(jax.devices()[:8], model_parallel=2)
    pipe = ControlNetPipeline(cfg, params, tok, dtype=jnp.float32, mesh=mesh)
    out = pipe(img, mask, control_image=ctrl, prompt="a cat",
               num_inference_steps=2, seed=1, num_images_per_prompt=4)
    assert out.shape == ref.shape
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 2, diff.max()
