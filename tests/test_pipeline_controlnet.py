"""End-to-end ControlNet pipeline on the tiny stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.pipelines.controlnet import ControlNetPipeline
from powerpaint_tpu.tasks.control import canny, get_control_image
from powerpaint_tpu.testing import tiny_v1_controlnet_config
from powerpaint_tpu.text.tokenizer import (
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)


@pytest.fixture(scope="module")
def pipe():
    cfg = tiny_v1_controlnet_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    return ControlNetPipeline(cfg, params, tok, dtype=jnp.float32)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(0)
    image = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    return image, mask


def test_canny_preprocessor(inputs):
    image, _ = inputs
    edges = get_control_image("canny", image)
    assert edges.shape == image.shape
    assert edges.dtype == np.uint8
    assert set(np.unique(edges)).issubset({0, 255})


def test_unknown_control_type_raises(inputs):
    with pytest.raises(NotImplementedError):
        get_control_image("depth", inputs[0])


def test_controlnet_inpaint(pipe, inputs):
    image, mask = inputs
    ctrl = canny(image)
    out = pipe(image, mask, control_image=ctrl, prompt="a dog",
               num_inference_steps=2, seed=5)
    assert out.shape == (1, 64, 64, 3)
    # at init all ControlNet zero-convs are zero => scale 0 and 1 identical
    # (the reference's zero-init contract, matching BrushNet zero taps)
    out_s0 = pipe(image, mask, control_image=ctrl, prompt="a dog",
                  num_inference_steps=2, seed=5,
                  controlnet_conditioning_scale=0.0)
    np.testing.assert_array_equal(out, out_s0)


def test_controlnet_influences_after_perturbation(inputs):
    """Un-zero one tap conv: control branch must now affect the output."""
    cfg = tiny_v1_controlnet_config()
    params = init_params(cfg, jax.random.PRNGKey(1), sample_hw=8,
                         dtype=jnp.float32)
    k = params["controlnet"]["controlnet_mid_block"]["kernel"]
    params["controlnet"]["controlnet_mid_block"]["kernel"] = (
        jnp.ones_like(k) * 0.05
    )
    # also un-zero the conditioning embedding output so the control IMAGE
    # (not just the latent) reaches the residuals
    ck = params["controlnet"]["controlnet_cond_embedding"]["conv_out"]["kernel"]
    params["controlnet"]["controlnet_cond_embedding"]["conv_out"]["kernel"] = (
        jnp.ones_like(ck) * 0.05
    )
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    p = ControlNetPipeline(cfg, params, tok, dtype=jnp.float32)

    image, mask = inputs
    ctrl = canny(image)
    a = p(image, mask, control_image=ctrl, prompt="a dog",
          num_inference_steps=2, seed=5)
    b = p(image, mask, control_image=np.zeros_like(ctrl), prompt="a dog",
          num_inference_steps=2, seed=5)
    assert not np.array_equal(a, b)


def test_no_control_falls_back_to_v1(pipe, inputs):
    image, mask = inputs
    out = pipe(image, mask, prompt="a dog", num_inference_steps=2, seed=5)
    assert out.shape == (1, 64, 64, 3)


def test_controlnet_guess_mode_runs(pipe, inputs):
    image, mask = inputs
    ctrl = canny(image)
    out = pipe(image, mask, control_image=ctrl, prompt="a dog",
               num_inference_steps=2, seed=5, guess_mode=True)
    assert out.shape == (1, 64, 64, 3)
