"""Controller facade routing + input validation layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.controller import PowerPaint
from powerpaint_tpu.core.validation import (
    InputValidationError,
    check_call_args,
    check_image_mask,
)
from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
from powerpaint_tpu.testing import tiny_v1_config
from powerpaint_tpu.text.tokenizer import (
    HashTokenizer,
    TokenizerWrapper,
    add_task_tokens,
)


@pytest.fixture(scope="module")
def controller():
    cfg = tiny_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    return PowerPaint(InpaintPipeline(cfg, params, tok, dtype=jnp.float32))


def test_infer_text_guided(controller):
    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    res = controller.infer(img, mask, prompt="a cat",
                           num_inference_steps=2, seed=1)
    assert res.result.shape == (64, 64, 3)
    assert res.mask_overlay.shape == (64, 64, 3)
    assert "generate" in res.timings_ms
    # composite preserves unmasked corner
    assert (res.result[2, 2] == img[2, 2]).all()
    # overlay reddens the hole
    assert res.mask_overlay[32, 32, 0] > img[32, 32, 0] - 1


def test_infer_outpainting_builds_canvas(controller):
    rng = np.random.RandomState(1)
    img = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    res = controller.infer(
        img, task="image-outpainting", num_inference_steps=2,
        horizontal_expansion_ratio=1.5, vertical_expansion_ratio=1.5,
    )
    assert res.result.shape == (72, 72, 3)


def test_infer_missing_mask_raises(controller):
    img = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="requires a mask"):
        controller.infer(img, task="text-guided")


def test_infer_control_without_pipeline_raises(controller):
    img = np.zeros((64, 64, 3), np.uint8)
    mask = np.zeros((64, 64), np.float32)
    with pytest.raises(ValueError, match="no ControlNet"):
        controller.infer(img, mask, control_type="canny")


def test_validation_errors():
    img = np.zeros((64, 64, 3), np.uint8)
    mask = np.zeros((64, 64), np.float32)
    with pytest.raises(InputValidationError, match="sizes differ"):
        check_image_mask(img, np.zeros((32, 32), np.float32))
    with pytest.raises(InputValidationError, match="multiples of 8"):
        check_image_mask(np.zeros((63, 64, 3), np.uint8),
                         np.zeros((63, 64), np.float32))
    with pytest.raises(InputValidationError, match="unknown task"):
        check_call_args(task="nope", num_inference_steps=5,
                        guidance_scale=7.5)
    with pytest.raises(InputValidationError, match="strength"):
        check_call_args(task="text-guided", num_inference_steps=5,
                        guidance_scale=7.5, strength=0.0)
    with pytest.raises(InputValidationError, match="fitting_degree"):
        check_call_args(task="text-guided", num_inference_steps=5,
                        guidance_scale=7.5, fitting_degree=2.0)
    check_image_mask(img, mask)  # clean case passes


def test_pipeline_rejects_bad_input(controller):
    img = np.zeros((64, 64, 3), np.uint8)
    bad_mask = np.zeros((10, 10), np.float32)
    with pytest.raises(InputValidationError):
        controller.pipeline(img, bad_mask, num_inference_steps=1)
