"""Auxiliary components: ImageProjection, safety hook, batching, metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.core.safety import (
    apply_safety_checker,
    register_safety_checker,
)
from powerpaint_tpu.models.projection import ImageProjection


def test_image_projection_shapes():
    m = ImageProjection(cross_attention_dim=64, num_image_text_embeds=8,
                        dtype=jnp.float32)
    emb = jnp.ones((2, 128))
    params = m.init(jax.random.PRNGKey(0), emb)
    out = m.apply(params, emb)
    assert out.shape == (2, 8, 64)


def test_safety_checker_hook():
    imgs = np.full((2, 8, 8, 3), 100, np.uint8)

    out, flags = apply_safety_checker(imgs)
    assert flags == [False, False]
    np.testing.assert_array_equal(out, imgs)

    register_safety_checker(lambda ims: [True, False])
    try:
        out, flags = apply_safety_checker(imgs)
        assert flags == [True, False]
        assert out[0].max() == 0 and out[1].max() == 100
    finally:
        register_safety_checker(None)


def test_num_images_per_prompt_batches():
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
    tok = TokenizerWrapper(HashTokenizer(vocab_size=1024))
    add_task_tokens(tok)
    pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 32), np.float32)
    mask[8:24, 8:24] = 1.0
    out = pipe(img, mask, prompt="x", num_inference_steps=2, seed=0,
               num_images_per_prompt=3)
    assert out.shape == (3, 32, 32, 3)
    # different noise per batch element
    assert not np.array_equal(out[0], out[1])


def test_metrics_stage_timing():
    from powerpaint_tpu.core.metrics import Telemetry

    t = Telemetry()
    with t.stage("a"):
        pass
    t.count("images", 2)
    rep = t.last_call_report()
    assert "a" in rep and rep["a"] >= 0
    assert t.counters["images"] == 2
    assert "stages_ms" in t.to_json()
