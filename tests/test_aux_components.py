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


def test_resolution_bucketing_helpers():
    from powerpaint_tpu.tasks.preprocess import (
        bucket_size,
        crop_from_bucket,
        pad_to_bucket,
    )

    assert bucket_size(1) == 64
    assert bucket_size(64) == 64
    assert bucket_size(65) == 128
    assert bucket_size(512) == 512
    assert bucket_size(5000) == 2048  # capped

    rng = np.random.RandomState(0)
    img = (rng.rand(72, 100, 3) * 255).astype(np.uint8)
    mask = np.zeros((72, 100), np.float32)
    mask[10:40, 10:40] = 1.0
    ip, mp, hw = pad_to_bucket(img, mask)
    assert ip.shape[:2] == (128, 128)
    assert hw == (72, 100)
    # padding is marked KEEP (mask 0) and replicates edge pixels
    assert (mp[:, 100:] == 0).all() and (mp[72:] == 0).all()
    np.testing.assert_array_equal(ip[:72, 100], ip[:72, 99])
    np.testing.assert_array_equal(crop_from_bucket(ip, hw), img)
    batched = crop_from_bucket(ip[None], hw)
    assert batched.shape == (1, 72, 100, 3)


def test_controller_resolution_bucketing():
    import jax
    import jax.numpy as jnp

    from powerpaint_tpu.controller import PowerPaint
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
    pp = PowerPaint(InpaintPipeline(cfg, params, tok, dtype=jnp.float32))

    rng = np.random.RandomState(0)
    img = (rng.rand(40, 72, 3) * 255).astype(np.uint8)
    mask = np.zeros((40, 72), np.float32)
    mask[8:32, 8:32] = 1.0
    res = pp.infer(img, mask, prompt="x", num_inference_steps=2, seed=0,
                   resolution_bucketing=True)
    # output crops back to the request size; far-outside pixels preserved
    assert res.result.shape == (40, 72, 3)
    assert res.raw.shape[:2] == (40, 72)
    far = np.ones((40, 72), bool)
    far[0:40, 0:44] = False  # keep only the region far from the mask blur
    assert (res.result[far] == img[far]).all()
