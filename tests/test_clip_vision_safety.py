"""CLIP vision tower (torch oracle), safety checker, ip_adapter_image path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from powerpaint_tpu.core.config import CLIPVisionConfig
from powerpaint_tpu.io import convert as C

TINY = CLIPVisionConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=2, image_size=32, patch_size=8, projection_dim=16,
)


def _hf_vision():
    transformers = pytest.importorskip("transformers")
    import torch

    torch.manual_seed(0)
    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=16,
    )
    return transformers.CLIPVisionModelWithProjection(cfg).eval()


def test_clip_vision_matches_transformers():
    """Shared weights through convert_clip_vision: image_embeds parity with
    the real transformers tower (the IP-Adapter encode_image oracle)."""
    torch = pytest.importorskip("torch")
    from powerpaint_tpu.models.clip_vision import CLIPVisionModelWithProjection

    torch.set_grad_enabled(False)
    hf = _hf_vision()
    pix = torch.randn(2, 3, 32, 32)
    want = hf(pixel_values=pix).image_embeds

    tree = C.convert_clip_vision(
        {k: v.numpy() for k, v in hf.state_dict().items()}
    )
    m = CLIPVisionModelWithProjection(TINY, dtype=jnp.float32)
    got = m.apply(
        {"params": tree},
        jnp.asarray(pix.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), atol=1e-4, rtol=1e-3
    )


def test_safety_checker_concept_thresholds():
    """Cosine-threshold semantics: an image whose projected embedding
    aligns with a concept row (score > weight) is flagged; others pass;
    special-care proximity tightens the threshold by 0.01."""
    from powerpaint_tpu.models.clip_vision import StableDiffusionSafetyChecker

    m = StableDiffusionSafetyChecker(TINY, num_concepts=3, num_special=2,
                                     dtype=jnp.float32)
    pix = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), pix)["params"]

    flags = m.apply({"params": params}, pix)
    emb_dim = TINY.projection_dim

    # craft concept tables around the actual embedding of image 0
    from powerpaint_tpu.models.clip_vision import CLIPVisionModel

    pooled = CLIPVisionModel(TINY, dtype=jnp.float32).apply(
        {"params": params["vision_model"]}, pix
    )[1]
    proj = pooled @ params["visual_projection"]["kernel"]
    e0 = np.asarray(proj[0]) / np.linalg.norm(np.asarray(proj[0]))

    p2 = jax.tree_util.tree_map(lambda x: x, params)  # mutable copy
    p2["concept_embeds"] = jnp.asarray(
        np.stack([e0, -e0, np.roll(e0, 1)]), jnp.float32)
    p2["concept_embeds_weights"] = jnp.asarray([0.5, 0.5, 2.0], jnp.float32)
    p2["special_care_embeds"] = jnp.asarray(
        np.stack([-e0, -e0]), jnp.float32)
    p2["special_care_embeds_weights"] = jnp.asarray([2.0, 2.0], jnp.float32)

    flags = np.asarray(m.apply({"params": p2}, pix))
    # image 0 aligns with concept row 0 (cos=1 > 0.5) -> flagged; both
    # images are identical (zeros) so both flag
    assert flags.all()

    # raise thresholds above 1 -> nothing flags
    p2["concept_embeds_weights"] = jnp.asarray([1.5, 1.5, 2.0], jnp.float32)
    flags = np.asarray(m.apply({"params": p2}, pix))
    assert not flags.any()

    # special-care adjustment: threshold 0.995 with cos=1.0 flags only
    # when the +0.01 adjustment applies (special row aligned)
    p2["concept_embeds_weights"] = jnp.asarray([1.005, 2.0, 2.0], jnp.float32)
    flags_no_special = np.asarray(m.apply({"params": p2}, pix))
    assert not flags_no_special.any()
    p2["special_care_embeds"] = jnp.asarray(np.stack([e0, -e0]), jnp.float32)
    p2["special_care_embeds_weights"] = jnp.asarray([0.5, 2.0], jnp.float32)
    flags_special = np.asarray(m.apply({"params": p2}, pix))
    assert flags_special.all()


def test_clip_safety_checker_hook_blacks_out():
    from powerpaint_tpu.core.safety import CLIPSafetyChecker, apply_safety_checker
    from powerpaint_tpu.models.clip_vision import StableDiffusionSafetyChecker

    m = StableDiffusionSafetyChecker(TINY, num_concepts=3, num_special=2,
                                     dtype=jnp.float32)
    pix = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), pix)["params"]
    params = jax.tree_util.tree_map(lambda x: x, params)
    # thresholds so low everything flags
    params["concept_embeds_weights"] = jnp.asarray([-2.0, -2.0, -2.0])

    checker = CLIPSafetyChecker(TINY, params)
    imgs = (np.random.RandomState(0).rand(2, 48, 48, 3) * 255).astype(np.uint8)
    out, flags = apply_safety_checker(imgs, checker)
    assert flags == [True, True]
    assert (out == 0).all()


def test_convert_safety_checker_collapses_double_prefix():
    sd = {
        "vision_model.vision_model.embeddings.class_embedding":
            np.zeros((8,), np.float32),
        "vision_model.vision_model.post_layernorm.weight":
            np.ones((8,), np.float32),
        "visual_projection.weight": np.zeros((4, 8), np.float32),
        "concept_embeds": np.zeros((3, 4), np.float32),
        "concept_embeds_weights": np.zeros((3,), np.float32),
    }
    tree = C.convert_safety_checker(sd)
    assert "class_embedding" in tree["vision_model"]["embeddings"]
    assert "scale" in tree["vision_model"]["post_layernorm"]
    assert tree["visual_projection"]["kernel"].shape == (8, 4)
    assert "concept_embeds" in tree


def test_v2_ip_adapter_image_encoding_path():
    """ip_adapter_image (raw image) -> CLIP tower -> decoupled attention;
    must change the output like precomputed embeds do."""
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.models.clip_vision import CLIPVisionModelWithProjection
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline
    from powerpaint_tpu.testing import tiny_v2_config
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = tiny_v2_config()
    cfg = cfg.replace(
        unet=cfg.unet.replace(ip_adapter_dim=16, ip_adapter_tokens=4),
        image_encoder=TINY,
    )
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=8,
                         dtype=jnp.float32)
    enc = CLIPVisionModelWithProjection(TINY, dtype=jnp.float32)
    params["image_encoder"] = jax.jit(enc.init)(
        jax.random.PRNGKey(7), jnp.zeros((1, 32, 32, 3))
    )["params"]

    tok = TokenizerWrapper(HashTokenizer(vocab_size=994))
    add_task_tokens(tok)
    pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 64), np.float32)
    mask[16:48, 16:48] = 1.0
    ref_img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)

    kw = dict(prompt="a dog", num_inference_steps=2, seed=3)
    base = pipe(img, mask, **kw)
    with_img = pipe(img, mask, ip_adapter_image=ref_img, **kw)
    assert not np.array_equal(base, with_img)

    from powerpaint_tpu.core.validation import InputValidationError

    with pytest.raises(InputValidationError):
        pipe(img, mask, ip_adapter_image=ref_img,
             ip_adapter_image_embeds=np.zeros(16, np.float32), **kw)
