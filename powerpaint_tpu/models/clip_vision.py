"""CLIP vision tower (ViT image encoder) + StableDiffusionSafetyChecker.

TPU-native counterparts of two reference dependencies:

- ``transformers.CLIPVisionModelWithProjection`` — the IP-Adapter image
  encoder (reference encode_image,
  pipeline_PowerPaint_Brushnet_CA.py:629-654);
- ``StableDiffusionSafetyChecker`` — CLIP ViT-L tower + linear projection +
  cosine scores against learned concept embeddings, blacking out flagged
  images (reference run_safety_checker, pipeline_PowerPaint.py:520-533).

Module/scope names mirror the transformers state dict (including its
historical ``pre_layrnorm`` typo) so ``io.convert.convert_clip_vision`` /
``convert_safety_checker`` map real checkpoints structurally.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from powerpaint_tpu.core.config import CLIPVisionConfig
from powerpaint_tpu.models.clip_text import CLIPEncoderLayer
from powerpaint_tpu.models.layers import LayerNorm, dense


class CLIPVisionEmbeddings(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        c, p = cfg.hidden_size, cfg.patch_size
        x = nn.Conv(
            c, (p, p), strides=(p, p), padding="VALID", use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, c)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c,),
            self.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, c)), x], axis=1
        )
        n_pos = (cfg.image_size // p) ** 2 + 1
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n_pos, c), self.param_dtype,
        )
        return x + pos[None].astype(x.dtype)


class CLIPVisionEncoder(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.config.num_hidden_layers):
            x = CLIPEncoderLayer(
                self.config, self.dtype, self.param_dtype,
                name=f"layers_{i}",
            )(x, jnp.float32(0.0))  # bidirectional: no causal mask
        return x


class CLIPVisionModel(nn.Module):
    """Returns (last_hidden_state, pooled) — pooled = post-LN class token
    (transformers CLIPVisionTransformer semantics)."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        x = CLIPVisionEmbeddings(cfg, self.dtype, self.param_dtype,
                                 name="embeddings")(pixel_values)
        x = LayerNorm(cfg.layer_norm_eps, self.param_dtype,
                      name="pre_layrnorm")(x)  # sic — transformers typo
        x = CLIPVisionEncoder(cfg, self.dtype, self.param_dtype,
                              name="encoder")(x)
        pooled = LayerNorm(cfg.layer_norm_eps, self.param_dtype,
                           name="post_layernorm")(x[:, 0])
        return x, pooled


class CLIPVisionModelWithProjection(nn.Module):
    """image_embeds = visual_projection(pooled) — the IP-Adapter image
    encoder output (reference encode_image :650)."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        _, pooled = CLIPVisionModel(
            self.config, self.dtype, self.param_dtype, name="vision_model"
        )(pixel_values)
        return dense(
            self.config.projection_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, use_bias=False,
            name="visual_projection",
        )(pooled)


def _cosine(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return a @ b.T


class StableDiffusionSafetyChecker(nn.Module):
    """CLIP tower + projection + concept cosine thresholds (the published
    CompVis safety-checker semantics the reference runs,
    pipeline_PowerPaint.py:520-533).  Returns per-image NSFW flags; callers
    black out flagged images (core/safety.py)."""

    config: CLIPVisionConfig
    num_concepts: int = 17
    num_special: int = 3
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        _, pooled = CLIPVisionModel(
            cfg, self.dtype, self.param_dtype, name="vision_model"
        )(pixel_values)
        emb = dense(
            cfg.projection_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, use_bias=False,
            name="visual_projection",
        )(pooled).astype(jnp.float32)

        init = nn.initializers.normal(0.02)
        concept = self.param(
            "concept_embeds", init,
            (self.num_concepts, cfg.projection_dim), self.param_dtype)
        special = self.param(
            "special_care_embeds", init,
            (self.num_special, cfg.projection_dim), self.param_dtype)
        c_w = self.param("concept_embeds_weights", nn.initializers.zeros,
                         (self.num_concepts,), self.param_dtype)
        s_w = self.param("special_care_embeds_weights",
                         nn.initializers.zeros, (self.num_special,),
                         self.param_dtype)

        special_scores = _cosine(emb, special.astype(jnp.float32)) - s_w
        # images matching a special-care concept get a stricter threshold
        adjustment = jnp.where(
            (special_scores > 0.0).any(axis=-1), 0.01, 0.0
        )
        concept_scores = (
            _cosine(emb, concept.astype(jnp.float32)) - c_w
            + adjustment[:, None]
        )
        return (concept_scores > 0.0).any(axis=-1)
