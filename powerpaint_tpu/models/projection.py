"""IP-Adapter image-embedding projector (reference ``ImageProjection``,
/root/reference/powerpaint/utils/utils.py:533-553): a linear map from CLIP
image embeddings to ``num_image_text_embeds`` extra context tokens, then
LayerNorm.  The v2 pipeline appends these tokens to the text context when an
IP-Adapter image is supplied (pipeline_PowerPaint_Brushnet_CA.py:673)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from powerpaint_tpu.models.layers import LayerNorm, dense


class ImageProjection(nn.Module):
    cross_attention_dim: int = 768
    num_image_text_embeds: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = dense(
            self.num_image_text_embeds * self.cross_attention_dim,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="image_embeds",
        )(image_embeds.astype(self.dtype))
        x = x.reshape(b, self.num_image_text_embeds, self.cross_attention_dim)
        return LayerNorm(param_dtype=self.param_dtype, name="norm")(x)
