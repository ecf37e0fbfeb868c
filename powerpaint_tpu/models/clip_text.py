"""CLIP text encoder (ViT-L/14 text tower, SD1.5) with task-token support.

TPU-native counterpart of transformers ``CLIPTextModel`` (reference
app.py:12,148) combined with the reference's ``EmbeddingLayerWithFixes``
(/root/reference/powerpaint/utils/utils.py:257-483).

The reference splices learned task-token vectors into the embedded sequence
with a Python while-loop over ids.  Because PowerPaint registers its
placeholder tokens as CONTIGUOUS new vocab ids (utils.py:118-135 appends
`P_xxx_0..9` to the tokenizer; utils.py:447 asserts the id range), the splice
is exactly equivalent to a gather from ``concat([base_table, external_rows])``
— which is how it is implemented here: one functional embedding lookup, no
sequence surgery, jit-friendly.  ``external_embeddings`` rows are ordered by
their token id (vocab_size + row_index).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from powerpaint_tpu.core.config import CLIPTextConfig
from powerpaint_tpu.models.layers import LayerNorm, dense


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        b, s, c = x.shape
        n = cfg.num_attention_heads
        d = c // n
        q = dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="q_proj")(x).reshape(b, s, n, d)
        k = dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="k_proj")(x).reshape(b, s, n, d)
        v = dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="v_proj")(x).reshape(b, s, n, d)
        scale = d ** -0.5
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + causal_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnqk,bknd->bqnd", probs, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(b, s, c)
        return dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.config
        h = LayerNorm(cfg.layer_norm_eps, self.param_dtype,
                      name="layer_norm1")(x)
        x = x + CLIPAttention(cfg, self.dtype, self.param_dtype,
                              name="self_attn")(h, causal_mask)
        h = LayerNorm(cfg.layer_norm_eps, self.param_dtype,
                      name="layer_norm2")(x)
        h = dense(cfg.intermediate_size, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="fc1")(h)
        h = quick_gelu(h) if cfg.hidden_act == "quick_gelu" else nn.gelu(h)
        h = dense(cfg.hidden_size, dtype=self.dtype,
                  param_dtype=self.param_dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns last_hidden_state (B, S, H) — the only output the reference
    pipelines consume (pipeline_PowerPaint.py:412-423 uses ``[0]``)."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 clip_skip: int = 0) -> jnp.ndarray:
        """``clip_skip`` (static): skip the last N encoder layers and apply
        the final LayerNorm to that earlier hidden state — exactly HF's
        ``hidden_states[-(clip_skip+1)]`` + final LN semantics (reference
        pipeline_PowerPaint_Brushnet_CA.py:537-553)."""
        cfg = self.config
        b, s = input_ids.shape

        token_table = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size), self.param_dtype,
        )
        if cfg.num_external_tokens:
            # learned task-prompt rows (P_ctxt/P_shape/P_obj x 10), appended at
            # ids >= vocab_size in registration order — the functional
            # equivalent of EmbeddingLayerWithFixes (utils.py:486-530).
            ext = self.param(
                "external_embedding", nn.initializers.normal(0.02),
                (cfg.num_external_tokens, cfg.hidden_size), self.param_dtype,
            )
            token_table = jnp.concatenate([token_table, ext], axis=0)

        pos_table = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size), self.param_dtype,
        )

        x = token_table[input_ids] + pos_table[None, :s]
        x = x.astype(self.dtype)

        causal = jnp.triu(
            jnp.full((s, s), -1e9, dtype=jnp.float32), k=1
        )[None, None]

        out = None
        for i in range(cfg.num_hidden_layers):
            if i == cfg.num_hidden_layers - clip_skip:
                out = x
            # later layers still run (their params must exist for loading)
            # but are dead code XLA eliminates when clip_skip > 0
            x = CLIPEncoderLayer(cfg, self.dtype, self.param_dtype,
                                 name=f"layers_{i}")(x, causal)
        if out is None:
            out = x
        return LayerNorm(cfg.layer_norm_eps, self.param_dtype,
                         name="final_layer_norm")(out)
