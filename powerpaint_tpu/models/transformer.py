"""Spatial transformer (self + cross attention) for the UNet, NHWC.

TPU-native counterpart of diffusers ``Transformer2DModel`` /
``BasicTransformerBlock`` as used by every CrossAttn block in the reference
(/root/reference/powerpaint/models/unet_2d_blocks.py:1237,2458,756).
Self-attention routes through the Pallas flash kernel on TPU; cross-attention
(kv = 77 text tokens) stays on the XLA einsum path (ops/attention.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from powerpaint_tpu.models.layers import GroupNorm, LayerNorm, conv, dense
from powerpaint_tpu.ops.attention import attention


class Attention(nn.Module):
    """Multi-head attention with separate q/kv sources.

    Matches diffusers ``Attention`` for SD1.5: q/k/v projections without
    bias, output projection with bias.

    IP-Adapter decoupled cross-attention (diffusers IPAdapterAttnProcessor,
    used by the reference v2 pipeline through load_ip_adapter —
    pipeline_PowerPaint_Brushnet_CA.py:650-707): when ``ip_context`` (the
    projected image tokens) is given, extra bias-free ``to_k_ip``/``to_v_ip``
    projections attend the SAME queries over the image tokens and the result
    is added, scaled, BEFORE the output projection.
    """

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        context: Optional[jnp.ndarray] = None,
        ip_context: Optional[jnp.ndarray] = None,
        ip_scale=1.0,
    ):
        # x: (B, S, C); context: (B, Skv, Cctx) or None for self-attention
        ctx = x if context is None else context
        inner = self.num_heads * self.head_dim
        b, s, _ = x.shape
        skv = ctx.shape[1]

        q = dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                  use_bias=False, name="to_q")(x)
        k = dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                  use_bias=False, name="to_k")(ctx)
        v = dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                  use_bias=False, name="to_v")(ctx)

        q = q.reshape(b, s, self.num_heads, self.head_dim)
        k = k.reshape(b, skv, self.num_heads, self.head_dim)
        v = v.reshape(b, skv, self.num_heads, self.head_dim)

        out = attention(q, k, v)

        if ip_context is not None:
            # one or several adapters (reference multi-IP-Adapter lists,
            # pipeline_PowerPaint_Brushnet_CA.py:658-675): each adapter has
            # its own decoupled K/V and scale; outputs sum.  Adapter 0
            # keeps the bare names (single-adapter checkpoints unchanged);
            # adapter a>0 uses the _a suffix (convert_ip_adapter maps
            # diffusers' to_k_ip.{a} ModuleList entries there).
            contexts = (ip_context if isinstance(ip_context, (tuple, list))
                        else (ip_context,))
            scales = (tuple(ip_scale)
                      if isinstance(ip_scale, (tuple, list))
                      else (ip_scale,) * len(contexts))
            for a, (ipc, sc) in enumerate(zip(contexts, scales)):
                sfx = "" if a == 0 else f"_{a}"
                n_ip = ipc.shape[1]
                k_ip = dense(inner, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             use_bias=False, name=f"to_k_ip{sfx}")(ipc)
                v_ip = dense(inner, dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             use_bias=False, name=f"to_v_ip{sfx}")(ipc)
                k_ip = k_ip.reshape(b, n_ip, self.num_heads, self.head_dim)
                v_ip = v_ip.reshape(b, n_ip, self.num_heads, self.head_dim)
                out_ip = attention(q, k_ip, v_ip)
                out = out + jnp.asarray(sc, out.dtype) * out_ip

        out = out.reshape(b, s, inner)
        return dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="to_out")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers FeedForward with geglu activation)."""

    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        h = dense(inner * 2, dtype=self.dtype, param_dtype=self.param_dtype,
                  name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return dense(dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_context=None, ip_scale=1.0):
        h = LayerNorm(param_dtype=self.param_dtype, name="norm1")(x)
        x = x + Attention(self.num_heads, self.head_dim, self.dtype,
                          self.param_dtype, name="attn1")(h)
        h = LayerNorm(param_dtype=self.param_dtype, name="norm2")(x)
        x = x + Attention(self.num_heads, self.head_dim, self.dtype,
                          self.param_dtype, name="attn2")(
            h, context, ip_context, ip_scale
        )
        h = LayerNorm(param_dtype=self.param_dtype, name="norm3")(x)
        x = x + FeedForward(dtype=self.dtype, param_dtype=self.param_dtype,
                            name="ff")(h)
        return x


class Transformer2DModel(nn.Module):
    """GroupNorm -> 1x1 conv in -> transformer blocks -> 1x1 conv out + skip."""

    num_heads: int
    head_dim: int
    num_layers: int = 1
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, ip_context=None, ip_scale=1.0):
        b, h, w, c = x.shape
        residual = x
        inner = self.num_heads * self.head_dim
        y = GroupNorm(32, 1e-6, self.param_dtype, name="norm")(x)
        if self.use_linear_projection:
            y = y.reshape(b, h * w, c)
            y = dense(inner, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="proj_in")(y)
        else:
            y = conv(inner, 1, 1, 0, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj_in")(y)
            y = y.reshape(b, h * w, inner)
        for i in range(self.num_layers):
            y = BasicTransformerBlock(
                self.num_heads, self.head_dim, self.dtype, self.param_dtype,
                name=f"blocks_{i}",
            )(y, context, ip_context, ip_scale)
        if self.use_linear_projection:
            y = dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                      name="proj_out")(y)
            y = y.reshape(b, h, w, c)
        else:
            y = y.reshape(b, h, w, inner)
            y = conv(c, 1, 1, 0, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="proj_out")(y)
        return y + residual
