"""ResNet block + spatial up/down sampling (NHWC).

TPU-native equivalent of diffusers ``ResnetBlock2D`` / ``Downsample2D`` /
``Upsample2D`` as used throughout the reference block library
(/root/reference/powerpaint/models/unet_2d_blocks.py).  GroupNorm+SiLU is a
single fused op feeding the conv so XLA keeps the epilogue in VMEM.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from powerpaint_tpu.models.layers import GroupNorm, conv, dense


class ResnetBlock2D(nn.Module):
    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None):
        in_ch = x.shape[-1]
        # Each GroupNorm+SiLU is handed to the conv as a ``gn`` prologue:
        # plain XLA chain by default (identical ops to applying the norm
        # here), one fused Pallas implicit-GEMM kernel under
        # POWERPAINT_FUSED_CONV=1 (see models/layers.py::Conv2D).
        g1, b1 = GroupNorm(self.groups, self.eps, self.param_dtype,
                           name="norm1")(x, params_only=True)
        h = conv(
            self.out_channels, 3, 1, 1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv1",
        )(x, gn=(g1, b1, self.groups, self.eps))
        if self.use_time_emb and temb is not None:
            t = dense(
                self.out_channels, dtype=self.dtype,
                param_dtype=self.param_dtype, name="time_emb_proj",
            )(nn.silu(temb))
            h = h + t[:, None, None, :].astype(h.dtype)
        g2, b2 = GroupNorm(self.groups, self.eps, self.param_dtype,
                           name="norm2")(h, params_only=True)
        h = conv(
            self.out_channels, 3, 1, 1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv2",
        )(h, gn=(g2, b2, self.groups, self.eps))
        if in_ch != self.out_channels:
            x = conv(
                self.out_channels, 1, 1, 0, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv_shortcut",
            )(x)
        return x + h


class Downsample2D(nn.Module):
    """stride-2 3x3 conv with torch-style padding (diffusers Downsample2D)."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv(
            self.out_channels, 3, 2, 1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """2x nearest-neighbor upsample + 3x3 conv (diffusers Upsample2D)."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, output_size: Optional[tuple] = None):
        b, h, w, c = x.shape
        if output_size is None:
            output_size = (h * 2, w * 2)
        # nearest-neighbor: repeat rows/cols (XLA lowers this to a cheap
        # broadcast-reshape, no gather)
        if output_size == (h * 2, w * 2):
            x = jnp.repeat(x, 2, axis=1)
            x = jnp.repeat(x, 2, axis=2)
        else:  # ragged target (odd input sizes) — nearest resize
            import jax.image

            x = jax.image.resize(
                x, (b, output_size[0], output_size[1], c), method="nearest"
            )
        return conv(
            self.out_channels, 3, 1, 1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv",
        )(x)
