"""UNet down/mid/up blocks with functional residual-injection taps.

TPU-native rework of the reference's forked block library
(/root/reference/powerpaint/models/unet_2d_blocks.py).  The reference threads
BrushNet features through mutable Python lists consumed with ``.pop(0)``
(unet_2d_blocks.py:1388-1402, 2630-2643); that cannot survive jax tracing, so
here every block takes an explicit tuple of ``add_samples`` whose length is
fixed by the config tap schedule (core/config.py) and injection order is
explicit:

- down blocks: inject after each resnet(+attn) BEFORE recording the skip, and
  after the downsampler (unet_2d_blocks.py:1385-1402 ordering);
- up blocks: record the emitted feature BEFORE injecting (2627-2643);
- emitted up features feed BrushNet's zero convs (``emit=True``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from powerpaint_tpu.models.resnet import Downsample2D, ResnetBlock2D, Upsample2D
from powerpaint_tpu.models.transformer import Transformer2DModel
from powerpaint_tpu.ops.freeu import FreeUConfig, apply_freeu

Taps = Optional[Tuple[jnp.ndarray, ...]]


class CrossAttnDownBlock2D(nn.Module):
    out_channels: int
    num_heads: int
    num_layers: int = 2
    transformer_layers: int = 1
    add_downsample: bool = True
    resnet_eps: float = 1e-5
    groups: int = 32
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, add_samples: Taps = None,
                 ip_context=None, ip_scale=1.0, extra_residual=None):
        """``extra_residual``: T2I-Adapter intrablock feature, added after
        the LAST (resnet, attention) pair — before the BrushNet tap and
        before the skip is recorded (reference unet_2d_blocks.py:1385-1392:
        additional_residuals first, then down_block_add_samples)."""
        skips = []
        it = iter(add_samples) if add_samples is not None else None
        head_dim = self.out_channels // self.num_heads
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, self.resnet_eps, self.groups,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(x, temb)
            x = Transformer2DModel(
                self.num_heads, head_dim, self.transformer_layers,
                self.use_linear_projection, self.dtype, self.param_dtype,
                name=f"attentions_{i}",
            )(x, context, ip_context, ip_scale)
            if extra_residual is not None and i == self.num_layers - 1:
                x = x + extra_residual
            if it is not None:
                x = x + next(it)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(
                self.out_channels, self.dtype, self.param_dtype,
                name="downsamplers_0",
            )(x)
            if it is not None:
                x = x + next(it)
            skips.append(x)
        return x, tuple(skips)


class DownBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    resnet_eps: float = 1e-5
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context=None, add_samples: Taps = None):
        del context
        skips = []
        it = iter(add_samples) if add_samples is not None else None
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, self.resnet_eps, self.groups,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(x, temb)
            if it is not None:
                x = x + next(it)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(
                self.out_channels, self.dtype, self.param_dtype,
                name="downsamplers_0",
            )(x)
            if it is not None:
                x = x + next(it)
            skips.append(x)
        return x, tuple(skips)


class UNetMidBlock2DCrossAttn(nn.Module):
    channels: int
    num_heads: int
    transformer_layers: int = 1
    resnet_eps: float = 1e-5
    groups: int = 32
    use_linear_projection: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context=None, ip_context=None, ip_scale=1.0):
        head_dim = self.channels // self.num_heads
        x = ResnetBlock2D(
            self.channels, self.resnet_eps, self.groups, dtype=self.dtype,
            param_dtype=self.param_dtype, name="resnets_0",
        )(x, temb)
        x = Transformer2DModel(
            self.num_heads, head_dim, self.transformer_layers,
            self.use_linear_projection, self.dtype, self.param_dtype,
            name="attentions_0",
        )(x, context, ip_context, ip_scale)
        x = ResnetBlock2D(
            self.channels, self.resnet_eps, self.groups, dtype=self.dtype,
            param_dtype=self.param_dtype, name="resnets_1",
        )(x, temb)
        return x


class MidBlock2D(nn.Module):
    """Resnet-only mid block (reference unet_2d_blocks.py:1026-1111)."""

    channels: int
    resnet_eps: float = 1e-5
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context=None):
        del context
        x = ResnetBlock2D(
            self.channels, self.resnet_eps, self.groups, dtype=self.dtype,
            param_dtype=self.param_dtype, name="resnets_0",
        )(x, temb)
        x = ResnetBlock2D(
            self.channels, self.resnet_eps, self.groups, dtype=self.dtype,
            param_dtype=self.param_dtype, name="resnets_1",
        )(x, temb)
        return x


class CrossAttnUpBlock2D(nn.Module):
    out_channels: int
    num_heads: int
    num_layers: int = 3
    transformer_layers: int = 1
    add_upsample: bool = True
    resnet_eps: float = 1e-5
    groups: int = 32
    use_linear_projection: bool = False
    freeu: Optional[FreeUConfig] = None
    resolution_idx: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, temb, skips, context, add_samples: Taps = None,
        emit: bool = False, output_size: Optional[tuple] = None,
        ip_context=None, ip_scale=1.0,
    ):
        emitted = []
        it = iter(add_samples) if add_samples is not None else None
        head_dim = self.out_channels // self.num_heads
        skips = list(skips)
        for i in range(self.num_layers):
            res = skips.pop()
            x, res = apply_freeu(self.resolution_idx, x, res, self.freeu)
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, self.resnet_eps, self.groups,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(x, temb)
            x = Transformer2DModel(
                self.num_heads, head_dim, self.transformer_layers,
                self.use_linear_projection, self.dtype, self.param_dtype,
                name=f"attentions_{i}",
            )(x, context, ip_context, ip_scale)
            if emit:
                emitted.append(x)
            if it is not None:
                x = x + next(it)
        if self.add_upsample:
            x = Upsample2D(
                self.out_channels, self.dtype, self.param_dtype,
                name="upsamplers_0",
            )(x, output_size)
            if emit:
                emitted.append(x)
            if it is not None:
                x = x + next(it)
        return (x, tuple(emitted)) if emit else (x, ())


class UpBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    resnet_eps: float = 1e-5
    groups: int = 32
    freeu: Optional[FreeUConfig] = None
    resolution_idx: int = 0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x, temb, skips, context=None, add_samples: Taps = None,
        emit: bool = False, output_size: Optional[tuple] = None,
    ):
        del context
        emitted = []
        it = iter(add_samples) if add_samples is not None else None
        skips = list(skips)
        for i in range(self.num_layers):
            res = skips.pop()
            x, res = apply_freeu(self.resolution_idx, x, res, self.freeu)
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, self.resnet_eps, self.groups,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(x, temb)
            if emit:
                emitted.append(x)
            if it is not None:
                x = x + next(it)
        if self.add_upsample:
            x = Upsample2D(
                self.out_channels, self.dtype, self.param_dtype,
                name="upsamplers_0",
            )(x, output_size)
            if emit:
                emitted.append(x)
            if it is not None:
                x = x + next(it)
        return (x, tuple(emitted)) if emit else (x, ())
