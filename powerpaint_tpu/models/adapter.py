"""T2I-Adapter (Mou et al. 2023, arXiv 2302.08453) — NHWC, TPU-native.

The reference UNet fork retains the T2I-Adapter injection path
(`down_intrablock_additional_residuals`,
/root/reference/powerpaint/models/unet_2d_condition.py:1052,1198-1214,
1288-1294) but ships no adapter model; this module supplies the standard
SD1.5 "full adapter" tower (the diffusers ``T2IAdapter`` full_adapter
architecture) so the path is usable end to end: a conditioning image is
pixel-unshuffled onto the latent grid and pushed through a small conv
pyramid, emitting ONE feature map per UNet down block (64/32/16/8 at
512^2), consumed by ``UNet2DConditionModel(...,
down_intrablock_additional_residuals=...)``.

Checkpoint layout matches diffusers ``T2IAdapter`` state dicts
(``adapter.conv_in``, ``adapter.body.{i}.in_conv``,
``adapter.body.{i}.resnets.{j}.block1/block2``) via
io/convert.py::convert_t2i_adapter.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch ``PixelUnshuffle(r)`` in NHWC: out[..., c*r*r + i*r + j] =
    x[b, r*h + i, r*w + j, c] (channel order (c, i, j), matching the
    torch conv weights that consume it)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h/r, w/r, c, i, j)
    return x.reshape(b, h // r, w // r, c * r * r)


class AdapterResnetBlock(nn.Module):
    """conv3x3 -> ReLU -> conv1x1, residual (diffusers AdapterResnetBlock)."""

    channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="block1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="block2")(h)
        return x + h


class AdapterBlock(nn.Module):
    """Optional 2x avg-pool downsample, optional 1x1 channel projection,
    then ``num_res_blocks`` residual convs (diffusers AdapterBlock)."""

    out_channels: int
    num_res_blocks: int
    down: bool = False
    needs_in_conv: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.down:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        if self.needs_in_conv:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="in_conv")(x)
        for j in range(self.num_res_blocks):
            x = AdapterResnetBlock(
                self.out_channels, self.dtype, self.param_dtype,
                name=f"resnets_{j}",
            )(x)
        return x


class _FullAdapter(nn.Module):
    channels: Tuple[int, ...]
    num_res_blocks: int
    downscale_factor: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, cond):
        x = pixel_unshuffle(cond.astype(self.dtype), self.downscale_factor)
        x = nn.Conv(self.channels[0], (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv_in")(x)
        feats = []
        for i, ch in enumerate(self.channels):
            prev = self.channels[max(i - 1, 0)]
            x = AdapterBlock(
                ch, self.num_res_blocks, down=i > 0,
                needs_in_conv=prev != ch, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"body_{i}",
            )(x)
            feats.append(x)
        return tuple(feats)


class T2IAdapter(nn.Module):
    """SD1.5 full adapter.  ``__call__(cond)``: cond is the conditioning
    image, (B, H, W, C) float in [0, 1] (the diffusers T2I pipeline feeds
    un-normalized [0,1] maps), H/W multiples of ``downscale_factor * 8``.
    Returns one feature tuple, len == len(channels), resolutions
    H/8, H/16, H/32, H/64 — exactly the UNet down-block grid."""

    channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    num_res_blocks: int = 2
    downscale_factor: int = 8
    in_channels: int = 3
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        return _FullAdapter(
            self.channels, self.num_res_blocks, self.downscale_factor,
            self.dtype, self.param_dtype, name="adapter",
        )(cond)
