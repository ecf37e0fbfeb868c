"""ControlNet (classic) — down+mid half-UNet with zero-conv skips.

TPU-native counterpart of diffusers ``ControlNetModel`` as consumed by the
reference ControlNet pipeline
(/root/reference/powerpaint/pipelines/pipeline_PowerPaint_ControlNet.py:1686-1694):
returns 12 down residuals + 1 mid residual which the base UNet adds onto its
skip connections (unet_2d_condition.py:1264-1276).

Note the base UNet for ppt-v1+ControlNet is the 9-channel inpainting UNet but
the ControlNet branch itself is a stock 4-channel SD1.5 ControlNet: its
conv_in sees only the noisy latent, while the control image enters through
the conditioning embedding (stride-2 conv stack from 512^2 to 64^2).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from powerpaint_tpu.core.config import (
    ControlNetConfig,
    CROSS_ATTN_DOWN,
    MID_CROSS_ATTN,
)
from powerpaint_tpu.models.blocks import (
    CrossAttnDownBlock2D,
    DownBlock2D,
    MidBlock2D,
    UNetMidBlock2DCrossAttn,
)
from powerpaint_tpu.models.brushnet import zero_conv
from powerpaint_tpu.models.layers import TimestepEmbedding, conv, timestep_sinusoid
from powerpaint_tpu.ops.attention import sp_hint


class ControlNetConditioningEmbedding(nn.Module):
    """conv 3->16, [conv s1 + conv s2]x3 through (16,32,96,256), zero conv out
    (diffusers ControlNetConditioningEmbedding)."""

    out_channels: int
    embed_channels: Tuple[int, ...] = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        x = conv(self.embed_channels[0], 3, 1, 1, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv_in")(cond)
        x = nn.silu(x)
        for i in range(len(self.embed_channels) - 1):
            x = conv(self.embed_channels[i], 3, 1, 1, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=f"blocks_{2*i}")(x)
            x = nn.silu(x)
            x = conv(self.embed_channels[i + 1], 3, 2, 1, dtype=self.dtype,
                     param_dtype=self.param_dtype, name=f"blocks_{2*i+1}")(x)
            x = nn.silu(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="conv_out",
        )(x)
        return x


class ControlNetModel(nn.Module):
    config: ControlNetConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, 4) noisy latent NHWC
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        controlnet_cond: jnp.ndarray,  # (B, 8H, 8W, 3) control image in [0,1]
        conditioning_scale=1.0,
        guess_mode: bool = False,
    ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
        cfg = self.config.base

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = timestep_sinusoid(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, self.dtype, self.param_dtype,
            name="time_embedding",
        )(t_emb)

        sample = sample.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)

        x = conv(cfg.block_out_channels[0], 3, 1, 1, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv_in")(sample)
        x = x + ControlNetConditioningEmbedding(
            cfg.block_out_channels[0],
            self.config.conditioning_embedding_out_channels,
            self.dtype, self.param_dtype,
            name="controlnet_cond_embedding",
        )(controlnet_cond.astype(self.dtype))

        features = [x]
        for i, block_type in enumerate(cfg.down_block_types):
            ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.down_block_types) - 1
            common = dict(
                out_channels=ch, num_layers=cfg.layers_per_block,
                add_downsample=not is_final, resnet_eps=cfg.norm_eps,
                groups=cfg.norm_num_groups, dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            if block_type == CROSS_ATTN_DOWN:
                x, feats = CrossAttnDownBlock2D(
                    num_heads=cfg.num_heads,
                    transformer_layers=cfg.transformer_layers_per_block,
                    use_linear_projection=cfg.use_linear_projection,
                    name=f"down_blocks_{i}", **common,
                )(x, temb, encoder_hidden_states)
            else:
                x, feats = DownBlock2D(name=f"down_blocks_{i}", **common)(
                    x, temb
                )
            # sequence-parallel mode: pin level-boundary shardings
            # (ops.attention.sp_hint, same rationale as models/unet.py)
            features.extend(sp_hint(f) for f in feats)
            x = sp_hint(x)

        if cfg.mid_block_type == MID_CROSS_ATTN:
            x = UNetMidBlock2DCrossAttn(
                cfg.block_out_channels[-1], cfg.num_heads,
                cfg.transformer_layers_per_block, cfg.norm_eps,
                cfg.norm_num_groups, cfg.use_linear_projection, self.dtype,
                self.param_dtype, name="mid_block",
            )(x, temb, encoder_hidden_states)
        else:
            x = MidBlock2D(
                cfg.block_out_channels[-1], cfg.norm_eps, cfg.norm_num_groups,
                self.dtype, self.param_dtype, name="mid_block",
            )(x, temb)

        x = sp_hint(x)
        down_res = tuple(
            zero_conv(f.shape[-1], self.dtype, self.param_dtype,
                      f"controlnet_down_blocks_{i}")(f)
            for i, f in enumerate(features)
        )
        mid_res = zero_conv(
            x.shape[-1], self.dtype, self.param_dtype, "controlnet_mid_block"
        )(x)

        if guess_mode:
            scales = jnp.logspace(-1, 0, len(down_res) + 1) * conditioning_scale
            down_res = tuple(t * scales[i] for i, t in enumerate(down_res))
            mid_res = mid_res * scales[-1]
        else:
            down_res = tuple(t * conditioning_scale for t in down_res)
            mid_res = mid_res * conditioning_scale

        return down_res, mid_res
