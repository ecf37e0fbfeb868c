"""BrushNet with preserved cross-attention — the ppt-v2 side branch.

TPU-native counterpart of the reference ``BrushNetModel``
(/root/reference/powerpaint/models/BrushNet_CA.py:38-958): a full UNet
(down+mid+up) whose input is concat(noisy latent, 5-ch conditioning) through
``conv_in_condition`` (BrushNet_CA.py:223-228, 822), and whose per-block
features exit through zero-initialized 1x1 convs:

- 12 down taps: conv_in output + one per resnet + one per downsampler
  (BrushNet_CA.py:330-352, 826-845);
- 1 mid tap (BrushNet_CA.py:355-358, 848-861);
- 15 up taps: one per up-resnet (3 each) + one per upsampler
  (BrushNet_CA.py:446-454, 863-902) — emitted PRE-injection by the up blocks.

Outputs are returned as flat tuples in the exact consumption order of
``UNet2DConditionModel`` (models/unet.py), making the injection topology a
static pytree contract instead of the reference's list-pop protocol.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from powerpaint_tpu.core.config import (
    BrushNetConfig,
    CROSS_ATTN_DOWN,
    CROSS_ATTN_UP,
    MID_CROSS_ATTN,
)
from powerpaint_tpu.models.blocks import (
    CrossAttnDownBlock2D,
    CrossAttnUpBlock2D,
    DownBlock2D,
    MidBlock2D,
    UNetMidBlock2DCrossAttn,
    UpBlock2D,
)
from powerpaint_tpu.models.layers import TimestepEmbedding, conv, timestep_sinusoid
from powerpaint_tpu.ops.attention import sp_hint


def zero_conv(ch: int, dtype, param_dtype, name: str) -> nn.Conv:
    return nn.Conv(
        ch, (1, 1), dtype=dtype, param_dtype=param_dtype,
        kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        name=name,
    )


class BrushNetModel(nn.Module):
    config: BrushNetConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, 4) noisy latent, NHWC
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,  # task-token text embeds
        brushnet_cond: jnp.ndarray,  # (B, H, W, 5) cond latents + mask
        conditioning_scale=1.0,
        guess_mode: bool = False,
    ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray, Tuple[jnp.ndarray, ...]]:
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
        brushnet_cond = brushnet_cond.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)

        # conv_in_condition on concat(sample, cond) (BrushNet_CA.py:822)
        x = conv(
            cfg.block_out_channels[0], 3, 1, 1, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_in_condition",
        )(jnp.concatenate([sample, brushnet_cond], axis=-1))

        # --- down ---
        down_features = [x]
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
            down_features.extend(sp_hint(f) for f in feats)
            x = sp_hint(x)

        down_taps = tuple(
            zero_conv(f.shape[-1], self.dtype, self.param_dtype,
                      f"brushnet_down_blocks_{i}")(f)
            for i, f in enumerate(down_features)
        )

        # --- mid ---
        skips = list(down_features)
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
        mid_tap = zero_conv(
            x.shape[-1], self.dtype, self.param_dtype, "brushnet_mid_block"
        )(x)

        # --- up (emit per-layer features) ---
        up_features = []
        reversed_ch = tuple(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            ch = reversed_ch[i]
            is_final = i == len(cfg.up_block_types) - 1
            n_res = cfg.layers_per_block + 1
            block_skips, skips = skips[-n_res:], skips[:-n_res]
            output_size = skips[-1].shape[1:3] if skips else None
            common = dict(
                out_channels=ch, num_layers=n_res, add_upsample=not is_final,
                resnet_eps=cfg.norm_eps, groups=cfg.norm_num_groups,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )
            if block_type == CROSS_ATTN_UP:
                x, feats = CrossAttnUpBlock2D(
                    num_heads=cfg.num_heads,
                    transformer_layers=cfg.transformer_layers_per_block,
                    use_linear_projection=cfg.use_linear_projection,
                    name=f"up_blocks_{i}", **common,
                )(x, temb, block_skips, encoder_hidden_states, emit=True,
                  output_size=output_size)
            else:
                x, feats = UpBlock2D(name=f"up_blocks_{i}", **common)(
                    x, temb, block_skips, emit=True, output_size=output_size
                )
            up_features.extend(sp_hint(f) for f in feats)
            x = sp_hint(x)

        up_taps = tuple(
            zero_conv(f.shape[-1], self.dtype, self.param_dtype,
                      f"brushnet_up_blocks_{i}")(f)
            for i, f in enumerate(up_features)
        )

        # --- scaling (BrushNet_CA.py:905-934) ---
        n_total = len(down_taps) + 1 + len(up_taps)
        if guess_mode:
            scales = jnp.logspace(-1, 0, n_total) * conditioning_scale
            down_taps = tuple(t * scales[i] for i, t in enumerate(down_taps))
            mid_tap = mid_tap * scales[len(down_taps)]
            up_taps = tuple(
                t * scales[len(down_taps) + 1 + i]
                for i, t in enumerate(up_taps)
            )
        else:
            down_taps = tuple(t * conditioning_scale for t in down_taps)
            mid_tap = mid_tap * conditioning_scale
            up_taps = tuple(t * conditioning_scale for t in up_taps)

        return down_taps, mid_tap, up_taps
