"""Conditional UNet2D (SD1.5 family) with BrushNet / ControlNet injection.

TPU-native counterpart of the reference's forked
``UNet2DConditionModel`` (/root/reference/powerpaint/models/unet_2d_condition.py:70-1363).
Differences by design (SURVEY.md §7):

- NHWC activations, bf16 compute, fp32 norm statistics;
- BrushNet features arrive as a fixed-length tuple (pytree) whose slicing is
  derived statically from the config tap schedule, replacing the reference's
  mutable-list ``pop(0)`` protocol (unet_2d_condition.py:1222-1348);
- injection order preserved exactly: one tensor after conv_in, one after each
  down-resnet(+attn) BEFORE the skip is recorded, one after each downsampler,
  one after mid, one after each up-resnet(+attn) and upsampler;
- ControlNet residuals (down_block_additional_residuals /
  mid_block_additional_residual) are added onto the recorded skip tensors
  (unet_2d_condition.py:1264-1276), the classic ControlNet contract.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from powerpaint_tpu.core.config import (
    CROSS_ATTN_DOWN,
    CROSS_ATTN_UP,
    MID_CROSS_ATTN,
    MID_RESNET,
    UNetConfig,
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

Taps = Optional[Tuple[jnp.ndarray, ...]]


def _down_tap_counts(cfg: UNetConfig) -> Tuple[int, ...]:
    counts = []
    for i in range(len(cfg.down_block_types)):
        is_final = i == len(cfg.down_block_types) - 1
        counts.append(cfg.layers_per_block + (0 if is_final else 1))
    return tuple(counts)


def _up_tap_counts(cfg: UNetConfig) -> Tuple[int, ...]:
    counts = []
    for i in range(len(cfg.up_block_types)):
        is_final = i == len(cfg.up_block_types) - 1
        counts.append(cfg.layers_per_block + 1 + (0 if is_final else 1))
    return tuple(counts)


class UNet2DConditionModel(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # FreeU (optional quality knob; reference unet enable_freeu):
    # pass ops.freeu.FreeUConfig(b1, b2, s1, s2)
    freeu: "Optional[object]" = None

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, C_in) NHWC
        timesteps: jnp.ndarray,  # (B,) or scalar
        encoder_hidden_states: jnp.ndarray,  # (B, 77, 768)
        *,
        down_block_add_samples: Taps = None,  # brushnet, len = 1 + sum(down)
        mid_block_add_sample: Optional[jnp.ndarray] = None,
        up_block_add_samples: Taps = None,  # brushnet, len = sum(up)
        down_block_additional_residuals: Taps = None,  # controlnet (12)
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        down_intrablock_additional_residuals: Taps = None,  # t2i-adapter
        timestep_cond: Optional[jnp.ndarray] = None,
        image_embeds: Optional[jnp.ndarray] = None,  # IP-Adapter (B, ip_dim)
        ip_scale=1.0,
        emit_encoder_cache: bool = False,
        encoder_cache: "Optional[tuple]" = None,  # (x_down_out, skips)
    ) -> jnp.ndarray:
        """``emit_encoder_cache``/``encoder_cache`` implement encoder
        propagation (Faster Diffusion, arXiv 2312.09608): encoder features
        (conv_in + down blocks) change little between adjacent denoise
        steps, so key steps emit them and non-key steps skip the whole
        encoder, recomputing only mid+up with the current timestep
        embedding.  Incompatible with BrushNet/ControlNet injection."""
        cfg = self.config
        is_brushnet = down_block_add_samples is not None
        is_controlnet = down_block_additional_residuals is not None
        is_adapter = down_intrablock_additional_residuals is not None
        if encoder_cache is not None or emit_encoder_cache:
            assert not (is_brushnet or is_controlnet or is_adapter), (
                "encoder caching cannot skip injected down features"
            )

        # IP-Adapter: project raw CLIP image embeds to extra context tokens
        # (reference unet_2d_condition.py:1030-1040 'ip_image_proj' +
        # diffusers IPAdapterAttnProcessor decoupled K/V in every attn2)
        ip_context = None
        if image_embeds is not None:
            from powerpaint_tpu.models.projection import ImageProjection

            embeds = (image_embeds
                      if isinstance(image_embeds, (tuple, list))
                      else (image_embeds,))
            tokens = cfg.ip_adapter_tokens
            tokens = (tokens if isinstance(tokens, (tuple, list))
                      else (tokens,) * len(embeds))
            # adapter 0 keeps the bare scope name (single-adapter
            # checkpoints unchanged); extra adapters get _a suffixes
            ip_context = tuple(
                ImageProjection(
                    cfg.cross_attention_dim, tokens[a],
                    self.dtype, self.param_dtype,
                    name="encoder_hid_proj" + ("" if a == 0 else f"_{a}"),
                )(e)
                for a, e in enumerate(embeds)
            )
            if len(ip_context) == 1 and not isinstance(
                image_embeds, (tuple, list)
            ):
                ip_context = ip_context[0]

        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # 1. time embedding (fp32 sinusoid -> MLP)
        t_emb = timestep_sinusoid(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        ).astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, self.dtype, self.param_dtype,
            cond_proj_dim=cfg.time_cond_proj_dim, name="time_embedding",
        )(t_emb, timestep_cond)

        # 2. conv_in
        sample = sample.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)
        # T2I-Adapter intrablock features: one tensor per down block,
        # consumed in order (reference unet_2d_condition.py:1198-1260)
        adapter_feats = (list(down_intrablock_additional_residuals)
                         if is_adapter else None)
        if encoder_cache is not None:
            # encoder propagation: reuse key-step encoder features
            x, skips = encoder_cache
            x = x.astype(self.dtype)
            skips = [s.astype(self.dtype) for s in skips]
        else:
            x = conv(
                cfg.block_out_channels[0], cfg.conv_in_kernel, 1,
                (cfg.conv_in_kernel - 1) // 2, dtype=self.dtype,
                param_dtype=self.param_dtype, name="conv_in",
            )(sample)

            # skip recorded BEFORE brushnet conv_in injection
            # (reference unet_2d_condition.py:1220-1223)
            skips = [x]
            if is_brushnet:
                down_taps = list(down_block_add_samples)
                x = x + down_taps.pop(0)

            # 3. down — adapter placement: cross-attn blocks add their
            # feature INSIDE, after the last resnet+attn pair and before
            # that skip is recorded; plain blocks add it to the block
            # OUTPUT, after their skips are recorded
            down_counts = _down_tap_counts(cfg)
            for i, block_type in enumerate(cfg.down_block_types):
                ch = cfg.block_out_channels[i]
                is_final = i == len(cfg.down_block_types) - 1
                taps = None
                if is_brushnet:
                    taps = tuple(down_taps[: down_counts[i]])
                    down_taps = down_taps[down_counts[i]:]
                common = dict(
                    out_channels=ch,
                    num_layers=cfg.layers_per_block,
                    add_downsample=not is_final,
                    resnet_eps=cfg.norm_eps,
                    groups=cfg.norm_num_groups,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )
                if block_type == CROSS_ATTN_DOWN:
                    extra = adapter_feats.pop(0) if adapter_feats else None
                    x, block_skips = CrossAttnDownBlock2D(
                        num_heads=cfg.num_heads,
                        transformer_layers=cfg.transformer_layers_per_block,
                        use_linear_projection=cfg.use_linear_projection,
                        name=f"down_blocks_{i}",
                        **common,
                    )(x, temb, encoder_hidden_states, taps, ip_context,
                      ip_scale, extra_residual=extra)
                else:
                    x, block_skips = DownBlock2D(
                        name=f"down_blocks_{i}", **common
                    )(x, temb, None, taps)
                    if adapter_feats:
                        # plain block: add AFTER the block (its recorded
                        # skips do NOT include the adapter feature —
                        # reference unet_2d_condition.py:1256-1260)
                        x = x + adapter_feats.pop(0)
                # sequence-parallel mode: pin each level's sharding (rows
                # when divisible, replicated below that) — see
                # ops.attention.sp_hint for why inference is not enough
                skips.extend(sp_hint(s) for s in block_skips)
                x = sp_hint(x)

            if is_controlnet:
                skips = [
                    s + r for s, r in
                    zip(skips, down_block_additional_residuals)
                ]
        cache_out = (x, tuple(skips)) if emit_encoder_cache else None

        # 4. mid
        if cfg.mid_block_type == MID_CROSS_ATTN:
            x = UNetMidBlock2DCrossAttn(
                cfg.block_out_channels[-1], cfg.num_heads,
                cfg.transformer_layers_per_block, cfg.norm_eps,
                cfg.norm_num_groups, cfg.use_linear_projection, self.dtype,
                self.param_dtype, name="mid_block",
            )(x, temb, encoder_hidden_states, ip_context, ip_scale)
        elif cfg.mid_block_type == MID_RESNET:
            x = MidBlock2D(
                cfg.block_out_channels[-1], cfg.norm_eps, cfg.norm_num_groups,
                self.dtype, self.param_dtype, name="mid_block",
            )(x, temb)
        else:
            raise ValueError(cfg.mid_block_type)

        # T2I-Adapter-XL style: one leftover feature for the mid block when
        # its shape matches (reference unet_2d_condition.py:1288-1294);
        # SD1.5 adapters emit exactly one tensor per down block, so this is
        # a no-op there
        if is_adapter and adapter_feats and x.shape == adapter_feats[0].shape:
            x = x + adapter_feats.pop(0)

        if is_controlnet and mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual
        if is_brushnet and mid_block_add_sample is not None:
            x = x + mid_block_add_sample
        x = sp_hint(x)

        # 5. up
        up_counts = _up_tap_counts(cfg)
        up_taps = list(up_block_add_samples) if up_block_add_samples else None
        reversed_ch = tuple(reversed(cfg.block_out_channels))
        for i, block_type in enumerate(cfg.up_block_types):
            ch = reversed_ch[i]
            is_final = i == len(cfg.up_block_types) - 1
            n_res = cfg.layers_per_block + 1
            block_skips, skips = skips[-n_res:], skips[:-n_res]
            output_size = skips[-1].shape[1:3] if skips else None
            taps = None
            if up_taps is not None:
                taps = tuple(up_taps[: up_counts[i]])
                up_taps = up_taps[up_counts[i]:]
            common = dict(
                out_channels=ch,
                num_layers=n_res,
                add_upsample=not is_final,
                resnet_eps=cfg.norm_eps,
                groups=cfg.norm_num_groups,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            if block_type == CROSS_ATTN_UP:
                x, _ = CrossAttnUpBlock2D(
                    num_heads=cfg.num_heads,
                    transformer_layers=cfg.transformer_layers_per_block,
                    use_linear_projection=cfg.use_linear_projection,
                    freeu=self.freeu, resolution_idx=i,
                    name=f"up_blocks_{i}",
                    **common,
                )(x, temb, block_skips, encoder_hidden_states, taps,
                  output_size=output_size, ip_context=ip_context,
                  ip_scale=ip_scale)
            else:
                x, _ = UpBlock2D(
                    freeu=self.freeu, resolution_idx=i,
                    name=f"up_blocks_{i}", **common
                )(x, temb, block_skips, None, taps, output_size=output_size)
            x = sp_hint(x)

        # 6. out
        from powerpaint_tpu.models.layers import GroupNorm

        x = GroupNorm(cfg.norm_num_groups, cfg.norm_eps, self.param_dtype,
                      name="conv_norm_out")(x, silu=True)
        x = conv(
            cfg.out_channels, cfg.conv_out_kernel, 1,
            (cfg.conv_out_kernel - 1) // 2, dtype=self.dtype,
            param_dtype=self.param_dtype, name="conv_out",
        )(x)
        if emit_encoder_cache:
            return x, cache_out
        return x
