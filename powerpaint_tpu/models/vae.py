"""AutoencoderKL (SD1.5 VAE) — NHWC, TPU-native.

Counterpart of diffusers ``AutoencoderKL`` as used by the reference
(pipeline_PowerPaint.py:27, 657-669: encode -> latent_dist.sample() x 0.18215;
:1051 decode(latents / 0.18215)).  The VAE attention mid-block is standard
single-head attention over 64x64=4096 tokens at 512 channels.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from powerpaint_tpu.core.config import VAEConfig
from powerpaint_tpu.models.layers import GroupNorm, conv, dense
from powerpaint_tpu.models.resnet import ResnetBlock2D, Upsample2D
from powerpaint_tpu.ops.attention import attention


class VAEAttention(nn.Module):
    """Single-head self-attention block (diffusers ``Attention`` in VAE mid)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(self.groups, 1e-6, self.param_dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="to_q")(y)
        k = dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="to_k")(y)
        v = dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name="to_v")(y)
        out = attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = dense(c, dtype=self.dtype, param_dtype=self.param_dtype,
                    name="to_out")(out)
        return out.reshape(b, h, w, c) + residual


class VAEDownsample2D(nn.Module):
    """Asymmetric-pad stride-2 conv (diffusers ``Downsample2D`` with pad=0:
    F.pad (0,1,0,1) then VALID conv). Conv is nested as ``conv`` to match the
    real checkpoint key ``downsamplers.0.conv.weight``."""

    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, 1e-6, self.groups, use_time_emb=False,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(x)
        if self.add_downsample:
            x = VAEDownsample2D(
                self.out_channels, self.dtype, self.param_dtype,
                name="downsamplers_0",
            )(x)
        return x


class UpDecoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, 1e-6, self.groups, use_time_emb=False,
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"resnets_{i}",
            )(x)
        if self.add_upsample:
            x = Upsample2D(
                self.out_channels, self.dtype, self.param_dtype,
                name="upsamplers_0",
            )(x)
        return x


class MidBlock(nn.Module):
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(
            self.channels, 1e-6, self.groups, use_time_emb=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="resnets_0",
        )(x)
        x = VAEAttention(self.channels, self.groups, self.dtype,
                         self.param_dtype, name="attentions_0")(x)
        x = ResnetBlock2D(
            self.channels, 1e-6, self.groups, use_time_emb=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name="resnets_1",
        )(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(self.dtype)
        x = conv(cfg.block_out_channels[0], 3, 1, 1, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            is_final = i == len(cfg.block_out_channels) - 1
            x = DownEncoderBlock2D(
                ch, cfg.layers_per_block, not is_final, cfg.norm_num_groups,
                self.dtype, self.param_dtype, name=f"down_blocks_{i}",
            )(x)
        x = MidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                     self.dtype, self.param_dtype, name="mid_block")(x)
        x = GroupNorm(cfg.norm_num_groups, 1e-6, self.param_dtype,
                      name="conv_norm_out")(x, silu=True)
        x = conv(2 * cfg.latent_channels, 3, 1, 1, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv_out")(x)
        # quant_conv maps moments -> moments (1x1)
        x = conv(2 * cfg.latent_channels, 1, 1, 0, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="quant_conv")(x)
        return x  # (B, H/8, W/8, 2*latent) = mean ++ logvar


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        z = z.astype(self.dtype)
        z = conv(cfg.latent_channels, 1, 1, 0, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="post_quant_conv")(z)
        x = conv(cfg.up_channels[-1], 3, 1, 1, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv_in")(z)
        x = MidBlock(cfg.up_channels[-1], cfg.norm_num_groups,
                     self.dtype, self.param_dtype, name="mid_block")(x)
        reversed_ch = tuple(reversed(cfg.up_channels))
        for i, ch in enumerate(reversed_ch):
            is_final = i == len(reversed_ch) - 1
            x = UpDecoderBlock2D(
                ch, cfg.up_layers + 1, not is_final,
                cfg.norm_num_groups, self.dtype, self.param_dtype,
                name=f"up_blocks_{i}",
            )(x)
        x = GroupNorm(cfg.norm_num_groups, 1e-6, self.param_dtype,
                      name="conv_norm_out")(x, silu=True)
        x = conv(cfg.out_channels, 3, 1, 1, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv_out")(x)
        return x


class MaskConditionEncoder(nn.Module):
    """Condition tower of the asymmetric VAE decoder (Asymmetric VQGAN,
    arXiv 2306.04632; the reference's optional higher-fidelity v1 decode —
    pipeline_PowerPaint.py:27, 1045-1051).  A small conv pyramid over the
    masked (known-region) image whose per-resolution features the decoder
    blends back in.  ``layer_spec`` = ((kernel, stride, out_ch), ...) —
    derived from the checkpoint by io.convert.infer_condition_layers so the
    tower matches real AsymmetricAutoencoderKL weights exactly."""

    layer_spec: tuple  # ((kernel, stride, out_ch), ...)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (k, s, ch) in enumerate(self.layer_spec):
            # torch Conv2d(..., padding=1) for both the 3x3/s1 and 4x4/s2
            # layers (even-kernel stride-2 + pad 1 halves even inputs)
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding=((1, 1), (1, 1)),
                dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"layers_{i}",
            )(x)
            feats.append(x)  # pre-activation feature is what gets blended
            x = nn.relu(x)
        return feats


class ConditionalDecoder(nn.Module):
    """Decoder with known-region feature injection: before each up block
    (and once at full resolution), where a condition feature matches the
    sample's (H, W, C), blend ``sample*mask + cond*(1-mask)`` — mask is 1
    in the HOLE, so known-region content comes from the condition tower."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, image, mask):
        cfg = self.config
        z = z.astype(self.dtype)
        z = conv(cfg.latent_channels, 1, 1, 0, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="post_quant_conv")(z)
        x = conv(cfg.up_channels[-1], 3, 1, 1, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv_in")(z)
        x = MidBlock(cfg.up_channels[-1], cfg.norm_num_groups,
                     self.dtype, self.param_dtype, name="mid_block")(x)

        masked_image = ((1.0 - mask) * image).astype(self.dtype)
        feats = MaskConditionEncoder(
            cfg.condition_layers, self.dtype, self.param_dtype,
            name="condition_encoder",
        )(masked_image)
        by_shape = {f.shape[1:]: f for f in feats}

        def blend(sample):
            key = sample.shape[1:]
            if key not in by_shape:
                return sample
            m = jax.image.resize(
                mask, mask.shape[:1] + key[:2] + (1,), method="nearest"
            ).astype(sample.dtype)
            return sample * m + by_shape[key] * (1.0 - m)

        reversed_ch = tuple(reversed(cfg.up_channels))
        for i, ch in enumerate(reversed_ch):
            is_final = i == len(reversed_ch) - 1
            x = blend(x)
            x = UpDecoderBlock2D(
                ch, cfg.up_layers + 1, not is_final,
                cfg.norm_num_groups, self.dtype, self.param_dtype,
                name=f"up_blocks_{i}",
            )(x)
        x = blend(x)
        x = GroupNorm(cfg.norm_num_groups, 1e-6, self.param_dtype,
                      name="conv_norm_out")(x, silu=True)
        x = conv(cfg.out_channels, 3, 1, 1, dtype=self.dtype,
                 param_dtype=self.param_dtype, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """Use via ``.apply(params, x, method='encode'/'decode'/'sample')``."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype, self.param_dtype)
        if self.config.asymmetric:
            self.decoder = ConditionalDecoder(
                self.config, self.dtype, self.param_dtype
            )
        else:
            self.decoder = Decoder(self.config, self.dtype, self.param_dtype)

    def encode(self, x):
        """Returns (mean, logvar) of the latent distribution (unscaled)."""
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def sample(self, x, rng):
        """Encode and draw one latent sample, scaled by scaling_factor
        (reference pipeline_PowerPaint.py:657-669)."""
        mean, logvar = self.encode(x)
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        noise = jax.random.normal(rng, mean.shape, dtype=jnp.float32)
        z = mean.astype(jnp.float32) + std * noise
        return (z * self.config.scaling_factor).astype(mean.dtype)

    def encode_mode(self, x):
        """Deterministic encode (distribution mode), scaled."""
        mean, _ = self.encode(x)
        return mean * self.config.scaling_factor

    def decode(self, z):
        """Decode latents (callers divide by scaling_factor first, matching
        reference pipeline_PowerPaint.py:1051)."""
        if self.config.asymmetric:
            raise ValueError(
                "asymmetric VAE decode needs (image, mask); call "
                "decode_with_condition"
            )
        return self.decoder(z)

    def decode_with_condition(self, z, image, mask):
        """Asymmetric decode: latents + full [-1,1] image + hole mask(=1)
        (reference pipeline_PowerPaint.py:1045-1051 condition_kwargs)."""
        if not self.config.asymmetric:
            raise ValueError("decode_with_condition needs asymmetric=True")
        return self.decoder(z, image, mask)

    def __call__(self, x, rng):
        z = self.sample(x, rng)
        if self.config.asymmetric:
            mask = jnp.ones(x.shape[:3] + (1,), jnp.float32)
            return self.decode_with_condition(
                z / self.config.scaling_factor, x, mask
            )
        return self.decode(z / self.config.scaling_factor)


def decode_tiled(
    vae: "AutoencoderKL",
    params,
    z: "jnp.ndarray",
    *,
    tile: int = 64,
    overlap: int = 16,
):
    """Tiled VAE decode for large canvases (the TPU answer to the reference's
    VAE slicing/tiling, pipeline_PowerPaint_ControlNet.py:326-356).

    Decodes (tile x tile)-latent windows with ``overlap`` latent pixels of
    context and linearly feathers the overlapping pixel regions.  Static tile
    count per canvas size -> one XLA program per size bucket.  z: (B, h, w, C)
    UNSCALED latents (callers divide by scaling_factor first).
    """
    b, h, w, c = z.shape
    if h <= tile and w <= tile:
        return vae.apply({"params": params}, z, method="decode")

    stride = tile - overlap
    ny = max(1, -(-(h - overlap) // stride))
    nx = max(1, -(-(w - overlap) // stride))

    out = None
    weight = None
    f = 8  # spatial scale factor
    for iy in range(ny):
        for ix in range(nx):
            y0 = min(iy * stride, max(h - tile, 0))
            x0 = min(ix * stride, max(w - tile, 0))
            th = min(tile, h)
            tw = min(tile, w)
            patch = jax.lax.dynamic_slice(z, (0, y0, x0, 0), (b, th, tw, c))
            dec = vae.apply({"params": params}, patch, method="decode")
            dec = dec.astype(jnp.float32)
            if out is None:
                out = jnp.zeros((b, h * f, w * f, dec.shape[-1]), jnp.float32)
                weight = jnp.zeros((1, h * f, w * f, 1), jnp.float32)
            # feathered weight: linear ramp across the overlap band
            wy = jnp.minimum(
                jnp.arange(th * f, dtype=jnp.float32) + 1.0,
                jnp.arange(th * f, 0.0, -1.0),
            )
            wy = jnp.minimum(wy / max(overlap * f, 1), 1.0)
            wx = jnp.minimum(
                jnp.arange(tw * f, dtype=jnp.float32) + 1.0,
                jnp.arange(tw * f, 0.0, -1.0),
            )
            wx = jnp.minimum(wx / max(overlap * f, 1), 1.0)
            wmap = (wy[:, None] * wx[None, :])[None, :, :, None]
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(
                    out, (0, y0 * f, x0 * f, 0),
                    (b, th * f, tw * f, dec.shape[-1]),
                ) + dec * wmap,
                (0, y0 * f, x0 * f, 0),
            )
            weight = jax.lax.dynamic_update_slice(
                weight,
                jax.lax.dynamic_slice(
                    weight, (0, y0 * f, x0 * f, 0), (1, th * f, tw * f, 1)
                ) + wmap,
                (0, y0 * f, x0 * f, 0),
            )
    return (out / jnp.maximum(weight, 1e-8)).astype(z.dtype)
