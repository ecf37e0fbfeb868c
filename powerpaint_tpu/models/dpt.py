"""Native DPT-hybrid monocular depth estimator (round-3 verdict #5).

The reference runs depth control-map extraction through the host-side
torch ``DPTForDepthEstimation("Intel/dpt-hybrid-midas")``
(/root/reference/app.py:116-123, 202-221).  This is the same network as
an NHWC Flax model so the last torch compute in the serving path runs on
the TPU: a BiT (ResNetv2-style, weight-standardized conv + GroupNorm)
stem feeding a ViT-B encoder, DPT reassembly of four feature stages, a
RefineNet-style fusion pyramid, and the 3-conv depth head
(Ranftl et al., "Vision Transformers for Dense Prediction", ICCV 2021).

Weights come from the published checkpoint via ``io.convert.convert_dpt``;
architecture parity is pinned against the installed ``transformers`` DPT
at random init (tests/test_dpt_oracle.py).

Layout notes (vs the torch deployment):
- NHWC everywhere; conv kernels HWIO.
- Weight standardization (per-output-filter zero-mean/unit-var, eps 1e-8,
  biased variance) is applied to the conv kernel at call time, exactly as
  the torch BiT does on every forward.
- The two bilinear-upsample flavours differ: fusion/head upsamples use
  align_corners=True (``_resize_align_corners``), residual-size matching
  and position-embedding resizes use half-pixel centers
  (``jax.image.resize`` bilinear), matching torch ``align_corners=False``.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    """Shape config mirroring the HF ``DPTConfig(is_hybrid=True)`` fields
    the architecture depends on (Intel/dpt-hybrid-midas values default)."""

    # BiT backbone
    embedding_size: int = 64
    bit_hidden_sizes: Tuple[int, ...] = (256, 512, 1024)
    bit_depths: Tuple[int, ...] = (3, 4, 9)
    bit_num_groups: int = 32
    # ViT encoder
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-12
    image_size: int = 384
    patch_size: int = 16
    # which ViT layer outputs feed reassembly stages 3 and 4 (0-indexed,
    # HF backbone_out_indices[2:])
    vit_out_layers: Tuple[int, int] = (8, 11)
    # neck / head
    neck_hidden_sizes: Tuple[int, ...] = (256, 512, 768, 768)
    reassemble_factors: Tuple[float, ...] = (1.0, 1.0, 1.0, 0.5)
    fusion_hidden_size: int = 256


def _resize_align_corners(x: jnp.ndarray, oh: int, ow: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True semantics (torch
    ``F.interpolate(..., mode='bilinear', align_corners=True)``), which
    ``jax.image.resize`` does not offer.  NHWC."""
    b, h, w, c = x.shape
    if (h, w) == (oh, ow):
        return x

    def axis_weights(n_in, n_out):
        if n_out == 1 or n_in == 1:
            pos = jnp.zeros((n_out,), jnp.float32)
        else:
            pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (
                n_out - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        frac = pos - i0.astype(jnp.float32)
        return i0, i1, frac

    y0, y1, fy = axis_weights(h, oh)
    x0, x1, fx = axis_weights(w, ow)
    fy = fy[None, :, None, None].astype(x.dtype)
    fx = fx[None, None, :, None].astype(x.dtype)
    top = x[:, y0]
    bot = x[:, y1]
    rows = top * (1 - fy) + bot * fy          # (B, oh, W, C)
    left = rows[:, :, x0]
    right = rows[:, :, x1]
    return left * (1 - fx) + right * fx


def _ws_kernel(kernel: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Weight standardization over (H, W, I) per output filter — the torch
    BiT applies batch_norm over the flattened filter with biased variance
    and this eps on every forward."""
    mean = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
    var = jnp.var(kernel, axis=(0, 1, 2), keepdims=True)
    return (kernel - mean) * jax.lax.rsqrt(var + eps)


class WSConv(nn.Module):
    """Weight-standardized conv, TF-SAME padding, no bias (BiT flavour)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        kernel = _ws_kernel(kernel).astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel, self.strides, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class GNAct(nn.Module):
    """GroupNorm (+ optional ReLU), BiT style (torch GN eps 1e-5)."""

    groups: int
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from powerpaint_tpu.ops.groupnorm import group_norm

        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        y = group_norm(x.astype(jnp.float32), gamma, beta,
                       num_groups=self.groups, eps=1e-5)
        if self.act:
            y = nn.relu(y)
        return y.astype(self.dtype)


def _make_div(value: float, divisor: int = 8) -> int:
    min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < 0.9 * value:
        new_value += divisor
    return new_value


class BitBottleneck(nn.Module):
    """Non-preactivation bottleneck (BiT 'bottleneck' layer_type, the
    ViT-hybrid flavour): three WS convs with GN+relu between, GN (no act)
    after conv3, residual add (1x1 WS downsample + GN on the first unit of
    a stage), final relu."""

    out_channels: int
    stride: int = 1
    groups: int = 32
    is_first: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = _make_div(self.out_channels * 0.25)
        shortcut = x
        if self.is_first:
            shortcut = WSConv(self.out_channels, (1, 1),
                              (self.stride, self.stride), self.dtype,
                              name="downsample_conv")(x)
            shortcut = GNAct(self.groups, act=False, dtype=self.dtype,
                             name="downsample_norm")(shortcut)
        h = WSConv(mid, (1, 1), dtype=self.dtype, name="conv1")(x)
        h = GNAct(self.groups, dtype=self.dtype, name="norm1")(h)
        h = WSConv(mid, (3, 3), (self.stride, self.stride), self.dtype,
                   name="conv2")(h)
        h = GNAct(self.groups, dtype=self.dtype, name="norm2")(h)
        h = WSConv(self.out_channels, (1, 1), dtype=self.dtype,
                   name="conv3")(h)
        h = GNAct(self.groups, act=False, dtype=self.dtype, name="norm3")(h)
        return nn.relu(h + shortcut)


class BitBackbone(nn.Module):
    """BiT stem + 3 stages; returns (stage1 1/4, stage2 1/8, stage3 1/16)
    feature maps — the hybrid embedder's residual features and the ViT
    input."""

    cfg: DPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        c = self.cfg
        h = WSConv(c.embedding_size, (7, 7), (2, 2), self.dtype,
                   name="stem_conv")(x)
        h = GNAct(c.bit_num_groups, dtype=self.dtype, name="stem_norm")(h)
        # TF-SAME 3x3/2 maxpool (dynamic padding in the torch BiT)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="SAME")
        feats = []
        for si, (depth, width) in enumerate(
                zip(c.bit_depths, c.bit_hidden_sizes)):
            stride = 1 if si == 0 else 2
            for li in range(depth):
                h = BitBottleneck(
                    out_channels=width,
                    stride=stride if li == 0 else 1,
                    groups=c.bit_num_groups,
                    is_first=li == 0,
                    dtype=self.dtype,
                    name=f"stage{si}_unit{li}",
                )(h)
            feats.append(h)
        return feats


class ViTSelfAttention(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        hd = d // self.heads
        q = nn.Dense(d, dtype=self.dtype, name="query")(x)
        k = nn.Dense(d, dtype=self.dtype, name="key")(x)
        v = nn.Dense(d, dtype=self.dtype, name="value")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, hd)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, x.dtype))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        return out.reshape(x.shape)


class ViTLayer(nn.Module):
    """Pre-LN ViT block (HF DPTViTLayer wiring)."""

    heads: int
    intermediate_size: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                         name="layernorm_before")(x.astype(jnp.float32))
        h = ViTSelfAttention(self.heads, self.dtype,
                             name="attention")(h.astype(self.dtype))
        h = nn.Dense(d, dtype=self.dtype, name="attention_out")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=self.eps, dtype=jnp.float32,
                         name="layernorm_after")(x.astype(jnp.float32))
        h = nn.Dense(self.intermediate_size, dtype=self.dtype,
                     name="intermediate")(h.astype(self.dtype))
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, dtype=self.dtype, name="output")(h)
        return x + h


class DPTHybridEncoder(nn.Module):
    """Hybrid embeddings (1x1 projection of the BiT 1/16 map + cls + pos)
    followed by the ViT stack; returns the token sequences after the two
    ``vit_out_layers`` blocks."""

    cfg: DPTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat16) -> Sequence[jnp.ndarray]:
        c = self.cfg
        b, gh, gw, _ = feat16.shape
        proj = nn.Conv(c.hidden_size, (1, 1), dtype=self.dtype,
                       name="projection")(feat16)
        tokens = proj.reshape(b, gh * gw, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.hidden_size), jnp.float32)
        n0 = (c.image_size // c.patch_size) ** 2
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, n0 + 1, c.hidden_size), jnp.float32)
        if gh * gw != n0:
            g0 = int(n0 ** 0.5)
            grid = pos[:, 1:].reshape(1, g0, g0, c.hidden_size)
            grid = jax.image.resize(grid, (1, gh, gw, c.hidden_size),
                                    method="bilinear")
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, gh * gw, c.hidden_size)],
                axis=1)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.hidden_size)).astype(
                tokens.dtype), tokens], axis=1)
        x = x + pos.astype(x.dtype)
        outs = []
        for i in range(c.num_layers):
            x = ViTLayer(c.num_heads, c.intermediate_size,
                         c.layer_norm_eps, self.dtype,
                         name=f"layer_{i}")(x)
            if i in c.vit_out_layers:
                outs.append(x)
        return outs


class PreActResidual(nn.Module):
    """DPT ResidualConvUnit: relu-conv-relu-conv + skip."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="convolution1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="convolution2")(h)
        return x + h


class FusionLayer(nn.Module):
    """DPT feature-fusion block: add refined residual, refine, upsample x2
    (align_corners=True), 1x1 projection."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None):
        if residual is not None:
            if residual.shape[1:3] != x.shape[1:3]:
                residual = jax.image.resize(
                    residual,
                    (residual.shape[0], x.shape[1], x.shape[2],
                     residual.shape[3]),
                    method="bilinear")
            x = x + PreActResidual(self.features, self.dtype,
                                   name="residual_layer1")(residual)
        x = PreActResidual(self.features, self.dtype,
                           name="residual_layer2")(x)
        x = _resize_align_corners(x, x.shape[1] * 2, x.shape[2] * 2)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="projection")(x)


class DPTDepthModel(nn.Module):
    """Full hybrid DPT depth network.  Input: (B, H, W, 3) float pixel
    values already normalized by the DPT preprocessing (mean .5 / std .5);
    H, W multiples of ``patch_size``.  Output: (B, H, W) inverse depth
    (the fusion pyramid ends at 1/2 resolution and the head upsamples the
    final x2, matching torch ``predicted_depth``)."""

    cfg: DPTConfig = DPTConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        f4, f8, f16 = BitBackbone(c, self.dtype, name="backbone")(pixels)
        t_a, t_b = DPTHybridEncoder(c, self.dtype, name="vit")(f16)
        b, gh, gw = f16.shape[0], f16.shape[1], f16.shape[2]

        # reassembly: hybrid keeps f4/f8 as-is; the two token stages get
        # readout-projected (concat cls), reshaped, 1x1-projected and
        # resized by their factor (1 and 0.5 for hybrid-midas)
        stages = [f4, f8]
        for i, tok in enumerate((t_a, t_b)):
            idx = i + 2
            cls, body = tok[:, :1], tok[:, 1:]
            readout = jnp.broadcast_to(cls, body.shape)
            h = jnp.concatenate([body, readout], axis=-1)
            h = nn.Dense(c.hidden_size, dtype=self.dtype,
                         name=f"readout_project_{idx}")(h)
            h = nn.gelu(h, approximate=False)
            h = h.reshape(b, gh, gw, c.hidden_size)
            h = nn.Conv(c.neck_hidden_sizes[idx], (1, 1), dtype=self.dtype,
                        name=f"reassemble_projection_{idx}")(h)
            factor = c.reassemble_factors[idx]
            if factor > 1:
                k = int(factor)
                h = nn.ConvTranspose(
                    c.neck_hidden_sizes[idx], (k, k), strides=(k, k),
                    dtype=self.dtype, name=f"reassemble_resize_{idx}")(h)
            elif factor < 1:
                s = int(round(1 / factor))
                h = nn.Conv(c.neck_hidden_sizes[idx], (3, 3),
                            strides=(s, s), padding=((1, 1), (1, 1)),
                            dtype=self.dtype,
                            name=f"reassemble_resize_{idx}")(h)
            stages.append(h)

        feats = [
            nn.Conv(c.fusion_hidden_size, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype,
                    name=f"neck_conv_{i}")(s)
            for i, s in enumerate(stages)
        ]

        # fusion pyramid, deepest first
        fused = FusionLayer(c.fusion_hidden_size, self.dtype,
                            name="fusion_0")(feats[3])
        fused = FusionLayer(c.fusion_hidden_size, self.dtype,
                            name="fusion_1")(fused, feats[2])
        fused = FusionLayer(c.fusion_hidden_size, self.dtype,
                            name="fusion_2")(fused, feats[1])
        fused = FusionLayer(c.fusion_hidden_size, self.dtype,
                            name="fusion_3")(fused, feats[0])

        h = nn.Conv(c.fusion_hidden_size // 2, (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="head_0")(fused)
        h = _resize_align_corners(h, h.shape[1] * 2, h.shape[2] * 2)
        h = nn.relu(nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, name="head_2")(h))
        h = nn.relu(nn.Conv(1, (1, 1), dtype=self.dtype, name="head_4")(h))
        return h[..., 0]
