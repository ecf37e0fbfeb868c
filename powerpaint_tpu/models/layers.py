"""Shared low-level layers (NHWC, bf16-compute/fp32-stat policy).

TPU-first counterparts of the torch primitives the reference pulls from
diffusers: GroupNorm/LayerNorm with fp32 statistics, timestep sinusoids, and
torch-padding-compatible convolutions (explicit ((1,1),(1,1)) padding so a
stride-2 k3 conv halves even inputs exactly like torch Conv2d(p=1)).
"""

from __future__ import annotations

import math
from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from powerpaint_tpu.ops.groupnorm import group_norm, layer_norm


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, silu: bool = False, params_only: bool = False):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        beta = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        if params_only:
            # declare params but defer the compute: the caller hands them
            # to Conv2D's ``gn=`` prologue (fused-conv path)
            return gamma, beta
        return group_norm(
            x, gamma, beta, num_groups=self.num_groups, eps=self.eps, silu=silu
        )


class LayerNorm(nn.Module):
    eps: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        beta = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return layer_norm(x, gamma, beta, eps=self.eps)


def _im2col_wanted() -> bool:
    import os

    return os.environ.get("POWERPAINT_CONV_IM2COL", "0") == "1"


def _fused_conv_wanted() -> bool:
    """Opt-in Pallas implicit-GEMM conv with the GroupNorm+SiLU producer
    fused as an in-VMEM prologue (ops/conv_pallas.py).  Unlike the
    rejected standalone fused-norm kernels (see ops/groupnorm.py), the
    prologue rides the conv's slab residency, so there is no extra HBM
    round trip to pay for."""
    import os

    return os.environ.get("POWERPAINT_FUSED_CONV", "0") == "1"


def _int8_wanted() -> bool:
    """Opt-in static-scale W8A8 conv (ops/conv_pallas.py::
    conv3x3_gn_silu_int8): GroupNorm+SiLU+quantize fused into the conv's
    VMEM slab, int8 MXU dots (2x bf16 rate on v5e), dequant in the
    epilogue.  The SmoothQuant-style route left open after round 2's
    dynamic-W8A8 removal (ROADMAP); quality-gated, measured in
    scripts/perf_int8_conv.py / results_int8_conv.json."""
    import os

    return os.environ.get("POWERPAINT_INT8", "0") == "1"


def _int8_x_scale() -> float:
    """Static per-tensor activation scale for the post-SiLU slab.  SiLU
    output is lower-bounded (~-0.28) and GN-normalized, so a global
    static scale is tight; override per deployment via
    POWERPAINT_INT8_XSCALE after calibration."""
    import os

    return float(os.environ.get("POWERPAINT_INT8_XSCALE", "8.0")) / 127.0


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _igemm_profitable(h: int, w: int, cin: int) -> bool:
    """Shape gate for the fused implicit-GEMM conv: only the UNet levels
    where the kernel measured FASTER than the XLA gn+silu+conv chain on
    v5e (scripts/results_igemm_conv.json — 64x64x320 and 16x16x1280 win
    ~4%, 32x32x640 loses).  Also excludes the wide concat shapes
    (cin 960/1920) whose f32 prologue temps exceed the 16 MB scoped-VMEM
    stack (measured compile OOM at 32x32x1920->640)."""
    return (h, w, cin) in {(64, 64, 320), (16, 16, 1280)}


class Conv2D(nn.Module):
    """NHWC conv, drop-in for ``nn.Conv`` (same param names/shapes/init and
    bit-identical float compute).

    POWERPAINT_CONV_IM2COL=1 reformulates small-spatial stride-1 3x3 SAME
    convs as explicit im2col + one GEMM: on v5e at the UNet's 16x16x1280 /
    8x8x1280 levels the GEMM runs 10-17% faster than XLA's conv lowering
    (scripts/perf_conv.py, scan protocol).  Same math to fp32 reduction
    order, not bitwise — hence opt-in."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: Union[str, tuple] = ((1, 1), (1, 1))
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gn=None):
        """``gn=(gamma, beta, groups, eps)`` prepends GroupNorm+SiLU to the
        conv.  With POWERPAINT_FUSED_CONV=1 on TPU the whole chain runs as
        one Pallas implicit-GEMM kernel (normalize+SiLU applied to the
        input slab in VMEM); otherwise it is the exact same two-op XLA
        chain the resnet blocks always used."""
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        fusable = (
            (kh, kw) == (3, 3)
            and self.strides == (1, 1)
            and self.padding == ((1, 1), (1, 1))
        )
        if gn is not None:
            gamma, beta, groups, eps = gn
            if fusable and _int8_wanted() and _on_tpu():
                from powerpaint_tpu.ops.conv_pallas import (
                    conv3x3_gn_silu_int8,
                    int8_fused_feasible,
                    quantize_weights_int8,
                )

                if int8_fused_feasible(x.shape[0], x.shape[1], x.shape[2],
                                       x.shape[3], self.features):
                    # weight quantization is scan-invariant — XLA hoists
                    # it out of the denoise loop, so it costs one pass per
                    # CALL, not per step
                    w_q, w_s = quantize_weights_int8(kernel)
                    return conv3x3_gn_silu_int8(
                        x.astype(self.dtype), w_q, w_s, gamma, beta,
                        groups, _int8_x_scale(), eps, bias=bias,
                    )
            if (fusable and _fused_conv_wanted() and _on_tpu()
                    and _igemm_profitable(x.shape[1], x.shape[2],
                                          x.shape[3])):
                from powerpaint_tpu.ops.conv_pallas import conv3x3_gn_silu

                return conv3x3_gn_silu(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    gamma, beta, groups, eps, bias=bias,
                )
            from powerpaint_tpu.ops.groupnorm import group_norm

            x = group_norm(
                x, gamma, beta, num_groups=groups, eps=eps, silu=True
            )
        if (
            _im2col_wanted()
            and (kh, kw) == (3, 3)
            and self.strides == (1, 1)
            and self.padding == ((1, 1), (1, 1))
            and x.shape[1] * x.shape[2] <= 1024  # <= 32x32: GEMM wins
        ):
            y = self._im2col(x.astype(self.dtype), kernel.astype(self.dtype))
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    def _im2col(self, x, kernel):
        b, h, w, cin = x.shape
        cout = kernel.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(3) for dx in range(3)
        ]
        patches = jnp.concatenate(cols, axis=-1).reshape(b * h * w, 9 * cin)
        y = jnp.dot(patches, kernel.reshape(9 * cin, cout))
        return y.reshape(b, h, w, cout)


class DenseGeneral(nn.Module):
    """Drop-in for ``nn.Dense`` (same params, bit-identical float
    compute)."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        y = jax.lax.dot_general(
            x.astype(self.dtype), kernel.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


def conv(
    features: int,
    kernel: int = 3,
    stride: int = 1,
    padding: Union[int, str] = 1,
    *,
    dtype=jnp.bfloat16,
    param_dtype=jnp.float32,
    name: Optional[str] = None,
    use_bias: bool = True,
) -> Conv2D:
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return Conv2D(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        dtype=dtype,
        param_dtype=param_dtype,
        use_bias=use_bias,
        name=name,
    )


def dense(
    features: int,
    *,
    dtype=jnp.bfloat16,
    param_dtype=jnp.float32,
    use_bias: bool = True,
    name: Optional[str] = None,
) -> DenseGeneral:
    return DenseGeneral(
        features,
        dtype=dtype,
        param_dtype=param_dtype,
        use_bias=use_bias,
        name=name,
    )


def timestep_sinusoid(
    timesteps: jax.Array,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """Sinusoidal timestep features (diffusers ``Timesteps`` semantics,
    used by reference BrushNet_CA.py:232 and the base UNet). fp32."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin], axis=-1) if flip_sin_to_cos else jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def guidance_scale_embedding(
    w: jax.Array, dim: int
) -> jax.Array:
    """LCM guidance-scale embedding (reference
    pipeline_PowerPaint_Brushnet_CA.py:972-1014 get_guidance_scale_embedding,
    from the LCM paper): sinusoid features of w*1000 fed to the UNet's
    ``timestep_cond`` projection when ``time_cond_proj_dim`` is set.  Note
    the [sin | cos] order (the timestep sinusoid uses [cos | sin])."""
    w = jnp.atleast_1d(w).astype(jnp.float32) * 1000.0
    half = dim // 2
    emb = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    emb = w[:, None] * emb[None, :]
    out = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class TimestepEmbedding(nn.Module):
    """linear -> silu -> linear (diffusers TimestepEmbedding)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    cond_proj_dim: Optional[int] = None

    @nn.compact
    def __call__(self, sample, condition=None):
        if condition is not None and self.cond_proj_dim is not None:
            cond = dense(
                sample.shape[-1],
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                use_bias=False,
                name="cond_proj",
            )(condition)
            sample = sample + cond
        h = dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_1",
        )(sample)
        h = nn.silu(h)
        h = dense(
            self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear_2",
        )(h)
        return h
