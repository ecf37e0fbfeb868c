"""GroupNorm (+ fused SiLU) in NHWC.

The reference's hottest non-matmul op: every ResnetBlock2D runs
GroupNorm(32) -> SiLU -> Conv twice (diffusers ResnetBlock2D, invoked from
reference unet_2d_blocks.py).  On TPU the XLA path below is written so the
normalize+silu epilogue fuses into the following conv.  A dedicated Pallas
GroupNorm kernel was measured and rejected (ROADMAP.md: 0.65 ms total across
the UNet; bf16 stats were slower than this fused XLA path).

Statistics are always fp32 regardless of activation dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    num_groups: int = 32,
    eps: float = 1e-6,
    silu: bool = False,
) -> jax.Array:
    """x: (..., C) NHWC; gamma/beta: (C,). Reduces over all non-batch dims
    within each channel group (matches torch GroupNorm semantics)."""
    orig_dtype = x.dtype
    b = x.shape[0]
    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    gs = c // num_groups

    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, gs)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(x.shape)
    out = xn * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(orig_dtype)


def layer_norm(
    x: jax.Array,
    gamma: Optional[jax.Array],
    beta: Optional[jax.Array],
    *,
    eps: float = 1e-5,
) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        out = out * gamma.astype(jnp.float32)
    if beta is not None:
        out = out + beta.astype(jnp.float32)
    return out.astype(orig_dtype)
