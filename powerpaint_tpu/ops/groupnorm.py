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


# fused-kernel gate: the Pallas GroupNorm holds one batch element's whole
# feature map in VMEM with double buffering across the batch grid; above
# this element count fall back to the XLA formulation (VAE feature maps,
# giant outpaint canvases).  2M elements = 4MB bf16 window, 16MB with
# in+out double buffering — measured safe alongside the rest of the
# pipeline's scoped VMEM (8M blew the budget inside AutoencoderKL.encode
# at batch 4).
_FUSE_LIMIT = 2 * 1024 * 1024


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _fused_wanted() -> bool:
    # DEFAULT OFF — measured end-to-end REGRESSION (v1 23.7 -> 36.7
    # ms/step): inside the compiled pipeline XLA fuses the two-pass norm
    # into the neighboring convs/GEMMs for near-zero marginal cost, while
    # a pallas custom call is an optimization barrier that forces an HBM
    # materialization on both sides (~0.13 ms x ~100 norm sites).  The
    # isolated-op micro-benchmarks (scripts/perf_norms.py, +4-7%) cannot
    # see fusion context — trust end-to-end numbers.  Kept as an opt-in
    # for future XLA versions.
    import os

    return os.environ.get("POWERPAINT_FUSED_NORMS", "0") == "1"


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
    within each channel group (matches torch GroupNorm semantics).

    On TPU, shapes whose per-batch-element map fits VMEM route through the
    fused Pallas kernel (ops/norms_pallas.py — one HBM read + write vs the
    ~16x-roofline XLA two-pass; round-3 measurement)."""
    if (
        _on_tpu()
        and _fused_wanted()
        and x.ndim >= 2
        and x.size // x.shape[0] <= _FUSE_LIMIT
        and x.shape[-1] % num_groups == 0
    ):
        from powerpaint_tpu.ops.norms_pallas import group_norm_fused

        return group_norm_fused(
            x, gamma, beta, num_groups=num_groups, eps=eps, silu=silu
        )
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
    if _on_tpu() and _fused_wanted() and gamma is not None \
            and beta is not None and x.ndim >= 2:
        from powerpaint_tpu.ops.norms_pallas import layer_norm_fused

        return layer_norm_fused(x, gamma, beta, eps=eps)
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
