"""Fused Pallas LayerNorm / GroupNorm(+SiLU) kernels for TPU.

Round-3 profiling (scripts/perf_overhead.py, amortized scan protocol on
v5e): the XLA two-pass LayerNorm at (2, 4096, 320) costs ~0.22 ms — ~16x
its HBM roofline — and a v2 denoise step runs ~50 norm instances across
the two UNet-scale forwards, making norm glue a multi-ms/step tax.  These
kernels do ONE HBM read + ONE write: the block stays in VMEM, statistics
use the single-pass E[x^2] - mean^2 form in fp32, and SiLU fuses into the
GroupNorm epilogue (the UNet always consumes GN through SiLU).

Dispatch lives in ops/groupnorm.py: TPU + fitting shapes -> these
kernels; CPU / oversized spatial (giant outpaint canvases, VAE maps) ->
the XLA reference formulation.  Parity pinned in tests/test_norms_pallas.py
(interpret mode) at fp32 tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # (Br, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    meansq = jnp.mean(x * x, axis=-1, keepdims=True)
    var = meansq - mean * mean
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    out = out * g_ref[...].astype(jnp.float32)
    out = out + b_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_r", "interpret"))
def layer_norm_fused(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    eps: float = 1e-5,
    block_r: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last axis; any leading shape."""
    orig_shape = x.shape
    c = x.shape[-1]
    r = x.size // c
    xr = x.reshape(r, c)
    nb = pl.cdiv(r, block_r)
    pad = nb * block_r - r
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xr, gamma.reshape(1, c), beta.reshape(1, c))
    if pad:
        out = out[:r]
    return out.reshape(orig_shape)


def _gn_kernel(x_ref, g_ref, b_ref, o_ref, *, num_groups, eps, silu):
    x = x_ref[0].astype(jnp.float32)  # (S, C)
    s, c = x.shape
    gs = c // num_groups
    # channel sums via a sublane reduction; per-group fold + broadcast-back
    # go through a one-hot matmul (an MXU segmented reduce — 2D throughout,
    # no cross-lane reshapes for Mosaic to trip on)
    colsum = jnp.sum(x, axis=0, keepdims=True)        # (1, C)
    colsumsq = jnp.sum(x * x, axis=0, keepdims=True)  # (1, C)
    row_g = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // gs
    col_g = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (row_g == col_g).astype(jnp.float32)     # (C, G)
    n = float(s * gs)
    mean_g = jax.lax.dot_general(
        colsum, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / n                                             # (1, G)
    meansq_g = jax.lax.dot_general(
        colsumsq, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / n
    inv_g = jax.lax.rsqrt(meansq_g - mean_g * mean_g + eps)
    # broadcast back to channels: (1, G) @ (G, C)
    mean_c = jax.lax.dot_general(
        mean_g, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (1, C)
    inv_c = jax.lax.dot_general(
        inv_g, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = (x - mean_c) * inv_c
    out = out * g_ref[...].astype(jnp.float32)
    out = out + b_ref[...].astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "silu", "interpret"),
)
def group_norm_fused(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-6,
    silu: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """GroupNorm over (B, ..., C) with stats per (batch, group); one
    program per batch element (the whole feature map sits in VMEM —
    callers gate on size, ops/groupnorm.py::_FUSE_LIMIT)."""
    orig_shape = x.shape
    b = x.shape[0]
    c = x.shape[-1]
    s = x.size // (b * c)
    xr = x.reshape(b, s, c)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, num_groups=num_groups, eps=eps,
                          silu=silu),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xr, gamma.reshape(1, c), beta.reshape(1, c))
    return out.reshape(orig_shape)
