"""W8A8 dynamic int8 quantization for the UNet's convs and projections.

EXPERIMENTAL — measured SLOWER end-to-end on the current XLA stack; keep
off (the default) for production.  The v5e MXU runs int8 at ~2x bf16 peak
and isolated W8A8 conv probes (scripts/perf_int8.py) show 1.25-1.5x over
bf16, but in the full 20-step v1 pipeline the mode measured 54.8 ms/step
vs 20.9 ms bf16 (0.81 vs 1.69 img/s): the dynamic activation quantize /
rescale passes are HBM-bound elementwise sweeps that XLA does not fuse
into the convs at scan scale.  Making this pay requires a Pallas kernel
that quantizes inside the conv's input pipeline (see ROADMAP.md).

Scheme (standard symmetric W8A8, cf. SmoothQuant/Q-Diffusion):
- weights: per-output-channel symmetric int8, scales computed on the fly
  from the (unchanged) fp32/bf16 params — no checkpoint or param-tree
  changes, quantization is purely a compute-mode;
- activations: dynamic symmetric scales — per-token for matmuls (rows
  factor out of the GEMM), per-tensor for convs (windows mix rows);
- accumulation in int32, rescale in fp32.

The mode is an opt-in context (``with quantized():``) consulted by
``models/layers.py`` at trace time; pipelines enable it for the UNet-scale
modules only (GroupNorm stats, softmax, schedulers, VAE stay bf16/fp32).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Tuple

import jax
import jax.numpy as jnp

_STATE = threading.local()

# quantize only GEMMs with at least this many rows (M = batch * pixels /
# tokens): tiny ops (timestep embeddings, 2x1280 denses) gain nothing and
# lose precision
MIN_ROWS = 256


def enabled() -> bool:
    return getattr(_STATE, "on", False)


@contextmanager
def quantized(on: bool = True):
    prev = enabled()
    _STATE.on = on
    try:
        yield
    finally:
        _STATE.on = prev


def quantize_module(module):
    """Proxy whose ``apply``/``init`` trace the wrapped module with int8
    compute enabled.  Surgical: only this module's convs/denses quantize."""

    class _Quantized:
        def __init__(self, inner):
            self._inner = inner

        def apply(self, *args, **kwargs):
            with quantized():
                return self._inner.apply(*args, **kwargs)

        def init(self, *args, **kwargs):
            with quantized():
                return self._inner.init(*args, **kwargs)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    return _Quantized(module)


def _quant_act(x: jnp.ndarray, per_token: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    xf = x.astype(jnp.float32)
    if per_token:
        amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    else:
        amax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quant_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel (last axis) symmetric scales."""
    wf = w.astype(jnp.float32)
    red = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(wf), axis=red)
    scale = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_conv(
    x: jnp.ndarray,  # (B, H, W, Cin), float
    w: jnp.ndarray,  # (kh, kw, Cin, Cout), float
    strides,
    padding,
) -> jnp.ndarray:
    """W8A8 NHWC conv; returns fp32 (caller casts + adds bias)."""
    xq, sx = _quant_act(x, per_token=False)
    wq, sw = _quant_weight(w)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * (sx * sw)


def int8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """W8A8 ``x @ w`` over the last axis of x; per-token activation scales.
    Returns fp32."""
    xq, sx = _quant_act(x, per_token=True)
    wq, sw = _quant_weight(w)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * sx * sw
