"""Attention ops.

The reference leans on torch/diffusers ``Attention`` processors (cuDNN/SDPA);
here attention is owned natively: a Pallas flash-attention kernel for TPU
self-attention over latent pixels (seq up to 64k for 4x outpaint canvases,
SURVEY.md §5.7) and an XLA einsum path for short-kv cross-attention (77 text
tokens) and for CPU test backends.

Layout convention: (batch, seq, heads, head_dim) — "BSNH".
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at trace time
        return False


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
) -> jax.Array:
    """Plain softmax attention, fp32 softmax accumulation.

    q: (B, Sq, N, D); k, v: (B, Sk, N, D).  Returns (B, Sq, N, D) in q.dtype.
    """
    *_, d = q.shape
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    logits = jnp.einsum(
        "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bnqk,bknd->bqnd",
        probs.astype(v.dtype),
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jax.Array:
    """Dispatch: Pallas flash attention on TPU for long self-attention,
    XLA einsum otherwise (short kv / CPU)."""
    if use_flash is None:
        import os

        env = os.environ.get("POWERPAINT_FLASH", "auto")
        if env == "0":
            use_flash = False
        elif env == "1":
            use_flash = _on_tpu()
        else:
            # flash pays off for long kv; cross-attention kv=77 stays on XLA
            use_flash = _on_tpu() and k.shape[1] >= 512 and q.shape[1] >= 512
    if use_flash:
        from powerpaint_tpu.ops import flash_attention as fa

        try:
            return fa.flash_attention(q, k, v, scale=scale)
        except Exception:
            # fall back to XLA if the kernel rejects this shape
            return xla_attention(q, k, v, scale=scale)
    return xla_attention(q, k, v, scale=scale)
