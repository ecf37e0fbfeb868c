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
import threading
from contextlib import contextmanager
from typing import Optional

import jax
import jax.numpy as jnp

_RING_STATE = threading.local()


@contextmanager
def ring_context(mesh, axis: str = "data", min_seq: int = 8192):
    """Enable context-parallel (ring) self-attention at trace time.

    While active, ``attention()`` routes self-attention whose sequence is
    at least ``min_seq`` tokens through ``ops.ring_attention`` with the
    sequence axis sharded over ``mesh[axis]`` — the SURVEY.md §5.7
    sequence-parallel path for >1k² outpaint canvases.  Cross-attention
    (kv = 77 text tokens) is unaffected.
    """
    prev = getattr(_RING_STATE, "cfg", None)
    _RING_STATE.cfg = (mesh, axis, min_seq)
    try:
        yield
    finally:
        _RING_STATE.cfg = prev


def _ring_cfg():
    return getattr(_RING_STATE, "cfg", None)


def sp_hint(x: jax.Array) -> jax.Array:
    """Sequence-parallel sharding hint for (B, H, W, C) activations.

    No-op unless a ``ring_context`` is active.  Shards latent rows over
    the mesh axis when H divides the axis size, otherwise pins the tensor
    REPLICATED.  The explicit replication matters: letting GSPMD infer
    shardings for the deep UNet levels (H smaller than the axis) makes it
    propagate padded non-divisible shardings into the denoise ``lax.scan``,
    which miscompiles on XLA:CPU (verified: 4-level UNet in a scan with a
    row-sharded output diverges ~0.3 while the identical unrolled program
    is exact).  Pinning each level's boundary sidesteps the inference.
    """
    ring = _ring_cfg()
    if ring is None or x.ndim < 2:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh, axis, _ = ring
    n = mesh.shape[axis]
    if x.shape[1] % n == 0:
        spec = P(None, axis)
    else:
        spec = P()
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


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
    """Dispatch: ring attention for mesh-sharded long self-attention
    (under ``ring_context``), Pallas flash attention on TPU for long
    self-attention, XLA einsum otherwise (short kv / CPU)."""
    ring = _ring_cfg()
    if (
        ring is not None
        and k.shape[1] == q.shape[1]  # self-attention only
        and q.shape[1] >= ring[2]
        and q.shape[1] % ring[0].shape[ring[1]] == 0
    ):
        from powerpaint_tpu.ops.ring_attention import ring_self_attention

        return ring_self_attention(
            q, k, v, mesh=ring[0], axis=ring[1], scale=scale
        )
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
