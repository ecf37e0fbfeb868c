"""Ring (context-parallel) self-attention over a device mesh.

SURVEY.md §5.7's sequence-parallel landing spot: 4x outpaint canvases reach
2048px -> 65k latent tokens, where even O(S)-memory flash attention on one
chip wastes the mesh.  Here the SEQUENCE axis is sharded over the mesh's
data axis and K/V shards rotate around the ring with ``jax.lax.ppermute``
(one ICI hop per step, compute/communication overlapped by XLA), while each
device folds incoming blocks into an online-softmax accumulator — the
blockwise/ring-attention construction, expressed with jax collectives
instead of NCCL.

Layout: (B, S, N, D) like ops/attention.py; S must divide by the axis size.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _block_attend(q, k, v, scale, m, l, acc):
    """Fold one K/V block into the online-softmax state.

    q: (B, Sq, N, D); k/v: (B, Sk, N, D);
    m/l: (B, N, Sq, 1) running max / normalizer; acc: (B, Sq, N, D).
    """
    s = jnp.einsum(
        "bqnd,bknd->bnqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)  # (B, N, Sq, 1)
    l = l * corr + p.sum(axis=-1, keepdims=True)
    pv = jnp.einsum(
        "bnqk,bknd->bqnd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    acc = acc * jnp.transpose(corr, (0, 2, 1, 3)) + pv
    return m_new, l, acc


def ring_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "data",
    scale: Optional[float] = None,
) -> jax.Array:
    """Full (non-causal) self-attention with the sequence axis sharded over
    ``axis``.  Returns the same sharding as q.  Exact (online softmax), not
    an approximation — matches xla_attention to fp32 tolerance."""
    *_, d = q.shape
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    n_shards = mesh.shape[axis]
    spec = P(None, axis, None, None)

    def local(q, k, v):
        b, sq, n, dd = q.shape
        m = jnp.full((b, n, sq, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((b, n, sq, 1), jnp.float32)
        acc = jnp.zeros((b, sq, n, dd), jnp.float32)
        qf = q.astype(jnp.float32)
        kb, vb = k, v
        for hop in range(n_shards):
            m, l, acc = _block_attend(qf, kb, vb, scale, m, l, acc)
            if hop + 1 < n_shards:
                perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
                kb = jax.lax.ppermute(kb, axis, perm)
                vb = jax.lax.ppermute(vb, axis, perm)
        out = acc / jnp.transpose(l, (0, 2, 1, 3))
        return out.astype(q.dtype)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    fn = shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )
    sharding = NamedSharding(mesh, spec)
    q = jax.lax.with_sharding_constraint(q, sharding)
    k = jax.lax.with_sharding_constraint(k, sharding)
    v = jax.lax.with_sharding_constraint(v, sharding)
    return fn(q, k, v)
