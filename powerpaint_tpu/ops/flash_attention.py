"""Pallas TPU flash attention (non-causal, inference).

Owns the hot self-attention of the UNet (latent-pixel sequences: 4096 tokens
at 512^2, up to 64k for outpaint canvases — reference outsources this to
torch SDPA, SURVEY.md §5.7).  Online-softmax blockwise algorithm: never
materializes the (S, S) score matrix, accumulates in fp32 VMEM scratch.

Layout: inputs (B, S, N, D) -> kernel operates on (B*N, S, D) with a
(batch*heads, q-blocks, kv-blocks) grid; kv is the innermost (sequential)
grid dimension, so the fp32 accumulators in VMEM scratch carry across kv
steps for a fixed q block.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr, *, kv_len, block_kv,
    use_exp2,
):
    """VPU-lean online softmax.  At SD head dims (D=40..160 << 128 lanes)
    the dots are cheap and the kernel is bound by the per-(q,kv)-element
    VPU work, so: the softmax scale is folded into q BEFORE the kernel
    (one op per q element instead of per s element), and the running
    denominator comes out of the PV matmul via a ones-column appended to v
    (the MXU lanes are padding anyway at D<127) — no VPU row-sum, no
    separate l scratch.  acc column D holds sum(p)-weighted ones, i.e. l."""
    kv_i = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (Bq, D) — pre-scaled
    k = k_ref[0]  # (Bk, D)
    v = v_ref[0]  # (Bk, D+1) — last column is ones

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    # mask out padded kv positions in the (only possibly ragged) final block
    if kv_len % block_kv != 0:
        kv_pos = kv_i * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        s = jnp.where(kv_pos < kv_len, s, _NEG_INF)

    m_prev = m_scr[:, :1]  # (Bq, 1)

    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    if use_exp2:
        # scores arrive in log2 units (log2(e) folded into the q scale on
        # the host side): exp(x) == exp2(x * log2 e), so the two hot
        # transcendentals become bare exp2 — the primitive exp lowers to
        # anyway — with zero extra multiplies per score element
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)  # (Bq, Bk) fp32
    else:
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # (Bq, Bk) fp32

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    pv = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Bq, D+1): output + row-sum in the last column
    acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(kv_i == num_kv - 1)
    def _finalize():
        l = acc_scr[:, -1:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:, :-1] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "block_q", "block_kv",
                              "debug_interpret", "use_exp2")
)
def _flash_bnsd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    block_q: int,
    block_kv: int,
    debug_interpret: bool = False,
    use_exp2: bool = True,
) -> jax.Array:
    """q: (G, Sq, D), k/v: (G, Sk, D) where G = batch*heads."""
    g, sq, d = q.shape
    _, skv, _ = k.shape
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(skv, block_kv)

    # fold the softmax scale into q: one multiply per q element instead of
    # one per (q, kv) score element (the kernel is VPU-bound at SD shapes);
    # exp2 mode additionally folds log2(e) here so the kernel's softmax
    # runs in log2 units (bitwise-equivalent math, cheaper transcendental)
    if use_exp2:
        scale = scale * math.log2(math.e)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    # ones column on v: the PV matmul then emits the softmax denominator in
    # its last output column (free — MXU lanes beyond D are padding anyway)
    v = jnp.concatenate(
        [v, jnp.ones((g, skv, 1), v.dtype)], axis=-1
    )

    # pad ragged sequence dims; padded q rows are sliced off after the call,
    # padded kv rows are masked inside the kernel.
    sq_pad = nq * block_q - sq
    skv_pad = nk * block_kv - skv
    if sq_pad:
        q = jnp.pad(q, ((0, 0), (0, sq_pad), (0, 0)))
    if skv_pad:
        k = jnp.pad(k, ((0, 0), (0, skv_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skv_pad), (0, 0)))

    kernel = functools.partial(
        _flash_kernel, kv_len=skv, block_kv=block_kv, use_exp2=use_exp2
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, nq * block_q, d), q.dtype),
        grid=(g, nq, nk),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_kv, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, block_kv, d + 1), lambda b, i, j: (b, j, 0),
                memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, d + 1), jnp.float32),  # acc + l column
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * sq * skv * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=g * sq * skv,
        ),
        interpret=debug_interpret,
    )(q, k, v)
    return out[:, :sq, :]


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    block_q: int = 1024,
    block_kv: int = 2048,
    debug_interpret: bool = False,
    use_exp2: bool = True,
) -> jax.Array:
    # default blocks re-tuned round 3 on v5e (scripts/perf_attn5.py sweep
    # of the VPU-lean kernel at S=4096, D=40): q1024/kv2048 measures
    # 1.48 ms/op at CFG-2 and 6.01 at CFG-8, vs 1.53/6.31 for the old
    # q2048/kv1024 — the kernel plateaus ~29 TF/s (VPU softmax floor)
    """Flash attention over (B, S, N, D) tensors (non-causal)."""
    b, sq, n, d = q.shape
    _, skv, _, _ = k.shape
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    block_q = min(block_q, max(sq, 8))
    block_kv = min(block_kv, max(skv, 8))

    def fold(x, s):
        return x.transpose(0, 2, 1, 3).reshape(b * n, s, d)

    out = _flash_bnsd(
        fold(q, sq), fold(k, skv), fold(v, skv), scale, block_q, block_kv,
        debug_interpret, use_exp2,
    )
    return out.reshape(b, n, sq, d).transpose(0, 2, 1, 3)
