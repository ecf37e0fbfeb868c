"""bf16-softmax flash-kernel experiment (round-4 MFU hunt, last VPU lever).

The in-graph subtraction (results_xattn_e2e.json) pinned the Pallas flash
self-attention at 5.7 ms/step — a custom call is a fusion barrier, so any
kernel win lands 1:1 end-to-end.  The kernel's floor is the per-(q,kv)-
element VPU softmax: max-reduce, subtract, exp2, f32->bf16 cast.  Two of
those might be cheap to attack at once by running the element work in
bf16: v5e VPU packs 2 bf16 lanes per f32 lane (potentially 2x rate if
Mosaic vectorizes it), and p is then already in the MXU's input dtype —
the cast disappears.

This measures a script-local kernel variant (scores cast to bf16 before
max/sub/exp2, bf16 running-max scratch, p fed to the PV dot uncast)
against the production f32-softmax kernel at the SD1.5 hot shapes, plus
max-abs output error vs an f32 reference.  Integration into the product
kernel only if BOTH the micro wins AND the error stays in bf16-noise
range (the model runs end-to-end in bf16 anyway).

Run on the real TPU: python scripts/perf_attn_bf16.py
"""
import functools
import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

_NEG_INF_BF16 = -3e38  # finite in bf16 range


def _bf16_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr, *, kv_len,
                 block_kv):
    kv_i = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF_BF16)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    # Mosaic requires 32-bit matmul accumulators, so the dot emits f32 and
    # one cast moves the element work to packed-lane bf16 — this replaces
    # the production kernel's p-cast (f32->bf16 before the PV dot), so the
    # cast count is unchanged while max/sub/exp2 run on bf16 vectors
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)

    if kv_len % block_kv != 0:
        kv_pos = kv_i * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        s = jnp.where(kv_pos < kv_len, s, _NEG_INF_BF16)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2((m_prev - m_new).astype(jnp.float32))
    p = jnp.exp2(s - m_new)  # bf16 in, bf16 out — no cast before the dot
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    pv = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(kv_i == num_kv - 1)
    def _finalize():
        l = acc_scr[:, -1:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:, :-1] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_bf16(q, k, v, scale, block_q, block_kv):
    g, sq, d = q.shape
    _, skv, _ = k.shape
    nq = pl.cdiv(sq, block_q)
    nk = pl.cdiv(skv, block_kv)
    scale = scale * math.log2(math.e)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    v = jnp.concatenate([v, jnp.ones((g, skv, 1), v.dtype)], axis=-1)
    kernel = functools.partial(_bf16_kernel, kv_len=skv, block_kv=block_kv)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g, nq * block_q, d), q.dtype),
        grid=(g, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_kv, d + 1), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.bfloat16),
            pltpu.VMEM((block_q, d + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(q, k, v)
    return out[:, :sq, :]


L, M = 20, 5


def bench(fn, q, k, v):
    """Amortized-scan protocol (perf_attention.py): jit(scan(op, L)) with
    the output chained back as q — a data dependency per iteration, so no
    relay/dispatch dedup can fake the number — queue M calls, fetch once."""
    def body(c, _):
        return fn(c, k, v).astype(c.dtype), None

    g = jax.jit(lambda c: jax.lax.scan(body, c, None, length=L)[0])
    out = g(q)
    _ = np.asarray(out).ravel()[0]
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        c = q
        for _ in range(M):
            c = g(c)
        _ = np.asarray(c).ravel()[0]
        best = min(best, (time.time() - t0) / (L * M) * 1000)
    return best


def main():
    assert jax.devices()[0].platform == "tpu"
    from powerpaint_tpu.ops.flash_attention import _flash_bnsd

    rows = []
    for tag, g, s, d in [("S4096_D40_cfg2", 16, 4096, 40),
                         ("S1024_D80_cfg2", 16, 1024, 80),
                         ("S4096_D40_b8", 128, 4096, 40)]:
        rng = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(rng, 3)
        q = jax.random.normal(kq, (g, s, d), jnp.bfloat16)
        k = jax.random.normal(kk, (g, s, d), jnp.bfloat16)
        v = jax.random.normal(kv, (g, s, d), jnp.bfloat16)
        scale = 1.0 / math.sqrt(d)
        bq, bk = min(1024, s), min(2048, s)

        ms_f32 = bench(lambda a, b, c: _flash_bnsd(a, b, c, scale, bq, bk),
                       q, k, v)
        ms_bf16 = bench(lambda a, b, c: _flash_bf16(a, b, c, scale, bq, bk),
                        q, k, v)

        # error vs f32 softmax reference (dense, fp32) — on a 2-head slice
        # to keep the (S, S) score matrix HBM-cheap at every shape
        qs, ks, vs = q[:2], k[:2], v[:2]
        qf, kf, vf = (x.astype(jnp.float32) for x in (qs, ks, vs))
        ref = jax.nn.softmax(
            jnp.einsum("gsd,gtd->gst", qf, kf) * scale, axis=-1
        ) @ vf
        err_f32 = float(jnp.max(jnp.abs(
            _flash_bnsd(qs, ks, vs, scale, bq, bk).astype(jnp.float32)
            - ref)))
        err_bf16 = float(jnp.max(jnp.abs(
            _flash_bf16(qs, ks, vs, scale, bq, bk).astype(jnp.float32)
            - ref)))

        flops = 4 * g * s * s * d
        rec = {"shape": tag, "f32sm_ms": round(ms_f32, 3),
               "bf16sm_ms": round(ms_bf16, 3),
               "f32sm_tfs": round(flops / ms_f32 / 1e9, 1),
               "bf16sm_tfs": round(flops / ms_bf16 / 1e9, 1),
               "maxerr_f32sm": round(err_f32, 5),
               "maxerr_bf16sm": round(err_bf16, 5)}
        print(json.dumps(rec), flush=True)
        rows.append(rec)

    out = os.path.join(REPO, "scripts", "results_attn_bf16.json")
    with open(out, "w") as f:
        json.dump({"rows": rows, "note": "v5e, flash kernel f32-softmax "
                   "(production) vs bf16-softmax variant, q1024/kv2048, "
                   "amortized scan L=20 x M=5 queued, best of 3; maxerr vs "
                   "dense fp32 softmax on a 2-head slice"}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
