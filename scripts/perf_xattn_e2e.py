"""In-graph cross-attention cost + layout variants (round-4 MFU hunt).

The r4 roofline micros put the kv=77 cross-attention rows at 2-4% of
their HBM roofline (scripts/results_roofline.json) — ~5.7 ms/step if the
micros held in-graph, which would be ~28% of a 20.5 ms v1 UNet forward
spent on 0.8 GFLOP.  Micros overstate (XLA fuses in-graph), so this
harness measures the REAL in-graph cost by stand-in subtraction, then
tries layout variants end-to-end:

  baseline        current dispatch (xla_attention, bnqk einsum layout)
  xattn_cheap     cross-attn -> q + eps*(k+v reductions): the delta vs
                  baseline is the true in-graph cross-attn cost
  selfattn_cheap  same for self-attn: bounds the flash kernel's share
  xattn_bqnk      logits einsum 'bqnd,bknd->bqnk' (no bnqk transpose of
                  the big q/out tensors; softmax over minormost kv)
  xattn_bf16sm    bnqk layout but bf16 logits + bf16 softmax (VPU half
                  the f32 element count; accuracy NOT evaluated here)

Protocol: jit(lax.scan(full v1 UNet fwd, length=20)) x M queued calls,
best of 3 — identical to perf_fusedconv_e2e.py so numbers compare.

Run on the real TPU: python scripts/perf_xattn_e2e.py
"""
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

L, M = 20, 5

from powerpaint_tpu.ops import attention as attn_mod

BASELINE_ATTENTION = attn_mod.attention


def _cheap(q, k, v):
    # keeps the k/v projections alive (so XLA can't DCE them) at ~zero cost
    red = jnp.sum(k, axis=1, keepdims=True) + jnp.sum(v, axis=1, keepdims=True)
    return q + jnp.asarray(1e-8, q.dtype) * red


def xattn_cheap(q, k, v, **kw):
    if k.shape[1] != q.shape[1]:
        return _cheap(q, k, v)
    return BASELINE_ATTENTION(q, k, v, **kw)


def selfattn_cheap(q, k, v, **kw):
    if k.shape[1] == q.shape[1]:
        return _cheap(q, k, v)
    return BASELINE_ATTENTION(q, k, v, **kw)


def _bqnk(q, k, v, bf16_softmax=False):
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    acc = jnp.bfloat16 if bf16_softmax else jnp.float32
    logits = jnp.einsum("bqnd,bknd->bqnk", q, k, preferred_element_type=acc)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum(
        "bqnk,bknd->bqnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def xattn_bqnk(q, k, v, **kw):
    if k.shape[1] != q.shape[1]:
        return _bqnk(q, k, v)
    return BASELINE_ATTENTION(q, k, v, **kw)


def xattn_bf16sm(q, k, v, **kw):
    if k.shape[1] != q.shape[1]:
        return _bqnk(q, k, v, bf16_softmax=True)
    return BASELINE_ATTENTION(q, k, v, **kw)


def xattn_flash(q, k, v, **kw):
    if k.shape[1] != q.shape[1]:
        from powerpaint_tpu.ops import flash_attention as fa

        # kv=77 -> a single ragged kv block; q/out transposes dominate the
        # kernel's memory traffic, everything else stays in VMEM
        return fa.flash_attention(q, k, v, scale=kw.get("scale"))
    return BASELINE_ATTENTION(q, k, v, **kw)


VARIANTS = {
    "baseline": BASELINE_ATTENTION,
    "xattn_cheap": xattn_cheap,
    "selfattn_cheap": selfattn_cheap,
    "xattn_bqnk": xattn_bqnk,
    "xattn_bf16sm": xattn_bf16sm,
    "xattn_flash": xattn_flash,
}


def measure(tag, fn):
    import powerpaint_tpu.models.transformer as tr

    tr.attention = fn  # module-level rebind; new jit below retraces
    from powerpaint_tpu.core.config import ppt_v1_config
    from powerpaint_tpu.models.unet import UNet2DConditionModel

    cfg = ppt_v1_config()
    unet = UNet2DConditionModel(cfg.unet, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (2, 64, 64, 9), jnp.bfloat16)
    ctx = jax.random.normal(rng, (2, 77, 768), jnp.bfloat16)
    params = jax.jit(unet.init)(rng, sample, jnp.array([0]), ctx)

    @jax.jit
    def run(p, s):
        def body(c, _):
            y = unet.apply(p, jnp.concatenate(
                [c, sample[..., 4:]], axis=-1), jnp.int32(500), ctx)
            return y.astype(c.dtype), ()
        c, _ = jax.lax.scan(body, s, None, length=L)
        return c

    s0 = sample[..., :4]
    out = run(params, s0)
    _ = np.asarray(out).ravel()[:1]
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        c = s0
        for _ in range(M):
            c = run(params, c)
        _ = np.asarray(c).ravel()[:1]
        best = min(best, (time.time() - t0) / (M * L) * 1000)
    rec = {"variant": tag, "unet_fwd_ms": round(best, 2)}
    print(json.dumps(rec), flush=True)
    tr.attention = BASELINE_ATTENTION
    return rec


def main():
    assert jax.devices()[0].platform == "tpu"
    rows = [measure(tag, fn) for tag, fn in VARIANTS.items()]
    # repeat baseline to bound machine drift
    rows.append(measure("baseline_rep2", BASELINE_ATTENTION))
    out = os.path.join(REPO, "scripts", "results_xattn_e2e.json")
    with open(out, "w") as f:
        json.dump({"rows": rows, "note": "v5e, full v1 UNet fwd, CFG b2, "
                   "scan L=20 x M=5 queued, best of 3"}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
