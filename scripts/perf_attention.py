"""Parameterized attention perf harness (consolidates the round-2/3
perf_attn*.py generations into one tool — round-3 verdict hygiene item).

Amortized-scan protocol (the only trustworthy one on the axon relay, see
the verify skill): jit(lax.scan(op, length=L)), queue M calls, fetch
once, divide.  Compares the XLA einsum path against the Pallas flash
kernel (current rev, exp2 softmax) across the SD1.5 hot shapes and an
optional block sweep.

    python scripts/perf_attention.py                 # default shape set
    python scripts/perf_attention.py --sweep         # + block sweep
    python scripts/perf_attention.py --shapes 2,4096,8,40 2,65536,8,40

Historical findings these runs reproduced (ROADMAP.md "ceiling" section):
the kernel is VPU-bound at ~29 TF/s for S=4096/D=40 regardless of block
shape; exp2 softmax bought ~8% micro (1.61 -> 1.48 ms/op).  Writes
scripts/results_attention.json.
"""

import argparse
import json
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


def timed_scan(op, q, k, v):
    from jax import lax

    def body(c, _):
        return op(c, k, v).astype(c.dtype), None

    g = jax.jit(lambda c: lax.scan(body, c, None, length=L)[0])
    out = g(q)
    _ = np.asarray(out).ravel()[0]
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        c = q
        for _ in range(M):
            c = g(c)
        _ = np.asarray(c).ravel()[0]
        best = min(best, (time.time() - t0) / (L * M))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", nargs="*", default=None,
                    help="B,S,N,D tuples (self-attention)")
    ap.add_argument("--sweep", action="store_true",
                    help="flash block-shape sweep at the first shape")
    args = ap.parse_args()

    from powerpaint_tpu.ops.attention import xla_attention
    from powerpaint_tpu.ops.flash_attention import flash_attention

    shapes = ([tuple(int(x) for x in s.split(",")) for s in args.shapes]
              if args.shapes else
              [(2, 4096, 8, 40), (2, 1024, 8, 80), (2, 256, 8, 160)])

    rows = []
    for b, s, n, d in shapes:
        rng = jax.random.PRNGKey(0)
        q = jax.random.normal(rng, (b, s, n, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, s, n, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, s, n, d),
                              jnp.bfloat16)
        flops = 2 * b * n * s * s * d * 2
        row = {"shape": f"B{b} S{s} N{n} D{d}"}
        for name, op in (("xla", xla_attention), ("flash", flash_attention)):
            try:
                t = timed_scan(op, q, k, v)
            except Exception as e:  # kernel rejects shape
                row[name] = f"error: {type(e).__name__}"
                continue
            row[f"{name}_us"] = round(t * 1e6, 1)
            row[f"{name}_tflops"] = round(flops / t / 1e12, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.sweep:
        b, s, n, d = shapes[0]
        rng = jax.random.PRNGKey(0)
        q = jax.random.normal(rng, (b, s, n, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, s, n, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, s, n, d),
                              jnp.bfloat16)
        flops = 2 * b * n * s * s * d * 2
        for bq in (512, 1024, 2048):
            for bkv in (512, 1024, 2048, 4096):
                if bq > s or bkv > s:
                    continue

                def op(qq, kk, vv, bq=bq, bkv=bkv):
                    return flash_attention(qq, kk, vv, block_q=bq,
                                           block_kv=bkv)

                try:
                    t = timed_scan(op, q, k, v)
                except Exception as e:
                    print(f"bq{bq} bkv{bkv}: {type(e).__name__}")
                    continue
                row = {"sweep": f"bq{bq}_bkv{bkv}",
                       "us": round(t * 1e6, 1),
                       "tflops": round(flops / t / 1e12, 1)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    out = os.path.join(REPO, "scripts", "results_attention.json")
    with open(out, "w") as f:
        json.dump({"rows": rows,
                   "note": "v5e, amortized scan L=20 M=5, bf16"}, f,
                  indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
