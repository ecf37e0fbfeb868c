"""Implicit-GEMM Pallas conv experiment (round-3 verdict "do this" #2).

At each SD1.5 conv level, measures (amortized scan protocol):
  1. XLA NHWC conv (the production baseline, ~73 TF/s at 64x64x320);
  2. Pallas implicit-GEMM conv3x3 (ops/conv_pallas.py);
  3. XLA chain  GN -> SiLU -> conv  (the resnet hot path as XLA runs it);
  4. Pallas fused chain: normalize+SiLU as conv prologue in VMEM.

Numerics are checked against XLA before timing (bf16 inputs, f32
accumulation both sides; tolerance covers tap-order differences).

Run on the real TPU:  python scripts/perf_igemm_conv.py
Writes scripts/results_igemm_conv.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ITERS = 50
LEVELS = [
    (2, 64, 64, 320, 320),
    (2, 32, 32, 640, 640),
    (2, 16, 16, 1280, 1280),
]


def timed_scan(step, init, n=ITERS, calls=10, reps=3):
    import jax
    from jax import lax

    g = jax.jit(lambda c: lax.scan(lambda c, _: (step(c), None), c, None,
                                   length=n)[0])
    out = g(init)
    _ = np.asarray(out).ravel()[0]
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = init
        for _ in range(calls):
            out = g(out)
        _ = np.asarray(out).ravel()[0]
        best = min(best, (time.time() - t0) / (n * calls))
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp

    from powerpaint_tpu.ops import conv_pallas as cp

    assert jax.devices()[0].platform == "tpu", "run this on the TPU"

    results = []
    for b, h, w, cin, cout in LEVELS:
        flops = 2 * b * h * w * 9 * cin * cout
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
        wt = (jax.random.normal(jax.random.PRNGKey(1),
                                (3, 3, cin, cout), jnp.bfloat16) *
              jnp.bfloat16(1.0 / np.sqrt(9 * cin)))
        gamma = jnp.ones((cin,), jnp.float32) * 1.1
        beta = jnp.ones((cin,), jnp.float32) * 0.05
        groups = 32

        def xla_conv(x, wt=wt, cout=cout, cin=cin):
            y = jax.lax.conv_general_dilated(
                x, wt, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            return y if cout == cin else jnp.tile(y, (1, 1, 1, cin // cout))

        def xla_chain(x, wt=wt, gamma=gamma, beta=beta):
            xf = x.astype(jnp.float32)
            bb, hh, ww, cc = xf.shape
            xg = xf.reshape(bb, hh * ww, groups, cc // groups)
            mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.mean(jnp.square(xg - mean), axis=(1, 3),
                           keepdims=True)
            xn = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)
                  ).reshape(bb, hh, ww, cc)
            y = xn * gamma + beta
            y = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
            return xla_conv(y)

        def pallas_conv(x, wt=wt, cout=cout, cin=cin):
            y = cp.conv3x3(x, wt)
            return y if cout == cin else jnp.tile(y, (1, 1, 1, cin // cout))

        def pallas_chain(x, wt=wt, gamma=gamma, beta=beta):
            return cp.conv3x3_gn_silu(x, wt, gamma, beta, groups)

        # ---- numerics first ----
        ref = np.asarray(jax.jit(xla_conv)(x), np.float32)
        got = np.asarray(jax.jit(pallas_conv)(x), np.float32)
        err = np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9)
        ref2 = np.asarray(jax.jit(xla_chain)(x), np.float32)
        got2 = np.asarray(jax.jit(pallas_chain)(x), np.float32)
        err2 = np.max(np.abs(ref2 - got2)) / (np.max(np.abs(ref2)) + 1e-9)
        print(json.dumps({"level": f"{h}x{w}x{cin}",
                          "rel_err_conv": float(err),
                          "rel_err_chain": float(err2)}), flush=True)
        assert err < 0.05 and err2 < 0.05, "numerics mismatch"

        row = {"level": f"{h}x{w}x{cin}->{cout}", "gflops": flops / 1e9}
        for name, fn in (("xla_conv", xla_conv),
                         ("pallas_conv", pallas_conv),
                         ("xla_gn_silu_conv", xla_chain),
                         ("pallas_fused_chain", pallas_chain)):
            t = timed_scan(fn, x)
            row[name + "_us"] = round(t * 1e6, 1)
            row[name + "_tflops"] = round(flops / t / 1e12, 1)
        print(json.dumps(row), flush=True)
        results.append(row)

    out = os.path.join(REPO, "scripts", "results_igemm_conv.json")
    with open(out, "w") as f:
        json.dump({"rows": results,
                   "note": "v5e, amortized scan, bf16/f32-acc"}, f,
                  indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
