"""Static-scale int8 (W8A8) conv micro-bench — the last named perf lever.

Round-4 verdict item 3 / ROADMAP "remaining levers": round 2's DYNAMIC
W8A8 was 2.6x slower (unfused absmax/rescale sweeps) and was removed; the
one plausible route left was a SmoothQuant-style STATIC-scale path with
quantization fused into the Pallas conv (ops/conv_pallas.py::
conv3x3_int8 / conv3x3_gn_silu_int8 — quantize rides the slab load, int8
dots on the MXU at 2x the bf16 rate, dequant in the epilogue).

Measures the dominant SD1.5 UNet conv shapes at 512^2 serving (CFG batch
2) in five modes: XLA bf16, Pallas bf16, Pallas bf16+GN-prologue, Pallas
int8, Pallas int8+GN-prologue.  Protocol: jit(lax.scan(body, length=L)),
M dispatches queued, one fetch (the only reliable fence on the axon
relay is a host fetch — see .claude/skills/verify).

Run on the real TPU:  python scripts/perf_int8_conv.py
Writes scripts/results_int8_conv.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

L = 20  # scan length
M = 10  # queued dispatches

# (B, H, W, C): square in/out channels so the scan can chain
SHAPES = [
    (2, 64, 64, 320),
    (2, 32, 32, 640),
    (2, 16, 16, 1280),
    (2, 8, 8, 1280),
]


def timed_scan(fn, x, n_ops=L, m=M):
    import jax

    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), None

        y, _ = jax.lax.scan(body, x, None, length=n_ops)
        return y

    np.asarray(run(x))  # compile + warm
    t0 = time.time()
    outs = [run(x) for _ in range(m)]
    np.asarray(outs[-1])  # single fence
    dt = time.time() - t0
    return dt / (m * n_ops)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from powerpaint_tpu.ops.conv_pallas import (
        conv3x3,
        conv3x3_gn_silu,
        conv3x3_gn_silu_int8,
        conv3x3_int8,
        quantize_weights_int8,
    )

    assert jax.devices()[0].platform == "tpu", "run this on the TPU"
    rows = []
    for b, h, w, c in SHAPES:
        k = jax.random.PRNGKey(0)
        x = jax.random.normal(k, (b, h, w, c), jnp.bfloat16)
        wt = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c),
                                jnp.float32) / np.sqrt(9 * c))
        wt_bf = wt.astype(jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        w_q, w_s = quantize_weights_int8(wt)
        x_scale = 3.0 / 127.0  # static: activations ~N(0,1)
        groups = 32
        flops = 2 * b * h * w * 9 * c * c

        def xla_conv(xx):
            return jax.lax.conv_general_dilated(
                xx, wt_bf, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(xx.dtype)

        modes = {
            "xla_bf16": xla_conv,
            "pallas_bf16": functools.partial(conv3x3, w=wt_bf),
            "pallas_bf16_gn": lambda xx: conv3x3_gn_silu(
                xx, wt_bf, gamma, beta, groups),
            "pallas_int8": lambda xx: conv3x3_int8(xx, w_q, w_s, x_scale),
            "pallas_int8_gn": lambda xx: conv3x3_gn_silu_int8(
                xx, w_q, w_s, gamma, beta, groups, x_scale),
        }
        row = {"shape": f"b{b}_{h}x{w}x{c}", "flops": flops}
        for name, fn in modes.items():
            try:
                dt = timed_scan(fn, x)
                row[f"{name}_ms"] = round(dt * 1e3, 4)
                row[f"{name}_tflops"] = round(flops / dt / 1e12, 1)
            except Exception as e:  # record the failure, keep sweeping
                row[f"{name}_error"] = str(e)[:160]
        # quantization error on this shape (bf16 exact vs int8)
        exact = np.asarray(xla_conv(x), np.float32)
        q = np.asarray(conv3x3_int8(x, w_q, w_s, x_scale), np.float32)
        row["int8_rel_err"] = round(
            float(np.abs(q - exact).mean() / (np.abs(exact).mean() + 1e-8)),
            5,
        )
        print(json.dumps(row), flush=True)
        rows.append(row)
    out = os.path.join(REPO, "scripts", "results_int8_conv.json")
    with open(out, "w") as f:
        json.dump({"int8_conv": rows, "note":
                   "v5e, scan L=20 M=10 protocol, static x_scale 3/127, "
                   "per-out-channel int8 weights"}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
