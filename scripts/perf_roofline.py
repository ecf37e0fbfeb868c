"""Per-op roofline accounting for a v1/v2 UNet step (round-3 verdict Weak #2).

For every hot conv/attention shape in an SD1.5 CFG-2 step this measures
achieved TF/s (amortized lax.scan protocol — isolated dispatches lie on
the relay) and computes the analytic roofline bound:

    AI   = FLOPs / HBM bytes          (bf16 activations + weights)
    bound = min(PEAK_TFLOPS, AI * HBM_BW)

so every "structural ceiling" claim in ROADMAP.md cites a measured row
with its compute-vs-HBM classification, instead of being asserted.

v5e peak numbers (public spec): 197 TF/s bf16, 819 GB/s HBM.

Run on the real TPU:  python scripts/perf_roofline.py
Writes scripts/results_roofline.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PEAK_TFLOPS = 197.0  # v5e bf16
HBM_GBPS = 819.0

ITERS = 50


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


def row(name, kind, t_s, flops, bytes_, count, extra=None):
    ai = flops / bytes_
    bound_tf = min(PEAK_TFLOPS, ai * HBM_GBPS / 1e3)
    achieved = flops / t_s / 1e12
    r = {
        "name": name,
        "kind": kind,
        "count_per_step": count,
        "us": round(t_s * 1e6, 1),
        "gflops": round(flops / 1e9, 2),
        "mbytes": round(bytes_ / 1e6, 2),
        "ai_flop_per_byte": round(ai, 1),
        "bound": "compute" if ai * HBM_GBPS / 1e3 >= PEAK_TFLOPS else "hbm",
        "roofline_tflops": round(bound_tf, 1),
        "achieved_tflops": round(achieved, 1),
        "pct_of_roofline": round(100 * achieved / bound_tf, 1),
        "total_ms_per_step": round(count * t_s * 1e3, 3),
    }
    if extra:
        r.update(extra)
    print(json.dumps(r), flush=True)
    return r


# --------------------------------------------------------------------------
# conv shapes of one SD1.5 UNet forward (CFG batch 2), with per-step counts
# counted from models/blocks.py wiring (down 2 resnets/level + mid 2 +
# up 3/level; each resnet = conv1 + conv2; channel-changing convs and the
# up-path concat convs are folded into same-level equivalents by FLOPs)
# --------------------------------------------------------------------------

# (B, H, W, Cin, Cout, count/step) stride-1 3x3
CONVS = [
    (2, 64, 64, 320, 320, 12),    # level-0 resnets (down 4, up 6) + io
    (2, 64, 64, 640, 320, 4),     # up-path concat convs at level 0
    (2, 32, 32, 640, 640, 12),
    (2, 32, 32, 1280, 640, 4),
    (2, 16, 16, 1280, 1280, 14),
    (2, 16, 16, 2560, 1280, 4),
    (2, 8, 8, 1280, 1280, 10),    # level-3 + mid resnets
]

# attention: (S_q, S_kv, heads, head_dim, count/step) — per-level self and
# cross attention inside the 16 transformer blocks, CFG batch 2
ATTN = [
    (4096, 4096, 8, 40, 4),   # 64x64 self (down 2, up 2... level-0 blocks)
    (4096, 77, 8, 40, 4),
    (1024, 1024, 8, 80, 6),
    (1024, 77, 8, 80, 6),
    (256, 256, 8, 160, 7),    # 16x16 blocks + mid
    (256, 77, 8, 160, 7),
]

# transformer GEMMs (qkv/out projections + geglu FF), folded per level:
# (S, C, count/step): each block does ~4 C*C projections + FF 8*C*C
GEMMS = [
    (4096, 320, 4),
    (1024, 640, 6),
    (256, 1280, 7),
]


def conv_flops(b, h, w, cin, cout):
    return 2 * b * h * w * 9 * cin * cout


def conv_bytes(b, h, w, cin, cout):
    return 2 * (b * h * w * cin + 9 * cin * cout + b * h * w * cout)


def attn_flops(b, sq, skv, heads, d):
    return 2 * b * heads * sq * skv * d * 2  # QK^T + PV


def attn_bytes(b, sq, skv, heads, d):
    # q, k, v read + out write, bf16 (flash: no materialized S matrix)
    return 2 * b * heads * (sq * d * 2 + skv * d * 2 + sq * d)


def main() -> None:
    import jax
    import jax.numpy as jnp

    assert jax.devices()[0].platform == "tpu", "run this on the TPU"
    from powerpaint_tpu.ops.attention import attention as ppt_attention

    rows = []

    for b, h, w, cin, cout, count in CONVS:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin),
                              jnp.bfloat16)
        wt = jax.random.normal(jax.random.PRNGKey(1), (3, 3, cin, cout),
                               jnp.bfloat16) * 0.02

        def step(x, wt=wt, cin=cin, cout=cout):
            y = jax.lax.conv_general_dilated(
                x, wt, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            if cin != cout:  # keep the carry shape: fold back down
                y = jnp.concatenate([y] * (cin // cout), axis=-1)
            return y

        t = timed_scan(step, x)
        rows.append(row(f"conv3x3 {h}x{w} {cin}->{cout}", "conv", t,
                        conv_flops(b, h, w, cin, cout),
                        conv_bytes(b, h, w, cin, cout), count))

    for sq, skv, heads, d, count in ATTN:
        b = 2
        # repo attention layout: (B, S, heads, D)
        q = jax.random.normal(jax.random.PRNGKey(0), (b, sq, heads, d),
                              jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (b, skv, heads, d),
                              jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (b, skv, heads, d),
                              jnp.bfloat16)

        def step(q, k=k, v=v):
            return ppt_attention(q, k, v)

        t = timed_scan(step, q)
        rows.append(row(f"attn S={sq} KV={skv} D={d}", "attention", t,
                        attn_flops(b, sq, skv, heads, d),
                        attn_bytes(b, sq, skv, heads, d), count))

    for s, c, count in GEMMS:
        b = 2
        x = jax.random.normal(jax.random.PRNGKey(0), (b * s, c),
                              jnp.bfloat16)
        wt = jax.random.normal(jax.random.PRNGKey(1), (c, c),
                               jnp.bfloat16) * 0.02

        def step(x, wt=wt):
            return jnp.dot(x, wt,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        t = timed_scan(step, x)
        # per block: qkvo ~ 4 CxC (self) + ~2.4 CxC (cross, kv on 77) +
        # FF geglu ~ 12 CxC -> fold as 18 CxC-equivalents per block
        rows.append(row(f"gemm {b*s}x{c}x{c}", "gemm", t,
                        2 * b * s * c * c,
                        2 * (b * s * c * 2 + c * c), count * 18,
                        extra={"note": "count = blocks x 18 CxC-equivalents"}))

    accounted = sum(r["total_ms_per_step"] for r in rows)
    out = {
        "peak_tflops": PEAK_TFLOPS,
        "hbm_gbps": HBM_GBPS,
        "rows": rows,
        "accounted_ms_per_v1like_step": round(accounted, 2),
        "note": ("amortized lax.scan protocol, v5e, bf16, CFG batch 2; "
                 "bound = min(peak, AI*BW); v1 step measured ~21-24 ms "
                 "(BENCH_r03 23.7 median)"),
    }
    path = os.path.join(REPO, "scripts", "results_roofline.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
