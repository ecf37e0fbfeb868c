"""Probe: int8 MXU throughput vs bf16 at SD1.5 shapes, + fused-QKV gain.

v5e int8 peak is ~2x bf16 — if XLA lowers int8 convs/dots onto the MXU,
a W8A8 dynamic-quantized UNet mode roughly halves the matmul-bound step
time.  This measures the primitive-level reality before building it.

Remote-relay measurement rules: per-call dispatch costs ~2-4ms RPC, so
every probe chains ITERS iterations inside ONE jitted lax.scan and the
fence is a host fetch of the carry.
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

rng = jax.random.PRNGKey(0)
ITERS = 50


def timed_scan(name, step, init, flops_per_iter, n=ITERS, calls=10, reps=3):
    """step: carry -> carry, chained n times inside one executable.

    Queues `calls` executions back-to-back and fetches ONLY the last —
    the ~110 ms fixed per-execution overhead pipelines away only across
    queued calls (a per-call fetch floors every result at ~2 ms/iter)."""
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
    rec = {"name": name, "us": round(best * 1e6, 1),
           "tflops": round(flops_per_iter / best / 1e12, 1)}
    print(json.dumps(rec), flush=True)


# --- raw dot: bf16 vs int8 (square weights so the chain closes) ---
for m, c in [(8192, 320), (2048, 640), (512, 1280)]:
    w16 = jax.random.normal(rng, (c, c), jnp.bfloat16) * 0.03
    w8 = (jax.random.normal(rng, (c, c)) * 30).astype(jnp.int8)
    x16 = jax.random.normal(rng, (m, c), jnp.bfloat16)
    flops = 2 * m * c * c

    timed_scan(f"dot_bf16_{m}x{c}x{c}",
               lambda x: jnp.tanh(jnp.dot(x, w16)), x16, flops)

    def int8_step(x):
        # keep carry int8: requantize the int32 result cheaply
        y = jnp.dot(x, w8, preferred_element_type=jnp.int32)
        return (y >> 8).astype(jnp.int8)

    x8 = (jax.random.normal(rng, (m, c)) * 30).astype(jnp.int8)
    timed_scan(f"dot_int8_{m}x{c}x{c}", int8_step, x8, flops)

# --- conv: bf16 vs int8 vs W8A8-dynamic at each UNet level ---
for b, h, w_, c in [(2, 64, 64, 320), (2, 32, 32, 640), (2, 16, 16, 1280),
                    (2, 8, 8, 1280)]:
    wb = jax.random.normal(rng, (3, 3, c, c), jnp.bfloat16) * 0.02
    w8 = (jax.random.normal(rng, (3, 3, c, c)) * 30).astype(jnp.int8)
    xb = jax.random.normal(rng, (b, h, w_, c), jnp.bfloat16)
    flops = 2 * b * h * w_ * 9 * c * c
    tag = f"{h}x{w_}x{c}"

    def bconv(x):
        return jnp.tanh(jax.lax.conv_general_dilated(
            x, wb, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")))

    timed_scan(f"conv_bf16_{tag}", bconv, xb, flops)

    def iconv(x):
        y = jax.lax.conv_general_dilated(
            x, w8, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y >> 10).astype(jnp.int8)

    x8 = (jax.random.normal(rng, (b, h, w_, c)) * 30).astype(jnp.int8)
    try:
        timed_scan(f"conv_int8_{tag}", iconv, x8, flops)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"name": f"conv_int8_{tag}",
                          "error": str(e)[:160]}), flush=True)

    def qconv(x):
        """W8A8 with on-the-fly symmetric quantization (the real mode)."""
        sx = jnp.maximum(jnp.max(jnp.abs(x)), 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                      ).astype(jnp.int8)
        sw = jnp.maximum(jnp.max(jnp.abs(wb), axis=(0, 1, 2)), 1e-6) / 127.0
        wq = jnp.clip(jnp.round(wb.astype(jnp.float32) / sw), -127, 127
                      ).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.tanh(y.astype(jnp.float32) * (sx * sw)
                        ).astype(jnp.bfloat16)

    try:
        timed_scan(f"conv_w8a8dyn_{tag}", qconv, xb, flops)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"name": f"conv_w8a8dyn_{tag}",
                          "error": str(e)[:160]}), flush=True)

# --- fused qkv projection vs three separate (self-attention shapes) ---
for s, c in [(4096, 320), (1024, 640), (256, 1280), (64, 1280)]:
    x = jax.random.normal(rng, (2, s, c), jnp.bfloat16)
    w3 = [jax.random.normal(rng, (c, c), jnp.bfloat16) * 0.02
          for _ in range(3)]
    wf = jnp.concatenate(w3, axis=1)
    flops = 3 * 2 * 2 * s * c * c

    def three(x):
        q, k, v = (jnp.dot(x, w3[0]), jnp.dot(x, w3[1]), jnp.dot(x, w3[2]))
        return jnp.tanh(q + k + v)

    def fused(x):
        q, k, v = jnp.split(jnp.dot(x, wf), 3, axis=-1)
        return jnp.tanh(q + k + v)

    timed_scan(f"qkv_three_{s}x{c}", three, x, flops)
    timed_scan(f"qkv_fused_{s}x{c}", fused, x, flops)
