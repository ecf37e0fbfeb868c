"""Conv formulation sweep at SD1.5 UNet shapes (the ~55%-MXU stack).

Compares, per resolution level: XLA NHWC conv (fp32 vs bf16 accumulation)
and im2col+GEMM, to find headroom vs the conv ceiling.

Relay protocol: every variant is chained ITERS times inside ONE jitted
lax.scan (per-dispatch RPC is ~2-4 ms and does NOT pipeline below that;
isolated sub-ms kernels are unmeasurable outside a scan).
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

rng = jax.random.PRNGKey(0)
ITERS = 50

# (B, H, W, Cin, Cout) stride-1 3x3 convs at each UNet level (CFG batch 2)
LEVELS = [
    (2, 64, 64, 320, 320),
    (2, 32, 32, 640, 640),
    (2, 16, 16, 1280, 1280),
    (2, 8, 8, 1280, 1280),
]


def timed_scan(name, step, init, flops_per_iter, n=ITERS, calls=10, reps=3):
    # Queue `calls` executions back-to-back and fetch ONLY the last: the
    # ~110 ms fixed per-execution overhead on the relay pipelines away
    # only across queued calls (fetching per call floors you at ~2 ms/iter).
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


def conv_f32acc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


def conv_bf16acc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def im2col_conv(x, w):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, dy:dy + h, dx:dx + wd, :]
        for dy in range(3) for dx in range(3)
    ]
    patches = jnp.concatenate(cols, axis=-1).reshape(b * h * wd, 9 * cin)
    wm = w.reshape(9 * cin, cout)
    y = jnp.dot(patches, wm, preferred_element_type=jnp.float32)
    return y.reshape(b, h, wd, cout).astype(jnp.bfloat16)


for b, h, wd, cin, cout in LEVELS:
    x = jax.random.normal(rng, (b, h, wd, cin), jnp.bfloat16)
    w = jax.random.normal(rng, (3, 3, cin, cout), jnp.bfloat16) * 0.02
    flops = 2 * b * h * wd * 9 * cin * cout
    tag = f"{h}x{wd}x{cin}"
    # tanh keeps the chain honest (output feeds next input, same scale)
    timed_scan(f"conv_f32acc_{tag}",
               lambda x, w=w: jnp.tanh(conv_f32acc(x, w)), x, flops)
    timed_scan(f"conv_bf16acc_{tag}",
               lambda x, w=w: jnp.tanh(conv_bf16acc(x, w)), x, flops)
    timed_scan(f"im2col_{tag}",
               lambda x, w=w: jnp.tanh(im2col_conv(x, w)), x, flops)

# batch scaling at the hot 64x64x320 level
for bb in (2, 4, 8, 16):
    x = jax.random.normal(rng, (bb, 64, 64, 320), jnp.bfloat16)
    w = jax.random.normal(rng, (3, 3, 320, 320), jnp.bfloat16) * 0.02
    flops = 2 * bb * 64 * 64 * 9 * 320 * 320
    timed_scan(f"conv_f32acc_b{bb}_64x64x320",
               lambda x, w=w: jnp.tanh(conv_f32acc(x, w)), x, flops)
