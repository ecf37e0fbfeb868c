"""exp vs exp2 softmax in the flash kernel (round-3 follow-up).

Amortized-scan protocol (the only trustworthy one on the axon relay, see
verify skill): jit(lax.scan(op, length=L)), queue M calls, fetch once.
Hot SD1.5 shape: CFG-2, S=4096, H=8, D=40 (level-1 self-attention), plus
the 65k-token outpaint shape.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from powerpaint_tpu.ops.flash_attention import flash_attention

L = 20
M = 5


def timed_scan(name, op, x):
    def body(c, _):
        q, k, v = c
        o = op(q, k, v)
        # keep the loop honest: feed the output back as q (same shape)
        return (o, k, v), ()

    f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=L)[0][0])
    c = (x, x, x)
    out = f(c)
    _ = np.asarray(out)  # fence after compile
    t0 = time.time()
    outs = [f(c) for _ in range(M)]
    _ = np.asarray(outs[-1])
    ms = (time.time() - t0) / (M * L) * 1000
    print(json.dumps({"name": name, "ms_per_op": round(ms, 4)}), flush=True)
    return ms


def main():
    rng = jax.random.PRNGKey(0)
    print("devices:", jax.devices(), flush=True)
    for (b, s, h, d), tag in (
        ((2, 4096, 8, 40), "cfg2_s4096_d40"),
        ((8, 4096, 8, 40), "cfg8_s4096_d40"),
        ((2, 16384, 8, 40), "cfg2_s16k_d40"),
    ):
        x = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        a = timed_scan(
            f"exp_{tag}",
            functools.partial(flash_attention, use_exp2=False), x)
        b_ = timed_scan(
            f"exp2_{tag}",
            functools.partial(flash_attention, use_exp2=True), x)
        print(json.dumps({"shape": tag, "speedup_pct":
                          round((a - b_) / a * 100, 2)}), flush=True)


if __name__ == "__main__":
    main()
