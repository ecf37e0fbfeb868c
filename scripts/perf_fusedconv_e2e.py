"""End-to-end test of the fused implicit-GEMM conv (round-3 verdict #2).

Times the full v1 UNet forward (CFG batch 2, 64x64 latent, 9-ch input)
as jit(lax.scan(length=20)) x M queued calls — the same protocol the
step-slope numbers use — with POWERPAINT_FUSED_CONV off vs on.  Only this
number decides whether the kernel ships as a default (the round-3
standalone fused-norm lesson).

Run on the real TPU: python scripts/perf_fusedconv_e2e.py
"""
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


def measure(tag):
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
    return rec


def main():
    assert jax.devices()[0].platform == "tpu"
    rows = []
    os.environ["POWERPAINT_FUSED_CONV"] = "0"
    rows.append(measure("xla_chain"))
    os.environ["POWERPAINT_FUSED_CONV"] = "1"
    rows.append(measure("fused_igemm_conv"))
    # interleave a second pass to split machine drift from the delta
    os.environ["POWERPAINT_FUSED_CONV"] = "0"
    rows.append(measure("xla_chain_rep2"))
    os.environ["POWERPAINT_FUSED_CONV"] = "1"
    rows.append(measure("fused_igemm_conv_rep2"))
    out = os.path.join(REPO, "scripts", "results_fusedconv_e2e.json")
    with open(out, "w") as f:
        json.dump({"rows": rows, "note": "v5e, full v1 UNet fwd, CFG b2, "
                   "scan L=20 x M=5 queued"}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
