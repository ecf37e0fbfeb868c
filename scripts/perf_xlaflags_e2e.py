"""XLA compiler-flag sweep on the full v1 UNet forward (round-4 MFU hunt).

The roofline table (scripts/results_roofline.json) shows every hot conv
COMPUTE-bound yet at 16-33% of MXU peak — the constraint is XLA's conv
lowering/fusion schedule, and the hand-written implicit-GEMM kernel lost
to it end-to-end (results_fusedconv_e2e.json).  The remaining lever is
steering that schedule itself: per-compile `compiler_options` (scoped
VMEM budget for fusions, retiming/scheduler knobs).

Protocol: jit(lax.scan(full v1 UNet fwd, length=20)) x M queued calls,
best of 3 — identical to perf_xattn_e2e.py so numbers compare.  Baseline
(no options) is re-measured last to bound machine drift.

Run on the real TPU: python scripts/perf_xlaflags_e2e.py
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

# each entry: (tag, compiler_options dict or None for baseline)
CONFIGS = [
    ("baseline", None),
    # scoped VMEM is the budget XLA's fusion passes may assume for
    # intermediate tiles; the default (16 MB-ish) caps how much of a
    # gn+silu+conv chain fits in one fusion at the wide levels
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
]


def measure(tag, options):
    from powerpaint_tpu.core.config import ppt_v1_config
    from powerpaint_tpu.models.unet import UNet2DConditionModel

    cfg = ppt_v1_config()
    unet = UNet2DConditionModel(cfg.unet, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (2, 64, 64, 9), jnp.bfloat16)
    ctx = jax.random.normal(rng, (2, 77, 768), jnp.bfloat16)
    params = jax.jit(unet.init)(rng, sample, jnp.array([0]), ctx)

    def run_fn(p, s):
        def body(c, _):
            y = unet.apply(p, jnp.concatenate(
                [c, sample[..., 4:]], axis=-1), jnp.int32(500), ctx)
            return y.astype(c.dtype), ()
        c, _ = jax.lax.scan(body, s, None, length=L)
        return c

    s0 = sample[..., :4]
    t0 = time.time()
    lowered = jax.jit(run_fn).lower(params, s0)
    compiled = lowered.compile(
        compiler_options=options) if options else lowered.compile()
    compile_s = time.time() - t0
    out = compiled(params, s0)
    _ = np.asarray(out).ravel()[:1]
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        c = s0
        for _ in range(M):
            c = compiled(params, c)
        _ = np.asarray(c).ravel()[:1]
        best = min(best, (time.time() - t0) / (M * L) * 1000)
    rec = {"config": tag, "unet_fwd_ms": round(best, 2),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    assert jax.devices()[0].platform == "tpu"
    rows = [measure(tag, opts) for tag, opts in CONFIGS]
    rows.append(measure("baseline_rep2", None))
    out = os.path.join(REPO, "scripts", "results_xlaflags_e2e.json")
    with open(out, "w") as f:
        json.dump({"rows": rows, "note": "v5e, full v1 UNet fwd, CFG b2, "
                   "scan L=20 x M=5 queued, best of 3"}, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
