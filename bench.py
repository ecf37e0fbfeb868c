"""Benchmark: full-size ppt-v1 inpainting on real TPU.

Measures images/sec/chip at 512x512, 20-step DDIM CFG inpainting (the
BASELINE.json target: >= 1.5 img/s/chip) plus p50 per-denoise-step latency,
on the flagship SD1.5-inpainting stack (random weights — identical FLOPs to
converted checkpoints).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    # persistent compilation cache: repeat bench runs skip the ~9min compile.
    # Lives inside the repo (gitignored) because /tmp does not survive round
    # boundaries — a pre-warmed cache here makes the driver's bench run warm.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from powerpaint_tpu.core.config import ppt_v1_config
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    platform = jax.devices()[0].platform
    which = os.environ.get("POWERPAINT_BENCH_PIPELINE", "v1")
    if which == "v2":
        from powerpaint_tpu.core.config import ppt_v2_config
        from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline

        cfg = ppt_v2_config()
    else:
        cfg = ppt_v1_config()

    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=64,
                         dtype=jnp.bfloat16)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    tok = TokenizerWrapper(HashTokenizer())
    add_task_tokens(tok)
    quantize = os.environ.get("POWERPAINT_BENCH_QUANTIZE") or None
    if which == "v2":
        pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.bfloat16,
                                quantize=quantize)
    else:
        pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.bfloat16,
                               quantize=quantize)

    rng = np.random.RandomState(0)
    image = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
    mask = np.zeros((512, 512), np.float32)
    mask[128:384, 128:384] = 1.0

    extra_kw = {}
    enc_cache = int(os.environ.get("POWERPAINT_BENCH_ENCODER_CACHE", "0"))
    if enc_cache > 1 and which == "v1":
        extra_kw["encoder_cache_interval"] = enc_cache
    if enc_cache > 1 and which == "v2":
        extra_kw["branch_cache_interval"] = enc_cache

    def run(steps, seed=0):
        return pipe(image, mask, prompt="a red sports car", seed=seed,
                    num_inference_steps=steps, **extra_kw)

    # AOT executable cache (io/aot.py): alongside the XLA persistent cache,
    # a serialized executable of the 20-step call makes the warmup skip
    # tracing AND compiling entirely on repeat runs (same TPU + jax).
    aot_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".aot")
    # the executable bakes in trace-time env knobs (e.g. conv formulation),
    # so those must be part of the cache file name
    im2col = os.environ.get("POWERPAINT_CONV_IM2COL", "0") == "1"
    aot_path = os.path.join(
        aot_dir, f"ppt_{which}_512_b1{'_im2col' if im2col else ''}.aot"
    )
    aot_loaded = False
    if platform == "tpu" and os.path.exists(aot_path):
        try:
            pipe.aot_load(aot_path)
            aot_loaded = True
        except Exception:
            pass

    # warmup / compile (two step counts -> two executables)
    t0 = time.time()
    try:
        run(20)
    except Exception:
        if not aot_loaded:
            raise
        # a stale/broken serialized executable (e.g. dumped from a
        # persistent-cache-restored compile) — discard and recompile
        for d in pipe._aot_dispatchers():
            d._entries.clear()
        try:
            os.remove(aot_path)
        except OSError:
            pass
        aot_loaded = False
        run(20)
    compile_20 = time.time() - t0
    t0 = time.time()
    run(10)
    compile_10 = time.time() - t0
    if platform == "tpu" and not aot_loaded and not quantize:
        try:
            os.makedirs(aot_dir, exist_ok=True)
            run(20)  # make the 20-step call the dispatcher's last
            pipe.aot_dump(aot_path)
        except Exception:
            pass

    def timed(steps, n=3):
        ts = []
        for i in range(n):
            t0 = time.time()
            out = run(steps, seed=i)
            ts.append(time.time() - t0)
        return min(ts)

    t20 = timed(20)
    t10 = timed(10)
    per_step = (t20 - t10) / 10.0  # slope: marginal denoise-step latency
    imgs_per_sec = 1.0 / t20

    batched = {}
    bsz = int(os.environ.get("POWERPAINT_BENCH_BATCH", "0"))
    if bsz > 1:
        def run_b(steps, seed=0):
            return pipe(image, mask, prompt="a red sports car", seed=seed,
                        num_inference_steps=steps,
                        num_images_per_prompt=bsz, **extra_kw)

        run_b(20)  # compile
        ts = []
        for i in range(3):
            t0 = time.time()
            run_b(20, seed=i)
            ts.append(time.time() - t0)
        tb = min(ts)
        batched = {
            "batched_imgs_per_sec": round(bsz / tb, 4),
            "batch_size": bsz,
            "t_total_batched_s": round(tb, 4),
        }

    result = {
        "metric": f"images/sec/chip @512x512 20-step ppt-{which} inpaint",
        "value": round(imgs_per_sec, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_sec / 1.5, 4),
        "extra": {
            "platform": platform,
            "t_total_20step_s": round(t20, 4),
            "t_total_10step_s": round(t10, 4),
            "p50_step_latency_ms": round(per_step * 1000, 2),
            "compile_s": round(compile_20 + compile_10, 1),
            "aot_warm": aot_loaded,
            "batch": 1,
            "dtype": "bfloat16",
            **batched,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
