"""Round-4 EXACT serving sweep: batch {4,8,16} x {sequential, pipelined}.

The BASELINE metric is img/s/CHIP (not img/s at batch 1), so batch is a
legitimate throughput lever; the round-3 verdict asked for this exact sweep
on the current exp2 flash kernel, with every executable AOT-dumped so the
driver's cold ``python bench.py`` captures the numbers without compiling.

Also warms the LCM 4-step cache (``ppt_v2_lcm4_512_b1.aot``) so the
``v2_lcm4_*`` extras fire, plus the v1/v2 batch-1 caches if missing.

Run on the real TPU:
    python scripts/perf_r4_sweep.py [batches...]            # v2 (default)
    python scripts/perf_r4_sweep.py --pipeline v1 [batches...]
    python scripts/perf_r4_sweep.py --pipeline lcm 4 8      # LCM batch sweep
Writes scripts/results_r4_sweep{_v1,_lcm}.json, one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
AOT_DIR = os.path.join(REPO, ".aot")


def _setup():
    # NO persistent compilation cache here: XLA cannot re-serialize an
    # executable it restored from that cache (io/aot.py:277-283), and this
    # script's whole job is dumping fresh .aot executables.  Compiles are
    # slower once; every later run (incl. the driver's bench) rides .aot/.
    pass


def _build(which: str = "v2"):
    import jax
    import jax.numpy as jnp

    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    if which == "v2":
        from powerpaint_tpu.core.config import ppt_v2_config
        from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline

        cfg, cls = ppt_v2_config(), BrushNetPipeline
    else:
        from powerpaint_tpu.core.config import ppt_v1_config
        from powerpaint_tpu.pipelines.inpaint import InpaintPipeline

        cfg, cls = ppt_v1_config(), InpaintPipeline
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=64,
                         dtype=jnp.bfloat16)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    tok = TokenizerWrapper(HashTokenizer())
    add_task_tokens(tok)
    return cls(cfg, params, tok, dtype=jnp.bfloat16)


def _inputs():
    rng = np.random.RandomState(0)
    image = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
    mask = np.zeros((512, 512), np.float32)
    mask[128:384, 128:384] = 1.0
    return image, mask


def sweep_batch(pipe, image, mask, bsz: int, which: str = "v2") -> dict:
    aot_path = os.path.join(AOT_DIR, f"ppt_{which}_512_b{bsz}.aot")
    warm = False
    sig = None
    if os.path.exists(aot_path):
        try:
            sig = pipe.aot_load(aot_path)
            warm = True
        except Exception:
            pass

    def run(seed=0):
        kw = {"num_images_per_prompt": bsz} if bsz > 1 else {}
        return pipe(image, mask, prompt="a red sports car", seed=seed,
                    num_inference_steps=20, **kw)

    t0 = time.time()
    try:
        run()
    except Exception:
        if not warm:
            raise
        for d in pipe._aot_dispatchers():
            d._entries.clear()
        os.remove(aot_path)
        warm = False
        run()
    compile_s = time.time() - t0
    warm = pipe.aot_repair_stale(sig, aot_path, warm)
    dump_error = None
    if not warm:
        # temp-file dump + atomic replace: a failed re-serialization keeps
        # the previous file instead of deleting the cache entry
        if not pipe.aot_redump(aot_path):
            dump_error = "aot re-dump failed (see log); previous file kept"

    ts = []
    for i in range(3):
        t0 = time.time()
        run(seed=i)
        ts.append(time.time() - t0)
    t = min(ts)
    K = 6
    t0 = time.time()
    pend = [
        pipe.submit(image, mask, prompt="a red sports car", seed=300 + i,
                    num_inference_steps=20,
                    **({"num_images_per_prompt": bsz} if bsz > 1 else {}))
        for i in range(K)
    ]
    for p in pend:
        p.result()
    sustained = (K * bsz) / (time.time() - t0)
    row = {
        "batch": bsz,
        "sequential_imgs_per_sec": round(bsz / t, 4),
        "t_total_s": round(t, 4),
        "pipelined_imgs_per_sec": round(sustained, 4),
        "compile_s": round(compile_s, 1),
        "aot_was_warm": warm,
    }
    if dump_error:
        row["dump_error"] = dump_error
    return row


def warm_lcm(pipe, image, mask, bsz: int = 1) -> dict:
    aot_path = os.path.join(AOT_DIR, f"ppt_v2_lcm4_512_b{bsz}.aot")
    warm = False
    sig = None
    if os.path.exists(aot_path):
        try:
            sig = pipe.aot_load(aot_path)
            warm = True
        except Exception:
            pass

    kw = dict(num_inference_steps=4, guidance_scale=1.0, scheduler="lcm")
    if bsz > 1:
        kw["num_images_per_prompt"] = bsz

    def run(seed=0):
        return pipe(image, mask, prompt="a red sports car", seed=seed, **kw)

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    warm = pipe.aot_repair_stale(sig, aot_path, warm)
    if not warm:
        pipe.aot_redump(aot_path)  # warns loudly on failure, keeps old file
    ts = []
    for i in range(3):
        t0 = time.time()
        run(seed=i)
        ts.append(time.time() - t0)
    K = 6
    t0 = time.time()
    pend = [
        pipe.submit(image, mask, prompt="a red sports car", seed=400 + i,
                    **kw)
        for i in range(K)
    ]
    for p in pend:
        p.result()
    sustained = (K * bsz) / (time.time() - t0)
    return {
        "mode": "lcm4",
        "batch": bsz,
        "sequential_imgs_per_sec": round(bsz / min(ts), 4),
        "pipelined_imgs_per_sec": round(sustained, 4),
        "compile_s": round(compile_s, 1),
        "aot_was_warm": warm,
    }


def warm_s10(image, mask, which: str) -> dict:
    """Dump the 10-step batch-1 executable (``ppt_{which}_512_b1_s10.aot``)
    bench.py uses for its step-latency slope.  Must happen HERE: bench.py
    runs with the persistent XLA cache enabled, and XLA cannot re-serialize
    an executable restored from that cache — only this script's
    fresh-compile process can produce the file."""
    pipe = _build_cn() if which == "cn" else _build(which)
    extra = {"control_image": _cn_control()} if which == "cn" else {}
    aot_path = os.path.join(AOT_DIR, f"ppt_{which}_512_b1_s10.aot")
    warm = False
    sig = None
    if os.path.exists(aot_path):
        try:
            sig = pipe.aot_load(aot_path)
            warm = True
        except Exception:
            pass

    def run(seed=0):
        return pipe(image, mask, prompt="a red sports car", seed=seed,
                    num_inference_steps=10, **extra)

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    warm = pipe.aot_repair_stale(sig, aot_path, warm)
    if not warm:
        pipe.aot_redump(aot_path)  # warns loudly on failure, keeps old file
    ts = []
    for i in range(3):
        t0 = time.time()
        run(seed=i)
        ts.append(time.time() - t0)
    return {
        "mode": f"{which}_s10",
        "t_total_10step_s": round(min(ts), 4),
        "compile_s": round(compile_s, 1),
        "aot_was_warm": warm,
    }


def _build_cn():
    import jax
    import jax.numpy as jnp

    from powerpaint_tpu.core.config import ppt_v1_controlnet_config
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.controlnet import ControlNetPipeline
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = ppt_v1_controlnet_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=64,
                         dtype=jnp.bfloat16)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    tok = TokenizerWrapper(HashTokenizer())
    add_task_tokens(tok)
    return ControlNetPipeline(cfg, params, tok, dtype=jnp.bfloat16)


def _cn_control():
    control = np.zeros((512, 512, 3), np.uint8)
    control[::8, :, :] = 255  # synthetic canny-like edge map (as bench.py)
    return control


def warm_cn(image, mask) -> dict:
    """v1+ControlNet batch-1: compile, dump ppt_cn_512_b1.aot, measure."""
    pipe = _build_cn()
    aot_path = os.path.join(AOT_DIR, "ppt_cn_512_b1.aot")
    warm = False
    sig = None
    if os.path.exists(aot_path):
        try:
            sig = pipe.aot_load(aot_path)
            warm = True
        except Exception:
            pass
    control = _cn_control()

    def run(seed=0):
        return pipe(image, mask, control_image=control,
                    prompt="a red sports car", seed=seed,
                    num_inference_steps=20)

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    warm = pipe.aot_repair_stale(sig, aot_path, warm)
    if not warm:
        pipe.aot_redump(aot_path)  # warns loudly on failure, keeps old file
    ts = []
    for i in range(3):
        t0 = time.time()
        run(seed=i)
        ts.append(time.time() - t0)
    K = 6
    t0 = time.time()
    pend = [
        pipe.submit(image, mask, control_image=control,
                    prompt="a red sports car", seed=500 + i,
                    num_inference_steps=20)
        for i in range(K)
    ]
    for p in pend:
        p.result()
    sustained = K / (time.time() - t0)
    return {
        "mode": "cn",
        "batch": 1,
        "sequential_imgs_per_sec": round(1.0 / min(ts), 4),
        "pipelined_imgs_per_sec": round(sustained, 4),
        "compile_s": round(compile_s, 1),
        "aot_was_warm": warm,
    }


def main() -> None:
    _setup()
    import jax

    assert jax.devices()[0].platform == "tpu", "run this on the TPU"
    argv = sys.argv[1:]
    which = "v2"
    if "--pipeline" in argv:
        i = argv.index("--pipeline")
        which = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    # --warm-only: dump executables but do NOT overwrite the committed
    # results_r4_sweep*.json sweep evidence (warm rows go to warm_*.json) —
    # this is the mode scripts/warm_aot.sh uses after a container reset
    warm_only = "--warm-only" in argv
    if warm_only:
        argv.remove("--warm-only")
    batches = [int(a) for a in argv] or [4, 8, 16]
    image, mask = _inputs()
    rows = []
    if which == "lcm":
        # LCM 4-step batch sweep (the few-step serving mode): fresh v2
        # pipe per config, executables dumped as ppt_v2_lcm4_512_b{N}.aot
        for b in batches:
            pipe = _build("v2")
            row = warm_lcm(pipe, image, mask, bsz=b)
            print(json.dumps(row), flush=True)
            rows.append(row)
            del pipe
    elif which == "cn":
        row = warm_cn(image, mask)
        print(json.dumps(row), flush=True)
        rows.append(row)
    elif which == "s10":
        # 10-step slope executables for all three serving pipelines
        for w in ("v1", "v2", "cn"):
            row = warm_s10(image, mask, w)
            print(json.dumps(row), flush=True)
            rows.append(row)
    else:
        for b in batches:
            pipe = _build(which)  # fresh pipe per config: one AOT entry each
            row = sweep_batch(pipe, image, mask, b, which)
            print(json.dumps(row), flush=True)
            rows.append(row)
            del pipe
    if which == "v2":
        pipe = _build(which)
        row = warm_lcm(pipe, image, mask)
        print(json.dumps(row), flush=True)
        rows.append(row)
    suffix = "" if which == "v2" else f"_{which}"
    stem = f"warm_r4_sweep{suffix}" if warm_only else f"results_r4_sweep{suffix}"
    out = os.path.join(REPO, "scripts", f"{stem}.json")
    with open(out, "w") as f:
        json.dump({f"{which}_sweep": rows, "note":
                   "v5e, 512^2, 20-step exact bf16, exp2 flash kernel rev 5",
                   }, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
