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


# AOT cache bookkeeping for the extras block: every executable the bench
# touches records whether its file loaded, whether it actually SERVED the
# warmup (a load whose signature no longer matches falls back to a silent
# multi-minute compile), and the warmup seconds — so a slow driver run
# diagnoses itself (`aot_misses` names exactly which program compiled cold).
AOT_STATUS: dict = {}


def _aot_note(name: str, loaded: bool, served: bool, warmup_s: float) -> None:
    AOT_STATUS[name] = {
        "loaded": bool(loaded),
        "served": bool(served),
        "warmup_s": round(warmup_s, 1),
    }


def _aot_extras() -> dict:
    return {
        "aot_status": AOT_STATUS,
        "aot_misses": sorted(
            k for k, v in AOT_STATUS.items() if not v["served"]
        ),
    }


def _s10_path(aot_path: str) -> str:
    """``<name>.aot`` -> ``<name>_s10.aot`` by suffix splice.  MUST NOT be
    a str.replace: the ``.aot/`` cache DIRECTORY component also matches
    and replace rewrites every occurrence — that bug made bench look in a
    nonexistent ``_s10.aot/`` dir for a full round, so every driver run
    paid the ~180 s slope-executable compile (BENCH_r04 compile_s 234).
    Pinned by tests/test_aot.py::test_bench_s10_path_splice."""
    assert aot_path.endswith(".aot"), aot_path
    return aot_path[:-len(".aot")] + "_s10.aot"


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
    # pre-flight fence: one tiny op + host fetch BEFORE anything is timed.
    # On the remote-TPU tunnel the first real execution can stall for
    # minutes waiting out a wedged claim from a previous process (observed
    # 1399 s in an otherwise fully AOT-warm run); absorbing that here and
    # reporting it separately keeps compile_s meaning "compile".
    t0 = time.time()
    np.asarray(jnp.zeros((8,), jnp.float32))
    preflight_s = time.time() - t0
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
    if which == "v2":
        pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.bfloat16)
    else:
        pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.bfloat16)

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
    aot_sig = None
    if platform == "tpu" and os.path.exists(aot_path):
        try:
            aot_sig = pipe.aot_load(aot_path)
            aot_loaded = True
        except Exception as e:
            # loud: a swallowed load failure here is a silent multi-minute
            # compile the operator thought the AOT cache had eliminated
            print(f"bench: aot_load({aot_path}) failed: "
                  f"{type(e).__name__}: {e}", flush=True)
    # the 10-step executable (slope measurement) is a different program —
    # cache it separately or every bench run pays its compile
    aot10_path = _s10_path(aot_path)
    aot10_loaded = False
    aot10_sig = None
    if platform == "tpu" and os.path.exists(aot10_path):
        try:
            aot10_sig = pipe.aot_load(aot10_path)
            aot10_loaded = True
        except Exception as e:
            print(f"bench: aot_load({aot10_path}) failed: "
                  f"{type(e).__name__}: {e}", flush=True)

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
    loaded_pre = aot_loaded
    aot_loaded = pipe.aot_repair_stale(aot_sig, aot_path, aot_loaded)
    _aot_note(f"{which}_b1_s20", loaded_pre, aot_loaded, compile_20)
    t0 = time.time()
    run(10)
    compile_10 = time.time() - t0
    loaded10_pre = aot10_loaded
    aot10_loaded = pipe.aot_repair_stale(aot10_sig, aot10_path, aot10_loaded)
    _aot_note(f"{which}_b1_s10", loaded10_pre, aot10_loaded, compile_10)
    if platform == "tpu" and not aot10_loaded:
        pipe.aot_redump(aot10_path)  # 10-step call is the most recent
    if platform == "tpu" and not aot_loaded:
        run(20)  # make the 20-step call the dispatcher's last
        pipe.aot_redump(aot_path)

    def timed(steps, n=3):
        ts = []
        for i in range(n):
            t0 = time.time()
            run(steps, seed=i)
            ts.append(time.time() - t0)
        return ts

    # marginal denoise-step latency: (20-step, 10-step) total-time slope.
    # Headline = (min(ts20) - min(ts10)) / 10: the min over >=5 samples
    # filters the relay's additive host-jitter (~0.1 s fixed overhead with
    # 10s-of-ms variance, amplified 100x/step by the subtraction) from
    # BOTH totals — it reproduces 17.3-17.4 ms across rounds where
    # per-index pairing swung 12-33 ms (BENCH_r04 33.3 outlier, r5 builder
    # spread 12.4-27.2).  The per-index paired samples + spread +
    # outlier-rejected median still ship in the extras so jitter is
    # visible instead of silently widening the headline.
    N_SLOPE = 7  # ~1 s/sample AOT-warm; more samples stabilize the mins
    ts20 = timed(20, n=N_SLOPE)
    ts10 = timed(10, n=N_SLOPE)
    t20, t10 = min(ts20), min(ts10)
    slopes_ms = sorted(
        (a - b) / 10.0 * 1000.0 for a, b in zip(ts20, ts10)
    )
    raw_median = slopes_ms[len(slopes_ms) // 2]
    kept = [s for s in slopes_ms if s <= 1.5 * raw_median] or slopes_ms
    slope_median_ms = kept[len(kept) // 2]
    per_step_ms = (t20 - t10) / 10.0 * 1000.0
    slope_spread_ms = slopes_ms[-1] - slopes_ms[0]
    imgs_per_sec = 1.0 / t20

    # sustained serving throughput: queue K dispatches back to back
    # (pipelines/async_dispatch.py), fetch in order — host preprocessing +
    # upload of request N+1 overlap request N's device compute, hiding the
    # fixed per-request overhead the sequential numbers above pay K times
    K = 6
    t0 = time.time()
    pendings = [
        pipe.submit(image, mask, prompt="a red sports car", seed=100 + i,
                    num_inference_steps=20, **extra_kw)
        for i in range(K)
    ]
    for p in pendings:
        p.result()
    sustained = K / (time.time() - t0)

    batched = {}
    bsz = int(os.environ.get("POWERPAINT_BENCH_BATCH", "0"))
    if bsz > 1:
        def run_b(steps, seed=0):
            return pipe(image, mask, prompt="a red sports car", seed=seed,
                        num_inference_steps=steps,
                        num_images_per_prompt=bsz, **extra_kw)

        aot_b = os.path.join(
            aot_dir,
            f"ppt_{which}_512_b{bsz}{'_im2col' if im2col else ''}.aot",
        )
        b_loaded = False
        b_sig = None
        if platform == "tpu" and os.path.exists(aot_b):
            try:
                b_sig = pipe.aot_load(aot_b)
                b_loaded = True
            except Exception:
                pass
        # compile (or AOT-warm); a stale/broken serialized executable is
        # discarded and recompiled, mirroring the batch-1 recovery above
        t0 = time.time()
        try:
            run_b(20)
        except Exception:
            if not b_loaded:
                raise
            for d in pipe._aot_dispatchers():
                d._entries.clear()
            try:
                os.remove(aot_b)
            except OSError:
                pass
            b_loaded = False
            run_b(20)
        b_pre = b_loaded
        b_loaded = pipe.aot_repair_stale(b_sig, aot_b, b_loaded)
        _aot_note(f"{which}_b{bsz}_s20", b_pre, b_loaded, time.time() - t0)
        if platform == "tpu" and not b_loaded:
            pipe.aot_redump(aot_b)
        ts = []
        for i in range(3):
            t0 = time.time()
            run_b(20, seed=i)
            ts.append(time.time() - t0)
        tb = min(ts)
        # pipelined batched serving: K batched dispatches back to back —
        # the production configuration (micro-batcher + async dispatch);
        # exact math, the batch and the overlap are both stated.  K=6
        # matches the batch-1 sustained protocol so the un-overlapped
        # first dispatch + final drain are a small fraction of the window.
        Kb = 6
        t0 = time.time()
        pend = [
            pipe.submit(image, mask, prompt="a red sports car",
                        seed=200 + i, num_inference_steps=20,
                        num_images_per_prompt=bsz, **extra_kw)
            for i in range(Kb)
        ]
        for p in pend:
            p.result()
        sustained_b = (Kb * bsz) / (time.time() - t0)
        batched = {
            "batched_imgs_per_sec": round(bsz / tb, 4),
            "batch_size": bsz,
            "t_total_batched_s": round(tb, 4),
            "batched_sustained_imgs_per_sec": round(sustained_b, 4),
        }

    # secondary pipeline numbers in `extra` (v2 when benching v1): only
    # when its AOT cache is warm (or POWERPAINT_BENCH_FULL=1) so the
    # driver's default run never pays a cold multi-minute compile
    other = {}
    other_which = "v2" if which == "v1" else "v1"
    other_aot = os.path.join(
        aot_dir, f"ppt_{other_which}_512_b1{'_im2col' if im2col else ''}.aot"
    )
    want_full = os.environ.get("POWERPAINT_BENCH_FULL") == "1"
    if platform == "tpu" and (os.path.exists(other_aot) or want_full):
        try:
            other.update(_bench_other(other_which, other_aot, image, mask))
        except Exception:
            pass

    # EXACT batched serving, both pipelines (the BASELINE metric is
    # img/s/CHIP — batch is a legitimate throughput lever): bench the warm
    # batched executables, sequential AND pipelined, and surface the best
    # exact number per pipeline.  AOT-gated like `other` so the default
    # run never compiles.  The default benches only the measured-best
    # batch (8 — the b4/b8/b16 sweeps in scripts/results_r4_sweep*.json
    # show saturation there for v1, v2 AND lcm); each skipped AOT load +
    # measurement costs ~2 min of driver wall-clock.  Set
    # POWERPAINT_BENCH_BATCHES=4,8,16 for the full in-bench table.
    bench_batches = {
        int(b) for b in os.environ.get(
            "POWERPAINT_BENCH_BATCHES", "8").split(",") if b.strip()
    }
    if platform == "tpu":
        import glob as _glob

        for w in ("v1", "v2"):
            rows = {}
            best = (0.0, None)
            # fold in the batch-1 numbers already measured above: the
            # headline run when w is the benched pipeline, `other` when
            # it is the secondary one
            b1_seq, b1_sus = None, None
            if w == which:
                b1_seq, b1_sus = imgs_per_sec, sustained
            else:
                b1_seq = other.get(f"{w}_imgs_per_sec")
                b1_sus = other.get(f"{w}_sustained_imgs_per_sec")
            if b1_seq is not None:
                best = (b1_seq, "b1")
            if b1_sus is not None and b1_sus > best[0]:
                best = (b1_sus, "b1_pipelined")
            for p in sorted(_glob.glob(
                    os.path.join(aot_dir, f"ppt_{w}_512_b*.aot"))):
                name = os.path.basename(p)
                try:
                    b = int(name.split("_b")[-1].split(".")[0].split("_")[0])
                except ValueError:
                    continue
                if b <= 1 or b not in bench_batches:
                    continue
                try:
                    row = _bench_batch(w, b, p, image, mask)
                except Exception:
                    continue
                rows.update(row)
                seq = row.get(f"{w}_b{b}_imgs_per_sec", 0.0)
                pl = row.get(f"{w}_b{b}_pipelined_imgs_per_sec", 0.0)
                if seq > best[0]:
                    best = (seq, f"b{b}")
                if pl > best[0]:
                    best = (pl, f"b{b}_pipelined")
            if rows:
                other.update(rows)
            if best[1] is not None:
                other[f"{w}_best_exact_imgs_per_sec"] = round(best[0], 4)
                other[f"{w}_best_exact_config"] = best[1]

    # few-step LCM mode (v2 + lcm sampler, 4 steps, embedded guidance) —
    # the LCM-LoRA serving configuration; AOT-gated like `other`.  Batched
    # LCM executables (ppt_v2_lcm4_512_b{N}.aot) are benched too and the
    # best config surfaced — at 4 steps the fixed per-call cost dominates,
    # so batching + pipelining are the production few-step configuration.
    if platform == "tpu":
        lcm_best = (0.0, None)
        lcm_paths = sorted(_glob.glob(
            os.path.join(aot_dir, "ppt_v2_lcm4_512_b*.aot")))
        lcm_b1 = os.path.join(aot_dir, "ppt_v2_lcm4_512_b1.aot")
        if want_full and lcm_b1 not in lcm_paths:
            lcm_paths.insert(0, lcm_b1)  # compile-and-dump path
        for p in lcm_paths:
            name = os.path.basename(p)
            try:
                b = int(name.split("_b")[-1].split(".")[0])
            except ValueError:
                continue
            if b > 1 and b not in bench_batches:
                continue  # same saturation-best default as the exact modes
            try:
                row = _bench_lcm(p, image, mask, bsz=b)
            except Exception:
                continue
            other.update(row)
            tag = "v2_lcm4" if b == 1 else f"v2_lcm4_b{b}"
            seq = row.get(f"{tag}_imgs_per_sec", 0.0)
            pl = row.get(f"{tag}_pipelined_imgs_per_sec", 0.0)
            if seq > lcm_best[0]:
                lcm_best = (seq, f"b{b}")
            if pl > lcm_best[0]:
                lcm_best = (pl, f"b{b}_pipelined")
        if lcm_best[1] is not None:
            other["v2_lcm4_best_imgs_per_sec"] = round(lcm_best[0], 4)
            other["v2_lcm4_best_config"] = lcm_best[1]

    # third pipeline: v1 + ControlNet (1 CN + 1 UNet forward per step,
    # reference pipeline_PowerPaint_ControlNet.py:1686-1715); AOT-gated
    cn_aot = os.path.join(aot_dir, "ppt_cn_512_b1.aot")
    if platform == "tpu" and (os.path.exists(cn_aot) or want_full):
        try:
            other.update(_bench_cn(cn_aot, image, mask))
        except Exception:
            pass

    result = {
        "metric": f"images/sec/chip @512x512 20-step ppt-{which} inpaint",
        "value": round(imgs_per_sec, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(imgs_per_sec / 1.5, 4),
        "extra": {
            "platform": platform,
            "t_total_20step_s": round(t20, 4),
            "t_total_10step_s": round(t10, 4),
            "step_latency_slope_ms": round(per_step_ms, 2),
            "slope_median_ms": round(slope_median_ms, 2),
            "slope_samples_ms": [round(s, 2) for s in slopes_ms],
            "slope_spread_ms": round(slope_spread_ms, 2),
            "compile_s": round(compile_20 + compile_10, 1),
            "preflight_s": round(preflight_s, 1),
            "sustained_imgs_per_sec": round(sustained, 4),
            "aot_warm": aot_loaded,
            "batch": 1,
            "dtype": "bfloat16",
            **batched,
            **other,
            **_aot_extras(),
        },
    }
    print(json.dumps(result))


def _bench_other(which: str, aot_path: str, image, mask) -> dict:
    """Measure the OTHER pipeline (20-step exact, batch 1) for the extras
    block.  Loads its AOT executable when available; compiles otherwise
    (callers gate on cache presence)."""
    import time

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

        cfg = ppt_v2_config()
        cls = BrushNetPipeline
    else:
        from powerpaint_tpu.core.config import ppt_v1_config
        from powerpaint_tpu.pipelines.inpaint import InpaintPipeline

        cfg = ppt_v1_config()
        cls = InpaintPipeline
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=64,
                         dtype=jnp.bfloat16)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    tok = TokenizerWrapper(HashTokenizer())
    add_task_tokens(tok)
    pipe = cls(cfg, params, tok, dtype=jnp.bfloat16)
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
                    num_inference_steps=20)

    t0 = time.time()
    run()  # warmup (AOT'd or compile)
    pre = warm
    warm = pipe.aot_repair_stale(sig, aot_path, warm)
    _aot_note(f"{which}_b1_s20", pre, warm, time.time() - t0)
    if not warm:
        pipe.aot_redump(aot_path)
    ts = []
    for i in range(3):
        t0 = time.time()
        run(seed=i)
        ts.append(time.time() - t0)
    t = min(ts)
    t0 = time.time()
    pend = [
        pipe.submit(image, mask, prompt="a red sports car", seed=50 + i,
                    num_inference_steps=20)
        for i in range(4)
    ]
    for p in pend:
        p.result()
    sustained = 4 / (time.time() - t0)
    out = {
        f"{which}_imgs_per_sec": round(1.0 / t, 4),
        f"{which}_t_total_20step_s": round(t, 4),
        f"{which}_sustained_imgs_per_sec": round(sustained, 4),
        f"{which}_aot_warm": warm,
    }
    # marginal step slope (min-difference, as the headline pipeline's):
    # only attempted when the 10-step executable is already cached, so the
    # extras never buy a fresh multi-minute compile for a secondary metric
    s10_path = _s10_path(aot_path)
    if os.path.exists(s10_path):
        s10_warm, s10_sig = False, None
        try:
            s10_sig = pipe.aot_load(s10_path)
            s10_warm = True
        except Exception as e:
            print(f"bench: aot_load({s10_path}) failed: "
                  f"{type(e).__name__}: {e}", flush=True)
        if s10_warm:
            def run10(seed=0):
                return pipe(image, mask, prompt="a red sports car",
                            seed=seed, num_inference_steps=10)

            t0 = time.time()
            run10()
            pre10 = s10_warm
            s10_warm = pipe.aot_repair_stale(s10_sig, s10_path, s10_warm)
            _aot_note(f"{which}_b1_s10", pre10, s10_warm,
                      time.time() - t0)
            if not s10_warm:
                pipe.aot_redump(s10_path)
            ts10 = []
            for i in range(3):
                t0 = time.time()
                run10(seed=i)
                ts10.append(time.time() - t0)
            out[f"{which}_step_latency_slope_ms"] = round(
                (t - min(ts10)) / 10.0 * 1000.0, 2)
    return out


def _bench_batch(which: str, bsz: int, aot_path: str, image, mask) -> dict:
    """Exact at batch ``bsz`` on pipeline ``which``: sequential (min of 3)
    and pipelined (6 back-to-back submits) img/s/chip.  Requires a warm AOT
    executable — callers gate on its existence so the driver's run never
    compiles."""
    import time

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
    pipe = cls(cfg, params, tok, dtype=jnp.bfloat16)
    sig = pipe.aot_load(aot_path)

    def run(seed=0):
        return pipe(image, mask, prompt="a red sports car", seed=seed,
                    num_inference_steps=20, num_images_per_prompt=bsz)

    # AOT-warm execute; a silent signature miss never raises — it falls
    # back to a fresh jit compile, which aot_repair_stale detects below
    # (the dead file is only replaced once a validated re-dump succeeds)
    t0 = time.time()
    run()
    served = pipe.aot_repair_stale(sig, aot_path, True)
    _aot_note(f"{which}_b{bsz}_s20", True, served, time.time() - t0)
    if not served:
        # silent signature miss: the warmup jit-compiled; re-dump so the
        # next run rides the cache
        pipe.aot_redump(aot_path)
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
                    num_inference_steps=20, num_images_per_prompt=bsz)
        for i in range(K)
    ]
    for p in pend:
        p.result()
    sustained = (K * bsz) / (time.time() - t0)
    return {
        f"{which}_b{bsz}_imgs_per_sec": round(bsz / t, 4),
        f"{which}_b{bsz}_t_total_s": round(t, 4),
        f"{which}_b{bsz}_pipelined_imgs_per_sec": round(sustained, 4),
    }


def _bench_cn(aot_path: str, image, mask) -> dict:
    """v1 + ControlNet (20-step exact, batch 1): the third serving
    pipeline — one ControlNet + one UNet forward per step (reference
    pipeline_PowerPaint_ControlNet.py:1686-1715).  AOT-gated by callers."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

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
    pipe = ControlNetPipeline(cfg, params, tok, dtype=jnp.bfloat16)
    warm = False
    sig = None
    if os.path.exists(aot_path):
        try:
            sig = pipe.aot_load(aot_path)
            warm = True
        except Exception:
            pass

    control = np.zeros((512, 512, 3), np.uint8)
    control[::8, :, :] = 255  # synthetic canny-like edge map

    def run(seed=0):
        return pipe(image, mask, control_image=control,
                    prompt="a red sports car", seed=seed,
                    num_inference_steps=20)

    t0 = time.time()
    run()
    pre = warm
    warm = pipe.aot_repair_stale(sig, aot_path, warm)
    _aot_note("cn_b1_s20", pre, warm, time.time() - t0)
    if not warm:
        pipe.aot_redump(aot_path)
    ts = []
    for i in range(3):
        t0 = time.time()
        run(seed=i)
        ts.append(time.time() - t0)
    t = min(ts)
    K = 6
    t0 = time.time()
    pend = [
        pipe.submit(image, mask, control_image=control,
                    prompt="a red sports car", seed=120 + i,
                    num_inference_steps=20)
        for i in range(K)
    ]
    for p in pend:
        p.result()
    sustained = K / (time.time() - t0)
    out = {
        "cn_imgs_per_sec": round(1.0 / t, 4),
        "cn_t_total_20step_s": round(t, 4),
        "cn_pipelined_imgs_per_sec": round(sustained, 4),
        "cn_aot_warm": warm,
    }
    # step slope, only when the 10-step executable is cached (as
    # _bench_other — never buy a compile for a secondary metric)
    s10_path = _s10_path(aot_path)
    if os.path.exists(s10_path):
        s10_warm, s10_sig = False, None
        try:
            s10_sig = pipe.aot_load(s10_path)
            s10_warm = True
        except Exception as e:
            print(f"bench: aot_load({s10_path}) failed: "
                  f"{type(e).__name__}: {e}", flush=True)
        if s10_warm:
            def run10(seed=0):
                return pipe(image, mask, control_image=control,
                            prompt="a red sports car", seed=seed,
                            num_inference_steps=10)

            t0 = time.time()
            run10()
            pre10 = s10_warm
            s10_warm = pipe.aot_repair_stale(s10_sig, s10_path, s10_warm)
            _aot_note("cn_b1_s10", pre10, s10_warm, time.time() - t0)
            if not s10_warm:
                pipe.aot_redump(s10_path)
            ts10 = []
            for i in range(3):
                t0 = time.time()
                run10(seed=i)
                ts10.append(time.time() - t0)
            out["cn_step_latency_slope_ms"] = round(
                (t - min(ts10)) / 10.0 * 1000.0, 2)
    return out


def _bench_lcm(aot_path: str, image, mask, bsz: int = 1) -> dict:
    """v2 + lcm scheduler, 4 steps, guidance 1.0 (embedded) — the few-step
    consistency-sampling configuration an LCM-LoRA-merged model serves.
    At 4 steps the fixed per-call cost (text/VAE encodes, decode, relay
    transfers) rivals the denoise loop, so batching + pipelined dispatch
    matter even more than in the 20-step exact mode; ``bsz`` > 1 benches
    that configuration (keys ``v2_lcm4_b{bsz}_*``)."""
    import time

    import jax
    import jax.numpy as jnp

    from powerpaint_tpu.core.config import ppt_v2_config
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.brushnet import BrushNetPipeline
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = ppt_v2_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=64,
                         dtype=jnp.bfloat16)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    tok = TokenizerWrapper(HashTokenizer())
    add_task_tokens(tok)
    pipe = BrushNetPipeline(cfg, params, tok, dtype=jnp.bfloat16)
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
    pre = warm
    warm = pipe.aot_repair_stale(sig, aot_path, warm)
    _aot_note(f"v2_lcm4_b{bsz}", pre, warm, time.time() - t0)
    if not warm:
        pipe.aot_redump(aot_path)
    ts = []
    for i in range(3):
        t0 = time.time()
        run(seed=i)
        ts.append(time.time() - t0)
    t = min(ts)
    # pipelined dispatch (K=6, same protocol as the exact modes)
    K = 6
    t0 = time.time()
    pend = [
        pipe.submit(image, mask, prompt="a red sports car", seed=80 + i,
                    **kw)
        for i in range(K)
    ]
    for p in pend:
        p.result()
    sustained = (K * bsz) / (time.time() - t0)
    tag = "v2_lcm4" if bsz == 1 else f"v2_lcm4_b{bsz}"
    return {
        f"{tag}_imgs_per_sec": round(bsz / t, 4),
        f"{tag}_t_total_s": round(t, 4),
        f"{tag}_pipelined_imgs_per_sec": round(sustained, 4),
        f"{tag}_aot_warm": warm,
    }


if __name__ == "__main__":
    main()
