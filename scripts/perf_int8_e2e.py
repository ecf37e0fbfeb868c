"""Static-scale int8 (W8A8) END-TO-END measurement on the v1 pipeline.

Round-3's lesson (ROADMAP "Norm glue was an illusion"): only end-to-end
numbers decide — micro wins can invert once a kernel becomes a fusion
barrier at ~100 call sites.  This runs the full 512^2 20-step v1 pipeline
bf16 vs POWERPAINT_INT8=1 (every fusable GN+SiLU+conv3x3 site routed
through ops/conv_pallas.py::conv3x3_gn_silu_int8) and records:

- sequential + pipelined img/s for both modes;
- PSNR of the int8 output against the bf16 output (the quality gate —
  the LCM gate pattern, tests/test_lcm_quality.py / results_lcm_quality)
  at the default static activation scale and the calibration sweep knob
  POWERPAINT_INT8_XSCALE.

Run on the real TPU:  python scripts/perf_int8_e2e.py
Writes scripts/results_int8_e2e.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build():
    import jax
    import jax.numpy as jnp

    from powerpaint_tpu.core.config import ppt_v1_config
    from powerpaint_tpu.io.params import init_params
    from powerpaint_tpu.pipelines.inpaint import InpaintPipeline
    from powerpaint_tpu.text.tokenizer import (
        HashTokenizer,
        TokenizerWrapper,
        add_task_tokens,
    )

    cfg = ppt_v1_config()
    params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=64,
                         dtype=jnp.bfloat16)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    tok = TokenizerWrapper(HashTokenizer())
    add_task_tokens(tok)
    return InpaintPipeline(cfg, params, tok, dtype=jnp.bfloat16)


def _measure(pipe, image, mask):
    def run(seed=0):
        return pipe(image, mask, prompt="a red sports car", seed=seed,
                    num_inference_steps=20)

    t0 = time.time()
    out = run()
    compile_s = time.time() - t0
    ts = []
    for i in range(3):
        t0 = time.time()
        run(seed=i)
        ts.append(time.time() - t0)
    K = 6
    t0 = time.time()
    pend = [pipe.submit(image, mask, prompt="a red sports car",
                        seed=100 + i, num_inference_steps=20)
            for i in range(K)]
    for p in pend:
        p.result()
    sustained = K / (time.time() - t0)
    return {
        "imgs_per_sec": round(1.0 / min(ts), 4),
        "t_total_s": round(min(ts), 4),
        "pipelined_imgs_per_sec": round(sustained, 4),
        "compile_s": round(compile_s, 1),
    }, np.asarray(out, np.float32)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return 99.0
    return 10.0 * np.log10(255.0 ** 2 / mse)


def main() -> None:
    import jax

    # same persistent compile cache as bench.py — repeat runs skip compiles
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    assert jax.devices()[0].platform == "tpu", "run this on the TPU"
    rng = np.random.RandomState(0)
    image = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
    mask = np.zeros((512, 512), np.float32)
    mask[128:384, 128:384] = 1.0

    os.environ["POWERPAINT_INT8"] = "0"
    pipe = _build()
    bf16, out_bf16 = _measure(pipe, image, mask)
    print(json.dumps({"mode": "bf16", **bf16}), flush=True)
    del pipe

    rows = {"bf16": bf16}
    for xscale in (os.environ.get("POWERPAINT_INT8_SWEEP") or "8.0").split(","):
        os.environ["POWERPAINT_INT8"] = "1"
        os.environ["POWERPAINT_INT8_XSCALE"] = xscale
        pipe = _build()
        int8, out_int8 = _measure(pipe, image, mask)
        int8["psnr_vs_bf16_db"] = round(psnr(out_int8, out_bf16), 2)
        int8["x_scale"] = float(xscale)
        print(json.dumps({"mode": f"int8_x{xscale}", **int8}), flush=True)
        rows[f"int8_x{xscale}"] = int8
        del pipe
    os.environ["POWERPAINT_INT8"] = "0"

    out = os.path.join(REPO, "scripts", "results_int8_e2e.json")
    with open(out, "w") as f:
        json.dump({"int8_e2e": rows, "note":
                   "v5e, v1 512^2 20-step, static-scale W8A8 on all fusable "
                   "GN+SiLU+conv3x3 sites, per-out-channel int8 weights"},
                  f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
