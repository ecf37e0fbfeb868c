"""Full-size AOT cold-start measurement on the real TPU.

Phase `dump`: build the full ppt-v1 512x512 bf16 pipeline, run one
20-step call (compiles or hits the persistent cache), aot_dump the
executable, print timings.
Phase `load`: in a FRESH process, build the pipeline, aot_load, run the
same call — the wall time to first image is the serving cold-start the
AOT path buys (no tracing, no XLA compile).

Usage: python scripts/aot_fullsize.py dump|load  [path]
"""
import json
import sys
import time

import numpy as np

t_start = time.time()
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

phase = sys.argv[1]
path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ppt_v1_512.aot"

cfg = ppt_v1_config()
params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=64,
                     dtype=jnp.bfloat16)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
tok = TokenizerWrapper(HashTokenizer())
add_task_tokens(tok)
pipe = InpaintPipeline(cfg, params, tok, dtype=jnp.bfloat16)
t_built = time.time()

rng = np.random.RandomState(0)
image = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
mask = np.zeros((512, 512), np.float32)
mask[128:384, 128:384] = 1.0

if phase == "load":
    t0 = time.time()
    pipe.aot_load(path)
    t_loaded = time.time()
    out = pipe(image, mask, prompt="a corgi on a bench",
               num_inference_steps=20, seed=7)
    t_first = time.time()
    assert out.shape == (1, 512, 512, 3)
    print(json.dumps({
        "phase": "load",
        "imports_and_params_s": round(t_built - t_start, 1),
        "aot_load_s": round(t_loaded - t0, 1),
        "first_image_s": round(t_first - t_loaded, 1),
        "total_cold_start_s": round(t_first - t_start, 1),
    }), flush=True)
else:
    t0 = time.time()
    out = pipe(image, mask, prompt="a corgi on a bench",
               num_inference_steps=20, seed=7)
    t_first = time.time()
    pipe.aot_dump(path)
    t_dumped = time.time()
    import os

    print(json.dumps({
        "phase": "dump",
        "first_image_s": round(t_first - t0, 1),
        "aot_dump_s": round(t_dumped - t_first, 1),
        "aot_bytes": os.path.getsize(path),
    }), flush=True)
