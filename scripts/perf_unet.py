"""UNet step timing with forced d2h sync, flash vs XLA attention."""
import json, os, sys, time
import numpy as np
import jax, jax.numpy as jnp

from powerpaint_tpu.core.config import ppt_v1_config
from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.models.unet import UNet2DConditionModel

mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
os.environ["POWERPAINT_FLASH"] = mode

cfg = ppt_v1_config()
params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=64, dtype=jnp.bfloat16)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)["unet"]
unet = UNet2DConditionModel(cfg.unet, dtype=jnp.bfloat16)

def timed(name, f, *args, n=10):
    out = f(*args)
    _ = np.asarray(out).sum()  # full sync via d2h
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _ = np.asarray(out).sum()
    dt = (time.time() - t0) / n
    print(json.dumps({"name": name, "flash": mode, "ms": round(dt*1000, 2)}), flush=True)

rngk = jax.random.PRNGKey(1)
for batch in (2, 8):
    sample = jax.random.normal(rngk, (batch, 64, 64, 9), jnp.bfloat16)
    ctx = jax.random.normal(rngk, (batch, 77, 768), jnp.bfloat16)
    f = jax.jit(lambda p, s, c: unet.apply({"params": p}, s, jnp.int32(500), c))
    timed(f"unet_cfg{batch}", f, params, sample, ctx)
