"""Whole-UNet differential timing: attention impl + conv/attention split."""
import json, os, sys, time
import numpy as np

variant = sys.argv[1]
if variant == "xla":
    os.environ["POWERPAINT_FLASH"] = "0"
elif variant == "flash":
    os.environ["POWERPAINT_FLASH"] = "1"

import jax, jax.numpy as jnp

if variant == "convonly":
    import powerpaint_tpu.models.transformer as tr
    class _Identity(tr.Transformer2DModel):
        def __call__(self, x, context):
            return x
    tr.Transformer2DModel = _Identity
    import powerpaint_tpu.models.blocks as blocks_mod
    blocks_mod.Transformer2DModel = _Identity

from powerpaint_tpu.core.config import ppt_v1_config
from powerpaint_tpu.models.unet import UNet2DConditionModel

cfg = ppt_v1_config()
unet = UNet2DConditionModel(cfg.unet, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
sample = jax.random.normal(rng, (2, 64, 64, 9), jnp.bfloat16)
ctx = jax.random.normal(rng, (2, 77, 768), jnp.bfloat16)
params = jax.jit(unet.init)(rng, sample, jnp.array([0]), ctx)
f = jax.jit(lambda p, s, c: unet.apply(p, s, jnp.int32(500), c))
out = f(params, sample, ctx); _ = np.asarray(out).sum()
t0 = time.time(); n = 20
for _ in range(n):
    out = f(params, sample, ctx)
_ = np.asarray(out).sum()
print(json.dumps({"variant": variant, "ms": round((time.time()-t0)/n*1000, 2)}), flush=True)
