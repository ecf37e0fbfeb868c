"""Layer-level timing at SD1.5 shapes: where do the 31ms go?"""
import json, os, sys, time
import numpy as np
import jax, jax.numpy as jnp

mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
os.environ["POWERPAINT_FLASH"] = mode

from powerpaint_tpu.models.resnet import ResnetBlock2D
from powerpaint_tpu.models.transformer import Transformer2DModel
from powerpaint_tpu.ops.groupnorm import group_norm

def timed(name, f, *args, n=20):
    out = f(*args); _ = np.asarray(out).sum()
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _ = np.asarray(out).sum()
    print(json.dumps({"name": name, "mode": mode,
                      "ms": round((time.time()-t0)/n*1000, 3)}), flush=True)

rng = jax.random.PRNGKey(0)
CTX = jax.random.normal(rng, (2, 77, 768), jnp.bfloat16)
TEMB = jax.random.normal(rng, (2, 1280), jnp.bfloat16)

# (H, W, C, heads, n_resnets_at_level, n_attn_at_level)
levels = [(64, 64, 320, 8), (32, 32, 640, 8), (16, 16, 1280, 8), (8, 8, 1280, 8)]
for (h, w, c, nh) in levels:
    x = jax.random.normal(rng, (2, h, w, c), jnp.bfloat16)
    res = ResnetBlock2D(c, dtype=jnp.bfloat16)
    rp = jax.jit(res.init)(rng, x, TEMB)
    timed(f"resnet_{h}x{w}x{c}", jax.jit(lambda p, x, t: res.apply(p, x, t)), rp, x, TEMB)
    tr = Transformer2DModel(nh, c // nh, dtype=jnp.bfloat16)
    tp = jax.jit(tr.init)(rng, x, CTX)
    timed(f"transformer_{h}x{w}x{c}", jax.jit(lambda p, x, c_: tr.apply(p, x, c_)), tp, x, CTX)

# groupnorm alone at the hot shape
x = jax.random.normal(rng, (2, 64, 64, 320), jnp.bfloat16)
g = jnp.ones((320,)); b = jnp.zeros((320,))
timed("groupnorm_silu_64x64x320", jax.jit(lambda x: group_norm(x, g, b, silu=True)), x)
