"""Break down the per-call fixed overhead (text, VAE enc/dec, transfers)."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
from powerpaint_tpu.core.config import ppt_v1_config
from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.models.vae import AutoencoderKL
from powerpaint_tpu.models.clip_text import CLIPTextModel

cfg = ppt_v1_config()
params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=64, dtype=jnp.bfloat16)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
vae = AutoencoderKL(cfg.vae, dtype=jnp.bfloat16)
text = CLIPTextModel(cfg.text_encoder, dtype=jnp.bfloat16)

def timed(name, f, *args, n=10):
    out = f(*args); _ = float(np.asarray(out))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _ = float(np.asarray(out))
    print(json.dumps({"name": name, "ms": round((time.time()-t0)/n*1000, 2)}), flush=True)

img = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 512, 3), jnp.bfloat16)
z = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 4), jnp.bfloat16)
ids = jnp.zeros((4, 77), jnp.int32)
rng = jax.random.PRNGKey(3)

timed("vae_encode_sum", jax.jit(lambda p, x, r: vae.apply({"params": p}, x, r, method="sample").astype(jnp.float32).sum()), params["vae"], img, rng)
timed("vae_decode_sum", jax.jit(lambda p, z: vae.apply({"params": p}, z, method="decode").astype(jnp.float32).sum()), params["vae"], z)
timed("text4_sum", jax.jit(lambda p, i: text.apply({"params": p}, i).astype(jnp.float32).sum()), params["text_encoder"], ids)

# host->device / device->host transfer of a 512^2 fp32 image
a = np.zeros((1, 512, 512, 3), np.float32)
t0 = time.time()
for _ in range(5):
    jax.block_until_ready(jnp.asarray(a))
print(json.dumps({"name": "h2d_3MB", "ms": round((time.time()-t0)/5*1000, 2)}), flush=True)
d = jnp.zeros((1, 512, 512, 3), jnp.float32)
t0 = time.time()
for _ in range(5):
    _ = np.asarray(d)
print(json.dumps({"name": "d2h_3MB", "ms": round((time.time()-t0)/5*1000, 2)}), flush=True)
