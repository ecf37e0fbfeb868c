"""Component timing on real TPU: where do the 939ms go?"""
import json, time
import numpy as np
import jax, jax.numpy as jnp

from powerpaint_tpu.core.config import ppt_v1_config
from powerpaint_tpu.io.params import init_params
from powerpaint_tpu.models.unet import UNet2DConditionModel
from powerpaint_tpu.models.vae import AutoencoderKL
from powerpaint_tpu.models.clip_text import CLIPTextModel

cfg = ppt_v1_config()
params = init_params(cfg, jax.random.PRNGKey(0), sample_hw=64, dtype=jnp.bfloat16)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

unet = UNet2DConditionModel(cfg.unet, dtype=jnp.bfloat16)
vae = AutoencoderKL(cfg.vae, dtype=jnp.bfloat16)
text = CLIPTextModel(cfg.text_encoder, dtype=jnp.bfloat16)

def timeit(name, fn, *args, n=5):
    # np.asarray fetch is the only reliable execution fence on the remote
    # relay (block_until_ready can return before the work runs)
    fn(*args)  # compile
    _ = np.asarray(fn(*args)).ravel()[:1]
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(out).ravel()[:1]
    dt = (time.time() - t0) / n
    print(json.dumps({"name": name, "ms": round(dt*1000, 2)}), flush=True)
    return dt

# trivial dispatch overhead
f_triv = jax.jit(lambda x: x + 1)
x1 = jnp.zeros((8, 128))
timeit("trivial_jit_call", f_triv, x1, n=20)

# unet single step (CFG batch 2)
sample = jnp.zeros((2, 64, 64, 9), jnp.bfloat16)
ctx = jnp.zeros((2, 77, 768), jnp.bfloat16)
f_unet = jax.jit(lambda p, s, c: unet.apply({"params": p}, s, jnp.int32(500), c))
timeit("unet_fwd_cfg2", f_unet, params["unet"], sample, ctx)

# vae encode 512^2
img = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
f_enc = jax.jit(lambda p, x: vae.apply({"params": p}, x, method="encode_mode"))
timeit("vae_encode", f_enc, params["vae"], img)

# vae decode
lat = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
f_dec = jax.jit(lambda p, z: vae.apply({"params": p}, z, method="decode"))
timeit("vae_decode", f_dec, params["vae"], lat)

# text encode (4 rows)
ids = jnp.zeros((4, 77), jnp.int32)
f_txt = jax.jit(lambda p, i: text.apply({"params": p}, i))
timeit("text_encode_4", f_txt, params["text_encoder"], ids)

# host->device transfer 512^2 image
a = np.zeros((1, 512, 512, 3), np.float32)
t0=time.time()
for _ in range(5):
    jax.block_until_ready(jnp.asarray(a))
print(json.dumps({"name": "h2d_512_image", "ms": round((time.time()-t0)/5*1000,2)}), flush=True)

# unet with batch 8 (CFG 16) for throughput scaling
sample16 = jnp.zeros((16, 64, 64, 9), jnp.bfloat16)
ctx16 = jnp.zeros((16, 77, 768), jnp.bfloat16)
timeit("unet_fwd_cfg16", f_unet, params["unet"], sample16, ctx16, n=3)
