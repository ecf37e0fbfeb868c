"""Differential: GroupNorm cost inside the full UNet (identity-GN variant)."""
import json, sys, time
import numpy as np

variant = sys.argv[1]
import jax, jax.numpy as jnp

if variant == "nogn":
    import powerpaint_tpu.ops.groupnorm as gn
    def fake_group_norm(x, gamma, beta, *, num_groups=32, eps=1e-6, silu=False):
        out = x * gamma.astype(x.dtype) + beta.astype(x.dtype)
        if silu:
            out = out * jax.nn.sigmoid(out)
        return out
    gn.group_norm = fake_group_norm
    import powerpaint_tpu.models.layers as L
    L.group_norm = fake_group_norm
elif variant == "bf16stats":
    import powerpaint_tpu.ops.groupnorm as gn
    def bf16_group_norm(x, gamma, beta, *, num_groups=32, eps=1e-6, silu=False):
        b = x.shape[0]; c = x.shape[-1]; gs = c // num_groups
        xf = x.reshape(b, -1, num_groups, gs)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
        out = xn * gamma.astype(x.dtype) + beta.astype(x.dtype)
        if silu:
            out = out * jax.nn.sigmoid(out)
        return out
    gn.group_norm = bf16_group_norm
    import powerpaint_tpu.models.layers as L
    L.group_norm = bf16_group_norm

from powerpaint_tpu.core.config import ppt_v1_config
from powerpaint_tpu.models.unet import UNet2DConditionModel

cfg = ppt_v1_config()
unet = UNet2DConditionModel(cfg.unet, dtype=jnp.bfloat16)
rng = jax.random.PRNGKey(0)
sample = jax.random.normal(rng, (2, 64, 64, 9), jnp.bfloat16)
ctx = jax.random.normal(rng, (2, 77, 768), jnp.bfloat16)
params = jax.jit(unet.init)(rng, sample, jnp.array([0]), ctx)
f = jax.jit(lambda p, s, c: unet.apply(p, s, jnp.int32(500), c).astype(jnp.float32).sum())
out = f(params, sample, ctx); _ = float(np.asarray(out))
t0 = time.time(); n = 20
for _ in range(n):
    out = f(params, sample, ctx)
_ = float(np.asarray(out))
print(json.dumps({"variant": variant, "ms": round((time.time()-t0)/n*1000, 2)}), flush=True)
