"""Quantify per-scan-iteration overhead on the relay + amortized op costs."""
import json, sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

L, M = 20, 5
rng = jax.random.PRNGKey(0)
B = 2

def timed(name, body, carry, flops=None, iters=1):
    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=L)
        return c
    c = run(carry); _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(M): c = run(c)
    _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]
    ms = (time.time()-t0)/(M*L)*1000
    rec = {"name": name, "ms_per_scan_iter": round(ms,3)}
    if flops: rec["tflops_s_per_op"] = round(flops*iters/(ms/1000)/1e12, 1)
    if iters>1: rec["ms_per_op"] = round(ms/iters, 4)
    print(json.dumps(rec), flush=True)

x = jax.random.normal(rng, (B, 64, 64, 320), jnp.bfloat16)

def empty(c, _):
    return c * 1.0000001, ()
timed("empty_body", empty, x)

K = jax.random.normal(rng, (3, 3, 320, 320), jnp.bfloat16)
dn = jax.lax.conv_dimension_numbers((B,64,64,320), (3,3,320,320), ("NHWC","HWIO","NHWC"))
def conv10(c, _):
    y = c
    for _i in range(10):
        y = jax.lax.conv_general_dilated(y, K, (1,1), "SAME", dimension_numbers=dn,
                                         preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return y, ()
flops_conv = B*4096*9*320*320*2
timed("conv3x3_x10", conv10, x, flops_conv, iters=10)

from powerpaint_tpu.ops.attention import attention
q = jax.random.normal(rng, (B, 4096, 8, 40), jnp.bfloat16)
def attn4(c, _):
    y = c
    for _i in range(4):
        y = attention(y, y, y)
    return y, ()
flops_attn = B*4*4096*4096*40*8
timed("flash_attn_x4", attn4, q, flops_attn, iters=4)

from powerpaint_tpu.models.layers import LayerNorm
xs = jax.random.normal(rng, (B, 4096, 320), jnp.bfloat16)
ln = LayerNorm(1e-5, jnp.float32); lp = jax.jit(ln.init)(rng, xs)
def ln10(c, _):
    y = c
    for _i in range(10):
        y = ln.apply(lp, y).astype(c.dtype)
    return y, ()
timed("layernorm_x10", ln10, xs, iters=10)
