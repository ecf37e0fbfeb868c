"""Attention implementation shootout at SD1.5 hot shapes (one dispatch per call)."""
import json, sys, time, functools
import numpy as np
import jax, jax.numpy as jnp

rng = jax.random.PRNGKey(0)

# level-1 self-attention: B=2 (CFG), S=4096, N=8, D=40
B, S, N, D = 2, 4096, 8, 40
q = jax.random.normal(rng, (B, S, N, D), jnp.bfloat16)
k = jax.random.normal(rng, (B, S, N, D), jnp.bfloat16)
v = jax.random.normal(rng, (B, S, N, D), jnp.bfloat16)

def timed(name, f, *args, n=30):
    out = f(*args); _ = np.asarray(out).sum()
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _ = np.asarray(out).sum()
    print(json.dumps({"name": name, "ms": round((time.time()-t0)/n*1000, 3)}), flush=True)

# 1. XLA einsum attention
from powerpaint_tpu.ops.attention import xla_attention
timed("xla_einsum", jax.jit(xla_attention), q, k, v)

# 2. my pallas kernel (current blocks 512)
from powerpaint_tpu.ops.flash_attention import flash_attention as mine
timed("mine_512", jax.jit(functools.partial(mine, block_q=512, block_kv=512)), q, k, v)
timed("mine_1024", jax.jit(functools.partial(mine, block_q=1024, block_kv=1024)), q, k, v)
timed("mine_2048_1024", jax.jit(functools.partial(mine, block_q=2048, block_kv=1024)), q, k, v)

# 3. jax bundled flash attention (layout B, N, S, D)
from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as jfa
def bundled(q, k, v):
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o = jfa(qt, kt, vt, sm_scale=1.0 / np.sqrt(D))
    return o.transpose(0, 2, 1, 3)
timed("jax_bundled_flash", jax.jit(bundled), q, k, v)

# 4. dot_product_attention API
f_dpa = jax.jit(lambda q,k,v: jax.nn.dot_product_attention(q, k, v))
timed("jax_nn_dpa", f_dpa, q, k, v)
