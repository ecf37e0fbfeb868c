import json, time, functools
import numpy as np
import jax, jax.numpy as jnp
from powerpaint_tpu.ops.attention import xla_attention
from powerpaint_tpu.ops.flash_attention import flash_attention as mine

rng = jax.random.PRNGKey(0)

def timed(name, f, *args, n=30):
    out = f(*args); _ = np.asarray(out).sum()
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _ = np.asarray(out).sum()
    print(json.dumps({"name": name, "ms": round((time.time()-t0)/n*1000, 3)}), flush=True)

# dispatch-overhead floor
f_nop = jax.jit(lambda x: x * 1.000001)
x_small = jnp.ones((8, 128), jnp.bfloat16)
timed("overhead_floor", f_nop, x_small)

# cross-attention L1: q 4096, kv 77
q = jax.random.normal(rng, (2, 4096, 8, 40), jnp.bfloat16)
k77 = jax.random.normal(rng, (2, 77, 8, 40), jnp.bfloat16)
v77 = jax.random.normal(rng, (2, 77, 8, 40), jnp.bfloat16)
timed("cross_L1_xla", jax.jit(xla_attention), q, k77, v77)
timed("cross_L1_flash", jax.jit(functools.partial(mine, block_q=2048, block_kv=128)), q, k77, v77)

# GEGLU FF at L1
from powerpaint_tpu.models.transformer import FeedForward
ff = FeedForward(dtype=jnp.bfloat16)
xff = jax.random.normal(rng, (2, 4096, 320), jnp.bfloat16)
pff = jax.jit(ff.init)(rng, xff)
timed("ff_L1", jax.jit(lambda p, x: ff.apply(p, x)), pff, xff)

# LayerNorm at L1
from powerpaint_tpu.ops.groupnorm import layer_norm
g = jnp.ones((320,)); b = jnp.zeros((320,))
timed("layernorm_L1", jax.jit(lambda x: layer_norm(x, g, b)), xff)

# full BasicTransformerBlock L1
from powerpaint_tpu.models.transformer import BasicTransformerBlock
bt = BasicTransformerBlock(8, 40, dtype=jnp.bfloat16)
ctx = jax.random.normal(rng, (2, 77, 768), jnp.bfloat16)
pbt = jax.jit(bt.init)(rng, xff, ctx)
timed("basic_block_L1", jax.jit(lambda p, x, c: bt.apply(p, x, c)), pbt, xff, ctx)

# self-attn L1 alone (best blocks)
k = jax.random.normal(rng, (2, 4096, 8, 40), jnp.bfloat16)
v = jax.random.normal(rng, (2, 4096, 8, 40), jnp.bfloat16)
timed("self_L1_flash_2048_1024", jax.jit(functools.partial(mine, block_q=2048, block_kv=1024)), q, k, v)
