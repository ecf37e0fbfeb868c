import json, time, functools
import numpy as np
import jax, jax.numpy as jnp
from powerpaint_tpu.ops.attention import xla_attention
from powerpaint_tpu.ops.flash_attention import flash_attention as mine

rng = jax.random.PRNGKey(0)

def timed(name, f, *args, n=30):
    out = f(*args); _ = float(np.asarray(out))
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    _ = float(np.asarray(out))
    print(json.dumps({"name": name, "ms": round((time.time()-t0)/n*1000, 3)}), flush=True)

def s(f):
    return jax.jit(lambda *a: f(*a).astype(jnp.float32).sum())

q = jax.random.normal(rng, (2, 4096, 8, 40), jnp.bfloat16)
k = jax.random.normal(rng, (2, 4096, 8, 40), jnp.bfloat16)
v = jax.random.normal(rng, (2, 4096, 8, 40), jnp.bfloat16)
k77 = jax.random.normal(rng, (2, 77, 8, 40), jnp.bfloat16)
v77 = jax.random.normal(rng, (2, 77, 8, 40), jnp.bfloat16)
xff = jax.random.normal(rng, (2, 4096, 320), jnp.bfloat16)
ctx = jax.random.normal(rng, (2, 77, 768), jnp.bfloat16)

from powerpaint_tpu.ops.groupnorm import layer_norm
g = jnp.ones((320,)); b = jnp.zeros((320,))
timed("layernorm_L1", s(lambda x: layer_norm(x, g, b)), xff)

from powerpaint_tpu.models.transformer import FeedForward, BasicTransformerBlock
ff = FeedForward(dtype=jnp.bfloat16)
pff = jax.jit(ff.init)(rng, xff)
timed("ff_L1", s(lambda p, x: ff.apply(p, x)), pff, xff)

timed("self_L1_flash", s(functools.partial(mine, block_q=2048, block_kv=1024)), q, k, v)
timed("self_L1_flash_512", s(functools.partial(mine, block_q=512, block_kv=512)), q, k, v)
timed("self_L1_xla", s(xla_attention), q, k, v)
timed("cross_L1_xla", s(xla_attention), q, k77, v77)
timed("cross_L1_flash", s(functools.partial(mine, block_q=2048, block_kv=128)), q, k77, v77)

bt = BasicTransformerBlock(8, 40, dtype=jnp.bfloat16)
pbt = jax.jit(bt.init)(rng, xff, ctx)
timed("basic_block_L1", s(lambda p, x, c: bt.apply(p, x, c)), pbt, xff, ctx)

# level-2/3 blocks
for (S2, C2) in [(1024, 640), (256, 1280)]:
    x2 = jax.random.normal(rng, (2, S2, C2), jnp.bfloat16)
    bt2 = BasicTransformerBlock(8, C2 // 8, dtype=jnp.bfloat16)
    p2 = jax.jit(bt2.init)(rng, x2, ctx)
    timed(f"basic_block_{S2}x{C2}", s(lambda p, x, c: bt2.apply(p, x, c)), p2, x2, ctx)
