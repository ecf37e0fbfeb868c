import json, time, functools
import numpy as np
import jax, jax.numpy as jnp
from powerpaint_tpu.ops.flash_attention import flash_attention as mine

rng = jax.random.PRNGKey(0)
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

for bq, bkv in [(4096, 1024), (4096, 2048), (2048, 2048), (2048, 512), (1024, 4096)]:
    timed(f"mine_{bq}_{bkv}", jax.jit(functools.partial(mine, block_q=bq, block_kv=bkv)), q, k, v)

# also level-2 shape (1024 seq, d=80) with best-so-far blocks
B2, S2, N2, D2 = 2, 1024, 8, 80
q2 = jax.random.normal(rng, (B2, S2, N2, D2), jnp.bfloat16)
k2 = jax.random.normal(rng, (B2, S2, N2, D2), jnp.bfloat16)
v2 = jax.random.normal(rng, (B2, S2, N2, D2), jnp.bfloat16)
timed("lvl2_mine_1024_1024", jax.jit(functools.partial(mine, block_q=1024, block_kv=1024)), q2, k2, v2)
from powerpaint_tpu.ops.attention import xla_attention
timed("lvl2_xla", jax.jit(xla_attention), q2, k2, v2)
