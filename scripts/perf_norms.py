"""Fused vs XLA norms on TPU (amortized scan protocol)."""
import json, time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from powerpaint_tpu.ops.norms_pallas import layer_norm_fused, group_norm_fused
from powerpaint_tpu.ops import groupnorm as gnmod

L, M = 20, 5
rng = jax.random.PRNGKey(0)

def timed(name, body, carry, iters):
    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=L)
        return c
    c = run(carry); _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(M): c = run(c)
    _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]
    print(json.dumps({"name": name,
                      "ms_per_op": round((time.time()-t0)/(M*L)/iters*1000, 4)}),
          flush=True)

for B in (2, 8):
    xs = jax.random.normal(rng, (B, 4096, 320), jnp.bfloat16)
    g = jnp.ones((320,)); b = jnp.zeros((320,))
    def ln_xla(c, _):
        y = c
        for _ in range(10):
            y = gnmod.layer_norm(y, None, None).astype(c.dtype)  # hits XLA path (no gamma)
        return y, ()
    timed(f"ln_xla_B{B}", ln_xla, xs, 10)
    def ln_fused(c, _):
        y = c
        for _ in range(10):
            y = layer_norm_fused(y, g, b).astype(c.dtype)
        return y, ()
    timed(f"ln_fused_B{B}", ln_fused, xs, 10)

    xi = jax.random.normal(rng, (B, 64, 64, 320), jnp.bfloat16)
    import os
    def gn_xla(c, _):
        os.environ["POWERPAINT_FUSED_NORMS"] = "0"
        y = c
        for _ in range(10):
            y = gnmod.group_norm(y, g, b, num_groups=32, silu=True).astype(c.dtype)
        os.environ["POWERPAINT_FUSED_NORMS"] = "1"
        return y, ()
    timed(f"gn_silu_xla_B{B}", gn_xla, xi, 10)
    def gn_fused(c, _):
        y = c
        for _ in range(10):
            y = group_norm_fused(y, g, b, num_groups=32, silu=True).astype(c.dtype)
        return y, ()
    timed(f"gn_silu_fused_B{B}", gn_fused, xi, 10)
