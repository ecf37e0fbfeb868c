"""Round-3 flash kernel A/B: VPU-lean kernel + block sweep at SD shapes."""
import json, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from powerpaint_tpu.ops.flash_attention import flash_attention

L, M = 20, 5
rng = jax.random.PRNGKey(0)

def timed(name, body, carry, flops, iters):
    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=L)
        return c
    c = run(carry); _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(M): c = run(c)
    _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]
    ms = (time.time()-t0)/(M*L)/iters*1000
    print(json.dumps({"name": name, "ms_per_op": round(ms,4),
                      "tflops_s": round(flops/(ms/1000)/1e12,1)}), flush=True)

for B, S, NH, D in ((2, 4096, 8, 40), (8, 4096, 8, 40), (2, 1024, 8, 80)):
    q = jax.random.normal(rng, (B, S, NH, D), jnp.bfloat16)
    flops = B*4*S*S*D*NH
    for bq, bkv in ((2048, 1024), (1024, 2048), (2048, 2048), (4096, 4096),
                    (1024, 4096), (512, 4096)):
        if bq > S or bkv > S:
            continue
        def body(c, _, bq=bq, bkv=bkv):
            y = c
            for _i in range(4):
                y = flash_attention(y, y, y, block_q=bq, block_kv=bkv)
            return y, ()
        timed(f"flash_B{B}_S{S}_D{D}_q{bq}_kv{bkv}", body, q, flops, 4)
