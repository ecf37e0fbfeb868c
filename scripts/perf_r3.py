"""Round-3 perf decomposition at SD1.5 shapes (scan protocol, real TPU).

Where does the 23.7 ms/step (v1) go, and which of the quantified levers
(320-level conv, transformer glue, attention) can actually pay?  Every
measurement is jit(lax.scan(body, length=L)) with M queued calls and ONE
host fetch (the only reliable fence on the axon relay).
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

L = 20   # scan length
M = 5    # queued calls

rng = jax.random.PRNGKey(0)
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def timed(name, make_body, carry, flops_per_iter=None):
    """make_body: () -> (body(c, _) -> (c, ())). Returns ms per iter."""
    body = make_body()

    @jax.jit
    def run(c):
        c, _ = jax.lax.scan(body, c, None, length=L)
        return c

    c = run(carry)
    _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]  # fence
    t0 = time.time()
    for _ in range(M):
        c = run(c)
    _ = np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]
    ms = (time.time() - t0) / (M * L) * 1000
    rec = {"name": name, "batch": BATCH, "ms": round(ms, 3)}
    if flops_per_iter:
        rec["tflops_s"] = round(flops_per_iter / (ms / 1000) / 1e12, 1)
    print(json.dumps(rec), flush=True)
    return ms


B = BATCH
S, C, NH, D = 64 * 64, 320, 8, 40
x_img = jax.random.normal(rng, (B, 64, 64, C), jnp.bfloat16)
x_seq = jax.random.normal(rng, (B, S, C), jnp.bfloat16)
ctx = jax.random.normal(rng, (B, 77, 768), jnp.bfloat16)
temb = jax.random.normal(rng, (B, 1280), jnp.bfloat16)

# ---- full transformer block at the hot level --------------------------
from powerpaint_tpu.models.transformer import Transformer2DModel  # noqa: E402

tr = Transformer2DModel(NH, D, dtype=jnp.bfloat16)
tp = jax.jit(tr.init)(rng, x_img, ctx)


def mk_tr():
    def body(c, _):
        out = tr.apply(tp, c, ctx)
        return out.astype(c.dtype), ()
    return body


# flops: qkv+o self (4*S*C*C), attn (4*S*S*D*NH), cross qkv (S*C*C + 2*77*C*C... approx),
# ff (2*S*C*4C*2... GEGLU: S*C*8C + S*4C*C), proj_in/out convs 2*S*C*C
flops_tr = B * (
    4 * S * C * C * 2            # self qkv + out proj (2 flops/MAC)
    + 4 * S * S * D * NH         # self attention dots
    + (S * C * C + 2 * 77 * C * C + S * C * C) * 2  # cross q, kv, out
    + 2 * S * 40 * 77 * NH * 2   # cross attention dots
    + (S * C * 8 * C + S * 4 * C * C) * 2  # GEGLU ff
    + 2 * S * C * C * 2          # proj_in/out 1x1
)
t_block = timed("transformer_block_64x64x320", mk_tr, x_img, flops_tr)

# ---- attention only ---------------------------------------------------
from powerpaint_tpu.ops.attention import attention  # noqa: E402

q4 = jax.random.normal(rng, (B, S, NH, D), jnp.bfloat16)


def mk_attn():
    def body(c, _):
        out = attention(c, c, c)
        return out.astype(c.dtype), ()
    return body


flops_attn = B * 4 * S * S * D * NH
t_attn = timed("self_attention_4096xD40", mk_attn, q4, flops_attn)

# ---- GEMM core only (qkv, out, cross, ff, proj as plain dots) ---------
Wc = jax.random.normal(rng, (C, C), jnp.bfloat16)
Wff1 = jax.random.normal(rng, (C, 8 * C), jnp.bfloat16)
Wff2 = jax.random.normal(rng, (4 * C, C), jnp.bfloat16)


def mk_gemms():
    def body(c, _):
        y = c
        for _i in range(6):  # qkv, o, cross q, cross o
            y = jax.lax.dot_general(
                y, Wc, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        g = jax.lax.dot_general(
            y, Wff1, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h, gate = jnp.split(g, 2, axis=-1)
        h = (h * jax.nn.gelu(gate)).astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            h, Wff2, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        # keep the chain live without feeding y's magnitude back (XLA
        # folds a literal 0.0*y to zero and DCEs the whole body)
        return c + 1e-6 * y.astype(c.dtype), ()
    return body


flops_gemms = B * (6 * S * C * C + S * C * 8 * C + S * 4 * C * C) * 2
timed("gemm_core_6xCxC_plus_ff", mk_gemms, x_seq, flops_gemms)

# ---- layernorm cost ---------------------------------------------------
from powerpaint_tpu.models.layers import LayerNorm  # noqa: E402

ln = LayerNorm(1e-5, jnp.float32)
lp = jax.jit(ln.init)(rng, x_seq)


def mk_ln():
    def body(c, _):
        y = ln.apply(lp, c)
        y2 = ln.apply(lp, y)
        y3 = ln.apply(lp, y2)
        return y3.astype(c.dtype), ()
    return body


timed("layernorm_x3_4096x320", mk_ln, x_seq)

# ---- conv 3x3 at the hot level: plain vs channel-padded ---------------
K = jax.random.normal(rng, (3, 3, C, C), jnp.bfloat16)
K384 = jnp.pad(K, ((0, 0), (0, 0), (0, 64), (0, 64)))
x384 = jnp.pad(x_img, ((0, 0), (0, 0), (0, 0), (0, 64)))

dn = jax.lax.conv_dimension_numbers((B, 64, 64, C), (3, 3, C, C),
                                    ("NHWC", "HWIO", "NHWC"))
dn384 = jax.lax.conv_dimension_numbers((B, 64, 64, 384), (3, 3, 384, 384),
                                       ("NHWC", "HWIO", "NHWC"))


def mk_conv(kern, dnum):
    def body(c, _):
        y = jax.lax.conv_general_dilated(
            c, kern, (1, 1), "SAME", dimension_numbers=dnum,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        return y, ()
    return body


flops_conv = B * S * 9 * C * C * 2
timed("conv3x3_64x64_320to320", lambda: mk_conv(K, dn), x_img, flops_conv)
flops_conv384 = B * S * 9 * 384 * 384 * 2
timed("conv3x3_64x64_384to384pad", lambda: mk_conv(K384, dn384), x384,
      flops_conv384)

# ---- resnet at the hot level vs its conv core -------------------------
from powerpaint_tpu.models.resnet import ResnetBlock2D  # noqa: E402

res = ResnetBlock2D(C, dtype=jnp.bfloat16)
rp = jax.jit(res.init)(rng, x_img, temb)


def mk_res():
    def body(c, _):
        y = res.apply(rp, c, temb)
        return y.astype(c.dtype), ()
    return body


flops_res = B * S * 9 * C * C * 2 * 2  # two 3x3 convs
timed("resnet_block_64x64x320", mk_res, x_img, flops_res)


def mk_conv2():
    inner = mk_conv(K, dn)

    def body(c, _):
        y, _ = inner(c, None)
        y, _ = inner(y, None)
        return y, ()
    return body


timed("conv3x3_x2_64x64_320", mk_conv2, x_img, flops_res)
