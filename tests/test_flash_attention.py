"""Pallas flash attention vs XLA reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.ops.attention import xla_attention
from powerpaint_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize(
    "b,sq,skv,n,d,block",
    [
        (1, 256, 256, 2, 64, 128),      # even blocks
        (2, 300, 300, 2, 40, 128),      # ragged seq, SD head_dim 40
        (1, 128, 77, 1, 64, 64),        # cross-attention-like ragged kv
        (1, 512, 512, 4, 160, 256),     # SD mid-block head_dim
    ],
)
def test_flash_matches_xla(b, sq, skv, n, d, block):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, sq, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, skv, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, skv, n, d), jnp.float32)
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=block, block_kv=block,
                          debug_interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16_close_to_fp32():
    rng = np.random.RandomState(1)
    q = rng.randn(1, 256, 2, 64).astype(np.float32)
    k = rng.randn(1, 256, 2, 64).astype(np.float32)
    v = rng.randn(1, 256, 2, 64).astype(np.float32)
    ref = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    out = flash_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), debug_interpret=True,
    )
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).mean()
    assert err < 0.02, err


def test_exp2_softmax_matches_exp():
    """The exp2 path (log2(e) folded into the q scale, round-3 perf mode)
    is the same softmax in different log units — outputs must agree with
    the natural-exp path to fp tolerance at bf16 and fp32."""
    rng = np.random.RandomState(2)
    for dt, atol in ((jnp.float32, 3e-6), (jnp.bfloat16, 2e-2)):
        q = jnp.asarray(rng.randn(2, 300, 2, 40), dt)
        k = jnp.asarray(rng.randn(2, 300, 2, 40), dt)
        v = jnp.asarray(rng.randn(2, 300, 2, 40), dt)
        a = flash_attention(q, k, v, block_q=128, block_kv=128,
                            debug_interpret=True, use_exp2=False)
        b = flash_attention(q, k, v, block_q=128, block_kv=128,
                            debug_interpret=True, use_exp2=True)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=atol)
