"""Ring (context-parallel) attention vs the single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from powerpaint_tpu.ops.attention import xla_attention
from powerpaint_tpu.ops.ring_attention import ring_self_attention
from powerpaint_tpu.parallel.mesh import build_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("seq,heads,dim", [(512, 4, 16), (256, 2, 8)])
def test_ring_attention_matches_xla(seq, heads, dim):
    mesh = build_mesh(jax.devices()[:8], model_parallel=1)  # data=8 ring
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (2, seq, heads, dim), jnp.float32)
    k = jax.random.normal(kk, (2, seq, heads, dim), jnp.float32)
    v = jax.random.normal(kv, (2, seq, heads, dim), jnp.float32)

    want = xla_attention(q, k, v)

    with mesh:
        got = jax.jit(
            lambda q, k, v: ring_self_attention(q, k, v, mesh=mesh)
        )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ring_attention_with_model_parallel_mesh():
    """Ring over data=4 while model=2 exists (the serving mesh shape)."""
    mesh = build_mesh(jax.devices()[:8], model_parallel=2)
    rng = jax.random.PRNGKey(1)
    q, k, v = (
        jax.random.normal(key, (1, 256, 2, 8), jnp.float32)
        for key in jax.random.split(rng, 3)
    )
    want = xla_attention(q, k, v)
    with mesh:
        got = jax.jit(
            lambda q, k, v: ring_self_attention(q, k, v, mesh=mesh)
        )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )
