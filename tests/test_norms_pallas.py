"""Fused Pallas LayerNorm / GroupNorm parity vs the XLA formulation
(interpret mode on CPU; the real kernels run the same code on TPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from powerpaint_tpu.ops.groupnorm import group_norm, layer_norm  # noqa: E402
from powerpaint_tpu.ops.norms_pallas import (  # noqa: E402
    group_norm_fused,
    layer_norm_fused,
)


@pytest.mark.parametrize("shape", [(2, 4096, 320), (1, 77, 768),
                                   (3, 100, 640)])
def test_layer_norm_fused_matches_xla(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 3 + 0.5)
    g = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    b = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    want = layer_norm(x, g, b, eps=1e-5)
    got = layer_norm_fused(x, g, b, eps=1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    # bf16 inputs
    xb = x.astype(jnp.bfloat16)
    want = layer_norm(xb, g, b, eps=1e-5)
    got = layer_norm_fused(xb, g, b, eps=1e-5, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=4e-2,
    )


@pytest.mark.parametrize("shape,groups,silu", [
    ((2, 64, 64, 320), 32, True),
    ((2, 64, 64, 320), 32, False),
    ((1, 16, 16, 128), 8, True),
    ((4, 8, 8, 64), 4, False),
])
def test_group_norm_fused_matches_xla(shape, groups, silu):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2 - 0.3)
    g = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    b = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    want = group_norm(x, g, b, num_groups=groups, eps=1e-6, silu=silu)
    got = group_norm_fused(x, g, b, num_groups=groups, eps=1e-6, silu=silu,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_group_norm_fused_bf16():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 32, 32, 64).astype(np.float32))
    g = jnp.asarray(rng.randn(64).astype(np.float32))
    b = jnp.asarray(rng.randn(64).astype(np.float32))
    want = group_norm(x.astype(jnp.bfloat16), g, b, num_groups=8, silu=True)
    got = group_norm_fused(x.astype(jnp.bfloat16), g, b, num_groups=8,
                           silu=True, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2
    )
