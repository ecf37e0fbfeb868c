"""Dtype policy for TPU.

The reference runs fp16 on CUDA (app.py:548,559).  On TPU the native fast
dtype is bfloat16: params and activations are bf16 by default, with fp32
accumulation inside matmuls (``preferred_element_type``), GroupNorm/LayerNorm
statistics, and attention softmax.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32   # storage dtype of the param tree
    compute_dtype: jnp.dtype = jnp.bfloat16  # activations / matmul inputs
    accum_dtype: jnp.dtype = jnp.float32   # matmul accum, norm stats, softmax

    def cast(self, x):
        return x.astype(self.compute_dtype) if hasattr(x, "astype") else x


DEFAULT = DTypePolicy()
BF16 = DTypePolicy(param_dtype=jnp.bfloat16)
FP32 = DTypePolicy(compute_dtype=jnp.float32)


def policy(name: str) -> DTypePolicy:
    return {
        "default": DEFAULT,
        "bfloat16": BF16,
        "bf16": BF16,
        "float32": FP32,
        "fp32": FP32,
    }[name]
