"""FreeU (Si et al. 2023) — free-lunch quality knob on UNet up-blocks.

The reference exposes enable_freeu through its forked UNet
(unet_2d_condition.py FreeU path; unet_2d_blocks.py apply_freeu).  Semantics:
in the first two up blocks, scale the backbone hidden states' low-order
channels by b1/b2 and low-pass-filter the skip connections scaled by s1/s2
in Fourier space.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class FreeUConfig(NamedTuple):
    b1: float = 1.5
    b2: float = 1.6
    s1: float = 0.9
    s2: float = 0.2


def fourier_filter(x: jnp.ndarray, threshold: int, scale: float) -> jnp.ndarray:
    """Scale low-frequency components of (B, H, W, C) by ``scale``."""
    orig_dtype = x.dtype
    xf = jnp.fft.fftn(x.astype(jnp.float32), axes=(1, 2))
    xf = jnp.fft.fftshift(xf, axes=(1, 2))
    b, h, w, c = x.shape
    cy, cx = h // 2, w // 2
    yy = jnp.abs(jnp.arange(h) - cy)[:, None]
    xx = jnp.abs(jnp.arange(w) - cx)[None, :]
    low = (yy < threshold) & (xx < threshold)
    mask = jnp.where(low, scale, 1.0)[None, :, :, None]
    xf = xf * mask
    xf = jnp.fft.ifftshift(xf, axes=(1, 2))
    out = jnp.fft.ifftn(xf, axes=(1, 2)).real
    return out.astype(orig_dtype)


def apply_freeu(
    resolution_idx: int,
    hidden: jnp.ndarray,
    skip: jnp.ndarray,
    cfg: Optional[FreeUConfig],
):
    """Apply to (hidden, skip) at up-block ``resolution_idx`` (0 and 1 only,
    matching diffusers apply_freeu)."""
    if cfg is None:
        return hidden, skip
    if resolution_idx == 0:
        n = hidden.shape[-1] // 2
        hidden = hidden.at[..., :n].multiply(cfg.b1)
        skip = fourier_filter(skip, threshold=1, scale=cfg.s1)
    elif resolution_idx == 1:
        n = hidden.shape[-1] // 2
        hidden = hidden.at[..., :n].multiply(cfg.b2)
        skip = fourier_filter(skip, threshold=1, scale=cfg.s2)
    return hidden, skip
