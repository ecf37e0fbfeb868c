"""Safety-checker hook (reference ``StableDiffusionSafetyChecker`` usage,
pipeline_PowerPaint.py:520-533; an ``_optional_components`` member — the v2
stack loads with ``safety_checker=None``, app.py:163).

The checker is a pluggable callable ``images_uint8 -> list[bool]`` (True =
flagged).  Flagged images are blacked out, matching the reference's
behavior.  ``register_safety_checker`` installs a global default; deployments
supply their own model (the reference's CLIP-based checker needs its own
checkpoint, which is loaded like any other converted model)."""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

SafetyChecker = Callable[[np.ndarray], List[bool]]

_CHECKER: Optional[SafetyChecker] = None


def register_safety_checker(fn: Optional[SafetyChecker]) -> None:
    global _CHECKER
    _CHECKER = fn


def get_safety_checker() -> Optional[SafetyChecker]:
    return _CHECKER


def apply_safety_checker(
    images: np.ndarray, checker: Optional[SafetyChecker] = None
):
    """(images, has_nsfw_flags): flagged images are zeroed (black), as the
    reference does via the checker's own replacement."""
    checker = checker if checker is not None else _CHECKER
    if checker is None:
        return images, [False] * images.shape[0]
    flags = list(checker(images))
    out = images.copy()
    for i, bad in enumerate(flags):
        if bad:
            out[i] = 0
    return out, flags


# CLIP normalization constants (transformers CLIPImageProcessor defaults)
_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPSafetyChecker:
    """The actual CLIP-based checker (reference
    ``StableDiffusionSafetyChecker`` + CLIPImageProcessor,
    pipeline_PowerPaint.py:520-533) as a registrable hook: bilinear-resize
    uint8 images to the tower's input size, CLIP-normalize, run the jitted
    flax checker (models/clip_vision.py), return per-image flags.

    ``params`` come from io.convert.convert_safety_checker on a real
    checkpoint (or random init for tests)."""

    def __init__(self, config, params, dtype=None):
        import jax
        import jax.numpy as jnp

        from powerpaint_tpu.models.clip_vision import (
            StableDiffusionSafetyChecker,
        )

        self.config = config
        self.params = params
        model = StableDiffusionSafetyChecker(
            config,
            num_concepts=int(params["concept_embeds"].shape[0]),
            num_special=int(params["special_care_embeds"].shape[0]),
            dtype=dtype or jnp.float32,
        )
        self._flags = jax.jit(
            lambda p, x: model.apply({"params": p}, x)
        )

    def __call__(self, images: np.ndarray) -> List[bool]:
        import jax.numpy as jnp
        from PIL import Image

        s = self.config.image_size
        batch = np.stack([
            np.asarray(
                Image.fromarray(img).resize((s, s), Image.BICUBIC),
                dtype=np.float32,
            )
            for img in images
        ])
        batch = (batch / 255.0 - _CLIP_MEAN) / _CLIP_STD
        flags = self._flags(self.params, jnp.asarray(batch))
        return [bool(f) for f in np.asarray(flags)]
