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
