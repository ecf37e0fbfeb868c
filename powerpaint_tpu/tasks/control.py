"""Control-image preprocessors (canny / depth / HED / pose).

Counterpart of the reference's preprocessor stack (app.py:116-123, 202-243,
420-433): canny runs locally via cv2 (same 100/200 thresholds); depth / HED /
openpose require external model checkpoints (DPT, controlnet_aux) which are
optional — they are gated behind ``register_preprocessor`` so deployments can
plug in their own implementations, matching the reference's hot-swap design.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

_REGISTRY: Dict[str, Callable[[np.ndarray], np.ndarray]] = {}


def register_preprocessor(name: str, fn: Callable[[np.ndarray], np.ndarray]):
    _REGISTRY[name] = fn


def canny(image: np.ndarray, low: int = 100, high: int = 200) -> np.ndarray:
    """cv2.Canny with the reference thresholds (app.py:420-424)."""
    import cv2

    edges = cv2.Canny(image, low, high)
    return np.stack([edges] * 3, axis=-1)


register_preprocessor("canny", canny)


def get_control_image(control_type: str, image: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 control map for the given type.

    depth/hed/pose raise with guidance unless an implementation was
    registered (their models are not bundled — reference downloads them from
    the hub at startup, app.py:116-123)."""
    if control_type in _REGISTRY:
        return _REGISTRY[control_type](image)
    raise NotImplementedError(
        f"control type {control_type!r} requires an external model; register "
        "one via powerpaint_tpu.tasks.control.register_preprocessor"
        f" (available: {sorted(_REGISTRY)})"
    )
