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


class DPTDepthPreprocessor:
    """DPT monocular depth control map (reference get_depth_map,
    app.py:116-123, 202-221): DPT forward -> bicubic upsample -> per-image
    min/max normalize -> 3-channel uint8.

    Runs the host-side torch DPT from transformers (the reference does the
    same; this is request-time preprocessing, not the TPU compute path).
    Pass a local checkpoint path for real weights ("Intel/dpt-hybrid-midas"
    layout) or ``model``/``processor`` instances directly (tests use a tiny
    random-init DPT).
    """

    def __init__(self, checkpoint: str = "Intel/dpt-hybrid-midas",
                 model=None, processor=None, output_size=(1024, 1024)):
        import transformers

        if model is None:
            model = transformers.DPTForDepthEstimation.from_pretrained(
                checkpoint, local_files_only=True
            )
        if processor is None:
            processor = transformers.DPTImageProcessor.from_pretrained(
                checkpoint, local_files_only=True
            )
        self.model = model.eval()
        self.processor = processor
        self.output_size = output_size

    def __call__(self, image: np.ndarray) -> np.ndarray:
        import torch

        inputs = self.processor(images=image, return_tensors="pt")
        with torch.no_grad():
            depth = self.model(
                pixel_values=inputs["pixel_values"]
            ).predicted_depth
        depth = torch.nn.functional.interpolate(
            depth.unsqueeze(1), size=self.output_size, mode="bicubic",
            align_corners=False,
        )
        dmin = depth.amin(dim=[1, 2, 3], keepdim=True)
        dmax = depth.amax(dim=[1, 2, 3], keepdim=True)
        depth = (depth - dmin) / torch.clamp(dmax - dmin, min=1e-8)
        out = depth[0, 0].cpu().numpy()
        out = (out * 255.0).clip(0, 255).astype(np.uint8)
        return np.stack([out] * 3, axis=-1)


def register_dpt_depth(**kwargs) -> "DPTDepthPreprocessor":
    """Instantiate + register the DPT depth preprocessor as 'depth'."""
    pre = DPTDepthPreprocessor(**kwargs)
    register_preprocessor("depth", pre)
    return pre


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
