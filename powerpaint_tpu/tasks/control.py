"""Control-image preprocessors (canny / depth / HED / pose).

Counterpart of the reference's preprocessor stack (app.py:116-123, 202-243,
420-433): canny runs locally via cv2 (same 100/200 thresholds); HED and
OpenPose run natively on device (Flax models in models/annotators.py, fed by
the same published checkpoints the reference downloads); depth uses the
host-side transformers DPT as the reference does.  All are gated behind
``register_preprocessor`` (their weights are not bundled — the reference
downloads them from the hub at startup), matching the reference's hot-swap
design.
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


def _fit_resolution(h: int, w: int, resolution: int) -> tuple:
    """Short side -> ``resolution``, both sides rounded to multiples of 64
    (the annotator operating scale used by the reference's controlnet_aux
    detectors; also bounds XLA compilations to a few shape buckets)."""
    k = float(resolution) / min(h, w)
    return (max(64, int(round(h * k / 64.0)) * 64),
            max(64, int(round(w * k / 64.0)) * 64))


def safe_step(x: np.ndarray, step: int = 2) -> np.ndarray:
    """Quantize a [0,1] map to ``step`` levels (controlnet_aux 'safe' mode)."""
    y = x.astype(np.float32) * float(step + 1)
    return y.astype(np.int32).astype(np.float32) / float(step)


def nms_edges(x: np.ndarray, threshold: int, sigma: float) -> np.ndarray:
    """Directional non-maximum suppression of a uint8 edge map (the
    'scribble' post-pass of the reference HED preprocessor): keep pixels
    that are maxima of their 3-neighborhood along any of four line
    directions, then binarize."""
    import cv2

    blurred = cv2.GaussianBlur(x.astype(np.float32), (0, 0), sigma)
    kernels = [
        np.array([[0, 0, 0], [1, 1, 1], [0, 0, 0]], np.uint8),
        np.array([[0, 1, 0], [0, 1, 0], [0, 1, 0]], np.uint8),
        np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.uint8),
        np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], np.uint8),
    ]
    kept = np.zeros_like(blurred)
    for kernel in kernels:
        line_max = cv2.dilate(blurred, kernel)
        kept = np.where(line_max == blurred, blurred, kept)
    out = np.zeros_like(kept, np.uint8)
    out[kept > threshold] = 255
    return out


class HEDPreprocessor:
    """HED edge control map, natively on device (reference app.py:119 via
    controlnet_aux HEDdetector; network in models/annotators.py).

    Flow: resize the uint8 RGB input to the ``detect_resolution`` bucket,
    RGB->BGR (the published checkpoint is Caffe/BGR), one jitted
    HEDNetwork forward, resize the edge probability back, scale to uint8.
    ``safe`` quantizes intensities; ``scribble`` applies directional NMS +
    binarization (the reference's scribble variant).
    """

    def __init__(self, params=None, checkpoint=None,
                 detect_resolution: int = 512, safe: bool = False,
                 scribble: bool = False):
        import jax
        import jax.numpy as jnp

        from powerpaint_tpu.models.annotators import HEDNetwork

        if params is None:
            if checkpoint is None:
                raise ValueError("need params or checkpoint")
            from powerpaint_tpu.io.convert import convert_hed, load_state_dict

            params = convert_hed(load_state_dict(checkpoint))
        self.params = jax.tree.map(jnp.asarray, params)
        self.model = HEDNetwork()
        self.detect_resolution = detect_resolution
        self.safe = safe
        self.scribble = scribble
        self._apply = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)
        )

    def __call__(self, image: np.ndarray) -> np.ndarray:
        import cv2

        h0, w0 = image.shape[:2]
        h, w = _fit_resolution(h0, w0, self.detect_resolution)
        interp = cv2.INTER_AREA if h <= h0 else cv2.INTER_LANCZOS4
        scaled = cv2.resize(image, (w, h), interpolation=interp)
        # Deliberately NO RGB->BGR flip: controlnet_aux's HEDdetector (the
        # reference's preprocessor, app.py:9,433) feeds the RGB image
        # straight into the Caffe-trained network whose stored means are
        # BGR-ordered — sd-controlnet-hed was trained on THOSE edge maps,
        # so conditioning parity requires reproducing the idiosyncrasy.
        x = scaled.astype(np.float32)[None] / 255.0
        edge = np.asarray(self._apply(self.params, x)[0, :, :, 0], np.float32)
        if self.safe:
            edge = safe_step(edge)
        edge_u8 = (edge * 255.0).clip(0, 255).astype(np.uint8)
        edge_u8 = cv2.resize(edge_u8, (w0, h0),
                             interpolation=cv2.INTER_LINEAR)
        if self.scribble:
            edge_u8 = nms_edges(edge_u8, 127, 3.0)
            edge_u8 = cv2.GaussianBlur(edge_u8, (0, 0), 3.0)
            edge_u8 = np.where(edge_u8 > 4, 255, 0).astype(np.uint8)
        return np.stack([edge_u8] * 3, axis=-1)


def register_hed(**kwargs) -> "HEDPreprocessor":
    """Instantiate + register the native HED preprocessor as 'hed'."""
    pre = HEDPreprocessor(**kwargs)
    register_preprocessor("hed", pre)
    return pre


def register_openpose(**kwargs):
    """Instantiate + register the native OpenPose body preprocessor as
    'pose'."""
    from powerpaint_tpu.tasks.pose import OpenposeBodyPreprocessor

    pre = OpenposeBodyPreprocessor(**kwargs)
    register_preprocessor("pose", pre)
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
