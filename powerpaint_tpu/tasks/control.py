"""Control-image preprocessors (canny / depth / HED / pose).

Counterpart of the reference's preprocessor stack (app.py:116-123, 202-243,
420-433): canny runs locally via cv2 (same 100/200 thresholds); HED,
OpenPose AND depth run natively on device (Flax models in
models/annotators.py and models/dpt.py, fed by the same published
checkpoints the reference downloads).  All are gated behind
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


def _cubic_weights(n_in: int, n_out: int, a: float = -0.75):
    """Separable cubic-convolution resampling taps, torch
    ``interpolate(mode='bicubic', align_corners=False)`` semantics:
    half-pixel centers, Keys kernel with A=-0.75, border replication.
    Returns (indices (n_out, 4) int, weights (n_out, 4) float32)."""
    pos = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
    i0 = np.floor(pos).astype(np.int64)
    idx = np.stack([i0 - 1, i0, i0 + 1, i0 + 2], axis=1)
    t = np.abs(pos[:, None] - idx)
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t ** 3 - (a + 3.0) * t ** 2 + 1.0,
        np.where(t < 2.0,
                 a * t ** 3 - 5.0 * a * t ** 2 + 8.0 * a * t - 4.0 * a,
                 0.0),
    )
    return np.clip(idx, 0, n_in - 1), w.astype(np.float32)


def resize_bicubic(x, oh: int, ow: int):
    """(B, H, W) jnp bicubic resize matching torch align_corners=False."""
    import jax.numpy as jnp

    b, h, w = x.shape
    yi, yw = _cubic_weights(h, oh)
    xi, xw = _cubic_weights(w, ow)
    rows = jnp.take(x, jnp.asarray(yi.ravel()), axis=1)
    rows = rows.reshape(b, oh, 4, w) * jnp.asarray(yw)[None, :, :, None]
    rows = rows.sum(axis=2)                                   # (B, oh, W)
    cols = jnp.take(rows, jnp.asarray(xi.ravel()), axis=2)
    cols = cols.reshape(b, oh, ow, 4) * jnp.asarray(xw)[None, None]
    return cols.sum(axis=3)


class DPTDepthPreprocessor:
    """DPT monocular depth control map (reference get_depth_map,
    app.py:116-123, 202-221): DPT forward -> bicubic upsample -> per-image
    min/max normalize -> 3-channel uint8.

    Runs the NATIVE Flax DPT-hybrid (models/dpt.py) on device — the torch
    ``DPTForDepthEstimation`` the reference uses stays host-side; this port
    removes the last torch compute from the serving path.  Pass a local
    checkpoint dir ("Intel/dpt-hybrid-midas" layout: config.json +
    weights) for real weights, or ``params``/``config`` directly (tests
    use a tiny random-init stack converted through io/convert.convert_dpt).
    """

    def __init__(self, checkpoint: str | None = None, params=None,
                 config=None, output_size=(1024, 1024), dtype=None):
        import jax
        import jax.numpy as jnp

        from powerpaint_tpu.models.dpt import DPTDepthModel

        if params is None:
            if checkpoint is None:
                raise ValueError("need params or checkpoint")
            import glob
            import os

            import transformers

            from powerpaint_tpu.io.convert import (
                convert_dpt,
                dpt_config_from_hf,
                load_state_dict,
            )

            hf_cfg = transformers.DPTConfig.from_pretrained(
                checkpoint, local_files_only=True)
            config = dpt_config_from_hf(hf_cfg)
            files = (glob.glob(os.path.join(checkpoint, "*.safetensors"))
                     or glob.glob(os.path.join(checkpoint, "*.bin")))
            if not files:
                raise FileNotFoundError(f"no weights under {checkpoint}")
            params = convert_dpt(load_state_dict(files[0]))
        if config is None:
            raise ValueError("need config with params")
        self.config = config
        self.params = jax.tree.map(jnp.asarray, params)
        self.model = DPTDepthModel(config, dtype or jnp.float32)
        self.output_size = output_size

        def run(p, x):
            depth = self.model.apply({"params": p}, x)
            up = resize_bicubic(depth, *output_size)
            dmin = jnp.min(up, axis=(1, 2), keepdims=True)
            dmax = jnp.max(up, axis=(1, 2), keepdims=True)
            return (up - dmin) / jnp.maximum(dmax - dmin, 1e-8)

        self._run = jax.jit(run)

    def _preprocess(self, image: np.ndarray) -> np.ndarray:
        """uint8 RGB -> (1, S, S, 3) float32, the DPTImageProcessor
        transform (bicubic resize to the model's square input, rescale
        1/255, normalize mean/std 0.5)."""
        from PIL import Image

        s = self.config.image_size
        pil = Image.fromarray(image).resize((s, s), Image.BICUBIC)
        x = np.asarray(pil, np.float32) / 255.0
        return ((x - 0.5) / 0.5)[None]

    def __call__(self, image: np.ndarray) -> np.ndarray:
        out = np.asarray(self._run(self.params, self._preprocess(image))[0])
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
