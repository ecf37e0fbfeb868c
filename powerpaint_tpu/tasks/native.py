"""ctypes binding for native image ops (native/image_ops.cpp): Gaussian mask
blur, blend compositing, red overlay.  Falls back to the numpy versions in
tasks/postprocess.py when the library isn't built."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native",
                         "libppt_image.so")


def _load_lib() -> Optional[ctypes.CDLL]:
    try:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.ppt_gaussian_blur.argtypes = [f32p, ctypes.c_int32, ctypes.c_int32,
                                      ctypes.c_float]
    lib.ppt_blend.argtypes = [u8p, u8p, f32p, ctypes.c_int32, ctypes.c_int32,
                              u8p]
    lib.ppt_red_overlay.argtypes = [u8p, f32p, ctypes.c_int32, ctypes.c_int32,
                                    ctypes.c_float, u8p]
    return lib


_LIB = _load_lib()


def native_available() -> bool:
    return _LIB is not None


def gaussian_blur(mask: np.ndarray, radius: float) -> np.ndarray:
    out = np.ascontiguousarray(mask, dtype=np.float32).copy()
    _LIB.ppt_gaussian_blur(out, out.shape[0], out.shape[1], float(radius))
    return out


def blend_result(result: np.ndarray, original: np.ndarray, mask: np.ndarray,
                 blur_radius: float = 4.0) -> np.ndarray:
    m = gaussian_blur(mask, blur_radius)
    h, w = m.shape
    out = np.empty((h, w, 3), np.uint8)
    _LIB.ppt_blend(
        np.ascontiguousarray(result, np.uint8),
        np.ascontiguousarray(original, np.uint8), m, h, w, out,
    )
    return out


def red_overlay(image: np.ndarray, mask: np.ndarray,
                alpha: float = 0.5) -> np.ndarray:
    h, w = mask.shape
    out = np.empty((h, w, 3), np.uint8)
    _LIB.ppt_red_overlay(
        np.ascontiguousarray(image, np.uint8),
        np.ascontiguousarray(mask, np.float32), h, w, float(alpha), out,
    )
    return out
