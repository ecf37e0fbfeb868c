"""Input validation — the failure-detection layer (SURVEY.md §5.3).

The reference guards its pipelines with ``check_inputs`` ValueErrors
(pipeline_PowerPaint.py:553-602, pipeline_PowerPaint_Brushnet_CA.py:753-866).
Equivalent checks here, raised BEFORE any device work, with actionable
messages (the raw alternative is a cryptic XLA shape error mid-jit).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from powerpaint_tpu.text.prompts import TASKS


class InputValidationError(ValueError):
    pass


def check_image_mask(image: np.ndarray, mask: np.ndarray) -> None:
    if image.ndim != 3 or image.shape[-1] != 3:
        raise InputValidationError(
            f"image must be (H, W, 3), got {image.shape}"
        )
    if mask.ndim != 2:
        raise InputValidationError(f"mask must be (H, W), got {mask.shape}")
    if image.shape[:2] != mask.shape[:2]:
        raise InputValidationError(
            f"image {image.shape[:2]} and mask {mask.shape[:2]} sizes differ; "
            "resize the mask to the image first"
        )
    h, w = image.shape[:2]
    if h % 8 or w % 8:
        raise InputValidationError(
            f"height/width must be multiples of 8, got {h}x{w} "
            "(use tasks.preprocess.crop_to_multiple_of_8)"
        )


def check_clip_skip(clip_skip: int, num_hidden_layers: int) -> None:
    """The encoder captures layer ``L - clip_skip``; outside [0, L-1] the
    capture condition never fires and the value would be silently ignored
    (the diffusers reference raises an IndexError instead)."""
    if not 0 <= int(clip_skip) <= num_hidden_layers - 1:
        raise InputValidationError(
            f"clip_skip must be in [0, {num_hidden_layers - 1}] for a "
            f"{num_hidden_layers}-layer text encoder, got {clip_skip}"
        )


def check_call_args(
    *,
    task: str,
    num_inference_steps: int,
    guidance_scale: float,
    strength: float = 1.0,
    fitting_degree: float = 1.0,
    control_guidance_start: float = 0.0,
    control_guidance_end: float = 1.0,
) -> None:
    if task not in TASKS:
        raise InputValidationError(f"unknown task {task!r}; one of {TASKS}")
    if not 1 <= num_inference_steps <= 1000:
        raise InputValidationError(
            f"num_inference_steps must be in [1, 1000], got {num_inference_steps}"
        )
    if guidance_scale < 0:
        raise InputValidationError(
            f"guidance_scale must be >= 0, got {guidance_scale}"
        )
    if not 0 < strength <= 1:
        raise InputValidationError(
            f"strength must be in (0, 1], got {strength}"
        )
    if not 0 <= fitting_degree <= 1:
        raise InputValidationError(
            f"fitting_degree must be in [0, 1], got {fitting_degree}"
        )
    if not 0 <= control_guidance_start <= control_guidance_end <= 1:
        raise InputValidationError(
            "need 0 <= control_guidance_start <= control_guidance_end <= 1, "
            f"got [{control_guidance_start}, {control_guidance_end}]"
        )


def check_scheduler(name: str, scheduler_config, num_steps: int):
    """Resolve + dry-build the sampler's tables ON THE HOST so bad
    combinations (unknown name, lcm steps > original_inference_steps,
    degenerate grids) surface as InputValidationError — an HTTP 400 — at
    call time instead of a raw ValueError mid-jit-dispatch (a 500).
    Returns the scheduler module (callers use its optional
    ``iteration_step_map`` hook).  Table construction is host numpy —
    microseconds next to the generate call."""
    from powerpaint_tpu import schedulers as _registry

    if not 1 <= int(num_steps) <= 1000:  # bound BEFORE building tables
        raise InputValidationError(
            f"num_inference_steps must be in [1, 1000], got {num_steps}"
        )
    try:
        mod, make = _registry.get(name)
        make(scheduler_config, num_steps)
    except ValueError as e:
        raise InputValidationError(str(e)) from e
    return mod


def check_control_image(
    control_image: Optional[np.ndarray], image: np.ndarray
) -> None:
    if control_image is None:
        return
    if control_image.shape[:2] != image.shape[:2]:
        raise InputValidationError(
            f"control image {control_image.shape[:2]} must match image "
            f"{image.shape[:2]}"
        )
