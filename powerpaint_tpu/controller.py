"""PowerPaint facade — the task router (reference ``PowerPaintController``,
app.py:83-543).

One object owning the loaded stacks, routing (task, control_type) to the
right pipeline with the reference's preprocessing policy: aspect resize to
640 short side (512 for outpainting), %8 crop, outpaint canvas construction,
red-overlay visualization and blur-blend compositing (app.py:245-473).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np

from powerpaint_tpu.tasks.postprocess import blend_result, red_overlay
from powerpaint_tpu.tasks.preprocess import (
    crop_to_multiple_of_8,
    outpaint_canvas,
    resize_short_side,
    to_numpy_image,
    to_numpy_mask,
)
from powerpaint_tpu.text.prompts import OUTPAINTING


@dataclasses.dataclass
class InferenceResult:
    result: np.ndarray  # blur-blended composite (H, W, 3) uint8
    raw: np.ndarray  # raw model output
    mask_overlay: np.ndarray  # red-overlay visualization
    timings_ms: Dict[str, float]
    nsfw_flags: Optional[list] = None


class PowerPaint:
    """infer() mirrors controller.infer routing (app.py:475-543)."""

    def __init__(self, pipeline, controlnet_pipeline=None):
        self.pipeline = pipeline
        self.controlnet_pipeline = controlnet_pipeline

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str, version: str = "ppt-v1",
                        dtype=None):
        import jax.numpy as jnp

        from powerpaint_tpu.io.checkpoint import load_ppt_v1, load_ppt_v2

        dtype = dtype or jnp.bfloat16
        if version == "ppt-v1":
            return cls(load_ppt_v1(checkpoint_dir, dtype=dtype))
        return cls(load_ppt_v2(checkpoint_dir, dtype=dtype))

    def infer(
        self,
        image,
        mask=None,
        *,
        task: str = "text-guided",
        prompt: str = "",
        negative_prompt: str = "",
        fitting_degree: float = 1.0,
        num_inference_steps: int = 45,
        guidance_scale: float = 7.5,
        seed: int = 0,
        control_type: Optional[str] = None,
        control_image=None,
        controlnet_conditioning_scale: float = 1.0,
        horizontal_expansion_ratio: float = 1.0,
        vertical_expansion_ratio: float = 1.0,
        short_side: int = 640,
        blend_blur_radius: float = 4.0,
        resolution_bucketing: bool = False,
        **pipeline_kwargs,
    ) -> InferenceResult:
        """``pipeline_kwargs`` pass through to the routed pipeline —
        e.g. scheduler=/strength=/eta= (v1), ip_adapter_image(_embeds)=/
        ip_adapter_scale=/guess_mode= (v2), per-branch lists (multi-CN).

        ``resolution_bucketing`` pads inputs to 64-pixel size buckets
        (edge pixels marked keep) and crops the result back: every
        distinct shape compiles a new XLA program (minutes on TPU), so
        bucketing caps compilations across arbitrary request sizes."""
        from powerpaint_tpu.core.metrics import GLOBAL as telemetry

        img = to_numpy_image(image)

        # reference resize policy: 640 short side for tasks, 512 for outpaint
        target = 512 if task == OUTPAINTING else short_side
        if min(img.shape[:2]) > target:
            img = resize_short_side(img, target)

        if task == OUTPAINTING:
            img, msk = outpaint_canvas(
                img, horizontal_expansion_ratio, vertical_expansion_ratio
            )
        else:
            if mask is None:
                raise ValueError(f"task {task!r} requires a mask")
            msk = to_numpy_mask(mask)
            if msk.shape[:2] != img.shape[:2]:
                msk = np.asarray(
                    resize_short_side(
                        (msk * 255).astype(np.uint8), min(img.shape[:2])
                    )
                ).astype(np.float32) / 255.0
                msk = msk[: img.shape[0], : img.shape[1]]

        img = crop_to_multiple_of_8(img)
        msk = msk[: img.shape[0], : img.shape[1]]

        orig_hw = None
        if resolution_bucketing:
            from powerpaint_tpu.tasks.preprocess import pad_to_bucket

            img, msk, orig_hw = pad_to_bucket(img, msk)
            if orig_hw == img.shape[:2]:
                orig_hw = None

        kwargs = dict(
            prompt=prompt,
            negative_prompt=negative_prompt,
            task=task,
            fitting_degree=fitting_degree,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            seed=seed,
            **pipeline_kwargs,
        )

        if control_type is not None:
            if self.controlnet_pipeline is None:
                raise ValueError(
                    "control_type given but no ControlNet pipeline loaded"
                )
            if control_image is None:
                from powerpaint_tpu.tasks.control import get_control_image

                control_image = get_control_image(control_type, img)
            out = self.controlnet_pipeline(
                img, msk, control_image=np.asarray(control_image),
                controlnet_conditioning_scale=controlnet_conditioning_scale,
                **kwargs,
            )
        else:
            out = self.pipeline(img, msk, **kwargs)

        from powerpaint_tpu.core.safety import apply_safety_checker

        out, nsfw_flags = apply_safety_checker(out)
        result = blend_result(out[0], img, msk, blur_radius=blend_blur_radius)
        raw = out[0]
        overlay = red_overlay(img, msk)
        if orig_hw is not None:
            from powerpaint_tpu.tasks.preprocess import crop_from_bucket

            result = crop_from_bucket(result, orig_hw)
            raw = crop_from_bucket(raw, orig_hw)
            overlay = crop_from_bucket(overlay, orig_hw)
        return InferenceResult(
            result=result,
            raw=raw,
            mask_overlay=overlay,
            timings_ms=telemetry.last_call_report(),
            nsfw_flags=nsfw_flags,
        )
