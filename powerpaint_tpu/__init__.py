"""PowerPaint-TPU: TPU-native task-prompt diffusion inpainting framework.

Public API:
    controller.PowerPaint          — facade (load + route + composite)
    pipelines.inpaint.InpaintPipeline
    pipelines.brushnet.BrushNetPipeline
    pipelines.controlnet.ControlNetPipeline
    io.checkpoint.load_ppt_v1 / load_ppt_v2 / save_native / load_native
    core.config                    — frozen model/pipeline configs
"""

__version__ = "0.1.0"

from powerpaint_tpu.core import config  # noqa: F401


def load(checkpoint_dir: str, version: str = "ppt-v1", **kwargs):
    """Convenience: build a PowerPaint controller from a checkpoint dir."""
    from powerpaint_tpu.controller import PowerPaint

    return PowerPaint.from_checkpoint(checkpoint_dir, version, **kwargs)
