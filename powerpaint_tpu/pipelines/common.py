"""Small helpers shared by all three pipelines.

These existed as per-pipeline copies and had already started to drift
(the ControlNet multi form lost ``prompt_embeds`` forwarding that v1
kept); one definition each keeps the three call surfaces in lockstep.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

OUTPUT_TYPES = ("uint8", "float32", "latent")


def check_output_type(output_type: str) -> None:
    """Reference ``output_type`` contract (pil -> uint8 arrays here;
    "latent" returns undecoded denoised latents,
    pipeline_PowerPaint.py:1044-1055)."""
    if output_type not in OUTPUT_TYPES:
        from powerpaint_tpu.core.validation import InputValidationError

        raise InputValidationError(
            f"output_type must be uint8 | float32 | latent, got "
            f"{output_type!r}"
        )


def norm_embeds(e) -> Optional[np.ndarray]:
    """Normalize a user ``prompt_embeds``/``negative_prompt_embeds`` array
    to (B, 77, D) fp32 (reference passthrough surface,
    pipeline_PowerPaint.py:742-743)."""
    if e is None:
        return None
    e = np.asarray(e, np.float32)
    return e[None] if e.ndim == 2 else e


class StepCallbackMixin:
    """Per-call step-callback slot + host trampoline.

    The observation-only analog of the reference's per-call ``callback`` /
    ``callback_on_step_end`` (pipeline_PowerPaint.py:746,1039 and
    pipeline_PowerPaint_Brushnet_CA.py:1451-1466), invoked from inside the
    compiled scan through ``jax.debug.callback``; latent mutation from a
    callback is not supported — it would force a host round-trip into the
    jitted program.  NOTE: the slot is read at device-execution time, which
    is why ``submit()`` (async dispatch) rejects callbacks.
    """

    _active_callback = None
    _active_callback_steps = 1

    def _run_step_callback(self, i, latents) -> None:
        cb = self._active_callback
        if cb is not None and int(i) % self._active_callback_steps == 0:
            cb(int(i), latents)
