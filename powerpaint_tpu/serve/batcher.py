"""Serving micro-batcher: coalesce concurrent requests into one generate.

The reference serializes requests (gradio demo.queue(), app.py:748); on TPU
the measured batch win (PARITY.md: 1.69 -> 2.05+ img/s at batch 4) makes
coalescing free throughput.  Requests that arrive within ``window_ms`` and
share the same compiled program (shape + static args) run as ONE jitted
generate with per-request prompts / fitting degrees / guidance scales /
seeds (pipelines/inpaint.py's multi-request form).  Per-image noise depends
only on each request's own seed, so batched results are bit-identical to
standalone runs.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


# per-request fields become parallel lists in the batched call; everything
# in SHARED must match for two requests to share a compiled program
PER_REQUEST = ("prompt", "negative_prompt", "fitting_degree",
               "guidance_scale", "seed")
PER_REQUEST_DEFAULTS = {"prompt": "", "negative_prompt": "",
                        "fitting_degree": 1.0, "guidance_scale": 7.5,
                        "seed": 0}
SHARED = ("task", "num_inference_steps", "strength", "scheduler", "eta",
          "brushnet_conditioning_scale", "controlnet_conditioning_scale",
          "control_guidance_start", "control_guidance_end", "guess_mode",
          "ip_adapter_scale", "encoder_cache_interval",
          "branch_cache_interval", "clip_skip")


def _hashable(v):
    return tuple(v) if isinstance(v, list) else v


@dataclasses.dataclass
class _Pending:
    image: np.ndarray  # (H, W, 3) uint8
    mask: np.ndarray  # (H, W) float
    kwargs: Dict[str, Any]
    event: threading.Event = dataclasses.field(
        default_factory=threading.Event
    )
    result: Optional[np.ndarray] = None
    error: Optional[BaseException] = None

    def batchable(self) -> bool:
        # eta noise is keyed per call, not per image; IP embeds are per
        # call too — run those alone.  Control requests batch with each
        # other (per-image control stacks along B; per-image seeds make
        # batched == standalone, pipelines/controlnet.py::_call_multi)
        k = self.kwargs
        return (float(k.get("eta", 0.0)) == 0.0
                and k.get("ip_adapter_image") is None
                and k.get("ip_adapter_image_embeds") is None
                and k.get("latents") is None)

    def _control_sig(self) -> Tuple:
        """Branch count + shapes — requests only share a compiled program
        when their control topology matches (content may differ)."""
        c = self.kwargs.get("control_image")
        if c is None:
            return ("nocontrol",)
        cs = c if isinstance(c, (list, tuple)) else [c]
        return ("control", len(cs)) + tuple(
            np.asarray(x).shape for x in cs
        )

    def group_key(self) -> Tuple:
        k = self.kwargs
        return (self.image.shape,) + self._control_sig() + tuple(
            (name, _hashable(k[name])) for name in SHARED if name in k
        )


class MicroBatcher:
    """submit() blocks until the request's image is ready.

    Only eta==0 requests batch with each other (the DDIM eta noise stream
    is keyed per call, not per image); eta>0 requests run alone.
    """

    def __init__(self, pipe, max_batch: int = 8, window_ms: float = 20.0):
        self.pipe = pipe
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def close(self):
        self._stop.set()
        self._q.put(None)  # wake the worker
        self._thread.join(timeout=5)

    # ------------------------------------------------------------- client

    def submit(self, image: np.ndarray, mask: np.ndarray, **kwargs):
        req = _Pending(image=image, mask=mask, kwargs=kwargs)
        self._q.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req.result

    # ------------------------------------------------------------- worker

    def _collect(self, first: _Pending) -> List[_Pending]:
        batch = [first]
        if not first.batchable():
            return batch
        key = first.group_key()
        # wait up to window_s for more compatible work
        import time

        end = time.monotonic() + self.window_s
        leftovers: List[_Pending] = []
        while len(batch) < self.max_batch:
            timeout = end - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                break
            if nxt.batchable() and nxt.group_key() == key:
                batch.append(nxt)
            else:
                leftovers.append(nxt)
        for item in leftovers:  # requeue what we can't batch
            self._q.put(item)
        return batch

    def _worker(self):
        while not self._stop.is_set():
            first = self._q.get()
            if first is None:
                continue
            batch = self._collect(first)
            try:
                self._run(batch)
            except BaseException as e:  # propagate to every waiter
                for r in batch:
                    r.error = e
                    r.event.set()

    def _run(self, batch: List[_Pending]):
        if len(batch) == 1:
            r = batch[0]
            r.result = self.pipe(r.image, r.mask, **r.kwargs)[0]
            r.event.set()
            return
        k0 = batch[0].kwargs
        call = {name: k0[name] for name in SHARED if name in k0}
        for name in PER_REQUEST:
            call[name] = [
                r.kwargs.get(name, PER_REQUEST_DEFAULTS[name])
                for r in batch
            ]
        if k0.get("control_image") is not None:
            call["control_image"] = [
                r.kwargs["control_image"] for r in batch
            ]
        out = self.pipe(
            [r.image for r in batch], [r.mask for r in batch], **call
        )
        for i, r in enumerate(batch):
            r.result = out[i]
            r.event.set()
