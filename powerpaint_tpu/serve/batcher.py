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

    def group_key(self) -> Tuple:
        k = self.kwargs
        return (
            self.image.shape,
            k.get("task", "text-guided"),
            int(k.get("num_inference_steps", 45)),
            float(k.get("strength", 1.0)),
            k.get("scheduler", "ddim"),
            float(k.get("eta", 0.0)),
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
        key = first.group_key()
        batchable = first.kwargs.get("eta", 0.0) == 0.0
        if not batchable:
            return batch
        deadline = threading.Event()
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
            if (nxt.group_key() == key
                    and nxt.kwargs.get("eta", 0.0) == 0.0):
                batch.append(nxt)
            else:
                leftovers.append(nxt)
        for item in leftovers:  # requeue what we can't batch
            self._q.put(item)
        del deadline
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
        out = self.pipe(
            [r.image for r in batch],
            [r.mask for r in batch],
            prompt=[r.kwargs.get("prompt", "") for r in batch],
            negative_prompt=[
                r.kwargs.get("negative_prompt", "") for r in batch
            ],
            task=k0.get("task", "text-guided"),
            fitting_degree=[
                float(r.kwargs.get("fitting_degree", 1.0)) for r in batch
            ],
            num_inference_steps=int(k0.get("num_inference_steps", 45)),
            guidance_scale=[
                float(r.kwargs.get("guidance_scale", 7.5)) for r in batch
            ],
            strength=float(k0.get("strength", 1.0)),
            scheduler=k0.get("scheduler", "ddim"),
            seed=[int(r.kwargs.get("seed", 0)) for r in batch],
        )
        for i, r in enumerate(batch):
            r.result = out[i]
            r.event.set()
