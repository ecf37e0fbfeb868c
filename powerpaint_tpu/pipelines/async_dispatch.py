"""Async request pipelining: dispatch a generate without fetching.

The reference's serving path is strictly sequential (eager torch: every
request pays upload + compute + download end to end).  On a remote TPU the
fixed per-request costs — host preprocessing, the RPC dispatch, and the
host->device upload of the image/mask — are pure overhead that XLA's async
dispatch can hide under the PREVIOUS request's device compute: JAX queues
the computation and returns immediately; only a host fetch of the result
blocks.

``pipe.submit(...)`` runs the normal ``__call__`` host path (validation,
tokenization, upload, dispatch) but skips the final device->host fetch,
returning a :class:`PendingImages`.  Calling ``.result()`` fences.  A
serving loop that dispatches request N+1 before fetching request N keeps
the device busy back to back (serve/batcher.py does this automatically;
bench.py reports it as ``sustained_imgs_per_sec``).

Implementation: a context variable (thread-local by construction) flips the
pipelines' shared ``finish()`` from "fetch to numpy" to "return the device
array" for the duration of one dispatch, so all three pipelines and both
the single- and multi-request forms inherit the async form without
duplicating their argument plumbing.
"""

from __future__ import annotations

import contextvars
from typing import Any

import numpy as np

_FETCH: contextvars.ContextVar[bool] = contextvars.ContextVar(
    "powerpaint_fetch_results", default=True
)


def finish(out: Any):
    """Terminal step of every pipeline ``__call__``: fetch to host numpy
    (the default, fences the device) or — under ``submit()`` — hand back
    the still-executing device array."""
    if _FETCH.get():
        return np.asarray(out)
    return out


class PendingImages:
    """A dispatched generate whose result has not been fetched yet."""

    __slots__ = ("_out", "_fetched")

    def __init__(self, out):
        self._out = out
        self._fetched = None

    def result(self) -> np.ndarray:
        """Block until the device computation finishes; returns the same
        (B, H, W, 3) uint8 array the synchronous call would have."""
        if self._fetched is None:
            self._fetched = np.asarray(self._out)
            self._out = None
        return self._fetched

    def done(self) -> bool:
        """True once the device computation has completed (non-blocking);
        host-side results still require ``result()``."""
        if self._fetched is not None:
            return True
        try:
            return self._out.is_ready()
        except AttributeError:  # non-jax output (already host-side)
            return True


class AsyncDispatchMixin:
    """Adds ``submit()`` to a pipeline whose ``__call__`` ends in
    :func:`finish`."""

    def submit(self, *args, **kwargs) -> PendingImages:
        """Same surface as ``__call__`` but returns a
        :class:`PendingImages` immediately after dispatch instead of
        blocking on the device->host fetch.

        Per-call step callbacks are rejected: the host trampoline reads
        the pipeline's active-callback slot at execution time, so a later
        dispatch would overwrite it while an earlier request is still
        running on device and its steps would invoke the wrong callback.
        Use the synchronous ``__call__`` for callback observation."""
        if kwargs.get("callback") is not None:
            from powerpaint_tpu.core.validation import InputValidationError

            raise InputValidationError(
                "callback is not supported with submit(): in-flight "
                "requests share the callback slot; use the synchronous "
                "call for step callbacks"
            )
        token = _FETCH.set(False)
        try:
            out = self(*args, **kwargs)
        finally:
            _FETCH.reset(token)
        return PendingImages(out)
