"""Observability: per-stage timing, counters, structured logging, profiler
hooks (SURVEY.md §5.1/§5.5 — absent in the reference, first-class here).

Stages are wall-clock spans around host-visible boundaries (device work is
async; a span closing calls ``block_until_ready`` only when it owns a
result).  ``Telemetry`` aggregates counters (images generated, steps run)
and exposes rates the bench/serving layers report.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import logging
import time
from typing import Dict, List, Optional

logger = logging.getLogger("powerpaint_tpu")


@dataclasses.dataclass
class StageTiming:
    name: str
    seconds: float


class Telemetry:
    """Per-call stage timings + global counters."""

    def __init__(self):
        self.counters: Dict[str, float] = {}
        self.stages: List[StageTiming] = []

    def count(self, name: str, value: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.stages.append(StageTiming(name, dt))
            logger.debug("stage %s: %.1f ms", name, dt * 1000)

    def last_call_report(self) -> Dict[str, float]:
        return {s.name: round(s.seconds * 1000, 2) for s in self.stages}

    def reset_stages(self) -> None:
        self.stages = []

    def to_json(self) -> str:
        return json.dumps(
            {"counters": self.counters, "stages_ms": self.last_call_report()}
        )


GLOBAL = Telemetry()


@contextlib.contextmanager
def jax_profile_trace(out_dir: Optional[str]):
    """Wrap a region in a jax.profiler trace when out_dir is set
    (the TPU-native answer to the reference's tqdm-only visibility)."""
    if not out_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
