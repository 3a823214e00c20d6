"""Profiling & throughput observability (new subsystem; the reference has
none — SURVEY §5 calls for jax.profiler traces + step-time/throughput
counters as first-class).
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@dataclass
class ThroughputMeter:
    """Tracks items/sec and step latency with warmup exclusion."""

    warmup_steps: int = 2
    _times: List[float] = field(default_factory=list)
    _items: List[int] = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, items: int = 1) -> float:
        assert self._t0 is not None, "call start() before stop()"
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        self._items.append(items)
        self._t0 = None
        return dt

    @contextlib.contextmanager
    def step(self, items: int = 1) -> Iterator[None]:
        self.start()
        try:
            yield
        finally:
            self.stop(items)

    def summary(self) -> Dict[str, float]:
        times = self._times[self.warmup_steps:] or self._times
        items = self._items[self.warmup_steps:] or self._items
        if not times:
            return {}
        total_t = sum(times)
        total_i = sum(items)
        return {
            "steps": float(len(times)),
            "mean_step_s": total_t / len(times),
            "min_step_s": min(times),
            "items_per_s": total_i / total_t if total_t > 0 else 0.0,
        }
