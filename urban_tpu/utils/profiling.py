"""Phase timing + device profiling hooks.

The reference logs coarse per-iteration phase timers T_sample/T_update/T_eval
(reference: urban_planning/agents/urban_planning_agent.py:229-246); this adds
the same timers as a context manager plus optional jax.profiler traces around
hot phases for TPU timeline inspection."""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class PhaseTimer:
    """Accumulates wall-clock per named phase; formats the reference's
    T_sample/T_update/T_eval log line."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0

    def log_line(self) -> str:
        return '\t'.join(f'T_{k} {v:.2f}' for k, v in self.times.items())

    def reset(self) -> None:
        self.times.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None, name: str = 'phase'):
    """jax.profiler trace around a hot phase (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        with jax.profiler.TraceAnnotation(name):
            yield
