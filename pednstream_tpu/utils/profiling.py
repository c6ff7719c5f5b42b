"""First-class tracing and throughput counters.

The reference has only ad-hoc wall-clock prints (examples/delft_exp.py,
Melbourne.py); here profiling is a subsystem: ``trace_profile`` captures
a jax.profiler trace viewable in XProf/TensorBoard/Perfetto, and
``StepTimer`` accumulates steps/sec counters for training and simulation
loops.
"""

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace_profile(log_dir: str = "outputs/profile"):
    """Capture a device trace: ``with trace_profile(): run()``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running steps/sec counter with EMA smoothing."""

    def __init__(self, ema: float = 0.1):
        self.ema = ema
        self.rate: Optional[float] = None
        self.total_steps = 0
        self._last_t: Optional[float] = None
        self._t0 = time.time()

    def tick(self, steps: int = 1) -> Optional[float]:
        now = time.time()
        self.total_steps += steps
        if self._last_t is not None:
            dt = now - self._last_t
            if dt > 0:
                inst = steps / dt
                self.rate = inst if self.rate is None else (
                    (1 - self.ema) * self.rate + self.ema * inst
                )
        self._last_t = now
        return self.rate

    @property
    def average(self) -> float:
        elapsed = time.time() - self._t0
        return self.total_steps / elapsed if elapsed > 0 else 0.0

    def summary(self) -> str:
        return (f"{self.total_steps} steps, avg {self.average:.1f} steps/s"
                + (f", current {self.rate:.1f} steps/s" if self.rate else ""))
