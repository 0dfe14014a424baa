"""Performance tracking: steps/sec, cell-updates/sec, ETA, final report.

Replaces the reference's tqdm + ad-hoc timing prints (v5.py:651-694,
cavity_flow_v1.py:493-527) with a small tracker whose first-class metric is
cell-updates/sec (the BASELINE.json north-star unit). Optional
``jax.profiler`` trace capture for deep dives.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@dataclasses.dataclass
class PerfTracker:
    n_cells: int
    _t0: float = dataclasses.field(default_factory=time.perf_counter)
    steps: int = 0

    def add_steps(self, n: int):
        self.steps += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def steps_per_sec(self) -> float:
        e = self.elapsed
        return self.steps / e if e > 0 else 0.0

    @property
    def cell_updates_per_sec(self) -> float:
        return self.steps_per_sec * self.n_cells

    def eta(self, frac_done: float) -> float:
        if frac_done <= 0:
            return float("inf")
        return self.elapsed * (1.0 - frac_done) / frac_done

    def report(self) -> dict:
        """Final performance report (reference v5.py:688-694)."""
        return {
            "total_steps": self.steps,
            "wall_time_s": round(self.elapsed, 3),
            "steps_per_sec": round(self.steps_per_sec, 2),
            "cell_updates_per_sec": self.cell_updates_per_sec,
        }


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Capture a jax.profiler trace around a block (no-op if dir is None)."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
