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


def device_memory_stats(device=None) -> dict:
    """Device-memory figures for the perf report / runner log.

    The reference self-reports process memory in its banner and
    per-snapshot logs (v5.py:84-92, :665-667, psutil); on a 16 GB-HBM
    TPU the figure that matters is the *device* allocator's peak —
    ``device.memory_stats()`` where the backend exposes it (TPU does;
    this rig's relay-body 413 limit at 8192² was diagnosed blind for
    want of exactly this number).  Always includes the live-array
    census from ``jax.live_arrays()`` (works on every backend).

    Returns a dict of ints; allocator keys are absent on backends that
    do not expose ``memory_stats`` (e.g. XLA CPU).
    """
    import jax

    dev = device if device is not None else jax.local_devices()[0]
    out: dict = {}
    try:
        ms = dev.memory_stats() or {}
    except Exception:
        ms = {}
    for out_key, in_key in (
        ("device_bytes_in_use", "bytes_in_use"),
        ("device_peak_bytes", "peak_bytes_in_use"),
        ("device_bytes_limit", "bytes_limit"),
        ("device_largest_alloc", "largest_alloc_size"),
    ):
        if in_key in ms:
            out[out_key] = int(ms[in_key])
    live = [a for a in jax.live_arrays() if dev in getattr(a, "devices", lambda: set())()]
    out["live_arrays"] = len(live)
    out["live_array_bytes"] = int(sum(a.nbytes for a in live))
    return out


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

    def report(self, include_memory: bool = True) -> dict:
        """Final performance report (reference v5.py:688-694) plus the
        device-memory census (v5.py:84-92's psutil banner, done for the
        accelerator allocator instead — see :func:`device_memory_stats`)."""
        out = {
            "total_steps": self.steps,
            "wall_time_s": round(self.elapsed, 3),
            "steps_per_sec": round(self.steps_per_sec, 2),
            "cell_updates_per_sec": self.cell_updates_per_sec,
        }
        if include_memory:
            try:
                out.update(device_memory_stats())
            except Exception:  # no jax backend initialised — perf only
                pass
        return out


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
