"""Host-side utilities: logging, profiling/perf reports."""

from cfdsim_tpu.utils.logging import setup_logging
from cfdsim_tpu.utils.profiling import PerfTracker

__all__ = ["setup_logging", "PerfTracker"]
