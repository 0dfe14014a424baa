"""Host-side utilities: logging, profiling/perf reports, compile cache."""

from cfdsim_tpu.utils.cache import enable_compilation_cache
from cfdsim_tpu.utils.logging import setup_logging
from cfdsim_tpu.utils.profiling import PerfTracker

__all__ = ["setup_logging", "PerfTracker", "enable_compilation_cache"]
