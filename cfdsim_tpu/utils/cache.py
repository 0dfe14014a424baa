"""Persistent XLA compilation cache (opt-in).

Long ``lax.scan`` chunks over implicit solvers compile slowly on the
XLA CPU backend (tens of minutes at 10k+ FEM elements — the compiler
constant-folds the closed-over element tables into the loop body).
jax's persistent compilation cache makes relaunches of the SAME
configuration near-instant: measured 14.3 s → 8.1 s on a small FEM
chunk, and it skips the constant-folding entirely on a hit. Keys cover
the jaxpr including inlined constants, so a different mesh is a miss.

Opt-in because the CPU AOT loader logs machine-feature warnings
(pseudo-features like prefer-no-scatter don't round-trip) — benign when
the cache directory stays on the machine that wrote it, which is the
intended single-host use.

Enable programmatically (before the first compilation)::

    from cfdsim_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()            # ~/.cache/cfdsim_tpu_xla

or via the CLI with ``CFDSIM_COMPILE_CACHE=/path python -m cfdsim_tpu …``.
"""

from __future__ import annotations

from pathlib import Path

import jax


def enable_compilation_cache(
    path: str = "~/.cache/cfdsim_tpu_xla",
    min_compile_secs: float = 2.0,
) -> Path:
    """Point jax's persistent compilation cache at ``path`` (created if
    missing). Call before any compilation; returns the resolved path."""
    p = Path(path).expanduser()
    p.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(p))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    return p
