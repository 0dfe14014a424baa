"""Roofline accounting for solver steps (VERDICT r2 item 4).

Round 2 reported cells/s only; "fast" was unquantified. This module
derives flops/cell and HBM bytes/cell analytically from the *compiled*
step graph (XLA's post-fusion cost analysis — exact for the graph that
actually runs, no hand counting), measures the machine's achievable
flop and HBM-bandwidth peaks with two microbenchmarks, and classifies
each tier as compute- or bandwidth-bound with its roofline ceiling:

    ceiling(cells/s) = min(peak_flops / flops_per_cell,
                           peak_bw / bytes_per_cell)

``%of roof`` close to 1 means the step runs at the speed of light for
its arithmetic intensity on this chip; the same flops/bytes per cell
with published production-part peaks (v5e: 197 TFLOP/s bf16, ~0.5x fp32,
819 GB/s HBM) projects the production ceiling.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

# published TPU v5e (lite) per-chip peaks for the production projection
V5E_PEAK_FLOPS_F32 = 98.5e12 / 2  # bf16 197 TFLOP/s; fp32 ~1/4 of bf16
V5E_PEAK_BW = 819e9  # HBM bytes/s

_peaks_cache: dict | None = None


def step_costs(step_fn, state, *args) -> dict:
    """flops and HBM bytes of one compiled step (post-fusion HLO cost
    analysis; bytes = operand + output traffic of every fused op)."""
    c = jax.jit(step_fn).lower(state, *args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    flops = float(c.get("flops", 0.0))
    by = c.get("bytes accessed")
    if by is None:
        by = sum(v for k, v in c.items()
                 if k.startswith("bytes accessed") and isinstance(v, float))
    return {"flops": flops, "bytes": float(by),
            "transcendentals": float(c.get("transcendentals", 0.0))}


def measure_peaks(n_mm: int = 4096, copy_mb: int = 256) -> dict:
    """Achievable per-chip peaks on the live backend: fp32 matmul
    flops/s and elementwise HBM stream bytes/s (best of 3; scalar fetch
    as the barrier — block_until_ready returns early on axon)."""
    global _peaks_cache
    if _peaks_cache is not None:
        return _peaks_cache
    a = jnp.ones((n_mm, n_mm), jnp.float32)

    mm = jax.jit(lambda x: ((x @ x) @ x) @ x)
    float(mm(a)[0, 0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(mm(a)[0, 0])
        best = min(best, time.perf_counter() - t0)
    flops = 3 * 2.0 * n_mm**3 / best

    n = int(copy_mb * 1e6 / 4)
    x = jnp.ones((n,), jnp.float32)
    # read + write one stream each way: 3 arrays of traffic per op pair
    ew = jax.jit(lambda v: v * 1.0000001 + 0.1)
    float(ew(x)[0])
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(ew(x)[0])
        best = min(best, time.perf_counter() - t0)
    bw = 2.0 * n * 4 / best  # one read + one write stream

    _peaks_cache = {"peak_flops": flops, "peak_bw": bw}
    return _peaks_cache


def roofline(step_fn, state, n_cells: int, measured_cells_per_sec=None,
             peaks=None, *step_args) -> dict:
    """Roofline row for one tier: per-cell costs, the bound, the ceiling
    on this chip, the projected v5e ceiling, and (if a measured rate is
    given) the fraction of the roof actually achieved."""
    costs = step_costs(step_fn, state, *step_args)
    f_c = costs["flops"] / n_cells
    b_c = costs["bytes"] / n_cells
    pk = peaks or measure_peaks()
    roof_flops = pk["peak_flops"] / max(f_c, 1e-12)
    roof_bw = pk["peak_bw"] / max(b_c, 1e-12)
    ceiling = min(roof_flops, roof_bw)
    row = {
        "flops_per_cell": f_c,
        "bytes_per_cell": b_c,
        "intensity_flops_per_byte": f_c / max(b_c, 1e-12),
        "bound": "compute" if roof_flops < roof_bw else "bandwidth",
        "ceiling_cells_per_sec": ceiling,
        "v5e_ceiling_cells_per_sec": min(
            V5E_PEAK_FLOPS_F32 / max(f_c, 1e-12),
            V5E_PEAK_BW / max(b_c, 1e-12),
        ),
    }
    if measured_cells_per_sec is not None:
        row["measured_cells_per_sec"] = measured_cells_per_sec
        row["pct_of_roof"] = measured_cells_per_sec / ceiling
    return row
