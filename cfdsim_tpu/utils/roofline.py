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


def _marginal_seconds(body, x, r1: int, r2: int) -> float:
    """Marginal per-iteration seconds of ``body`` between scan lengths r1
    and r2 — the per-call constant (host dispatch + axon relay transfer,
    ~100 ms on this rig) cancels out, leaving pure device time.  A
    single-call timing here is overhead-dominated and under-reports the
    achievable peaks by ~100x (the round-3 roofline bug: 'ceilings' the
    measured steps beat by 110x)."""

    def run(reps):
        f = jax.jit(lambda v: jax.lax.scan(
            lambda c, _: (body(c), None), v, None, length=reps)[0])
        out = f(x)
        float(out.reshape(-1)[0])  # compile + execute (axon barrier)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(x)
            float(out.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run(r1), run(r2)
    m = (t2 - t1) / (r2 - r1)
    # shared-chip variance can invert the marginal; fall back to the
    # long-run average (conservative: still includes the constant)
    return m if m > 0 else t2 / r2


def measure_peaks(n_mm: int = 2048, copy_mb: int = 64) -> dict:
    """Achievable per-chip peaks on the live backend: MXU matmul flops/s
    (default precision — bf16 passes on TPU) and elementwise HBM stream
    bytes/s.  Both are measured MARGINALLY inside a lax.scan chain so the
    per-invocation relay/dispatch constant cancels (same methodology as
    bench.py's headline timing)."""
    global _peaks_cache
    if _peaks_cache is not None:
        return _peaks_cache
    a = jnp.full((n_mm, n_mm), 1.0 / n_mm, jnp.float32)

    # one n³ matmul per scan iteration; rescale keeps values O(1)
    sec = _marginal_seconds(lambda x: x @ x, a, 4, 24)
    flops = 2.0 * n_mm**3 / sec

    n = int(copy_mb * 1e6 / 4)
    x = jnp.ones((n,), jnp.float32)
    sec = _marginal_seconds(lambda v: v * 1.0000001 + 0.1, x, 8, 48)
    bw = 2.0 * n * 4 / sec  # one read + one write stream per iteration

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
        row["pct_of_roof"] = 100.0 * measured_cells_per_sec / ceiling
    return row
