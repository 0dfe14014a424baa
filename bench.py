"""Headline benchmark: cell-updates/sec on the 1024² lid-driven cavity
(BASELINE.json north star: ≥1e9 on one TPU v5e chip).

Runs the full solver step — adaptive CFL dt, central convection, diffusion,
BCs, exact DCT pressure projection (a *direct* solve of the Neumann
Poisson problem, strictly more accurate than the reference's 1500-sweep
iterative budget, v5.py:64-65) — as jitted lax.scan chunks.

Throughput is measured marginally between two chunk lengths: the
per-invocation constant (host dispatch + argument transfer over the axon
relay on this rig; absent in a real deployment where state stays resident)
cancels out, leaving steady-state device throughput. Prints ONE JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def _timed_chunk(case, state, n_steps: int) -> float:
    """Seconds to run n_steps on-device (scalar fetch as the barrier)."""

    def chunk(s, cfl):
        def body(st, _):
            return case.step(st, cfl)

        return jax.lax.scan(body, s, None, length=n_steps)

    f = jax.jit(chunk)
    out, _ = f(state, jnp.float32(1.0))
    float(out.t)  # compile + execute once
    t0 = time.perf_counter()
    out, _ = f(state, jnp.float32(1.0))
    float(out.t)
    return time.perf_counter() - t0, out


def run_bench(n=1024, short=100, long=600):
    from cfdsim_tpu.cases import lid_cavity
    from cfdsim_tpu.solvers.poisson import PoissonConfig

    case = lid_cavity(
        n=n,
        Re=1000.0,
        poisson=PoissonConfig(method="dct"),
        compute_metrics=False,
    )

    t_short, state_s = _timed_chunk(case, case.state, short)
    t_long, state_l = _timed_chunk(case, case.state, long)

    # sanity: simulation must be healthy after the long chunk
    assert bool(jnp.all(jnp.isfinite(state_l.u))), "non-finite state"
    max_u = float(jnp.max(jnp.abs(state_l.u)))
    assert max_u <= 1.5, f"velocity blow-up: {max_u}"

    cups = n * n * (long - short) / (t_long - t_short)
    return {
        "metric": "cell_updates_per_sec_cavity1024",
        "value": cups,
        "unit": "cells/s",
        "vs_baseline": cups / 1e9,
    }


if __name__ == "__main__":
    result = run_bench()
    print(json.dumps(result))
    sys.stdout.flush()
