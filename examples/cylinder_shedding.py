"""Kármán vortex street behind a cylinder with Strouhal validation.

The reference's flagship demo (v3-v5: Re=100-600 cylinder producing a
vortex street, validated only visually). Here the wake probe's oscillation
frequency is checked against the empirical Strouhal band St ≈ 0.15-0.20
for Re = 100-200.

Run:  python examples/cylinder_shedding.py [Re] [n_periods]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def run_shedding(Re=150.0, t_final=80.0, nx=300, ny=90, sample_every=25,
                 verbose=True):
    from cfdsim_tpu.cases import cylinder

    # faster-than-parity settings: shorter domain, dt_max opened up to the
    # CFL limit (the reference caps dt at 1e-4 for robustness, v5.py:57)
    case = cylinder(
        nx=nx, ny=ny, Re=Re,
        domain=(15.0, 4.0), center=(3.0, 2.0),
        dt_max=2e-3, warmup_steps=200, warmup_dt=5e-4,
        ibm_ramp_steps=200, cfl_target=0.35, artificial_viscosity=0.0,
        scheme="upwind",
    )
    # probe: v-velocity 2.5 diameters downstream of the cylinder center
    X, Y = case.grid.meshgrid()
    cx, cy = case.extras["center"]
    j = int(np.argmin(np.abs(X[0] - (cx + 2.5))))
    i = int(np.argmin(np.abs(Y[:, 0] - cy)))

    def chunk(state, _):
        def body(s, _):
            s2, m = case.step(s, jnp.float32(1.0))
            return s2, s2.v[i, j]
        return jax.lax.scan(body, state, None, length=sample_every)

    f = jax.jit(lambda s: jax.lax.scan(chunk, s, None, length=40))
    state = case.state
    times, probe = [], []
    while float(state.t) < t_final:
        t0 = float(state.t)
        state, v_hist = f(state)
        t1 = float(state.t)
        v_last = np.asarray(v_hist)[:, -1]  # one sample per `sample_every` steps
        probe.extend(v_last.tolist())
        times.extend(np.linspace(t0, t1, len(v_last), endpoint=False).tolist())
        if verbose:
            print(f"t={t1:7.2f}  probe v={v_last[-1]:+.3f}", flush=True)
    return np.asarray(times), np.asarray(probe), case


def main():
    from cfdsim_tpu.validation import strouhal_number

    Re = float(sys.argv[1]) if len(sys.argv) > 1 else 150.0
    times, probe, case = run_shedding(Re=Re)
    # analyze the established-shedding tail (last 60% of the signal)
    n0 = int(0.4 * len(probe))
    sample_dt = float(np.mean(np.diff(times[n0:])))
    St = strouhal_number(probe[n0:], sample_dt, 2 * case.extras["radius"], 1.0)
    amp = float(np.std(probe[n0:]))
    print(f"Re={Re:.0f}: St={St:.3f} (empirical ~0.16-0.19), "
          f"probe amplitude={amp:.3f}")
    return St, amp


if __name__ == "__main__":
    main()
