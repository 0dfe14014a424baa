"""Kolmogorov-forced 2D turbulence with energy-spectrum diagnostics.

Runs the spectral stable-fluids tier (reference plot.jl — it renders
vorticity frames but never reports spectra) on a SQUARE unit box with
sin(k_f πy) forcing and prints the ring-averaged E(k): the forcing
peak, the inverse-energy-cascade band below k_f (Kraichnan−Kolmogorov
k^-5/3), and the direct enstrophy-cascade band above it (k^-3 in the
ideal 2D phenomenology; steeper at this modest Re because ν=1e-3
dissipates the tail).

Usage: python examples/kolmogorov_spectrum.py [--n 256] [--t 40]
       (CFDSIM_PLATFORM=cpu to force CPU)
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("CFDSIM_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["CFDSIM_PLATFORM"])

import jax.numpy as jnp
import numpy as np


def run(n=256, t_final=40.0, k_force=8, nu=1e-3, chunk=200, verbose=True):
    from cfdsim_tpu.cases import build
    from cfdsim_tpu.utils.spectra import energy_spectrum_2d

    case = build("kolmogorov", ny=n, aspect=1.0, nu=nu,
                 forcing_wavenumber=k_force)
    dt = case.cfg.dt

    def run_chunk(s, _):
        def body(st, _):
            st2, m = case.step(st, jnp.float32(1.0))
            return st2, m.energy

        return jax.lax.scan(body, s, None, length=chunk)

    run_chunk = jax.jit(run_chunk)
    state = case.state
    t0 = time.perf_counter()
    n_chunks = int(round(t_final / dt / chunk))
    for c in range(n_chunks):
        state, e = run_chunk(state, None)
        if verbose and (c % 5 == 4 or c == n_chunks - 1):
            el = time.perf_counter() - t0
            print(f"  t={float(state.t):6.1f}  E={float(e[-1]):.4f}  "
                  f"[{(c + 1) * chunk / el:6.0f} steps/s]", flush=True)

    k, ek = energy_spectrum_2d(state.u, state.v)

    # the forcing is sin(k_f·π·y) on a unit-height box → k_f/2 full
    # cycles per box, i.e. integer shell k_inj = k_f/2 in the
    # energy_spectrum_2d units (cycles/box)
    k_inj = max(k_force // 2, 1)

    def slope(lo, hi):
        sl = slice(lo, hi)
        if hi - lo < 3:
            return float("nan")  # too few shells for a meaningful fit
        return float(np.polyfit(np.log(k[sl]), np.log(ek[sl] + 1e-30), 1)[0])

    s_inv = slope(1, k_inj)                      # inverse energy cascade
    s_dir = slope(k_inj + 2, min(6 * k_inj, n // 3))  # enstrophy range
    k_peak = int(np.argmax(ek[1:])) + 1
    print(f"\nRESULT kolmogorov {n}² k_f={k_force} (injection shell "
          f"k={k_inj}) t={t_final:g}: E(k) peak at k={k_peak}, "
          f"slope below injection {s_inv:.2f} (inverse cascade: -5/3), "
          f"slope above injection {s_dir:.2f} "
          f"(enstrophy cascade: -3 ideal, steeper with ν=1e-3)")
    return {"k": k, "E_k": ek, "slope_inverse": s_inv, "slope_direct": s_dir,
            "k_peak": k_peak, "k_inj": k_inj}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--t", type=float, default=40.0)
    p.add_argument("--kf", type=int, default=8)
    p.add_argument("--nu", type=float, default=1e-3)
    a = p.parse_args()
    run(n=a.n, t_final=a.t, k_force=a.kf, nu=a.nu)
