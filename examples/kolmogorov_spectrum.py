"""Kolmogorov-forced 2D turbulence with energy-spectrum diagnostics.

Runs the spectral stable-fluids tier (reference plot.jl — it renders
vorticity frames but never reports spectra) on a SQUARE unit box with
sin(k_f πy) forcing and prints the ring-averaged E(k): the forcing
peak, the inverse-energy-cascade band below k_f (Kraichnan−Kolmogorov
k^-5/3), and the direct enstrophy-cascade band above it (k^-3 in the
ideal 2D phenomenology; steeper at this modest Re because ν=1e-3
dissipates the tail).

With ``--alpha > 0`` (linear Ekman friction, SpectralConfig.
linear_friction) the inverse cascade is arrested at the friction scale
instead of piling into a box-scale condensate: the run time-averages
E(k) over the stationary tail and fits the k^-5/3 band between the
friction peak and the injection shell — the stationary-inverse-cascade
diagnostic the round-4 condensate caveat called for (VERDICT r4 #4).

Usage: python examples/kolmogorov_spectrum.py [--n 256] [--t 40]
       [--alpha 0.15] (CFDSIM_PLATFORM=cpu to force CPU)
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


def run(n=256, t_final=40.0, k_force=8, nu=1e-3, chunk=200, verbose=True,
        alpha=0.0, t_stat=None, forcing_scale=0.1, noise=0.0, seed=0,
        advection="sl", dt=0.01, solver="stable"):
    from cfdsim_tpu.cases import build
    from cfdsim_tpu.utils.spectra import energy_spectrum_2d

    if solver == "ps":
        # pseudo-spectral vorticity tier: no advection dissipation;
        # forcing is per unit TIME there (the stable-fluids tier's
        # per-step impulse ≈ forcing_scale/dt in these units)
        case = build("kolmogorov_ps", ny=n, aspect=1.0, nu=nu, dt=dt,
                     forcing_wavenumber=k_force, linear_friction=alpha,
                     forcing_scale=forcing_scale, noise=noise, seed=seed)
        get_uv = case.extras["velocities"]
    else:
        case = build("kolmogorov", ny=n, aspect=1.0, nu=nu, dt=dt,
                     forcing_wavenumber=k_force, linear_friction=alpha,
                     forcing_scale=forcing_scale, advection=advection)
        get_uv = lambda s: (s.u, s.v)  # noqa: E731
    state = case.state
    if noise > 0 and solver != "ps":
        # the laminar Kolmogorov flow is an exact solution; without a
        # perturbation seed the run sits on the stable manifold forever
        # (measured: all-shells-at-round-off, BENCHNOTES) — seed the
        # instability explicitly
        rng = np.random.default_rng(seed)
        state = state._replace(
            u=state.u + noise * jnp.asarray(
                rng.standard_normal(state.u.shape), jnp.float32),
            v=state.v + noise * jnp.asarray(
                rng.standard_normal(state.v.shape), jnp.float32))
    dt = case.cfg.dt
    # with friction the flow becomes statistically stationary; average
    # E(k) over the tail (default: last half of the run)
    if t_stat is None:
        t_stat = 0.5 * t_final if alpha > 0 else t_final

    def run_chunk(s, _):
        def body(st, _):
            st2, m = case.step(st, jnp.float32(1.0))
            return st2, m.energy

        return jax.lax.scan(body, s, None, length=chunk)

    run_chunk = jax.jit(run_chunk)
    t0 = time.perf_counter()
    n_chunks = int(round(t_final / dt / chunk))
    ek_acc, n_acc = None, 0
    for c in range(n_chunks):
        state, e = run_chunk(state, None)
        if float(state.t) >= t_stat:
            k, ek_i = energy_spectrum_2d(*get_uv(state))
            ek_acc = ek_i if ek_acc is None else ek_acc + ek_i
            n_acc += 1
        if verbose and (c % 5 == 4 or c == n_chunks - 1):
            el = time.perf_counter() - t0
            print(f"  t={float(state.t):6.1f}  E={float(e[-1]):.4f}  "
                  f"[{(c + 1) * chunk / el:6.0f} steps/s]", flush=True)

    if ek_acc is not None and n_acc > 0:
        k, ek = k, ek_acc / n_acc  # time-averaged stationary spectrum
    else:
        k, ek = energy_spectrum_2d(*get_uv(state))

    # the forcing is sin(k_f·π·y) on a unit-height box → k_f/2 full
    # cycles per box, i.e. integer shell k_inj = k_f/2 in the
    # energy_spectrum_2d units (cycles/box)
    k_inj = max(k_force // 2, 1)

    def slope(lo, hi):
        sl = slice(lo, hi)
        if hi - lo < 3:
            return float("nan")  # too few shells for a meaningful fit
        return float(np.polyfit(np.log(k[sl]), np.log(ek[sl] + 1e-30), 1)[0])

    # friction-arrest peak: search BELOW the injection shell (the global
    # argmax otherwise lands on the forcing bump itself and empties the
    # fit window)
    k_hi = max(k_inj - 1, 2)
    k_peak = int(np.argmax(ek[1:k_hi])) + 1
    # log-spaced shell table so run logs carry the spectrum shape
    shells = sorted({int(q) for q in np.geomspace(1, len(ek) - 1, 18)})
    print("  E(k): " + "  ".join(f"{q}:{ek[q]:.2e}" for q in shells))
    # inverse-cascade fit window: from just above the friction/energy
    # peak up to the injection shell (the k^-5/3 band lives there)
    lo_inv = max(k_peak + 1, 2) if alpha > 0 else 1
    # stop short of the forcing bump (it spreads ~k_inj/8 shells down)
    hi_inv = max(lo_inv + 3, k_inj - max(2, k_inj // 8))
    s_inv = slope(lo_inv, hi_inv)                # inverse energy cascade
    s_dir = slope(k_inj + 2, min(6 * k_inj, n // 3))  # enstrophy range
    stat = (f" [stationary avg over {n_acc} snapshots t>{t_stat:g}]"
            if n_acc else "")
    print(f"\nRESULT kolmogorov {n}² k_f={k_force} (injection shell "
          f"k={k_inj}) t={t_final:g} alpha={alpha:g}{stat}: E(k) peak at "
          f"k={k_peak}, slope k∈[{lo_inv},{hi_inv}) {s_inv:.2f} "
          f"(inverse cascade: -5/3), "
          f"slope above injection {s_dir:.2f} "
          f"(enstrophy cascade: -3 ideal, steeper with ν=1e-3)")
    return {"k": k, "E_k": ek, "slope_inverse": s_inv, "slope_direct": s_dir,
            "k_peak": k_peak, "k_inj": k_inj, "alpha": alpha}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--t", type=float, default=40.0)
    p.add_argument("--kf", type=int, default=8)
    p.add_argument("--nu", type=float, default=1e-3)
    p.add_argument("--alpha", type=float, default=0.0,
                   help="linear (Ekman) friction coefficient; >0 makes "
                        "the inverse cascade stationary")
    p.add_argument("--t-stat", type=float, default=None,
                   help="start of the stationary averaging window "
                        "(default t/2 when alpha>0)")
    p.add_argument("--fs", type=float, default=0.1,
                   help="forcing amplitude (SpectralConfig.forcing_scale)")
    p.add_argument("--noise", type=float, default=0.0,
                   help="initial white-noise velocity amplitude (seeds "
                        "the Kolmogorov instability; the laminar state "
                        "is exact and never transitions unseeded)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--advection", default="sl", choices=["sl", "bfecc"],
                   help="bfecc = MacCormack error compensation (2nd "
                        "order; the bilinear SL trace's numerical "
                        "viscosity otherwise damps the cascade flux)")
    p.add_argument("--dt", type=float, default=0.01)
    p.add_argument("--solver", default="stable", choices=["stable", "ps"],
                   help="ps = pseudo-spectral vorticity tier "
                        "(models/spectral_ps.py; dissipation-free "
                        "advection, forcing per unit time — use "
                        "--dt ~2e-3 and fs ~ stable-fs/dt·(dt_ps) "
                        "for comparable injection)")
    a = p.parse_args()
    run(n=a.n, t_final=a.t, k_force=a.kf, nu=a.nu, alpha=a.alpha,
        t_stat=a.t_stat, forcing_scale=a.fs, noise=a.noise, seed=a.seed,
        advection=a.advection, dt=a.dt, solver=a.solver)
