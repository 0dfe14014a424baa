"""Spectral stable-fluids solver: projection exactness, Taylor-Green
viscous decay, and the forced Kolmogorov case (SURVEY.md §2.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import kolmogorov
from cfdsim_tpu.models import spectral as spec


def _run(step, state, n, chunk=50):
    f = jax.jit(
        lambda s: jax.lax.scan(lambda st, _: step(st), s, None, length=chunk)
    )
    m = None
    for _ in range(n // chunk):
        state, m = f(state)
    return state, m


def test_projection_removes_divergence():
    cfg = spec.SpectralConfig(ny=64, aspect=1.0, forcing_scale=0.1)
    step = spec.make_step(cfg)
    rng = np.random.default_rng(0)
    state = spec.init_state(
        cfg,
        u0=rng.standard_normal((64, 64)).astype(np.float32),
        v0=rng.standard_normal((64, 64)).astype(np.float32),
    )
    state, metrics = jax.jit(step)(state)
    # spectral divergence after projection ~ round-off
    assert float(metrics.max_div) < 1e-4


def test_taylor_green_viscous_decay():
    """Unforced Taylor-Green vortex: KE decays as exp(−2ν(2π)²(kx²+ky²)t/…)
    — for u=sin(2πx)cos(2πy), v=−cos(2πx)sin(2πy) on the unit torus the
    decay rate of energy is exp(−4ν(2π)²·2·t/2)… concretely E(t) =
    E(0)·exp(−4νκ²t) with κ² = (2π)²·2 an exact NS solution (advection is
    a pure pressure gradient)."""
    ny = 64
    cfg = spec.SpectralConfig(
        ny=ny, aspect=1.0, nu=5e-3, dt=0.005, forcing_scale=0.0,
        angular_wavenumbers=True,
    )
    step = spec.make_step(cfg)
    x = (np.arange(ny)) / ny
    X, Y = np.meshgrid(x, x)
    # small amplitude keeps the semi-Lagrangian backtrace displacement
    # (and its numerical diffusion) negligible, isolating spectral diffusion
    amp = 0.01
    u0 = amp * np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y)
    v0 = -amp * np.cos(2 * np.pi * X) * np.sin(2 * np.pi * Y)
    state = spec.init_state(cfg, u0=u0, v0=v0)
    e0 = float(jnp.mean(0.5 * (state.u**2 + state.v**2)))
    n_steps = 100
    state, metrics = _run(step, state, n_steps)
    e1 = float(metrics.energy[-1])
    t = n_steps * cfg.dt
    kappa2 = (2 * np.pi) ** 2 * 2.0
    expected = e0 * np.exp(-2.0 * cfg.nu * kappa2 * t)
    assert e1 == pytest.approx(expected, rel=0.05)


def test_kolmogorov_forced_run_is_finite_and_energetic():
    case = kolmogorov(ny=90, aspect=1.6, dt=0.01)
    state, metrics = _run(case.step, case.state, 200)
    assert bool(jnp.all(jnp.isfinite(state.u)))
    assert float(metrics.energy[-1]) > 1e-4  # forcing injected energy
    assert float(metrics.max_div[-1]) < 1e-3
    # curl for visualization has the forcing's banded structure
    w = spec.spectral_curl(state, case.cfg)
    assert np.isfinite(np.asarray(w)).all()


def test_kolmogorov_energy_spectrum_peaks_at_forcing_scale():
    """SURVEY.md §4: energy-spectrum sanity. The sin(kπy) forcing injects
    at wavenumber k/2 cycles across the unit height; after spin-up the 1D
    y-spectrum of u must peak there (before turbulence develops)."""
    cfg = spec.SpectralConfig(ny=96, aspect=1.0, forcing_wavenumber=8,
                              forcing_scale=0.05, nu=5e-3, dt=0.01)
    step = spec.make_step(cfg)
    state = spec.init_state(cfg)
    state, _ = _run(step, state, 100)
    u = np.asarray(state.u)
    spec_y = np.abs(np.fft.rfft(u, axis=0)).mean(axis=1)
    k_peak = int(np.argmax(spec_y[1:])) + 1
    assert k_peak == cfg.forcing_wavenumber // 2, f"spectrum peak at k={k_peak}"


def test_reference_parity_wavenumbers_run():
    cfg = spec.SpectralConfig(ny=48, aspect=1.0, angular_wavenumbers=False)
    step = spec.make_step(cfg)
    state = spec.init_state(cfg)
    state, m = _run(step, state, 50)
    assert bool(jnp.all(jnp.isfinite(state.u)))


def test_energy_spectrum_parseval_and_peak():
    # validation.energy_spectrum: Parseval closure and correct peak k for
    # a single-mode field
    from cfdsim_tpu.validation import energy_spectrum

    n = 96
    x = np.linspace(0, 1, n, endpoint=False)
    X, Y = np.meshgrid(x, x, indexing="xy")
    k0 = 6  # cycles across the unit box -> angular wavenumber 2*pi*6
    u = np.sin(2 * np.pi * k0 * Y)
    v = np.cos(2 * np.pi * k0 * X)
    k, E = energy_spectrum(u, v, 1.0, 1.0)
    dk = k[1] - k[0]
    total = (E * dk).sum()
    mean_ke = 0.5 * (u**2 + v**2).mean()
    assert abs(total - mean_ke) < 0.05 * mean_ke
    assert abs(k[np.argmax(E)] - 2 * np.pi * k0) < 2 * dk


def test_kolmogorov_spectrum_decays_at_high_k():
    # developed Kolmogorov flow: energy concentrated at/below the forcing
    # band, decaying toward the grid scale (spectrum sanity, SURVEY.md §4)
    from cfdsim_tpu.validation import energy_spectrum

    case = kolmogorov(ny=96, aspect=1.0, nu=2e-3, dt=0.01)
    state, _ = _run(case.step, case.state, 300)
    k, E = energy_spectrum(np.asarray(state.u), np.asarray(state.v),
                           case.cfg.lx, 1.0)
    lo = E[(k > 0) & (k < 2 * np.pi * 12)].sum()
    hi = E[k > 2 * np.pi * 30].sum()
    assert lo > 10.0 * hi, (lo, hi)


def test_linear_friction_bounds_energy():
    """Ekman drag (SpectralConfig.linear_friction, VERDICT r4 #4): with
    α large enough to keep the forced sheet flow laminar, the energy
    saturates EXACTLY at the discrete forced-dissipative fixed point
    u* = F dt e^{−λdt}/(1−e^{−λdt}) of the per-step update
    u ← (u + F dt)·exp(−λ dt), λ = α + νk², E = u*²/4 — bounded and
    stationary instead of the frictionless condensate's pile-up."""
    alpha, nu, dt, fs = 1.0, 1e-3, 0.01, 0.1
    cfg = spec.SpectralConfig(ny=64, aspect=1.0, nu=nu, dt=dt,
                              forcing_wavenumber=8, forcing_scale=fs,
                              linear_friction=alpha)
    s, m = _run(spec.make_step(cfg), spec.init_state(cfg), 1000)
    ea = float(m.energy[-1])

    k = 8 * np.pi  # sin(8πy): 4 cycles/box, angular wavenumber 8π
    lam_dt = (alpha + nu * k * k) * dt
    u_star = fs * np.exp(-lam_dt) / (1.0 - np.exp(-lam_dt))
    assert ea == pytest.approx(u_star**2 / 4.0, rel=0.02)

    # stationarity: another 300 steps leave E unchanged to <1%
    s2, m2 = _run(spec.make_step(cfg), s, 300)
    assert abs(float(m2.energy[-1]) - ea) / ea < 0.01


def test_bfecc_advection_less_dissipative_than_sl():
    """BFECC/MacCormack option (SpectralConfig.advection="bfecc"): on an
    inviscid, force-free Taylor-Green field (a steady Euler solution —
    ALL energy loss is the advection scheme's numerical viscosity) the
    error-compensated trace must retain clearly more energy than the
    reference's bilinear semi-Lagrangian backtrace, and the clamp must
    keep the result finite and bounded by the initial extrema."""
    import dataclasses

    n = 96
    y, x = np.meshgrid(np.arange(n) / n, np.arange(n) / n, indexing="ij")
    u0 = np.sin(2 * np.pi * 4 * x) * np.cos(2 * np.pi * 4 * y)
    v0 = -np.cos(2 * np.pi * 4 * x) * np.sin(2 * np.pi * 4 * y)
    base = spec.SpectralConfig(ny=n, aspect=1.0, nu=0.0, dt=0.01,
                               forcing_scale=0.0)
    energies = {}
    for adv in ("sl", "bfecc"):
        cfg = dataclasses.replace(base, advection=adv)
        s, m = _run(spec.make_step(cfg), spec.init_state(cfg, u0=u0, v0=v0),
                    60)
        assert np.isfinite(np.asarray(s.u)).all()
        # clamped correction + projection: no runaway overshoot
        assert float(jnp.max(jnp.abs(s.u))) < 1.5
        energies[adv] = float(m.energy[-1])
    assert energies["bfecc"] > 1.5 * energies["sl"], energies
