"""Compressible FV module validation: flux consistency, conservation,
Sod shock tube plateaus, oblique-shock angle vs θ-β-M analytics, and the
supersonic cavity case health (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import cavity_supersonic, wedge
from cfdsim_tpu.grid import Grid
from cfdsim_tpu.models import compressible as comp
from cfdsim_tpu.monitor import check_compressible
from cfdsim_tpu.solvers.riemann import (
    FLUXES,
    cons_to_prim,
    euler_flux,
    prim_to_cons,
)

GAMMA = 1.4


def _run(case, t_end, chunk=100):
    f = jax.jit(
        lambda s, c: jax.lax.scan(lambda st, _: case.step(st, c), s, None, length=chunk)
    )
    st = case.state
    m = None
    while float(st.t) < t_end:
        st, m = f(st, jnp.float32(1.0))
    return st, m


@pytest.mark.parametrize("flux_name", ["rusanov", "hllc", "roe"])
def test_flux_consistency_uniform_state(flux_name):
    # F(U, U) must equal the exact Euler flux for any uniform state
    rho = jnp.full((8, 16), 1.3)
    u = jnp.full((8, 16), 0.7)
    v = jnp.full((8, 16), -0.2)
    p = jnp.full((8, 16), 2.1)
    U = prim_to_cons(rho, u, v, p, GAMMA)
    for axis in (0, 1):
        F = FLUXES[flux_name](U, U, GAMMA, axis)
        F_exact = euler_flux(U, GAMMA, axis)
        np.testing.assert_allclose(np.asarray(F), np.asarray(F_exact),
                                   rtol=1e-5, atol=1e-5)


def test_cons_prim_roundtrip():
    rng = np.random.default_rng(0)
    rho = jnp.asarray(0.5 + rng.random((8, 8)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
    p = jnp.asarray(0.5 + rng.random((8, 8)), jnp.float32)
    r2, u2, v2, p2 = cons_to_prim(prim_to_cons(rho, u, v, p, GAMMA), GAMMA)
    np.testing.assert_allclose(r2, rho, rtol=1e-5)
    np.testing.assert_allclose(u2, u, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(p2, p, rtol=1e-4, atol=1e-5)


def _sod_case(nx=200, flux="hllc", reconstruction="muscl", **cfg_kw):
    grid = Grid(nx=nx, ny=8, x_max=1.0, y_max=0.04, centering="cell")
    cfg = comp.CompressibleConfig(
        grid=grid, flux=flux, reconstruction=reconstruction, cfl=0.4, **cfg_kw
    )
    x = grid.x_coords()
    left = x < 0.5
    rho = jnp.asarray(np.where(left, 1.0, 0.125), jnp.float32)[None, :].repeat(8, 0)
    p = jnp.asarray(np.where(left, 1.0, 0.1), jnp.float32)[None, :].repeat(8, 0)
    zero = jnp.zeros_like(rho)
    U0 = prim_to_cons(rho, zero, zero, p, GAMMA)

    def bc(U, step, t):
        # transmissive x, uniform y
        U = U.at[:, :, 0].set(U[:, :, 1])
        U = U.at[:, :, -1].set(U[:, :, -2])
        U = U.at[:, 0, :].set(U[:, 1, :])
        U = U.at[:, -1, :].set(U[:, -2, :])
        return U

    step = comp.make_step(cfg, bc)
    state = comp.CompressibleState(U=U0, t=jnp.float32(0.0), step=jnp.int32(0))
    from cfdsim_tpu.cases import Case

    return Case("sod", cfg, step, state, grid)


def test_sod_shock_tube_plateaus():
    """Standard Sod problem at t=0.2: star-region values are known exactly
    (p* = 0.30313, u* = 0.92745, ρ*L = 0.42632, ρ*R = 0.26557)."""
    case = _sod_case(nx=400)
    st, _ = _run(case, 0.2, chunk=50)
    U = np.asarray(st.U)
    rho, u, v, p = (np.asarray(a) for a in cons_to_prim(jnp.asarray(U), GAMMA))
    x = case.grid.x_coords()
    row = 4  # any interior row; solution is 1D

    def mean_in(lo, hi, f):
        sel = (x > lo) & (x < hi)
        return f[row, sel].mean()

    # left star plateau (between rarefaction tail ~0.49 and contact ~0.685)
    assert mean_in(0.55, 0.65, rho) == pytest.approx(0.42632, rel=0.03)
    # right star plateau (between contact and shock ~0.85)
    assert mean_in(0.72, 0.82, rho) == pytest.approx(0.26557, rel=0.03)
    # star pressure and velocity span both plateaus
    assert mean_in(0.58, 0.78, p) == pytest.approx(0.30313, rel=0.03)
    assert mean_in(0.58, 0.78, u) == pytest.approx(0.92745, rel=0.03)
    # untouched ends
    assert mean_in(0.02, 0.15, rho) == pytest.approx(1.0, rel=0.01)
    assert mean_in(0.92, 0.98, rho) == pytest.approx(0.125, rel=0.01)


def test_mass_conservation_closed_box():
    """Reflective box with a density blob: total mass must be conserved to
    round-off (conservative flux form)."""
    grid = Grid(nx=64, ny=64, centering="cell")
    cfg = comp.CompressibleConfig(grid=grid, flux="hllc", cfl=0.4)
    X, Y = grid.meshgrid()
    rho = jnp.asarray(
        1.0 + 0.5 * np.exp(-((X - 0.5) ** 2 + (Y - 0.5) ** 2) / 0.01),
        jnp.float32,
    )
    p = jnp.full_like(rho, 1.0)
    zero = jnp.zeros_like(rho)
    U0 = prim_to_cons(rho, zero, zero, p, GAMMA)

    def bc(U, step, t):
        # reflective on all four sides
        U = U.at[:, :, 0].set(U[:, :, 1])
        U = U.at[1, :, 0].set(-U[1, :, 1])
        U = U.at[:, :, -1].set(U[:, :, -2])
        U = U.at[1, :, -1].set(-U[1, :, -2])
        U = U.at[:, 0, :].set(U[:, 1, :])
        U = U.at[2, 0, :].set(-U[2, 1, :])
        U = U.at[:, -1, :].set(U[:, -2, :])
        U = U.at[2, -1, :].set(-U[2, -2, :])
        return U

    step = comp.make_step(cfg, bc)
    state = comp.CompressibleState(U=U0, t=jnp.float32(0.0), step=jnp.int32(0))
    mass0 = float(jnp.sum(state.U[0, 1:-1, 1:-1]))
    e0 = float(jnp.sum(state.U[3, 1:-1, 1:-1]))
    f = jax.jit(lambda s: jax.lax.scan(
        lambda st, _: step(st, jnp.float32(1.0)), s, None, length=100)[0])
    state = f(state)
    mass1 = float(jnp.sum(state.U[0, 1:-1, 1:-1]))
    # interior mass changes only through the wall fluxes of the ghost ring;
    # with reflective ghosts the normal mass flux is ~0
    assert mass1 == pytest.approx(mass0, rel=1e-4)
    # total energy is a conserved variable too (ρE flux vanishes at walls)
    e1 = float(jnp.sum(state.U[3, 1:-1, 1:-1]))
    assert e1 == pytest.approx(e0, rel=1e-4)
    assert bool(jnp.all(jnp.isfinite(state.U)))


def test_wedge_oblique_shock_angle_and_jump():
    """θ-β-M: M=2 over a 10° wedge → β ≈ 39.3°, ρ2/ρ1 ≈ 1.458,
    p2/p1 ≈ 1.707 (weak-shock branch)."""
    case = wedge(nx=200, ny=100, flux="hllc", reconstruction="muscl")
    st, m = _run(case, 1.5, chunk=200)
    U = np.asarray(st.U)
    rho = U[0]
    X = case.grid.x_coords()
    Y = case.grid.y_coords()
    xs, ys = [], []
    for j in range(len(X)):
        if not (1.0 <= X[j] <= 1.8):
            continue
        idx = np.where(rho[:, j] > 1.2)[0]
        if len(idx):
            xs.append(X[j])
            ys.append(Y[idx.max()])
    slope = np.polyfit(xs, ys, 1)[0]
    beta = np.degrees(np.arctan(slope))
    assert beta == pytest.approx(39.3, abs=5.0), f"shock angle {beta}"

    jj = int(np.argmin(np.abs(X - 1.5)))
    y_probe = np.tan(np.deg2rad(10.0)) * 1.0 + 0.08
    ii = int(np.argmin(np.abs(Y - y_probe)))
    r, u, v, p = (np.asarray(a) for a in cons_to_prim(jnp.asarray(U), GAMMA))
    assert r[ii, jj] == pytest.approx(1.458, rel=0.08)
    assert p[ii, jj] == pytest.approx(1.707, rel=0.08)


def test_supersonic_cavity_real_geometry():
    # beyond-reference mode: actual solid plate with the cavity cut out —
    # a recirculating shear-driven flow must develop inside the cavity
    case = cavity_supersonic(nx=120, ny=48, real_geometry=True)
    st, m = _run(case, 0.6, chunk=100)
    assert bool(jnp.all(jnp.isfinite(st.U)))
    solid = np.asarray(case.extras["solid_mask"])
    U = np.asarray(st.U)
    assert np.abs(U[1][solid]).max() == 0.0  # momentum dead in the plate
    Y = np.asarray(case.grid.meshgrid()[1])
    cav = (Y < 0.25) & ~solid
    assert U[1][cav].min() < -0.05, "no recirculation in the cavity"


def test_supersonic_cavity_runs_healthy():
    case = cavity_supersonic(nx=120, ny=48)
    st, m = _run(case, 0.4, chunk=100)
    assert bool(jnp.all(jnp.isfinite(st.U)))
    report = check_compressible(jax.device_get(m), max_velocity=100.0)
    assert report.ok, report.reason
    # pinned cavity block stays quiescent (cavity_flow_v1.py:165-170)
    pin = np.asarray(case.extras["cavity_mask"]) > 0.5
    assert np.abs(np.asarray(st.U)[1][pin]).max() < 1e-5


def test_sod_rk2_matches_exact():
    # SSP-RK2 must preserve (or sharpen) the Sod star-state accuracy
    case = _sod_case(nx=400, time_order=2)
    st, _ = _run(case, 0.2, chunk=50)
    rho = np.asarray(cons_to_prim(st.U, GAMMA)[0])
    x = case.grid.x_coords()
    sel = (x > 0.72) & (x < 0.82)
    assert rho[4, sel].mean() == pytest.approx(0.26557, rel=0.03)
    assert bool(jnp.all(jnp.isfinite(st.U)))


@pytest.mark.parametrize("flux_name", ["rusanov", "roe"])
def test_sod_all_fluxes_stable(flux_name):
    case = _sod_case(nx=100, flux=flux_name, reconstruction="none")
    st, _ = _run(case, 0.15, chunk=50)
    assert bool(jnp.all(jnp.isfinite(st.U)))
    rho = np.asarray(st.U[0])
    assert rho.min() > 0.05 and rho.max() < 1.2


def test_wedge_aligned_frame_shock_angle_exact():
    """Exact-geometry oblique shock: the wedge-aligned frame removes the
    staircase/tip error, so the θ-β-M angle (39.31° for M=2, θ=10°) must
    come out to sub-degree accuracy even at modest resolution."""
    case = wedge(nx=200, ny=100, flux="hllc", reconstruction="muscl",
                 frame="wedge_aligned")
    st, _ = _run(case, 2.5, chunk=200)
    rho = np.asarray(st.U[0])
    X = case.grid.x_coords()
    Y = case.grid.y_coords()
    mid = 0.5 * (1.0 + 1.458)
    xs, ys = [], []
    for j in range(len(X)):
        if not (0.7 <= X[j] <= 1.4):
            continue
        col = rho[:, j]
        above = np.where(col > mid)[0]
        if not len(above) or above.max() + 1 >= len(Y):
            continue
        i = above.max()
        f = (col[i] - mid) / (col[i] - col[i + 1] + 1e-12)
        xs.append(X[j])
        ys.append(Y[i] + f * (Y[i + 1] - Y[i]))
    beta = np.degrees(np.arctan(np.polyfit(xs, ys, 1)[0])) + 10.0
    assert beta == pytest.approx(39.31, abs=0.5), f"shock angle {beta}"
    # post-shock jump values (weak-branch θ-β-M)
    r, u, v, p = (np.asarray(a) for a in cons_to_prim(st.U, GAMMA))
    jj = int(np.argmin(np.abs(X - 1.3)))
    ii = int(np.argmin(np.abs(Y - 0.08)))
    assert r[ii, jj] == pytest.approx(1.458, rel=0.01)
    assert p[ii, jj] == pytest.approx(1.707, rel=0.01)
    assert abs(v[ii, jj]) < 0.01  # post-shock flow parallel to the wall


def test_wedge_ghost_slip_wall_runs_and_deflects():
    """Mirror-ghost slip-wall IBM (lab frame): healthy run, post-shock
    deflection within ~1.5° of the 10° wedge angle (the staircase entropy
    layer biases the geometric shock angle; the deflection is the robust
    wall-quality metric)."""
    case = wedge(nx=200, ny=100, flux="hllc", reconstruction="muscl",
                 wall_treatment="ghost")
    st, _ = _run(case, 2.0, chunk=200)
    assert bool(jnp.all(jnp.isfinite(st.U)))
    r, u, v, p = (np.asarray(a) for a in cons_to_prim(st.U, GAMMA))
    X = case.grid.x_coords()
    Y = case.grid.y_coords()
    jj = int(np.argmin(np.abs(X - 1.3)))
    ii = int(np.argmin(np.abs(Y - (np.tan(np.deg2rad(10.0)) * 0.8 + 0.06))))
    defl = np.degrees(np.arctan2(v[ii, jj], u[ii, jj]))
    assert defl == pytest.approx(10.0, abs=1.5), f"deflection {defl}"


def test_roe_textbook_sod_star_states():
    # the characteristic-decomposition Roe must hit the Sod star states as
    # tightly as HLLC (the reference's roe_ref variant is far more diffusive)
    case = _sod_case(nx=400, flux="roe")
    st, _ = _run(case, 0.2, chunk=50)
    rho, u, v, p = (np.asarray(a) for a in cons_to_prim(st.U, GAMMA))
    x = case.grid.x_coords()
    row = 4

    def mean_in(lo, hi, f):
        sel = (x > lo) & (x < hi)
        return f[row, sel].mean()

    assert mean_in(0.55, 0.65, rho) == pytest.approx(0.42632, rel=0.03)
    assert mean_in(0.72, 0.82, rho) == pytest.approx(0.26557, rel=0.03)
    assert mean_in(0.58, 0.78, p) == pytest.approx(0.30313, rel=0.03)
    assert mean_in(0.58, 0.78, u) == pytest.approx(0.92745, rel=0.03)


def test_superbee_muscl_sharper_contact_than_minmod():
    # superbee (compressive) must resolve the Sod contact discontinuity in
    # fewer cells than minmod; run with SSP-RK2 for TVD stability
    def contact_width(limiter):
        case = _sod_case(nx=400, flux="hllc", limiter=limiter, time_order=2)
        st, _ = _run(case, 0.2, chunk=50)
        rho = np.asarray(cons_to_prim(st.U, GAMMA)[0])[4]
        # contact spans rho 0.42632 -> 0.26557 around x ~ 0.685
        x = case.grid.x_coords()
        sel = (x > 0.6) & (x < 0.8)
        r = rho[sel]
        hi, lo = 0.42632, 0.26557
        inside = (r < hi - 0.1 * (hi - lo)) & (r > lo + 0.1 * (hi - lo))
        return inside.sum()

    w_minmod = contact_width("minmod")
    w_superbee = contact_width("superbee")
    assert w_superbee < w_minmod, (w_superbee, w_minmod)


def test_roe_ref_parity_variant_stable():
    case = _sod_case(nx=100, flux="roe_ref", reconstruction="none")
    st, _ = _run(case, 0.15, chunk=50)
    assert bool(jnp.all(jnp.isfinite(st.U)))
