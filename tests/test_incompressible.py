"""Incompressible projection solver: physics validation (SURVEY.md §4 —
the reference's eyeballed diagnostics turned into assertable tests:
divergence-free after projection, Ghia cavity profiles, Poiseuille)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import channel, cylinder, lid_cavity
from cfdsim_tpu.ops.stencil import divergence
from cfdsim_tpu.validation import ghia_error


def _run(case, n_steps, chunk=200):
    f = jax.jit(
        lambda s, c: jax.lax.scan(lambda st, _: case.step(st, c), s, None, length=chunk)
    )
    state = case.state
    m = None
    for _ in range(n_steps // chunk):
        state, m = f(state, jnp.float32(1.0))
    return state, m


@pytest.fixture(scope="module")
def cavity_steady():
    case = lid_cavity(n=48, Re=100.0)
    state, metrics = _run(case, 2400)
    return case, state, metrics


def test_cavity_reaches_ghia_profiles(cavity_steady):
    case, state, _ = cavity_steady
    assert float(state.t) > 15.0, "should have advanced well into steady state"
    eu, ev = ghia_error(
        state.u, state.v, 100, case.grid.y_coords(), case.grid.x_coords()
    )
    # 48x48, second order: expect ~1% RMS
    assert eu < 0.02, f"u-centerline RMS error {eu}"
    assert ev < 0.02, f"v-centerline RMS error {ev}"


def test_cavity_divergence_free_after_projection(cavity_steady):
    # collocated approximate projection: divergence is small except within a
    # few nodes of the singular lid corners (standard for this scheme)
    case, state, metrics = cavity_steady
    d = np.asarray(divergence(state.u, state.v, case.grid.dx, case.grid.dy))
    assert np.abs(d[3:-5, 3:-3]).max() < 0.5  # away from the lid
    assert float(np.asarray(metrics.div_post)[-1]) < 2.0


def test_cavity_stays_healthy(cavity_steady):
    case, state, metrics = cavity_steady
    m = jax.device_get(metrics)
    assert np.all(np.isfinite(np.asarray(state.u)))
    assert float(np.max(np.asarray(m.max_vel))) <= 1.0 + 1e-3  # lid speed bound
    # energy settled (steady state): last two chunk means close
    assert float(np.asarray(m.energy)[-1]) == pytest.approx(
        float(np.asarray(m.energy)[0]), rel=0.05
    )


def test_channel_develops_poiseuille_profile():
    case = channel(nx=96, ny=32, Re=50.0, length=3.0)
    state, metrics = _run(case, 1600)
    y = case.grid.y_coords()
    h = case.grid.y_max
    exact = 6.0 * (y / h) * (1.0 - y / h)
    mid = np.asarray(state.u)[:, 48]
    rms = np.sqrt(np.mean((mid - exact) ** 2))
    assert rms < 0.1, f"Poiseuille profile RMS {rms}"
    assert float(np.asarray(metrics.div_post)[-1]) < 0.1


def test_cylinder_ibm_enforces_solid_body():
    case = cylinder(nx=120, ny=40, Re=100.0, ibm_ramp_steps=0, warmup_steps=0)
    state, metrics = _run(case, 60, chunk=30)
    solid = np.asarray(case.extras["solid_mask"])
    u = np.asarray(state.u)
    v = np.asarray(state.v)
    # velocity inside the solid must be penalized to ~0
    assert np.abs(u[solid]).max() < 1e-3
    assert np.abs(v[solid]).max() < 1e-3
    assert np.all(np.isfinite(u))


def test_cylinder_ref_parity_mode_runs():
    # reference-parity: halved SUPG convection + masked rbsor Poisson
    case = cylinder(
        nx=96, ny=32, Re=100.0, ref_parity=True,
        poisson=None, warmup_steps=0, ibm_ramp_steps=10,
    )
    state, metrics = _run(case, 20, chunk=10)
    assert np.all(np.isfinite(np.asarray(state.u)))
    # masked poisson: pressure stays 0 inside the solid
    solid = np.asarray(case.extras["solid_mask"])
    assert np.abs(np.asarray(state.p)[solid]).max() == 0.0


def test_implicit_diffusion_stable_beyond_explicit_limit():
    # backward-Euler viscous step: dt is CFL-limited only; must stay stable
    # above the explicit bound h²/4ν and still reach the Ghia solution
    case = lid_cavity(n=48, Re=100.0, diffusion="implicit", cfl=0.7)
    h = case.grid.dx
    explicit_limit = 0.2 * h * h / case.cfg.nu  # what _adaptive_dt enforces
    state, metrics = _run(case, 2000)
    assert float(np.asarray(metrics.dt)[-1]) > explicit_limit
    assert np.all(np.isfinite(np.asarray(state.u)))
    eu, ev = ghia_error(
        state.u, state.v, 100, case.grid.y_coords(), case.grid.x_coords()
    )
    assert eu < 0.03 and ev < 0.03


def test_les_and_upwind_variants_stable():
    case = lid_cavity(n=32, Re=1000.0, scheme="upwind", use_les=True)
    state, metrics = _run(case, 200, chunk=100)
    assert np.all(np.isfinite(np.asarray(state.u)))
    assert float(np.asarray(metrics.max_vel)[-1]) <= 1.0 + 1e-3


def test_les_adds_dissipation():
    # Smagorinsky eddy viscosity must lower the kinetic energy of an
    # under-resolved high-Re flow relative to the no-model run
    kw = dict(n=48, Re=10000.0, scheme="central", cfl=0.4)
    no_les, m0 = _run(lid_cavity(use_les=False, **kw), 600, chunk=200)
    with_les, m1 = _run(lid_cavity(use_les=True, smagorinsky_constant=0.2, **kw),
                        600, chunk=200)
    e0 = float(np.asarray(m0.energy)[-1])
    e1 = float(np.asarray(m1.energy)[-1])
    assert np.isfinite(e0) and np.isfinite(e1)
    assert e1 < e0, f"LES energy {e1} should be below no-model {e0}"
