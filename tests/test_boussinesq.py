"""Boussinesq natural convection: the differentially heated cavity
against the de Vahl Davis (1983) benchmark — a quantitative two-way
coupled validation the reference never had."""

import numpy as np
import jax
import jax.numpy as jnp

from cfdsim_tpu.cases import heated_cavity


def _run(case, t_end):
    step = case.step
    f = jax.jit(lambda s0: jax.lax.scan(
        lambda st, _: step(st, jnp.float32(1.0)), s0, None, length=1000))
    s = case.state
    ms = None
    while float(s.t) < t_end:
        s, ms = f(s)
    return s, ms


def test_heated_cavity_nusselt_ra1e3():
    # de Vahl Davis: Nu = 1.118, v_max ≈ 3.70 at Ra=10³
    case = heated_cavity(n=48, Ra=1e3)
    s, ms = _run(case, 0.6)
    nu_wall = float(np.asarray(ms.nu_hot_wall)[-1])
    nu_mid = float(np.asarray(ms.nu_mid)[-1])
    np.testing.assert_allclose(nu_wall, 1.118, rtol=0.02)
    np.testing.assert_allclose(nu_mid, 1.118, rtol=0.02)
    # steady state: wall and mid-plane Nusselt agree (energy conservation)
    np.testing.assert_allclose(nu_wall, nu_mid, rtol=5e-3)
    np.testing.assert_allclose(float(np.asarray(ms.max_vel)[-1]), 3.70,
                               rtol=0.05)
    # θ stays within the wall temperatures; projection exact
    assert float(np.asarray(ms.theta_min)[-1]) > -1e-3
    assert float(np.asarray(ms.theta_max)[-1]) < 1.0 + 1e-3
    assert float(np.asarray(ms.div_post)[-1]) < 1e-3


def test_heated_cavity_upwind_theta_monotone():
    # upwind θ advection is monotone: θ strictly within [0, 1] even while
    # the plume develops at higher Ra
    case = heated_cavity(n=32, Ra=1e4, theta_scheme="upwind")
    s, ms = _run(case, 0.2)
    assert float(jnp.min(s.theta)) >= -1e-6
    assert float(jnp.max(s.theta)) <= 1.0 + 1e-6
    assert bool(jnp.all(jnp.isfinite(s.u)))


def test_heated_cavity_zero_ra_stays_conductive():
    # Ra=0: no buoyancy → the conducting initial profile is a steady
    # state; velocities remain zero and Nu = 1 exactly
    case = heated_cavity(n=32, Ra=0.0)
    s, ms = _run(case, 0.1)
    assert float(jnp.max(jnp.abs(s.u))) < 1e-6
    np.testing.assert_allclose(float(np.asarray(ms.nu_hot_wall)[-1]), 1.0,
                               rtol=1e-3)
