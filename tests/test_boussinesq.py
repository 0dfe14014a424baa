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


def test_heated_cavity_explicit_sharded_matches():
    # multi-chip natural convection: trimmed MAC faces + θ halos + exact
    # distributed DCT projection must match the single-device step
    from cfdsim_tpu.parallel.boussinesq_explicit import (
        make_heated_cavity_explicit_step,
        shard_boussinesq_state,
        trim_boussinesq_state,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = heated_cavity(n=32, Ra=1e4)
    step_ex = make_heated_cavity_explicit_step(case.cfg, mesh)
    step_ref = jax.jit(case.step)
    t = shard_boussinesq_state(trim_boussinesq_state(case.state), mesh)
    r = case.state
    m_ex = m_ref = None
    for _ in range(40):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:-1, :],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.theta), np.asarray(r.theta),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    np.testing.assert_allclose(float(m_ex.nu_hot_wall),
                               float(m_ref.nu_hot_wall), rtol=1e-4)
    np.testing.assert_allclose(float(m_ex.nu_mid), float(m_ref.nu_mid),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)
    assert len(t.u.sharding.device_set) == 8


def test_rayleigh_benard_onset_bracket():
    # linear stability: the conducting state decays below the critical
    # Rayleigh number (Ra_c = 1708, rigid-rigid) and convection rolls
    # grow and saturate above it
    from cfdsim_tpu.cases import rayleigh_benard

    def run(Ra, t_end):
        case = rayleigh_benard(ny=32, aspect=2.0, Ra=Ra)
        f = jax.jit(lambda s0: jax.lax.scan(
            lambda st, _: case.step(st, jnp.float32(1.0)), s0, None,
            length=1000))
        s = case.state
        ms = None
        while float(s.t) < t_end:
            s, ms = f(s)
        return (float(np.asarray(ms.max_vel)[-1]),
                float(np.asarray(ms.nu_hot_wall)[-1]),
                float(np.asarray(ms.nu_mid)[-1]))

    vel_sub, nu_sub, _ = run(1200.0, 1.0)
    assert vel_sub < 1e-3          # subcritical: perturbation decays
    np.testing.assert_allclose(nu_sub, 1.0, rtol=1e-3)  # pure conduction

    vel_super, nu_super, nu_mid = run(3000.0, 5.0)
    assert vel_super > 5.0         # supercritical: rolls saturate
    assert nu_super > 1.3          # convective heat-transport enhancement
    # steady state: wall and mid-plane Nusselt agree (flux conservation)
    np.testing.assert_allclose(nu_super, nu_mid, rtol=0.02)


def test_heated_cavity_snapshot_restore_roundtrip(tmp_path):
    from cfdsim_tpu.io_ import SnapshotWriter, restore

    case = heated_cavity(n=16, Ra=1e3)
    s, _ = _run(case, 0.02)
    writer = SnapshotWriter(tmp_path / "bq.h5")
    writer.save(int(s.step), float(s.t), u=s.u, v=s.v, p=s.p, theta=s.theta)
    restored = restore(case.state, tmp_path / "bq.h5")
    np.testing.assert_array_equal(np.asarray(restored.theta),
                                  np.asarray(s.theta))
    np.testing.assert_array_equal(np.asarray(restored.u), np.asarray(s.u))
    assert int(restored.step) == int(s.step)
    # and it keeps stepping from the restored state
    s2, _ = case.step(restored, jnp.float32(1.0))
    assert bool(jnp.all(jnp.isfinite(s2.theta)))


def test_heated_cube_nusselt_ra1e4():
    # Tric et al. (2000) cube benchmark: Nu = 2.054 at Ra=10⁴
    from cfdsim_tpu.cases import heated_cube

    case = heated_cube(n=32, Ra=1e4)
    s, ms = _run(case, 0.4)
    nu_wall = float(np.asarray(ms.nu_hot_wall)[-1])
    nu_mid = float(np.asarray(ms.nu_mid)[-1])
    np.testing.assert_allclose(nu_wall, 2.054, rtol=0.03)
    np.testing.assert_allclose(nu_wall, nu_mid, rtol=5e-3)
    assert float(np.asarray(ms.theta_min)[-1]) > -1e-3
    assert float(np.asarray(ms.theta_max)[-1]) < 1.0 + 1e-3
    assert float(np.asarray(ms.div_post)[-1]) < 1e-2


def test_heated_cube_explicit_sharded_matches():
    # multi-chip 3D natural convection: trimmed 3D MAC faces + θ halos +
    # exact distributed 3D DCT must match the single-device step
    from cfdsim_tpu.cases import heated_cube
    from cfdsim_tpu.parallel.boussinesq3d_explicit import (
        make_heated_cube_explicit_step,
        shard_boussinesq3d_state,
        trim_boussinesq3d_state,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = heated_cube(n=16, Ra=1e4)
    step_ex = make_heated_cube_explicit_step(case.cfg, mesh)
    step_ref = jax.jit(case.step)
    t = shard_boussinesq3d_state(trim_boussinesq3d_state(case.state), mesh)
    r = case.state
    m_ex = m_ref = None
    for _ in range(30):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.theta), np.asarray(r.theta),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.nu_hot_wall),
                               float(m_ref.nu_hot_wall), rtol=1e-4)
    np.testing.assert_allclose(float(m_ex.nu_mid), float(m_ref.nu_mid),
                               rtol=1e-3, atol=1e-4)
    assert len(t.u.sharding.device_set) == 8


def test_rayleigh_benard_explicit_sharded_matches():
    # the bottom-heated orientation under sharding too
    from cfdsim_tpu.parallel.boussinesq_explicit import (
        make_heated_cavity_explicit_step,
        shard_boussinesq_state,
        trim_boussinesq_state,
    )
    from cfdsim_tpu.cases import rayleigh_benard
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = rayleigh_benard(ny=16, aspect=2.0, Ra=3000.0)
    step_ex = make_heated_cavity_explicit_step(case.cfg, mesh)
    step_ref = jax.jit(case.step)
    t = shard_boussinesq_state(trim_boussinesq_state(case.state), mesh)
    r = case.state
    m_ex = m_ref = None
    for _ in range(40):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:-1, :],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.theta), np.asarray(r.theta),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(float(m_ex.nu_hot_wall),
                               float(m_ref.nu_hot_wall), rtol=1e-4)
    np.testing.assert_allclose(float(m_ex.nu_mid), float(m_ref.nu_mid),
                               rtol=1e-3, atol=1e-4)
