"""Sharded ghost-cell direct-forcing IBM (parallel/ibm_ghost_explicit)
must match the single-device apply exactly: the tables travel as
shard_map ARGS (gather-on-constants miscompile rules), probe corners
poke into neighbor shards through measured-width halos."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.parallel.mesh import make_grid_mesh



@pytest.fixture(scope="module")
def mesh():
    return make_grid_mesh(8, topology=(2, 4))


def test_apply_ghost_forcing_local_matches_global(mesh):
    """The raw sharded apply on one component field == the single-device
    apply_ghost_forcing on the corresponding full array (bitwise modulo
    fp reassociation — we assert to 1e-7)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.ibm_ghost import apply_ghost_forcing, sphere_ghost_ibm
    from cfdsim_tpu.parallel.ibm_ghost_explicit import (
        apply_ghost_forcing_local,
        ghost_ibm_spec,
        partition_ghost_ibm3d,
        shard_ghost_tables,
    )

    nx, ny, nz = 32, 16, 16
    g = Grid3D(nx=nx, ny=ny, nz=nz, x_max=8.0, y_max=4.0, z_max=4.0,
               centering="cell")
    xf = g.x_min + np.arange(nx + 1) * g.dx
    yf = g.y_min + np.arange(ny + 1) * g.dy
    zf = g.z_min + np.arange(nz + 1) * g.dz
    ghost = sphere_ghost_ibm(xf, yf, zf, (2.0, 2.0, 2.0), 0.5)

    py, px = mesh.shape["y"], mesh.shape["x"]
    tables, width = partition_ghost_ibm3d(ghost, nx, ny, nz, py, px)
    tables = shard_ghost_tables(tables, mesh)

    rng = np.random.default_rng(3)
    u_full = jnp.asarray(rng.standard_normal((nz, ny, nx + 1)), jnp.float32)
    v_full = jnp.asarray(rng.standard_normal((nz, ny + 1, nx)), jnp.float32)
    w_full = jnp.asarray(rng.standard_normal((nz + 1, ny, nx)), jnp.float32)
    strength = jnp.float32(0.7)

    spec = P(None, "y", "x")
    sh = NamedSharding(mesh, spec)

    def local(fields, tabs):
        ou, du = apply_ghost_forcing_local(
            fields[0], tabs.u, py, px, width, strength)
        ov, dv = apply_ghost_forcing_local(
            fields[1], tabs.v, py, px, width, strength)
        ow, dw = apply_ghost_forcing_local(
            fields[2], tabs.w, py, px, width, strength)
        return (ou, ov, ow), (du, dv, dw)

    f = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=((spec, spec, spec), ghost_ibm_spec()),
        out_specs=((spec, spec, spec), (spec, spec, spec)),
    ))
    fields_t = tuple(
        jax.device_put(a, sh)
        for a in (u_full[:, :, :-1], v_full[:, :-1, :], w_full[:-1])
    )
    (ou, ov, ow), (du, dv, dw) = f(fields_t, tables)

    ru, dru = apply_ghost_forcing(u_full, ghost.u, strength)
    rv, drv = apply_ghost_forcing(v_full, ghost.v, strength)
    rw, drw = apply_ghost_forcing(w_full, ghost.w, strength)

    np.testing.assert_allclose(np.asarray(ou), np.asarray(ru)[:, :, :-1],
                               rtol=0, atol=5e-7)
    np.testing.assert_allclose(np.asarray(ov), np.asarray(rv)[:, :-1, :],
                               rtol=0, atol=5e-7)
    np.testing.assert_allclose(np.asarray(ow), np.asarray(rw)[:-1],
                               rtol=0, atol=5e-7)
    np.testing.assert_allclose(np.asarray(du), np.asarray(dru)[:, :, :-1],
                               rtol=0, atol=5e-7)
    assert len(ou.sharding.device_set) == 8


def test_sphere_ghost_explicit_matches_single_device(mesh):
    """Full sharded ghost-sphere step (external-flow BCs + sharp-interface
    ghost forcing + distributed 3D DCT projection) == the single-device
    sphere case with ibm_scheme='ghost', forces included."""
    from cfdsim_tpu.cases import sphere_mac3d
    from cfdsim_tpu.parallel.mac3d_explicit import (
        make_sphere_ghost_mac3d_explicit_step,
        shard_trimmed_state3d,
        trim_state3d,
    )

    case = sphere_mac3d(
        nx=32, ny=16, nz=16, Re=100.0, domain=(8.0, 4.0, 4.0),
        center=(2.0, 2.0, 2.0), scheme="tvd", ibm_scheme="ghost",
        ibm_ramp_steps=4, compute_metrics=True,
    )
    step_ref = jax.jit(case.step)
    step_ex, tables = make_sphere_ghost_mac3d_explicit_step(
        case.cfg, mesh, case.extras["ibm_ghost"],
        v_inf=case.extras["v_inf"], ibm_ramp_steps=4,
    )
    t = shard_trimmed_state3d(trim_state3d(case.state), mesh)
    r = case.state
    for _ in range(6):
        t, m_ex = step_ex(t, jnp.float32(1.0), tables)
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fz), float(m_ref.fz),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.max_vel), float(m_ref.max_vel),
                               rtol=1e-5)
    assert float(m_ex.fx) > 0.0
    assert len(t.u.sharding.device_set) == 8


def test_sphere_ghost_stretched_explicit_matches_single_device(mesh):
    """Sharded stretched-3D ghost sphere (nonuniform probe stencils,
    volume-weighted forces, area-weighted outflow) == the single-device
    sphere_stretched case with ibm_scheme='ghost'."""
    from cfdsim_tpu.cases import sphere_stretched
    from cfdsim_tpu.parallel.mac3d_explicit import (
        shard_trimmed_state3d,
        trim_state3d,
    )
    from cfdsim_tpu.parallel.mac_stretched3d_explicit import (
        make_sphere_ghost3d_stretched_explicit_step,
    )

    case = sphere_stretched(
        nx=32, ny=16, nz=16, Re=100.0, domain=(8.0, 4.0, 4.0),
        center=(2.0, 2.0, 2.0), scheme="central", ibm_scheme="ghost",
        refine_strength=1.5, refine_width=1.0, wake_length=2.0,
        ibm_ramp_steps=4, compute_metrics=True,
    )
    step_ref = jax.jit(case.step)
    step_ex, tables = make_sphere_ghost3d_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"],
        case.extras["z_faces"], case.extras["ibm_ghost"],
        v_inf=case.extras["v_inf"], ibm_ramp_steps=4,
    )
    t = shard_trimmed_state3d(trim_state3d(case.state), mesh)
    r = case.state
    for _ in range(6):
        t, m_ex = step_ex(t, jnp.float32(1.0), tables)
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=3e-4)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fz), float(m_ref.fz),
                               rtol=2e-4, atol=1e-6)
    assert float(m_ex.fx) > 0.0
    assert len(t.u.sharding.device_set) == 8


def _transport_state_sharded(case, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cfdsim_tpu.models.mac3d import MAC3DState
    from cfdsim_tpu.models.transport3d import Transport3DState
    from cfdsim_tpu.parallel.mac3d_explicit import (
        shard_trimmed_state3d,
        trim_state3d,
    )

    s = case.state
    sh = NamedSharding(mesh, P(None, "y", "x"))
    mac_trim = trim_state3d(MAC3DState(u=s.u, v=s.v, w=s.w, p=s.p,
                                       t=s.t, step=s.step))
    mac_trim = shard_trimmed_state3d(mac_trim, mesh)
    return Transport3DState(
        u=mac_trim.u, v=mac_trim.v, w=mac_trim.w, p=mac_trim.p,
        theta=jax.device_put(s.theta, sh), t=mac_trim.t,
        step=mac_trim.step,
    )


def test_heated_sphere_ghost_explicit_matches_single_device(mesh):
    """Sharded ghost forced convection: sharp-interface forcing on BOTH
    momentum and θ (cell-centered ghost set partitioned alongside the
    face sets) == the single-device heated_sphere with
    ibm_scheme='ghost', Nusselt included."""
    from cfdsim_tpu.cases import heated_sphere
    from cfdsim_tpu.parallel.transport3d_explicit import (
        make_heated_sphere_explicit_step,
    )

    case = heated_sphere(
        nx=32, ny=16, nz=16, Re=100.0, domain=(8.0, 4.0, 4.0),
        center=(2.0, 2.0, 2.0), scheme="tvd", ibm_scheme="ghost",
        ibm_ramp_steps=4,
    )
    step_ref = jax.jit(case.step)
    step_ex, tables, table_c = make_heated_sphere_explicit_step(
        case.cfg, mesh, v_inf=case.extras["v_inf"], ibm_ramp_steps=4,
        ghost=case.extras["ibm_ghost"], ghost_c=case.extras["ibm_ghost_c"],
    )
    t = _transport_state_sharded(case, mesh)
    r = case.state
    for _ in range(6):
        t, m_ex = step_ex(t, jnp.float32(1.0), tables, table_c)
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.theta), np.asarray(r.theta),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_ex.nusselt), float(m_ref.nusselt),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.theta_max),
                               float(m_ref.theta_max), rtol=1e-4)
    assert float(m_ex.nusselt) != 0.0
    assert len(t.theta.sharding.device_set) == 8


def test_heated_sphere_ghost_stretched_explicit_matches_single_device(mesh):
    """Sharded stretched ghost forced convection (nonuniform ghost
    stencils on momentum + θ, volume-weighted heat flux) == the
    single-device heated_sphere_stretched with ibm_scheme='ghost'."""
    from cfdsim_tpu.cases import heated_sphere_stretched
    from cfdsim_tpu.parallel.transport3d_explicit import (
        make_heated_sphere_stretched_explicit_step,
    )

    case = heated_sphere_stretched(
        nx=32, ny=16, nz=16, Re=100.0, domain=(8.0, 4.0, 4.0),
        center=(2.0, 2.0, 2.0), scheme="central", ibm_scheme="ghost",
        refine_strength=1.5, refine_width=1.0, wake_length=2.0,
        ibm_ramp_steps=4,
    )
    step_ref = jax.jit(case.step)
    step_ex, tables, table_c = make_heated_sphere_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"],
        case.extras["z_faces"], v_inf=case.extras["v_inf"],
        ibm_ramp_steps=4,
        ghost=case.extras["ibm_ghost"], ghost_c=case.extras["ibm_ghost_c"],
    )
    t = _transport_state_sharded(case, mesh)
    r = case.state
    for _ in range(6):
        t, m_ex = step_ex(t, jnp.float32(1.0), tables, table_c)
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.theta), np.asarray(r.theta),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(float(m_ex.nusselt), float(m_ref.nusselt),
                               rtol=2e-4)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    assert float(m_ex.nusselt) != 0.0
    assert len(t.theta.sharding.device_set) == 8


def test_sphere_ghost_dynamic_les_explicit_matches_single_device(mesh):
    """Sharded ghost-IBM sphere with les_model='dynamic': the Germano
    contraction must exclude the body via the halo'd trimmed solid
    masks exactly as ops.les_dynamic.ibm_fluid_mask_centers does on the
    global arrays (cs2 is a psum'd fp32 contraction — equality to
    partial-sum rounding)."""
    from cfdsim_tpu.cases import sphere_mac3d
    from cfdsim_tpu.models.mac3d import center_velocities_3d
    from cfdsim_tpu.ops.les_dynamic import (
        dynamic_cs2_3d,
        ibm_fluid_mask_centers,
    )
    from cfdsim_tpu.parallel.mac3d_explicit import (
        make_sphere_ghost_mac3d_explicit_step,
        shard_trimmed_state3d,
        trim_state3d,
    )

    case = sphere_mac3d(
        nx=32, ny=16, nz=16, Re=500.0, domain=(8.0, 4.0, 4.0),
        center=(2.0, 2.0, 2.0), scheme="tvd", ibm_scheme="ghost",
        ibm_ramp_steps=4, compute_metrics=True, use_les=True,
        les_model="dynamic",
    )

    # superpose low-k modes so the contraction engages (cs2 > 0): a
    # masked-out-body bug would be invisible at cs2 == 0
    rng = np.random.default_rng(11)

    def modes(shape, sd, amp=0.3):
        r = np.random.default_rng(sd)
        z = (np.arange(shape[0]) + 0.5) / shape[0]
        y = (np.arange(shape[1]) + 0.5) / shape[1]
        x = (np.arange(shape[2]) + 0.5) / shape[2]
        Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
        out = np.zeros(shape)
        for k in range(1, 6):
            out += (amp / k) * (
                np.sin(2 * np.pi * k * X + r.uniform(0, 6))
                * np.cos(2 * np.pi * k * Y + r.uniform(0, 6))
                * np.cos(2 * np.pi * k * Z + r.uniform(0, 6))
            )
        return out + 0.03 * rng.standard_normal(shape)

    s0 = case.state
    s_ref = s0._replace(
        u=s0.u + jnp.asarray(modes(s0.u.shape, 21), jnp.float32),
        v=s0.v + jnp.asarray(modes(s0.v.shape, 22), jnp.float32),
        w=s0.w + jnp.asarray(modes(s0.w.shape, 23), jnp.float32),
    )
    ghost = case.extras["ibm_ghost"]
    fluid = ibm_fluid_mask_centers(ibm_ghost=ghost)
    uc, vc, wc = center_velocities_3d(s_ref.u, s_ref.v, s_ref.w)
    dx = case.cfg.grid.dx
    cs2 = dynamic_cs2_3d(uc, vc, wc, 0.5 / dx, 0.5 / dx, 0.5 / dx,
                         dx * dx, mask=fluid)
    assert float(cs2) > 1e-5

    step_ref = jax.jit(case.step)
    step_ex, tables = make_sphere_ghost_mac3d_explicit_step(
        case.cfg, mesh, ghost,
        v_inf=case.extras["v_inf"], ibm_ramp_steps=4,
    )
    t = shard_trimmed_state3d(trim_state3d(s_ref), mesh)
    r = s_ref
    for _ in range(4):
        t, m_ex = step_ex(t, jnp.float32(1.0), tables)
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    assert len(t.u.sharding.device_set) == 8


@pytest.mark.parametrize("les_model", ["smagorinsky", "dynamic"])
def test_sphere_ghost_stretched_les_explicit_matches_single_device(
        mesh, les_model):
    """The Re=3900 production configuration sharded: stretched grid +
    ghost-cell wall treatment + LES (static and dynamic). Window-based
    ν_t on the nonuniform metrics; the dynamic Germano contraction
    excludes the body via the halo'd ghost 'solid' masks."""
    from cfdsim_tpu.cases import sphere_stretched
    from cfdsim_tpu.parallel.mac3d_explicit import (
        shard_trimmed_state3d,
        trim_state3d,
    )
    from cfdsim_tpu.parallel.mac_stretched3d_explicit import (
        make_sphere_ghost3d_stretched_explicit_step,
    )

    case = sphere_stretched(
        nx=32, ny=16, nz=16, Re=2000.0, domain=(8.0, 4.0, 4.0),
        center=(2.0, 2.0, 2.0), scheme="central", ibm_scheme="ghost",
        refine_strength=1.5, refine_width=1.0, wake_length=2.0,
        ibm_ramp_steps=4, compute_metrics=True, use_les=True,
        les_model=les_model,
    )
    # superpose low-k modes so the dynamic contraction engages
    rng = np.random.default_rng(29)

    def modes(shape, sd, amp=0.3):
        r = np.random.default_rng(sd)
        z = (np.arange(shape[0]) + 0.5) / shape[0]
        y = (np.arange(shape[1]) + 0.5) / shape[1]
        x = (np.arange(shape[2]) + 0.5) / shape[2]
        Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
        out = np.zeros(shape)
        for k in range(1, 6):
            out += (amp / k) * (
                np.sin(2 * np.pi * k * X + r.uniform(0, 6))
                * np.cos(2 * np.pi * k * Y + r.uniform(0, 6))
                * np.cos(2 * np.pi * k * Z + r.uniform(0, 6))
            )
        return out + 0.03 * rng.standard_normal(shape)

    s0 = case.state
    s_ref = s0._replace(
        u=s0.u + jnp.asarray(modes(s0.u.shape, 61), jnp.float32),
        v=s0.v + jnp.asarray(modes(s0.v.shape, 62), jnp.float32),
        w=s0.w + jnp.asarray(modes(s0.w.shape, 63), jnp.float32),
    )
    step_ref = jax.jit(case.step)
    step_ex, tables = make_sphere_ghost3d_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"],
        case.extras["z_faces"], case.extras["ibm_ghost"],
        v_inf=case.extras["v_inf"], ibm_ramp_steps=4,
    )
    t = shard_trimmed_state3d(trim_state3d(s_ref), mesh)
    r = s_ref
    for _ in range(4):
        t, m_ex = step_ex(t, jnp.float32(1.0), tables)
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=3e-4, atol=1e-6)
    assert len(t.u.sharding.device_set) == 8
