"""Moving-geometry IBM (mac.make_step moving_body): static-limit
equivalence with the precomputed-mask path, Galilean/co-moving force
invariance, and the oscillating-cylinder case."""

import numpy as np
import jax
import jax.numpy as jnp

from cfdsim_tpu.cases import build
from cfdsim_tpu.grid import Grid
from cfdsim_tpu.ibm import MovingBody, translating_body
from cfdsim_tpu.models import mac
from cfdsim_tpu.solvers.poisson import PoissonConfig


def _sharp_masks_2d(grid, center, radius):
    """Static sharp face masks with the exact formula the moving-body
    path evaluates on device."""
    dx, dy = grid.dx, grid.dy
    xu = grid.x_min + np.arange(grid.nx + 1) * dx
    yu = grid.y_min + (np.arange(grid.ny) + 0.5) * dy
    Xu, Yu = np.meshgrid(xu, yu, indexing="xy")
    xv = grid.x_min + (np.arange(grid.nx) + 0.5) * dx
    yv = grid.y_min + np.arange(grid.ny + 1) * dy
    Xv, Yv = np.meshgrid(xv, yv, indexing="xy")
    du = np.sqrt((Xu - center[0]) ** 2 + (Yu - center[1]) ** 2)
    dv = np.sqrt((Xv - center[0]) ** 2 + (Yv - center[1]) ** 2)
    m = lambda d: np.clip((radius + 0.5 * dx - d) / dx, 0.0, 1.0)
    return (jnp.asarray(m(du), jnp.float32), jnp.asarray(m(dv), jnp.float32))


def _cfg(grid, nu=0.01, **kw):
    return mac.MACConfig(grid=grid, nu=nu, scheme="tvd",
                         poisson=PoissonConfig(method="dct"), **kw)


def test_moving_body_static_limit_matches_masks():
    """A MovingBody with constant center and zero velocity must equal
    the static precomputed-mask IBM path to fp roundoff."""
    grid = Grid(nx=64, ny=32, x_max=16.0, y_max=8.0, centering="cell")
    center, radius = (6.0, 4.0), 0.5
    cfg = _cfg(grid)
    bcs = mac.external_flow_bcs(
        1.0, grid.y_min + (np.arange(grid.ny) + 0.5) * grid.dy,
        grid.y_max, perturb_ramp_steps=10,
    )
    mu, mv = _sharp_masks_2d(grid, center, radius)
    step_static = jax.jit(mac.make_step(cfg, bcs, ibm_mask_u=mu,
                                        ibm_mask_v=mv, ibm_ramp_steps=5))
    body = MovingBody(
        center=lambda t: center,
        velocity=lambda t: (jnp.zeros_like(t), jnp.zeros_like(t)),
        radius=radius,
    )
    step_moving = jax.jit(mac.make_step(cfg, bcs, moving_body=body,
                                        ibm_ramp_steps=5))
    u0 = jnp.full((32, 65), 1.0, jnp.float32) * (1.0 - mu)
    s_a = mac.init_state(cfg, u0=u0)
    s_b = s_a
    for _ in range(5):
        s_a, m_a = step_static(s_a, jnp.float32(1.0))
        s_b, m_b = step_moving(s_b, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(s_a.u), np.asarray(s_b.u),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_a.v), np.asarray(s_b.v),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(float(m_a.fx), float(m_b.fx),
                               rtol=1e-5, atol=1e-7)


def test_comoving_body_feels_no_force():
    """A body translating at exactly the stream velocity has zero
    relative velocity everywhere: the penalization must not disturb the
    uniform flow and the reported force must vanish (the sharpest
    Galilean-consistency check of the u − u_b forcing)."""
    grid = Grid(nx=96, ny=32, x_max=24.0, y_max=8.0, centering="cell")
    cfg = _cfg(grid, nu=0.005)
    bcs = mac.external_flow_bcs(
        1.0, grid.y_min + (np.arange(grid.ny) + 0.5) * grid.dy,
        grid.y_max, perturb_amp=0.0,
    )
    body = translating_body((4.0, 4.0), (1.0, 0.0), 0.5)
    step = jax.jit(mac.make_step(cfg, bcs, moving_body=body))
    s = mac.init_state(cfg, u0=jnp.ones((32, 97), jnp.float32))
    for _ in range(30):
        s, m = step(s, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(s.u), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s.v), 0.0, atol=1e-5)
    assert abs(float(m.fx)) < 1e-5
    assert abs(float(m.fy)) < 1e-5


def test_oscillating_cylinder_case():
    """The KC=5 oscillating cylinder: the in-line force must flip sign
    with the body acceleration over the cycle (inertia + drag oppose
    the motion), and the flow stays finite and exactly projected."""
    case = build(
        "cylinder_oscillating", nx=96, ny=48, domain=(12.0, 6.0),
        center=(6.0, 3.0), KC=5.0, Re=100.0, period=5.0,
    )
    step = jax.jit(case.step)
    s = case.state
    ts, fxs = [], []
    while float(s.t) < 5.0:  # one period
        s, m = step(s, jnp.float32(1.0))
        ts.append(float(s.t))
        fxs.append(float(m.fx))
    assert bool(jnp.isfinite(s.u).all())
    assert float(m.div_post) < 1e-3
    fxs = np.asarray(fxs)
    ts = np.asarray(ts)
    # body velocity ∝ cos(2πt/T): in the first quarter period the body
    # accelerates in +x, so the FLUID pushes back: force on the body
    # (−fx reported on fluid... fx is the momentum the body ADDS) —
    # check anti-correlation of fx with the body acceleration sign
    # structure: fx must flip sign between the first and third quarter
    q1 = fxs[(ts > 0.3) & (ts < 1.0)].mean()
    q3 = fxs[(ts > 2.8) & (ts < 3.5)].mean()
    assert q1 * q3 < 0.0
    assert np.max(np.abs(fxs)) > 0.1  # a real force signal


def test_moving_sphere3d_static_limit_and_oscillation():
    """3D moving body (mac3d): static-limit equivalence with the sharp
    sphere masks, then an oscillating sphere stays finite/projected
    with a sign-alternating in-line force."""
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.ibm import (
        MovingBody3D,
        oscillating_sphere,
        sphere_masks_mac3d,
    )
    from cfdsim_tpu.models import mac3d
    from cfdsim_tpu.solvers.poisson3d import Poisson3DConfig

    grid = Grid3D(nx=32, ny=16, nz=16, x_max=8.0, y_max=4.0, z_max=4.0,
                  centering="cell")
    center, radius = (2.0, 2.0, 2.0), 0.5
    cfg = mac3d.MAC3DConfig(grid=grid, nu=0.01, scheme="tvd",
                            poisson=Poisson3DConfig(method="dct"))
    bcs = mac3d.external_flow_bcs3d(1.0)
    masks = sphere_masks_mac3d(grid, center, radius, profile="sharp")
    step_static = jax.jit(mac3d.make_step(
        cfg, bcs, ibm_mask_u=masks[0], ibm_mask_v=masks[1],
        ibm_mask_w=masks[2], ibm_ramp_steps=3,
    ))
    z3 = lambda t: (jnp.zeros_like(t),) * 3
    body = MovingBody3D(center=lambda t: center, velocity=z3,
                        radius=radius)
    step_moving = jax.jit(mac3d.make_step(cfg, bcs, moving_body=body,
                                          ibm_ramp_steps=3))
    u0 = jnp.ones((16, 16, 33), jnp.float32) * (1.0 - masks[0])
    s_a = mac3d.init_state(cfg)._replace(u=u0)
    s_b = s_a
    for _ in range(4):
        s_a, m_a = step_static(s_a, jnp.float32(1.0))
        s_b, m_b = step_moving(s_b, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(s_a.u), np.asarray(s_b.u),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(float(m_a.fx), float(m_b.fx),
                               rtol=1e-5, atol=1e-7)

    # oscillating sphere in a quiescent free-slip box
    cfg2 = mac3d.MAC3DConfig(grid=grid, nu=0.005, scheme="tvd",
                             dt_max=0.05)
    body2 = oscillating_sphere((4.0, 2.0, 2.0), 0.5, amplitude=0.8,
                               period=4.0)
    step2 = jax.jit(mac3d.make_step(cfg2, mac3d.free_slip_bcs3d(),
                                    moving_body=body2))
    s = mac3d.init_state(cfg2)
    fxs, ts = [], []
    while float(s.t) < 4.0:
        s, m = step2(s, jnp.float32(1.0))
        fxs.append(float(m.fx))
        ts.append(float(s.t))
    assert bool(jnp.isfinite(s.u).all())
    assert float(m.div_post) < 1e-3
    fxs, ts = np.asarray(fxs), np.asarray(ts)
    q1 = fxs[(ts > 0.2) & (ts < 0.9)].mean()
    q3 = fxs[(ts > 2.2) & (ts < 2.9)].mean()
    assert q1 * q3 < 0.0 and np.max(np.abs(fxs)) > 0.05


def test_stretched_moving_body_uniform_matches_mac():
    """Uniform faces: the stretched moving-body path must reproduce the
    uniform MAC moving-body step (central scheme, same sharp masks,
    same volume weights)."""
    c_u = build("cylinder_oscillating", nx=48, ny=24, domain=(8.0, 4.0),
                center=(4.0, 2.0), scheme="central", KC=4.0, period=4.0)
    c_s = build("cylinder_oscillating", nx=48, ny=24, domain=(8.0, 4.0),
                center=(4.0, 2.0), scheme="central", KC=4.0, period=4.0,
                stretched=True, refine_strength=0.0)
    np.testing.assert_allclose(np.diff(c_s.extras["x_faces"]), 8.0 / 48,
                               rtol=1e-12)
    s_u, s_s = c_u.state, c_s.state
    step_u = jax.jit(c_u.step)
    step_s = jax.jit(c_s.step)
    for _ in range(8):
        s_u, m_u = step_u(s_u, jnp.float32(1.0))
        s_s, m_s = step_s(s_s, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(s_s.u), np.asarray(s_u.u),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_s.v), np.asarray(s_u.v),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_s.fx), float(m_u.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_s.dt), float(m_u.dt), rtol=1e-5)


def test_moving_body_explicit_matches_single_device():
    """Sharded moving-geometry IBM: per-step on-device mask rebuild from
    the shard's global index grids + psum'd momentum-exchange forces
    must match the single-device cylinder_oscillating step on an
    8-device mesh."""
    from cfdsim_tpu.cases import cylinder_oscillating
    from cfdsim_tpu.parallel.mac_explicit import (
        make_moving_body_mac_explicit_step,
    )
    from cfdsim_tpu.parallel.mac_sharded import (
        shard_trimmed_state,
        trim_state,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = cylinder_oscillating(
        nx=64, ny=32, domain=(16.0, 8.0), center=(8.0, 4.0),
        KC=4.0, Re=80.0, period=4.0, scheme="tvd",
    )
    step_ref = jax.jit(case.step)
    step_ex = make_moving_body_mac_explicit_step(
        case.cfg, mesh, case.extras["body"]
    )
    t = shard_trimmed_state(trim_state(case.state), mesh)
    r = case.state
    for _ in range(8):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    assert len(t.u.sharding.device_set) == 8


def test_moving_ghost_explicit_matches_single_device():
    """Sharded moving GHOST (sharp-interface wall on a moving body):
    on-device classification from global index offsets + probe gathers
    through measured-width halo windows must match the single-device
    cylinder_oscillating with ibm_scheme='ghost' on the 8-device mesh
    (VERDICT r3 item 6 — the last cell of the {static,moving} x
    {single,sharded} x {penalize,ghost} cube)."""
    from cfdsim_tpu.cases import cylinder_oscillating
    from cfdsim_tpu.parallel.mac_explicit import (
        make_moving_body_mac_explicit_step,
    )
    from cfdsim_tpu.parallel.mac_sharded import (
        shard_trimmed_state,
        trim_state,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = cylinder_oscillating(
        nx=64, ny=32, domain=(16.0, 8.0), center=(8.0, 4.0),
        KC=4.0, Re=80.0, period=4.0, scheme="tvd", ibm_scheme="ghost",
    )
    step_ref = jax.jit(case.step)
    step_ex = make_moving_body_mac_explicit_step(
        case.cfg, mesh, case.extras["body"], moving_scheme="ghost"
    )
    t = shard_trimmed_state(trim_state(case.state), mesh)
    r = case.state
    for _ in range(8):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    assert abs(float(m_ex.fx)) > 1e-5  # a real force signal
    assert len(t.u.sharding.device_set) == 8


def test_moving_ghost3d_explicit_matches_single_device():
    """Sharded 3D moving ghost: trilinear window probes + z-local
    classification must match the single-device mac3d
    moving_scheme='ghost' oscillating sphere."""
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.ibm import oscillating_sphere
    from cfdsim_tpu.models import mac3d
    from cfdsim_tpu.parallel.mac3d_explicit import (
        make_moving_body_mac3d_explicit_step,
        shard_trimmed_state3d,
        trim_state3d,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    grid = Grid3D(nx=24, ny=16, nz=12, x_max=6.0, y_max=4.0, z_max=3.0,
                  centering="cell")
    cfg = mac3d.MAC3DConfig(grid=grid, nu=0.01, scheme="tvd", dt_max=0.02)
    body = oscillating_sphere((3.0, 2.0, 1.5), 0.5, amplitude=0.6,
                              period=3.0)
    step_ref = jax.jit(mac3d.make_step(
        cfg, mac3d.free_slip_bcs3d(), moving_body=body,
        moving_scheme="ghost", ibm_ramp_steps=2,
    ))
    step_ex = make_moving_body_mac3d_explicit_step(
        cfg, mesh, body, ibm_ramp_steps=2, moving_scheme="ghost"
    )
    t = shard_trimmed_state3d(trim_state3d(mac3d.init_state(cfg)), mesh)
    r = mac3d.init_state(cfg)
    for _ in range(6):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fz), float(m_ref.fz),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    assert abs(float(m_ex.fx)) > 1e-5
    assert len(t.u.sharding.device_set) == 8


def test_stretched3d_moving_body_uniform_matches_mac3d():
    """Uniform faces: the stretched-3D moving-body path must reproduce
    the uniform mac3d moving-body step (central scheme — identical
    masks, penalization, volume weights)."""
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.ibm import oscillating_sphere
    from cfdsim_tpu.models import mac3d
    from cfdsim_tpu.models import mac_stretched3d as ms3
    from cfdsim_tpu.solvers.poisson3d import Poisson3DConfig

    n = 16
    body = oscillating_sphere((2.0, 1.0, 1.0), 0.3, amplitude=0.4,
                              period=3.0)
    grid = Grid3D(nx=2 * n, ny=n, nz=n, x_max=4.0, y_max=2.0, z_max=2.0,
                  centering="cell")
    cfg_u = mac3d.MAC3DConfig(grid=grid, nu=0.01, scheme="central",
                              poisson=Poisson3DConfig(method="dct"),
                              dt_max=0.02)
    step_u = jax.jit(mac3d.make_step(cfg_u, mac3d.free_slip_bcs3d(),
                                     moving_body=body))
    faces = lambda m, L: np.linspace(0.0, L, m + 1)
    cfg_s = ms3.StretchedMAC3DConfig(nx=2 * n, ny=n, nz=n, nu=0.01,
                                     scheme="central", dt_max=0.02)
    step_s = jax.jit(ms3.make_step(
        cfg_s, mac3d.free_slip_bcs3d(), faces(2 * n, 4.0),
        faces(n, 2.0), faces(n, 2.0), moving_body=body,
    ))
    s_u = mac3d.init_state(cfg_u)
    s_s = ms3.init_state(cfg_s)
    for _ in range(6):
        s_u, m_u = step_u(s_u, jnp.float32(1.0))
        s_s, m_s = step_s(s_s, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(s_s.u), np.asarray(s_u.u),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_s.w), np.asarray(s_u.w),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_s.fx), float(m_u.fx),
                               rtol=2e-4, atol=1e-6)
    assert abs(float(m_s.fx)) > 1e-4  # a real force signal


def test_moving_body3d_explicit_matches_single_device():
    """Sharded 3D moving-geometry IBM (mac3d_explicit moving_body):
    per-shard on-device mask rebuild + psum'd forces must match the
    single-device oscillating-sphere step on the 8-device mesh
    (VERDICT r2 item 3)."""
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.ibm import oscillating_sphere
    from cfdsim_tpu.models import mac3d
    from cfdsim_tpu.parallel.mac3d_explicit import (
        make_moving_body_mac3d_explicit_step,
        shard_trimmed_state3d,
        trim_state3d,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    grid = Grid3D(nx=24, ny=16, nz=12, x_max=6.0, y_max=4.0, z_max=3.0,
                  centering="cell")
    cfg = mac3d.MAC3DConfig(grid=grid, nu=0.01, scheme="tvd", dt_max=0.02)
    body = oscillating_sphere((3.0, 2.0, 1.5), 0.5, amplitude=0.6,
                              period=3.0)
    step_ref = jax.jit(mac3d.make_step(cfg, mac3d.free_slip_bcs3d(),
                                       moving_body=body, ibm_ramp_steps=2))
    step_ex = make_moving_body_mac3d_explicit_step(cfg, mesh, body,
                                                   ibm_ramp_steps=2)
    t = shard_trimmed_state3d(trim_state3d(mac3d.init_state(cfg)), mesh)
    r = mac3d.init_state(cfg)
    for _ in range(6):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fz), float(m_ref.fz),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    assert len(t.u.sharding.device_set) == 8


def test_stretched_moving_body_explicit_matches_single_device():
    """Sharded stretched moving-geometry IBM: coordinate-LUT mask rebuild
    + volume-weighted psum'd forces must match the single-device
    cylinder_oscillating(stretched=True) step on the 8-device mesh
    (VERDICT r2 item 3, stretched quadrant)."""
    from cfdsim_tpu.cases import cylinder_oscillating
    from cfdsim_tpu.parallel.mac_sharded import shard_trimmed_state, trim_state
    from cfdsim_tpu.parallel.mac_stretched_explicit import (
        make_moving_body_stretched_explicit_step,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = cylinder_oscillating(
        nx=64, ny=32, domain=(16.0, 8.0), center=(8.0, 4.0),
        KC=4.0, Re=80.0, period=4.0, scheme="tvd", stretched=True,
        refine_strength=2.0,
    )
    step_ref = jax.jit(case.step)
    step_ex = make_moving_body_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"],
        case.extras["body"],
    )
    t = shard_trimmed_state(trim_state(case.state), mesh)
    r = case.state
    for _ in range(8):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    assert len(t.u.sharding.device_set) == 8


def test_stretched_moving_ghost_explicit_matches_single_device():
    """Sharded stretched moving GHOST (the Dütsch KC=5 quality tier):
    searchsorted corner lookups on the coordinate vectors riding as
    replicated shard_map args + window probe gathers must match the
    single-device cylinder_oscillating(stretched=True,
    ibm_scheme='ghost') step."""
    from cfdsim_tpu.cases import cylinder_oscillating
    from cfdsim_tpu.parallel.mac_sharded import shard_trimmed_state, trim_state
    from cfdsim_tpu.parallel.mac_stretched_explicit import (
        make_moving_body_stretched_explicit_step,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = cylinder_oscillating(
        nx=64, ny=32, domain=(16.0, 8.0), center=(8.0, 4.0),
        KC=4.0, Re=80.0, period=4.0, scheme="tvd", stretched=True,
        refine_strength=2.0, ibm_scheme="ghost",
    )
    step_ref = jax.jit(case.step)
    step_ex = make_moving_body_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"],
        case.extras["body"], moving_scheme="ghost",
    )
    t = shard_trimmed_state(trim_state(case.state), mesh)
    r = case.state
    for _ in range(8):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    assert abs(float(m_ex.fx)) > 1e-5
    assert len(t.u.sharding.device_set) == 8


def test_stretched3d_moving_body_explicit_matches_single_device():
    """Sharded stretched-3D moving-geometry IBM — the last quadrant of
    the {2D,3D} x {uniform,stretched} sharded moving-body matrix — must
    match the single-device mac_stretched3d moving step (central
    scheme) on the 8-device mesh."""
    import numpy as onp

    from cfdsim_tpu.ibm import oscillating_sphere
    from cfdsim_tpu.models import mac_stretched3d as ms3
    from cfdsim_tpu.models.mac_stretched import stretched_faces
    from cfdsim_tpu.parallel.mac3d_explicit import (
        shard_trimmed_state3d,
        trim_state3d,
    )
    from cfdsim_tpu.parallel.mac_stretched3d_explicit import (
        make_moving_body3d_stretched_explicit_step,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    nx, ny, nz = 24, 16, 12
    xf = stretched_faces(nx, 6.0, refine=[(3.0, 1.0, 1.5)])
    yf = stretched_faces(ny, 4.0, refine=[(2.0, 1.0, 1.5)])
    zf = stretched_faces(nz, 3.0, refine=[(1.5, 1.0, 1.5)])
    cfg = ms3.StretchedMAC3DConfig(nx=nx, ny=ny, nz=nz, nu=0.01,
                                   scheme="central", dt_max=0.02)
    body = oscillating_sphere((3.0, 2.0, 1.5), 0.5, amplitude=0.6,
                              period=3.0)
    from cfdsim_tpu.models import mac3d
    step_ref = jax.jit(ms3.make_step(cfg, mac3d.free_slip_bcs3d(),
                                     xf, yf, zf, moving_body=body,
                                     ibm_ramp_steps=2))
    step_ex = make_moving_body3d_stretched_explicit_step(
        cfg, mesh, xf, yf, zf, body, ibm_ramp_steps=2)
    t = shard_trimmed_state3d(trim_state3d(ms3.init_state(cfg)), mesh)
    r = ms3.init_state(cfg)
    for _ in range(6):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    onp.testing.assert_allclose(onp.asarray(t.u), onp.asarray(r.u)[:, :, :-1],
                                rtol=0, atol=2e-5)
    onp.testing.assert_allclose(onp.asarray(t.v), onp.asarray(r.v)[:, :-1, :],
                                rtol=0, atol=2e-5)
    onp.testing.assert_allclose(onp.asarray(t.w), onp.asarray(r.w)[:-1],
                                rtol=0, atol=2e-5)
    onp.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                                rtol=2e-4, atol=1e-6)
    onp.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                                rtol=2e-4, atol=1e-6)
    onp.testing.assert_allclose(float(m_ex.fz), float(m_ref.fz),
                                rtol=2e-4, atol=1e-6)
    onp.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
