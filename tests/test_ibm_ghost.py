"""Ghost-cell direct-forcing IBM (ibm_ghost.py).

Mechanics on tiny grids: classification completeness, exactness of the
reflection on fields where it is analytic (constant, radially linear),
and the stretched-3D sphere case stepping stably with positive drag
and a clean projection under ``ibm_scheme="ghost"``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdsim_tpu.ibm_ghost import (
    GhostIBM3D,
    apply_ghost_forcing,
    sphere_ghost_ibm,
)
from cfdsim_tpu.models.mac_stretched import stretched_faces

CENTER = (2.0, 2.0, 2.0)
RADIUS = 0.5


def _faces(n=28, stretched=True):
    if stretched:
        mk = lambda: stretched_faces(n, 4.0, refine=[(2.0, 1.0, 2.0)])
    else:
        mk = lambda: np.linspace(0.0, 4.0, n + 1)
    return mk(), mk(), mk()


@pytest.fixture(scope="module")
def ghost():
    xf, yf, zf = _faces()
    return sphere_ghost_ibm(xf, yf, zf, CENTER, RADIUS)


def _coords(xf, yf, zf, comp):
    xc = 0.5 * (xf[:-1] + xf[1:])
    yc = 0.5 * (yf[:-1] + yf[1:])
    zc = 0.5 * (zf[:-1] + zf[1:])
    xs = xf if comp == "u" else xc
    ys = yf if comp == "v" else yc
    zs = zf if comp == "w" else zc
    Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
    return X, Y, Z


def test_classification_partitions_interior(ghost):
    """solid ∪ ghost = all faces with d <= R, disjoint; every ghost
    face has a fluid axis neighbor."""
    xf, yf, zf = _faces()
    for comp, gs in zip("uvw", ghost):
        X, Y, Z = _coords(xf, yf, zf, comp)
        d = np.sqrt((X - CENTER[0]) ** 2 + (Y - CENTER[1]) ** 2
                    + (Z - CENTER[2]) ** 2)
        inside = d <= RADIUS
        solid = np.asarray(gs.solid, bool)
        gmask = np.zeros_like(solid)
        gmask[np.asarray(gs.gz), np.asarray(gs.gy), np.asarray(gs.gx)] = True
        assert not (solid & gmask).any()
        assert ((solid | gmask) == inside).all()
        assert gmask.sum() > 0 and solid.sum() > 0
        # weights are a partition of unity
        np.testing.assert_allclose(
            np.asarray(gs.pw).sum(-1), 1.0, atol=1e-6
        )


def test_constant_field_reflection_exact(ghost):
    """u ≡ c outside: probes read exactly c (trilinear of a constant),
    ghosts get -scale·c, solids 0, fluid untouched. The second Jacobi
    sweep couples ghosts whose probe corners touch other ghosts,
    perturbing at the 1e-5 level (their corner weights are small by
    construction) — atol covers it."""
    xf, yf, zf = _faces()
    c = 0.7
    for comp, gs in zip("uvw", ghost):
        X, _, _ = _coords(xf, yf, zf, comp)
        f = jnp.full(X.shape, c, jnp.float32)
        out, du = apply_ghost_forcing(f, gs, jnp.float32(1.0))
        out = np.asarray(out)
        want_ghost = -np.asarray(gs.scale) * c
        np.testing.assert_allclose(
            out[np.asarray(gs.gz), np.asarray(gs.gy), np.asarray(gs.gx)],
            want_ghost, atol=1e-4,
        )
        solid = np.asarray(gs.solid, bool)
        assert np.abs(out[solid]).max() == 0.0
        gmask = np.zeros_like(solid)
        gmask[np.asarray(gs.gz), np.asarray(gs.gy), np.asarray(gs.gx)] = True
        fluid = ~(solid | gmask)
        np.testing.assert_array_equal(out[fluid], np.float32(c))
        np.testing.assert_allclose(np.asarray(f - out), np.asarray(du))


def test_linear_wall_field_is_analytically_continued(ghost):
    """For u = a·(d - R) (zero exactly on the surface, linear along
    every normal) the reflection returns the field's own analytic
    continuation: u_ghost = a·(d_g - R). Trilinear interpolation of
    the curved field adds O(h²/R) error — tolerance scaled to it."""
    xf, yf, zf = _faces()
    a = 2.0
    h = float(np.diff(xf).min())
    for comp, gs in zip("uvw", ghost):
        X, Y, Z = _coords(xf, yf, zf, comp)
        d = np.sqrt((X - CENTER[0]) ** 2 + (Y - CENTER[1]) ** 2
                    + (Z - CENTER[2]) ** 2)
        f = jnp.asarray(a * (d - RADIUS), jnp.float32)
        out, _ = apply_ghost_forcing(f, gs, jnp.float32(1.0))
        got = np.asarray(out)[
            np.asarray(gs.gz), np.asarray(gs.gy), np.asarray(gs.gx)
        ]
        want = a * (d[np.asarray(gs.gz), np.asarray(gs.gy),
                      np.asarray(gs.gx)] - RADIUS)
        # curvature error of trilinear sampling at distance ~R
        tol = 4.0 * a * h * h / RADIUS
        assert np.abs(got - want).max() < tol


def test_ramp_blends_toward_target(ghost):
    gs = ghost.u
    xf, yf, zf = _faces()
    X, _, _ = _coords(xf, yf, zf, "u")
    f = jnp.ones(X.shape, jnp.float32)
    full, _ = apply_ghost_forcing(f, gs, jnp.float32(1.0))
    half, _ = apply_ghost_forcing(f, gs, jnp.float32(0.5))
    np.testing.assert_allclose(
        np.asarray(half), np.asarray(0.5 * (f + full)), atol=1e-6
    )


def test_sphere_stretched_ghost_case_steps():
    """The registry case with ibm_scheme="ghost": stable steps, clean
    projection, drag in the flow direction once the ramp is past."""
    from cfdsim_tpu.cases import build

    case = build(
        "sphere_stretched", nx=36, ny=20, nz=20, Re=100.0,
        domain=(8.0, 4.0, 4.0), center=(2.0, 2.0, 2.0),
        refine_strength=2.0, refine_width=1.0,
        ibm_scheme="ghost", ibm_ramp_steps=5,
    )

    def chunk(s):
        def body(c, _):
            c2, m = case.step(c, jnp.float32(1.0))
            return c2, (m.fx, m.div_post)

        return jax.lax.scan(body, s, None, length=30)

    s, (fx, div_post) = jax.jit(chunk)(case.state)
    assert np.isfinite(np.asarray(s.u)).all()
    assert np.isfinite(np.asarray(s.v)).all()
    assert np.isfinite(np.asarray(s.w)).all()
    assert float(jnp.max(jnp.abs(div_post))) < 1e-3
    assert float(fx[-1]) > 0.0
    # the solid interior is pinned (strength 1 resets it every step)
    gs = sphere_ghost_ibm(
        case.extras["x_faces"], case.extras["y_faces"],
        case.extras["z_faces"], case.extras["center"],
        case.extras["radius"],
    )
    solid = np.asarray(gs.u.solid, bool)
    # the solid interior is reset before each projection, so it only
    # carries the O(dt·∇φ) projection kick — small vs v_inf = 1, not
    # zero (larger on this deliberately coarse grid)
    assert np.abs(np.asarray(s.u)[solid]).max() < 0.15


def test_sphere_uniform_ghost_case_steps():
    """The uniform mac3d tier carries the same ibm_scheme="ghost"."""
    from cfdsim_tpu.cases import build

    case = build(
        "sphere", nx=32, ny=16, nz=16, Re=100.0,
        domain=(8.0, 4.0, 4.0), center=(2.0, 2.0, 2.0),
        ibm_scheme="ghost", ibm_ramp_steps=5,
    )

    def chunk(s):
        def body(c, _):
            c2, m = case.step(c, jnp.float32(1.0))
            return c2, m.fx

        return jax.lax.scan(body, s, None, length=25)

    s, fx = jax.jit(chunk)(case.state)
    assert np.isfinite(np.asarray(s.u)).all()
    assert float(fx[-1]) > 0.0


def test_heated_sphere_ghost_theta():
    """Thermal ghost treatment (sphere_ghost_cells on θ - θ_body):
    the isothermal surface lands on r = R; the body injects heat
    (Nu > 0) and the FLUID θ stays within physical bounds (ghost
    values are extrapolations beyond θ_body by design)."""
    from cfdsim_tpu.cases import build
    from cfdsim_tpu.ibm_ghost import sphere_ghost_cells

    case = build(
        "heated_sphere", nx=32, ny=16, nz=16, Re=100.0,
        domain=(8.0, 4.0, 4.0), center=(2.0, 2.0, 2.0),
        ibm_scheme="ghost", ibm_ramp_steps=5,
    )

    def chunk(s):
        def body(c, _):
            c2, m = case.step(c, jnp.float32(1.0))
            return c2, m.nusselt

        return jax.lax.scan(body, s, None, length=30)

    s, nus = jax.jit(chunk)(case.state)
    assert np.isfinite(np.asarray(s.theta)).all()
    assert float(nus[-1]) > 0.0
    g = case.grid
    xf = np.arange(g.nx + 1) * g.dx
    yf = np.arange(g.ny + 1) * g.dy
    zf = np.arange(g.nz + 1) * g.dz
    gs = sphere_ghost_cells(xf, yf, zf, (2.0, 2.0, 2.0), 0.5)
    th = np.asarray(s.theta)
    fluid = ~np.asarray(gs.solid, bool)
    fluid[np.asarray(gs.gz), np.asarray(gs.gy), np.asarray(gs.gx)] = False
    assert th[fluid].min() > -1e-4 and th[fluid].max() < 1.0 + 1e-4
    # solid interior pinned at theta_body
    np.testing.assert_allclose(
        th[np.asarray(gs.solid, bool)], 1.0, atol=1e-5
    )


def test_cylinder_2d_ghost():
    """2D habitat: constant-field reflection exactness on the u set and
    the cylinder_mac case stepping with drag in the stream direction."""
    from cfdsim_tpu.cases import build
    from cfdsim_tpu.ibm_ghost import apply_ghost_forcing_2d, cylinder_ghost_ibm

    xf = np.linspace(0.0, 8.0, 97)
    yf = np.linspace(0.0, 4.0, 49)
    g2 = cylinder_ghost_ibm(xf, yf, (2.0, 2.0), 0.5)
    gs = g2.u
    assert len(np.asarray(gs.gx)) > 0
    xc = 0.5 * (yf[:-1] + yf[1:])
    f = jnp.full((len(xc), len(xf)), 0.6, jnp.float32)
    out, du = apply_ghost_forcing_2d(f, gs, jnp.float32(1.0))
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(gs.gy), np.asarray(gs.gx)],
        -np.asarray(gs.scale) * 0.6, atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(f - out), np.asarray(du))

    case = build(
        "cylinder_mac", nx=96, ny=48, Re=100.0, domain=(8.0, 4.0),
        center=(2.0, 2.0), ibm_scheme="ghost", ibm_ramp_steps=5,
        warmup_steps=0,
    )

    def chunk(s):
        def body(c, _):
            c2, m = case.step(c, jnp.float32(1.0))
            return c2, m.fx

        return jax.lax.scan(body, s, None, length=30)

    s, fx = jax.jit(chunk)(case.state)
    assert np.isfinite(np.asarray(s.u)).all()
    assert float(fx[-1]) > 0.0


def test_stretched_2d_ghost_uniform_equivalence():
    """On uniform faces the stretched-2D ghost step must reproduce the
    uniform mac ghost step (same stencils — the builders see identical
    coordinates), including the volume-weighted forces."""
    from cfdsim_tpu.grid import Grid
    from cfdsim_tpu.ibm_ghost import cylinder_ghost_ibm
    from cfdsim_tpu.models import mac
    from cfdsim_tpu.models import mac_stretched as ms

    n = 32
    xf = np.linspace(0.0, 1.0, n + 1)
    ghost = cylinder_ghost_ibm(xf, xf, (0.5, 0.5), 0.15)
    bcs = mac.cavity_bcs(1.0)
    scfg = ms.StretchedMACConfig(nx=n, ny=n, nu=0.01, cfl_target=0.5,
                                 dt_max=0.5 / n)
    step_s = jax.jit(ms.make_step(scfg, bcs, xf, xf, ibm_ghost=ghost))
    from cfdsim_tpu.solvers.poisson import PoissonConfig

    # exact-DCT projection to match the stretched tier's exact FDM
    ucfg = mac.MACConfig(grid=Grid(nx=n, ny=n, centering="cell"), nu=0.01,
                         cfl_target=0.5, dt_max=0.5 / n,
                         poisson=PoissonConfig(method="dct"))
    step_u = jax.jit(mac.make_step(ucfg, bcs, ibm_ghost=ghost))
    ss, su = ms.init_state(scfg), mac.init_state(ucfg)
    for _ in range(10):
        ss, m_s = step_s(ss, jnp.float32(1.0))
        su, m_u = step_u(su, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(ss.u), np.asarray(su.u),
                               rtol=0, atol=5e-6)
    np.testing.assert_allclose(np.asarray(ss.v), np.asarray(su.v),
                               rtol=0, atol=5e-6)
    np.testing.assert_allclose(float(m_s.fx), float(m_u.fx), atol=1e-5)


def test_moving_ghost_static_limit_matches_precomputed():
    """moving_ghost_forcing_2d with a constant center and u_b = 0 must
    reproduce the host-precomputed static apply (same classification,
    same bilinear probes on the uniform grid)."""
    from cfdsim_tpu.ibm_ghost import (
        apply_ghost_forcing_2d,
        cylinder_ghost_ibm,
        moving_ghost_forcing_2d,
    )

    nx, ny = 96, 48
    xf = np.linspace(0.0, 8.0, nx + 1)
    yf = np.linspace(0.0, 4.0, ny + 1)
    dx = 8.0 / nx
    dy = 4.0 / ny
    yc = 0.5 * (yf[:-1] + yf[1:])
    X, Y = (jnp.asarray(a, jnp.float32)
            for a in np.meshgrid(xf, yc, indexing="xy"))
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(ny, nx + 1)), jnp.float32)
    static = cylinder_ghost_ibm(xf, yf, (2.0, 2.0), 0.5,
                                probe_dist=1.5 * dx)
    out_s, du_s = apply_ghost_forcing_2d(f, static.u, jnp.float32(1.0))
    out_m, du_m = moving_ghost_forcing_2d(
        f, X, Y, 0.0, dx, 0.5 * dy, dy, (2.0, 2.0), 0.5, 1.5 * dx,
        jnp.float32(0.0), jnp.float32(1.0),
    )
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(du_m), np.asarray(du_s),
                               rtol=0, atol=2e-5)


def test_moving_ghost_comoving_stream_is_forceless():
    """A body co-moving with a uniform stream (u ≡ u_b everywhere)
    leaves the field untouched: the ghost reflection of a constant
    u_b field through the wall value u_b is u_b."""
    from cfdsim_tpu.ibm_ghost import moving_ghost_forcing_2d

    nx, ny = 64, 64
    xf = np.linspace(0.0, 4.0, nx + 1)
    yf = np.linspace(0.0, 4.0, ny + 1)
    dx = dy = 4.0 / nx
    yc = 0.5 * (yf[:-1] + yf[1:])
    X, Y = (jnp.asarray(a, jnp.float32)
            for a in np.meshgrid(xf, yc, indexing="xy"))
    ub = jnp.float32(0.7)
    f = jnp.full((ny, nx + 1), 0.7, jnp.float32)
    out, du = moving_ghost_forcing_2d(
        f, X, Y, 0.0, dx, 0.5 * dy, dy, (2.0, 2.0), 0.5, 1.5 * dx,
        ub, jnp.float32(1.0),
    )
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5)
    assert float(jnp.max(jnp.abs(du))) < 1e-5


def test_oscillating_cylinder_ghost_case_steps():
    from cfdsim_tpu.cases import build

    case = build(
        "cylinder_oscillating", nx=96, ny=48, domain=(8.0, 4.0),
        center=(4.0, 2.0), ibm_scheme="ghost",
    )

    def chunk(s):
        def body(c, _):
            c2, m = case.step(c, jnp.float32(1.0))
            return c2, m.fx

        return jax.lax.scan(body, s, None, length=25)

    s, fx = jax.jit(chunk)(case.state)
    assert np.isfinite(np.asarray(s.u)).all()
    assert np.isfinite(float(fx[-1]))


def test_moving_ghost_nonuniform_matches_uniform_on_uniform_faces():
    """The searchsorted nonuniform moving-ghost apply equals the
    floor-arithmetic uniform one on uniform coordinate vectors."""
    from cfdsim_tpu.ibm_ghost import (
        moving_ghost_forcing_2d,
        moving_ghost_forcing_2d_nonuniform,
    )

    nx, ny = 96, 48
    xf = np.linspace(0.0, 8.0, nx + 1)
    yf = np.linspace(0.0, 4.0, ny + 1)
    dx = 8.0 / nx
    dy = 4.0 / ny
    yc = 0.5 * (yf[:-1] + yf[1:])
    X, Y = (jnp.asarray(a, jnp.float32)
            for a in np.meshgrid(xf, yc, indexing="xy"))
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.normal(size=(ny, nx + 1)), jnp.float32)
    args = ((2.1, 1.9), 0.5, 1.5 * dx, jnp.float32(0.3),
            jnp.float32(1.0))
    out_u, du_u = moving_ghost_forcing_2d(
        f, X, Y, 0.0, dx, 0.5 * dy, dy, *args)
    out_n, du_n = moving_ghost_forcing_2d_nonuniform(
        f, X, Y, xf, yc, *args)
    np.testing.assert_allclose(np.asarray(out_n), np.asarray(out_u),
                               rtol=0, atol=2e-5)


def test_oscillating_cylinder_stretched_ghost_steps():
    from cfdsim_tpu.cases import build

    case = build(
        "cylinder_oscillating", nx=64, ny=48, domain=(8.0, 4.0),
        center=(4.0, 2.0), stretched=True, ibm_scheme="ghost",
    )

    def chunk(s):
        def body(c, _):
            c2, m = case.step(c, jnp.float32(1.0))
            return c2, m.fx

        return jax.lax.scan(body, s, None, length=20)

    s, fx = jax.jit(chunk)(case.state)
    assert np.isfinite(np.asarray(s.u)).all()
    assert np.isfinite(float(fx[-1]))


def test_moving_ghost_3d_static_limit_matches_precomputed():
    """moving_ghost_forcing_3d with constant center and u_b=0 equals the
    host-precomputed static sphere apply on the uniform grid."""
    from cfdsim_tpu.ibm_ghost import (
        apply_ghost_forcing,
        moving_ghost_forcing_3d,
        sphere_ghost_ibm,
    )

    nx, ny, nz = 32, 16, 16
    xf = np.linspace(0.0, 8.0, nx + 1)
    yf = np.linspace(0.0, 4.0, ny + 1)
    zf = np.linspace(0.0, 4.0, nz + 1)
    dx = dy = dz = 0.25
    yc = 0.5 * (yf[:-1] + yf[1:])
    zc = 0.5 * (zf[:-1] + zf[1:])
    Z, Y, X = (jnp.asarray(a, jnp.float32)
               for a in np.meshgrid(zc, yc, xf, indexing="ij"))
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.normal(size=(nz, ny, nx + 1)), jnp.float32)
    static = sphere_ghost_ibm(xf, yf, zf, (2.0, 2.0, 2.0), 0.5,
                              probe_dist=1.5 * dx)
    out_s, du_s = apply_ghost_forcing(f, static.u, jnp.float32(1.0))
    out_m, du_m = moving_ghost_forcing_3d(
        f, X, Y, Z, (0.0, 0.5 * dy, 0.5 * dz), (dx, dy, dz),
        (2.0, 2.0, 2.0), 0.5, 1.5 * dx, jnp.float32(0.0),
        jnp.float32(1.0),
    )
    np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_s),
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(du_m), np.asarray(du_s),
                               rtol=0, atol=2e-5)


def test_moving_ghost_3d_step_runs():
    """mac3d moving_scheme="ghost": a translating sphere steps stably
    with finite forces and a clean projection."""
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.ibm import MovingBody3D
    from cfdsim_tpu.models import mac3d
    from cfdsim_tpu.solvers.poisson3d import Poisson3DConfig

    grid = Grid3D(nx=32, ny=16, nz=16, x_max=8.0, y_max=4.0, z_max=4.0,
                  centering="cell")
    cfg = mac3d.MAC3DConfig(grid=grid, nu=0.01, scheme="tvd",
                            dt_max=0.05,
                            poisson=Poisson3DConfig(method="dct"))
    one3 = lambda t: (jnp.ones_like(t), jnp.zeros_like(t),
                      jnp.zeros_like(t))
    body = MovingBody3D(center=lambda t: (2.0 + t, 2.0, 2.0),
                        velocity=one3, radius=0.5)
    step = jax.jit(mac3d.make_step(cfg, mac3d.free_slip_bcs3d(),
                                   moving_body=body,
                                   moving_scheme="ghost"))
    s = mac3d.init_state(cfg)
    for _ in range(10):
        s, m = step(s, jnp.float32(1.0))
    assert np.isfinite(np.asarray(s.u)).all()
    assert np.isfinite(float(m.fx))
    assert float(m.div_post) < 1e-3


def test_moving_ghost_stretched3d_uniform_matches_mac3d():
    """On uniform faces the stretched-3D moving ghost equals the
    uniform mac3d moving ghost (searchsorted vs floor lookup)."""
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.ibm import MovingBody3D
    from cfdsim_tpu.models import mac3d
    from cfdsim_tpu.models import mac_stretched3d as ms3
    from cfdsim_tpu.solvers.poisson3d import Poisson3DConfig

    nx, ny, nz = 32, 16, 16
    xf = np.linspace(0.0, 8.0, nx + 1)
    yf = np.linspace(0.0, 4.0, ny + 1)
    zf = np.linspace(0.0, 4.0, nz + 1)
    one3 = lambda t: (0.5 * jnp.ones_like(t), jnp.zeros_like(t),
                      jnp.zeros_like(t))
    body = MovingBody3D(center=lambda t: (2.0 + 0.5 * t, 2.0, 2.0),
                        velocity=one3, radius=0.5)
    grid = Grid3D(nx=nx, ny=ny, nz=nz, x_max=8.0, y_max=4.0, z_max=4.0,
                  centering="cell")
    ucfg = mac3d.MAC3DConfig(grid=grid, nu=0.01, scheme="central",
                             dt_max=0.02,
                             poisson=Poisson3DConfig(method="dct"))
    scfg = ms3.StretchedMAC3DConfig(nx=nx, ny=ny, nz=nz, nu=0.01,
                                    scheme="central", dt_max=0.02)
    bcs_u = mac3d.free_slip_bcs3d()
    step_u = jax.jit(mac3d.make_step(ucfg, bcs_u, moving_body=body,
                                     moving_scheme="ghost"))
    step_s = jax.jit(ms3.make_step(scfg, bcs_u, xf, yf, zf,
                                   moving_body=body,
                                   moving_scheme="ghost"))
    su, ss = mac3d.init_state(ucfg), ms3.init_state(scfg)
    for _ in range(6):
        su, m_u = step_u(su, jnp.float32(1.0))
        ss, m_s = step_s(ss, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(ss.u), np.asarray(su.u),
                               rtol=0, atol=5e-6)
    np.testing.assert_allclose(np.asarray(ss.w), np.asarray(su.w),
                               rtol=0, atol=5e-6)
    np.testing.assert_allclose(float(m_s.fx), float(m_u.fx),
                               rtol=1e-4, atol=1e-6)


def test_ghost_and_masks_mutually_exclusive():
    from cfdsim_tpu.models import mac_stretched3d as ms3

    xf = np.linspace(0.0, 4.0, 17)
    cfg = ms3.StretchedMAC3DConfig(nx=16, ny=16, nz=16, nu=0.01)
    ghost = sphere_ghost_ibm(xf, xf, xf, CENTER, RADIUS)
    bcs = ms3.cavity3d_bcs(1.0)
    with pytest.raises(ValueError):
        ms3.make_step(
            cfg, bcs, xf, xf, xf,
            ibm_mask_u=jnp.zeros((16, 16, 17)), ibm_ghost=ghost,
        )
