"""3D compressible FV solver: dimension-generic Riemann solvers must
match the validated 2D ones, Sod along every axis must match the exact
star states (axis isotropy of the dimension-split update), the spherical
blast must stay spherical, and the closed box conserves mass/energy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdsim_tpu.grid import Grid3D
from cfdsim_tpu.models import compressible3d as c3
from cfdsim_tpu.solvers.riemann import (
    FLUXES_ND,
    cons_to_prim_nd,
    euler_flux_nd,
    hllc_flux,
    hllc_flux_nd,
    prim_to_cons,
    rusanov_flux,
    rusanov_flux_nd,
)

GAMMA = 1.4


def test_nd_solvers_match_2d_solvers():
    rng = np.random.default_rng(0)
    rho = jnp.asarray(0.5 + rng.random((8, 16)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    p = jnp.asarray(0.5 + rng.random((8, 16)), jnp.float32)
    UL = prim_to_cons(rho, u, v, p, GAMMA)
    UR = prim_to_cons(rho * 1.1, u * 0.9, v, p * 1.2, GAMMA)
    for axis2d, vaxis in ((1, 0), (0, 1)):  # x faces → u, y faces → v
        np.testing.assert_allclose(
            np.asarray(rusanov_flux_nd(UL, UR, GAMMA, vaxis)),
            np.asarray(rusanov_flux(UL, UR, GAMMA, axis2d)),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(hllc_flux_nd(UL, UR, GAMMA, vaxis)),
            np.asarray(hllc_flux(UL, UR, GAMMA, axis2d)),
            rtol=1e-5, atol=1e-5,
        )


def test_nd_flux_consistency():
    rho = jnp.full((4, 4, 8), 1.3)
    u = jnp.full((4, 4, 8), 0.7)
    v = jnp.full((4, 4, 8), -0.2)
    w = jnp.full((4, 4, 8), 0.4)
    p = jnp.full((4, 4, 8), 2.1)
    U = c3.prim_to_cons_3d(rho, u, v, w, p, GAMMA)
    for name, f in FLUXES_ND.items():
        for vaxis in (0, 1, 2):
            np.testing.assert_allclose(
                np.asarray(f(U, U, GAMMA, vaxis)),
                np.asarray(euler_flux_nd(U, GAMMA, vaxis)),
                rtol=1e-5, atol=1e-5, err_msg=f"{name} vaxis={vaxis}",
            )


def _sod3d_along(axis: int, n=200, flux="hllc"):
    """Sod tube along one spatial axis of a thin 3D box."""
    shape = [6, 6, 6]
    shape[axis] = n
    nz, ny, nx = shape
    grid = Grid3D(nx=nx, ny=ny, nz=nz,
                  x_max=1.0 if axis == 2 else 0.03 * nx,
                  y_max=1.0 if axis == 1 else 0.03 * ny,
                  z_max=1.0 if axis == 0 else 0.03 * nz)
    cfg = c3.Compressible3DConfig(grid=grid, cfl=0.3, reconstruction="muscl",
                                  flux=flux)
    coords = (np.arange(shape[axis]) + 0.5) / shape[axis]
    left = coords < 0.5
    bshape = [1, 1, 1]
    bshape[axis] = n
    rho = jnp.asarray(
        np.broadcast_to(np.where(left, 1.0, 0.125).reshape(bshape), shape),
        jnp.float32,
    )
    p = jnp.asarray(
        np.broadcast_to(np.where(left, 1.0, 0.1).reshape(bshape), shape),
        jnp.float32,
    )
    zero = jnp.zeros(shape, jnp.float32)
    U0 = c3.prim_to_cons_3d(rho, zero, zero, zero, p, GAMMA)

    def bc(U, step, t):
        for arr_axis in (1, 2, 3):
            lo = jax.lax.slice_in_dim(U, 1, 2, axis=arr_axis)
            hi = jax.lax.slice_in_dim(
                U, U.shape[arr_axis] - 2, U.shape[arr_axis] - 1, axis=arr_axis
            )
            mid = jax.lax.slice_in_dim(U, 1, U.shape[arr_axis] - 1, axis=arr_axis)
            U = jnp.concatenate([lo, mid, hi], axis=arr_axis)
        return U

    step = c3.make_step(cfg, bc)
    s = c3.init_state(cfg, U0)
    f = jax.jit(lambda st: jax.lax.scan(
        lambda c_, _: step(c_, jnp.float32(1.0)), st, None, length=50)[0])
    while float(s.t) < 0.2:
        s = f(s)
    rho_prof = np.asarray(s.U[0]).mean(
        axis=tuple(i for i in range(3) if i != axis)
    )
    return coords, rho_prof


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_sod3d_star_states_every_axis(axis):
    x, rho = _sod3d_along(axis)

    def mean_in(lo, hi):
        sel = (x > lo) & (x < hi)
        return rho[sel].mean()

    assert mean_in(0.55, 0.65) == pytest.approx(0.42632, rel=0.04)
    assert mean_in(0.72, 0.82) == pytest.approx(0.26557, rel=0.04)
    assert mean_in(0.02, 0.15) == pytest.approx(1.0, rel=0.01)


def test_blast3d_spherical_and_conservative():
    from cfdsim_tpu.cases import blast3d

    case = blast3d(n=32)
    step = jax.jit(case.step)
    s = case.state
    mass0 = float(jnp.sum(s.U[0, 1:-1, 1:-1, 1:-1]))
    e0 = float(jnp.sum(s.U[4, 1:-1, 1:-1, 1:-1]))
    for _ in range(40):
        s, m = step(s, jnp.float32(1.0))
    assert bool(jnp.all(jnp.isfinite(s.U)))
    mass1 = float(jnp.sum(s.U[0, 1:-1, 1:-1, 1:-1]))
    e1 = float(jnp.sum(s.U[4, 1:-1, 1:-1, 1:-1]))
    assert mass1 == pytest.approx(mass0, rel=1e-4)
    assert e1 == pytest.approx(e0, rel=1e-4)
    # spherical symmetry: density profiles along the three axes through
    # the center agree (dimension-split isotropy)
    rho = np.asarray(s.U[0])
    c = 16
    px = rho[c, c, :]
    py = rho[c, :, c]
    pz = rho[:, c, c]
    assert np.abs(px - py).max() < 0.02
    assert np.abs(px - pz).max() < 0.02


@pytest.mark.parametrize("axis", [0, 1, 2])
def test_sod3d_roe_every_axis(axis):
    # dimension-generic textbook Roe (characteristic decomposition +
    # Harten fix): same star states along every axis
    x, rho = _sod3d_along(axis, flux="roe")

    def mean_in(lo, hi):
        sel = (x > lo) & (x < hi)
        return rho[sel].mean()

    assert mean_in(0.55, 0.65) == pytest.approx(0.42632, rel=0.04)
    assert mean_in(0.72, 0.82) == pytest.approx(0.26557, rel=0.04)
    assert mean_in(0.02, 0.15) == pytest.approx(1.0, rel=0.01)
