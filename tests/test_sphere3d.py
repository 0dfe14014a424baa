"""3D immersed-sphere flow (the 3D habitat of the reference's flagship
IBM capability, v5.py:275-283/228-237): mask geometry, external-flow BC
invariants, and a short wake run with the penalization drag force."""

import numpy as np
import jax
import jax.numpy as jnp

from cfdsim_tpu.cases import build, sphere_mac3d
from cfdsim_tpu.grid import Grid3D
from cfdsim_tpu.ibm import potential_flow_sphere_mac3d, sphere_masks_mac3d
from cfdsim_tpu.models import mac3d
from cfdsim_tpu.validation import sphere_drag_schiller_naumann


def test_sphere_masks_geometry():
    grid = Grid3D(nx=32, ny=16, nz=16, x_max=4.0, y_max=2.0, z_max=2.0,
                  centering="cell")
    mu, mv, mw = sphere_masks_mac3d(grid, (1.0, 1.0, 1.0), 0.4)
    assert mu.shape == (16, 16, 33)
    assert mv.shape == (16, 17, 32)
    assert mw.shape == (17, 16, 32)
    # mask is 1 deep inside, 0 in the far field, and in [0, 1]
    for m in (mu, mv, mw):
        assert float(m.min()) >= 0.0 and float(m.max()) <= 1.0
        assert float(m[..., -1].max()) == 0.0  # outflow plane is clear
    # center cell fully solid: u-face nearest (1,1,1) → iz=7/8, iy=7/8, ix=8
    assert float(mu[8, 8, 8]) == 1.0


def test_potential_flow_sphere_far_field_and_body():
    grid = Grid3D(nx=48, ny=24, nz=24, x_max=12.0, y_max=6.0, z_max=6.0,
                  centering="cell")
    masks = sphere_masks_mac3d(grid, (3.0, 3.0, 3.0), 0.5)
    u0, v0, w0 = potential_flow_sphere_mac3d(
        grid, (3.0, 3.0, 3.0), 0.5, 1.0, *masks
    )
    # far field ≈ uniform inflow (R³/2r³ decay: at r ≥ 5R the defect <1%)
    assert abs(float(u0[0, 0, 0]) - 1.0) < 0.02
    assert abs(float(u0[-1, -1, -1]) - 1.0) < 0.02
    # no-slip inside the body
    assert float(jnp.abs(u0[12, 12, 12])) == 0.0
    # potential flow is (nearly) divergence-free away from the blend shell
    div = mac3d.divergence_mac3d(u0, v0, w0, grid.dx, grid.dy, grid.dz)
    assert float(jnp.max(jnp.abs(div[:, :, -8:]))) < 1e-2


def test_external_flow_bcs3d_uniform_invariant():
    """A uniform stream with no body is an exact fixed point of the full
    step (advection of a constant, zero diffusion, zero projection)."""
    from cfdsim_tpu.models.mac3d import MAC3DConfig, external_flow_bcs3d

    grid = Grid3D(nx=16, ny=8, nz=8, x_max=4.0, y_max=2.0, z_max=2.0,
                  centering="cell")
    cfg = MAC3DConfig(grid=grid, nu=0.01, scheme="tvd")
    bcs = external_flow_bcs3d(1.0)
    step = jax.jit(mac3d.make_step(cfg, bcs))
    state = mac3d.init_state(cfg)._replace(
        u=jnp.ones((8, 8, 17), jnp.float32)
    )
    for _ in range(5):
        state, m = step(state, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(state.u), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.v), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.w), 0.0, atol=1e-6)
    assert float(m.div_post) < 1e-5


def test_sphere_case_short_run_drag():
    """Coarse 6-cells/D run to a steady wake: stays finite, interior
    exactly projected, and the sharp-mask penalization drag lands in the
    resolution-inflated band around Schiller–Naumann (measured 1.61 at
    this grid vs Cd_SN(100) = 1.09 — the effective radius is
    R + O(dx/2), i.e. ~1.5× the frontal area at dx = R/2)."""
    case = build(
        "sphere", nx=48, ny=24, nz=24, Re=100.0,
        domain=(12.0, 6.0, 6.0), center=(3.0, 3.0, 3.0),
        ibm_ramp_steps=20, compute_metrics=True,
    )

    def chunk(state, _):
        def body(s, _):
            s2, m = case.step(s, 1.0)
            return s2, m.fx

        return jax.lax.scan(body, state, None, length=40)

    chunk = jax.jit(chunk)
    state = case.state
    for _ in range(4):  # t ≈ 15 — past the impulsive-start transient
        state, fx = chunk(state, None)
    assert bool(jnp.isfinite(state.u).all())
    # interior divergence is machine-exact (the DCT projection); the
    # outflow column is re-reset to the mass-consistent value after the
    # correction, so only the last cell column carries O(dt·∂φ) residue
    g = case.grid
    div = mac3d.divergence_mac3d(state.u, state.v, state.w,
                                 g.dx, g.dy, g.dz)
    assert float(jnp.max(jnp.abs(div[:, :, :-1]))) < 1e-3
    cd = float(fx[-1]) * case.extras["coeff_scale"]
    cd_ref = sphere_drag_schiller_naumann(100.0)
    assert cd_ref < cd < 2.0 * cd_ref
    # lateral forces ≈ 0 relative to drag (steady axisymmetric regime)
    _, m = case.step(state, 1.0)
    assert abs(float(m.fy)) < 0.1 * float(m.fx)
    assert abs(float(m.fz)) < 0.1 * float(m.fx)


def test_schiller_naumann_values():
    # spot-check the correlation against tabulated standard-drag values
    assert abs(sphere_drag_schiller_naumann(100.0) - 1.09) < 0.02
    assert abs(sphere_drag_schiller_naumann(10.0) - 4.15) < 0.2
