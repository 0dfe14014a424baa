"""Element-sharded FEM assembly (parallel/fem_explicit.py) must match
the single-device operators on the 8-device CPU mesh: the psum over
per-device partial assemblies reassociates fp32 sums, so equality is to
roundoff tolerances, not bit-exact."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdsim_tpu.fem.assembly import apply_ns
from cfdsim_tpu.models.fem import FEMConfig, _tau, make_step as make_step_ref
from cfdsim_tpu.parallel.fem_explicit import (
    make_sharded_ns_apply,
    make_step,
    solve_stokes_sharded,
)
from cfdsim_tpu.parallel.mesh import make_grid_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_grid_mesh(8, topology=(1, 8))


@pytest.fixture(scope="module")
def tiny_case():
    from cfdsim_tpu.cases import build

    return build(
        "cylinder_fem", re=80, h_far=0.5, h_near=0.12,
        viz_shape=(24, 36), gmres_tol=1e-5,
    )


def test_sharded_apply_matches_single(mesh, tiny_case):
    case = tiny_case
    ops = case.extras["ops"]
    cfg = case.cfg
    tau = _tau(ops, cfg)
    u, p = case.state.u, case.state.p

    app = make_sharded_ns_apply(ops, mesh, cfg)
    # transient block (mass + convection)
    yu_s, yp_s = jax.jit(lambda u, p: app(u, p, 20.0, u))(u, p)
    yu_r, yp_r = apply_ns(ops, u, p, cfg.nu, 20.0, u, tau)
    np.testing.assert_allclose(yu_s, yu_r, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(yp_s, yp_r, atol=2e-4, rtol=1e-4)
    # Stokes block
    yu_s, yp_s = jax.jit(lambda u, p: app(u, p))(u, p)
    yu_r, yp_r = apply_ns(ops, u, p, cfg.nu, None, None, tau)
    np.testing.assert_allclose(yu_s, yu_r, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(yp_s, yp_r, atol=2e-4, rtol=1e-4)


def test_sharded_step_matches_single(mesh, tiny_case):
    case = tiny_case
    ops = case.extras["ops"]
    g = case.extras["g"]
    fnodes = case.extras["spaces"].dirichlet_tag_nodes["cylinder"]
    step_s = jax.jit(
        make_step(ops, case.cfg, g, mesh, force_nodes=fnodes)
    )
    step_r = jax.jit(
        make_step_ref(ops, case.cfg, g, force_nodes=fnodes)
    )
    ss, sr = case.state, case.state
    for _ in range(3):
        ss, ms = step_s(ss, 1.0)
        sr, mr = step_r(sr, 1.0)
    scale = float(jnp.abs(sr.u).max())
    np.testing.assert_allclose(ss.u, sr.u, atol=5e-4 * scale)
    np.testing.assert_allclose(float(ms.fx), float(mr.fx), atol=5e-3)
    np.testing.assert_allclose(float(ms.energy), float(mr.energy),
                               rtol=1e-4)
    assert bool(jnp.isfinite(ss.u).all())


def test_sharded_theta_step_matches_single(mesh, tiny_case):
    """Crank-Nicolson (θ=0.5) sharded step vs the single-device θ step."""
    case = tiny_case
    ops = case.extras["ops"]
    g = case.extras["g"]
    cfg = dataclasses.replace(case.cfg, theta=0.5)
    step_s = jax.jit(make_step(ops, cfg, g, mesh))
    step_r = jax.jit(make_step_ref(ops, cfg, g))
    ss, _ = step_s(case.state, 1.0)
    sr, _ = step_r(case.state, 1.0)
    scale = float(jnp.abs(sr.u).max())
    np.testing.assert_allclose(ss.u, sr.u, atol=5e-4 * scale)


def test_sharded_pspg_step_matches_single(mesh, tiny_case):
    """Consistent-PSPG (stab="pspg") sharded monolithic step vs the
    single-device one — θ=0.5 exercises both the operator's residual
    term and the rhs's −(1−θ) convection share."""
    case = tiny_case
    ops = case.extras["ops"]
    g = case.extras["g"]
    cfg = dataclasses.replace(case.cfg, theta=0.5, stab="pspg")
    step_s = jax.jit(make_step(ops, cfg, g, mesh))
    step_r = jax.jit(make_step_ref(ops, cfg, g))
    ss = sr = case.state
    for _ in range(2):
        ss, _ = step_s(ss, 1.0)
        sr, _ = step_r(sr, 1.0)
    scale = float(jnp.abs(sr.u).max())
    np.testing.assert_allclose(ss.u, sr.u, atol=5e-4 * scale)
    np.testing.assert_allclose(ss.p, sr.p, atol=5e-3)
    assert bool(jnp.isfinite(ss.u).all())


@pytest.mark.parametrize("space,supg", [("p1p1", 0.0), ("p2p1", 1.0)])
def test_sharded_projection_step_matches_single(mesh, space, supg):
    """Element-sharded projection step ≡ models.fem.make_projection_step
    on the 8-device mesh — both Poisson operator variants (P1-P1 K_p
    and Taylor-Hood exact Schur) and the SU stabilization path."""
    from cfdsim_tpu.cases import build
    from cfdsim_tpu.models.fem import make_projection_step as make_ref
    from cfdsim_tpu.parallel.fem_explicit import make_projection_step

    case = build(
        "cylinder_fem", re=80, h_far=0.5, h_near=0.12, space=space,
        viz_shape=(24, 36), gmres_tol=1e-6, theta=0.5,
        scheme="projection", supg=supg,
    )
    ops = case.extras["ops"]
    g = case.extras["g"]
    m = case.extras["mesh"]
    force = case.extras["spaces"].dirichlet_tag_nodes["cylinder"]
    step_s = jax.jit(
        make_projection_step(
            ops, case.cfg, g, m.tags["outlet"], mesh, force_nodes=force
        )
    )
    step_r = jax.jit(
        make_ref(ops, case.cfg, g, m.tags["outlet"], force_nodes=force)
    )
    ss = sr = case.state
    for _ in range(3):
        ss, ms = step_s(ss, 1.0)
        sr, mr = step_r(sr, 1.0)
    scale = float(jnp.abs(sr.u).max())
    np.testing.assert_allclose(ss.u, sr.u, atol=5e-4 * scale)
    np.testing.assert_allclose(ss.p, sr.p, atol=5e-3)
    np.testing.assert_allclose(float(ms.fx), float(mr.fx), atol=5e-3)
    assert bool(jnp.isfinite(ss.u).all())


def test_sharded_stokes_matches_single(mesh, tiny_case):
    case = tiny_case
    ops = case.extras["ops"]
    g = case.extras["g"]
    from cfdsim_tpu.models.fem import solve_stokes

    cfg = dataclasses.replace(
        case.cfg, gmres_restart=200, gmres_maxiter=20, gmres_tol=1e-6
    )
    st_s = solve_stokes_sharded(ops, cfg, g, mesh)
    st_r = solve_stokes(ops, cfg, g)
    scale = float(jnp.abs(st_r.u).max())
    np.testing.assert_allclose(st_s.u, st_r.u, atol=1e-3 * scale)
