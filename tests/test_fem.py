"""Unstructured FEM tier tests (reference family julia/flow_over_cylinder_fischer).

Strategy mirrors the reference's own validation style (SURVEY.md §4):
exactness on analytically representable flows (Poiseuille is in the
P2-P1 space, so the discrete solution must reproduce it to roundoff),
mesh-health invariants, manufactured-solution convergence for P1-P1,
and a smoke run of the full cylinder case."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdsim_tpu.fem.mesh import cylinder_mesh, rectangle_mesh
from cfdsim_tpu.fem.spaces import build_spaces, dirichlet_values
from cfdsim_tpu.fem.assembly import (
    build_element_ops,
    interpolate_u,
    l2_norm,
)
from cfdsim_tpu.fem.sample import build_sampler, sample_fields
from cfdsim_tpu.models.fem import FEMConfig, make_step, solve_stokes


# ---------------------------------------------------------------- mesh


def test_cylinder_mesh_health():
    m = cylinder_mesh(h_far=0.3, h_near=0.04, smooth_iters=3)
    assert m.n_tris > 500
    assert m.areas().min() > 0
    q = m.quality()
    assert q.min() > 0.3 and q.mean() > 0.85
    for tag in ("inlet", "outlet", "walls", "cylinder"):
        assert len(m.tags[tag]) > 0
    # cylinder nodes lie exactly on the circle
    cyl = m.points[m.tags["cylinder"]]
    r = np.hypot(cyl[:, 0] - 3.0, cyl[:, 1])
    np.testing.assert_allclose(r, 0.5, rtol=1e-6)
    # every boundary edge belongs to exactly one triangle (watertight)
    assert len(m.boundary_edges) > 0


def test_rectangle_mesh_tags_cover_boundary():
    m = rectangle_mesh(6, 4, (0.0, 2.0), (0.0, 1.0))
    tagged = np.concatenate([m.tags[t] for t in m.tags])
    # outlet corners belong to walls (Dirichlet), not outlet
    corner = np.nonzero(
        (np.abs(m.points[:, 0] - 2.0) < 1e-12)
        & (np.abs(np.abs(m.points[:, 1] - 0.5) - 0.5) < 1e-12)
    )[0]
    assert set(corner) <= set(m.tags["walls"])
    assert len(set(tagged)) == len(tagged)  # tags are disjoint


# ---------------------------------------- exactness (Taylor-Hood P2-P1)


def _poiseuille_setup(kind, n=12, nu=0.1):
    mesh = rectangle_mesh(2 * n, n, (0.0, 4.0), (0.0, 1.0))
    sp = build_spaces(mesh, kind)
    ops = build_element_ops(sp)
    g = dirichlet_values(
        sp,
        {
            "inlet": lambda x, y: (4.0 * y * (1.0 - y), np.zeros_like(y)),
            "walls": lambda x, y: (0 * x, 0 * y),
        },
    )
    return mesh, sp, ops, g


def test_taylor_hood_stokes_poiseuille_exact():
    """Poiseuille (quadratic u, linear p) is in the P2-P1 space; with the
    do-nothing outlet the discrete Stokes solution is exact (v1.jl:103-127
    space on v1.jl:170-200's Stokes operator)."""
    mesh, sp, ops, g = _poiseuille_setup("p2p1")
    cfg = FEMConfig(
        nu=0.1, space="p2p1", gmres_tol=1e-7,
        gmres_restart=200, gmres_maxiter=30,
    )
    st = solve_stokes(ops, cfg, g)
    uq, gu = interpolate_u(ops, st.u)
    u_ex = 4.0 * ops.xq[..., 1] * (1.0 - ops.xq[..., 1])
    assert float(l2_norm(ops, uq[..., 0] - u_ex)) < 5e-5
    assert float(l2_norm(ops, uq[..., 1])) < 5e-5
    p_ex = 8 * 0.1 * (4.0 - mesh.points[:, 0])
    np.testing.assert_allclose(np.asarray(st.p), p_ex, atol=5e-5)
    # exactly divergence-free at quadrature points
    assert float(l2_norm(ops, gu[..., 0, 0] + gu[..., 1, 1])) < 5e-5


def test_taylor_hood_ns_step_preserves_poiseuille():
    """Poiseuille is a steady NS solution ((u·∇)u = 0): the backward-
    Euler step (v2.jl:202-215 weak form) must keep it to solver
    precision."""
    mesh, sp, ops, g = _poiseuille_setup("p2p1", n=8)
    cfg = FEMConfig(
        nu=0.1, dt=0.1, space="p2p1", gmres_tol=1e-7, gmres_maxiter=100
    )
    st = solve_stokes(ops, cfg, g)
    step = jax.jit(make_step(ops, cfg, g))
    st2, m = step(st, 1.0)
    assert float(jnp.abs(st2.u - st.u).max()) < 1e-4
    assert float(m.poisson_res) < 1e-5


def test_crank_nicolson_step_preserves_poiseuille():
    """θ=0.5 (Crank-Nicolson on viscous+convective terms) is implemented
    via the linearity identity θ(νK+C(ū))u = (θν)Ku + C(θū)u; a steady
    solution must be a fixed point for any θ."""
    mesh, sp, ops, g = _poiseuille_setup("p2p1", n=8)
    cfg = FEMConfig(
        nu=0.1, dt=0.1, space="p2p1", theta=0.5,
        gmres_tol=1e-7, gmres_restart=120, gmres_maxiter=20,
    )
    st = solve_stokes(ops, cfg, g)
    step = jax.jit(make_step(ops, cfg, g))
    st2, m = step(st, 1.0)
    assert float(jnp.abs(st2.u - st.u).max()) < 1e-4


def test_taylor_hood_transient_solver_converges():
    """Regression: the Taylor-Hood transient system has an exactly-zero
    (2,2) block; without the dt·L_p Schur term in the Jacobi
    preconditioner (assembly.operator_diag) GMRES stalled above
    accept_relres every step and the keep-previous guard silently froze
    the flow. The step must both converge and actually advance."""
    from cfdsim_tpu.cases import build

    case = build(
        "schafer_turek_fem", space="p2p1", h_far=0.08, h_near=0.025,
        viz_shape=(24, 64), theta=0.5,
    )
    step = jax.jit(case.step)
    st, m = step(case.state, 1.0)
    st2, m2 = step(st, 1.0)
    assert float(m2.poisson_res) < 1e-4
    assert float(jnp.abs(st2.u - st.u).max()) > 0
    assert float(m2.fx) > 0  # drag on the cylinder is positive


def test_stokes_body_force_exact():
    """Manufactured u=(y², 0), p=0, f=(−2ν, 0) — satisfies the outlet
    do-nothing condition and lies in the P2 space."""
    mesh = rectangle_mesh(8, 6, (0.0, 2.0), (0.0, 1.0))
    sp = build_spaces(mesh, "p2p1")
    ops = build_element_ops(sp)
    g = dirichlet_values(
        sp,
        {
            "inlet": lambda x, y: (y * y, np.zeros_like(y)),
            "walls": lambda x, y: (y * y, 0 * y),
        },
    )
    nu = 0.3
    cfg = FEMConfig(nu=nu, space="p2p1", gmres_tol=1e-7, gmres_maxiter=100)
    st = solve_stokes(
        ops, cfg, g, body_force=lambda x, y: (-2.0 * nu + 0 * x, 0 * y)
    )
    uq, _ = interpolate_u(ops, st.u)
    u_ex = ops.xq[..., 1] ** 2
    assert float(l2_norm(ops, uq[..., 0] - u_ex)) < 1e-4
    assert float(jnp.abs(st.p).max()) < 1e-3


# ------------------------------------------- P1-P1 stabilized (v2.jl)


def test_p1p1_stokes_converges():
    """Equal-order P1-P1 with τ∇p·∇q (v2.jl:137-173) is stable and
    converges on Poiseuille under refinement."""
    errs = []
    for n in (8, 16):
        mesh, sp, ops, g = _poiseuille_setup("p1p1", n=n)
        cfg = FEMConfig(
            nu=0.1, space="p1p1", gmres_tol=1e-6,
            gmres_restart=200, gmres_maxiter=20,
        )
        st = solve_stokes(ops, cfg, g)
        uq, _ = interpolate_u(ops, st.u)
        u_ex = 4.0 * ops.xq[..., 1] * (1.0 - ops.xq[..., 1])
        errs.append(float(l2_norm(ops, uq[..., 0] - u_ex)))
    assert errs[0] < 0.15
    assert errs[0] / errs[1] > 2.0  # ~2nd-order drop


def test_p1p1_pspg_transient_converges():
    """Consistent PSPG stabilization (FEMConfig.stab="pspg"): the
    transient P1-P1 step on Poiseuille must stay stable (no pressure
    checkerboard) and its steady error must converge under refinement —
    the same acceptance bar as the Brezzi-Pitkäranta form, with the
    residual-based term replacing τ∇p·∇q in operator AND rhs."""
    errs = []
    for n in (8, 16):
        mesh, sp, ops, g = _poiseuille_setup("p1p1", n=n)
        cfg = FEMConfig(
            nu=0.1, dt=0.2, space="p1p1", stab="pspg", gmres_tol=1e-6,
            gmres_restart=200, gmres_maxiter=20,
        )
        st = solve_stokes(ops, cfg, g)
        step = jax.jit(make_step(ops, cfg, g))
        for _ in range(5):
            st, m = step(st, 1.0)
        assert bool(jnp.isfinite(st.u).all())
        assert float(m.poisson_res) < 1e-4
        uq, _ = interpolate_u(ops, st.u)
        u_ex = 4.0 * ops.xq[..., 1] * (1.0 - ops.xq[..., 1])
        errs.append(float(l2_norm(ops, uq[..., 0] - u_ex)))
    assert errs[0] < 0.15
    assert errs[0] / errs[1] > 2.0  # ~2nd-order drop


def test_p1p1_global_tau_parity_mode():
    """tau_h pins the reference's global τ = H²/(4ν+2V∞H) (v2.jl:169-170)
    instead of the per-element default; both must solve stably."""
    mesh, sp, ops, g = _poiseuille_setup("p1p1", n=8)
    cfg = FEMConfig(
        nu=0.1, space="p1p1", tau_h=0.125, gmres_tol=1e-6,
        gmres_restart=200, gmres_maxiter=20,
    )
    st = solve_stokes(ops, cfg, g)
    assert bool(jnp.isfinite(st.u).all())
    uq, _ = interpolate_u(ops, st.u)
    u_ex = 4.0 * ops.xq[..., 1] * (1.0 - ops.xq[..., 1])
    assert float(l2_norm(ops, uq[..., 0] - u_ex)) < 0.2


# ------------------------------------------------------- full cylinder


@pytest.fixture(scope="module")
def fem_cylinder():
    from cfdsim_tpu.cases import build

    return build(
        "cylinder_fem", re=100, h_far=0.35, h_near=0.06,
        viz_shape=(60, 90), gmres_tol=1e-5,
    )


def test_cylinder_fem_case_runs(fem_cylinder):
    case = fem_cylinder
    step = jax.jit(case.step)
    st, m = step(case.state, 1.0)
    st, m = step(st, 1.0)
    assert bool(jnp.isfinite(st.u).all())
    assert float(m.max_vel) < 5.0
    assert float(m.dt) == pytest.approx(0.05)
    # reaction drag is positive and O(1) in coefficient terms
    cd = 2.0 * float(m.fx)
    assert 0.1 < cd < 30.0
    assert float(m.poisson_res) < 1e-2


def test_cylinder_fem_sampler(fem_cylinder):
    case = fem_cylinder
    f = sample_fields(
        case.extras["sampler"], case.state.u, case.state.p
    )
    assert f["speed"].shape == (60, 90)
    nanfrac = float(jnp.mean(jnp.isnan(f["speed"]).astype(jnp.float32)))
    assert 0.005 < nanfrac < 0.05  # cylinder interior NaN-masked
    assert float(jnp.nanmax(f["speed"])) < 5.0
    assert "p" in f and "vorticity" in f


def test_fem_run_on_device(fem_cylinder):
    """The zero-host-round-trip while_loop driver works on FEM states
    (GMRES nests inside the outer while_loop)."""
    from cfdsim_tpu.runner import run_on_device

    case = fem_cylinder
    (st, m) = run_on_device(case.step, case.state, t_final=0.2)
    assert float(st.t) >= 0.2
    assert int(st.step) == 4  # dt=0.05
    assert bool(jnp.isfinite(st.u).all())


def test_fem_step_is_differentiable():
    """The GMRES solve is wrapped in lax.custom_linear_solve, so the
    semi-implicit step reverse-differentiates by implicit adjoint
    (gradient of mean KE after one step w.r.t. the initial velocity is
    finite and nonzero)."""
    mesh, sp, ops, g = _poiseuille_setup("p1p1", n=6)
    cfg = FEMConfig(
        nu=0.1, dt=0.1, space="p1p1", gmres_tol=1e-6,
        gmres_restart=120, gmres_maxiter=10,
    )
    st = solve_stokes(ops, cfg, g)
    step = make_step(ops, cfg, g)

    def loss(u0):
        s2, _ = step(st._replace(u=u0), 1.0)
        return jnp.mean(s2.u ** 2)

    gr = jax.jit(jax.grad(loss))(st.u)
    assert bool(jnp.isfinite(gr).all())
    assert float(jnp.abs(gr).max()) > 0


def test_sampler_exact_gradient_vorticity():
    """The sampler's physical-gradient tables must reproduce the exact
    vorticity of a rigid-rotation field (u = (−ωy, ωx) ⇒ curl = 2ω) at
    every sample point — checks the per-sample Jacobian inversion."""
    from cfdsim_tpu.fem.sample import build_sampler, sample_fields

    mesh = rectangle_mesh(6, 5, (-1.0, 1.0), (-1.0, 1.0))
    sp = build_spaces(mesh, "p1p1")
    omega = 0.75
    u = np.stack(
        [-omega * sp.u_points[:, 1], omega * sp.u_points[:, 0]], axis=1
    )
    tab = build_sampler(sp, np.linspace(-0.9, 0.9, 7),
                        np.linspace(-0.9, 0.9, 5))
    f = sample_fields(tab, jnp.asarray(u, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(f["vorticity"]), 2 * omega, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(f["u"]),
        -omega * np.linspace(-0.9, 0.9, 5)[:, None] * np.ones((1, 7)),
        atol=1e-6,
    )


def test_cylinder_fem_failed_solve_keeps_previous():
    """v2.jl:223-225 parity: a solve that cannot reach accept_relres
    keeps the previous solution."""
    from cfdsim_tpu.cases import build

    case = build(
        "cylinder_fem", re=100, h_far=0.35, h_near=0.06,
        viz_shape=(40, 60),
    )
    import dataclasses as dc

    bad_cfg = dc.replace(case.cfg, gmres_maxiter=0, accept_relres=1e-12)
    from cfdsim_tpu.models.fem import make_step as mk

    step = jax.jit(mk(case.extras["ops"], bad_cfg, case.extras["g"]))
    st, m = step(case.state, 1.0)
    np.testing.assert_array_equal(
        np.asarray(st.u), np.asarray(case.state.u)
    )


def test_fem_cavity_ghia_re100():
    """Lid-driven cavity on the FEM tier (all-Dirichlet rectangle,
    enclosed pressure up to a constant): centerline profiles vs the
    Ghia et al. (1982) Re=100 tables — the same cross-validation bar
    as the structured tiers (RMS ~3e-3 at n=32, measured)."""
    from cfdsim_tpu.cases import build
    from cfdsim_tpu.fem.sample import point_sampler, sample_fields
    from cfdsim_tpu.validation import GHIA_U, GHIA_V, GHIA_X, GHIA_Y

    case = build("cavity_fem", n=32, Re=100.0, dt=0.1)
    step = jax.jit(case.step)
    st = case.state
    for _ in range(100):
        st, m = step(st, 1.0)
    assert float(m.poisson_res) < 1e-4
    sp = case.extras["spaces"]
    tu = point_sampler(
        sp, np.stack([0.5 * np.ones_like(GHIA_Y), GHIA_Y], axis=1)
    )
    tv = point_sampler(
        sp, np.stack([GHIA_X, 0.5 * np.ones_like(GHIA_X)], axis=1)
    )
    u_c = np.asarray(sample_fields(tu, st.u)["u"]).ravel()
    v_c = np.asarray(sample_fields(tv, st.u)["v"]).ravel()
    eu = float(np.sqrt(np.mean((u_c - GHIA_U[100]) ** 2)))
    ev = float(np.sqrt(np.mean((v_c - GHIA_V[100]) ** 2)))
    assert eu < 0.01 and ev < 0.01, (eu, ev)
