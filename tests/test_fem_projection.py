"""Projection (incremental pressure-correction) FEM scheme tests.

Validation strategy: exactness on Poiseuille (a steady NS solution in
the Taylor-Hood space must be a fixed point of the split scheme — at a
fixed point the pressure increment is zero, so the splitting error
vanishes and the test is as sharp as for the monolithic step), the
divergence-reducing property of the correction, positivity of the HRZ
lumped mass on both spaces, and tracking of the monolithic solver on
the P1-P1 cylinder (loose tolerance — the two discretizations differ by
design: τ-stabilization vs the projection's implicit dt·K_p
stabilization). Physics validation lives in BENCHNOTES ("FEM tier"):
the steady Schäfer-Turek 2D-1 benchmark against published Cd/Cl/Δp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdsim_tpu.fem.mesh import cylinder_mesh, rectangle_mesh
from cfdsim_tpu.fem.spaces import build_spaces, dirichlet_values
from cfdsim_tpu.fem.assembly import (
    apply_div_u,
    apply_grad_p,
    apply_momentum_conv,
    apply_ns,
    build_element_ops,
    lumped_mass_u,
)
from cfdsim_tpu.models.fem import (
    FEMConfig,
    make_projection_step,
    make_step,
    solve_stokes,
)


def _poiseuille_setup(kind, n=8, nu=0.1):
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


def test_lumped_mass_positive_and_consistent():
    """HRZ lumping must be strictly positive on BOTH spaces (row-sum
    lumping has zero P2 vertex masses — the reason HRZ is used) and
    must preserve the total mass (domain area per component)."""
    for kind in ("p1p1", "p2p1"):
        mesh, sp, ops, g = _poiseuille_setup(kind, n=4)
        ml = lumped_mass_u(ops)
        assert float(ml.min()) > 0.0, kind
        np.testing.assert_allclose(float(ml.sum()), 4.0, rtol=1e-5)


def test_momentum_conv_matches_coupled_operator():
    """apply_momentum_conv + apply_grad_p must reproduce the momentum
    rows of the coupled apply_ns exactly (same einsum contractions,
    split for the segregated scheme)."""
    mesh, sp, ops, g = _poiseuille_setup("p1p1", n=4)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(ops.n_u, 2)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(ops.n_p,)), jnp.float32)
    adv = jnp.asarray(rng.normal(size=(ops.n_u, 2)), jnp.float32)
    yu_ref, _ = apply_ns(ops, u, p, 0.1, 2.0, adv, None)
    yu = apply_momentum_conv(ops, u, 0.1, 2.0, adv) + apply_grad_p(ops, p)
    np.testing.assert_allclose(
        np.asarray(yu), np.asarray(yu_ref), rtol=1e-5, atol=1e-5
    )


def test_projection_step_preserves_poiseuille():
    """Poiseuille is a steady NS solution inside the Taylor-Hood space;
    at a fixed point the pressure increment vanishes (div u* = 0), so
    the projection step must keep it to solver precision — the
    splitting error cancels identically."""
    mesh, sp, ops, g = _poiseuille_setup("p2p1")
    cfg = FEMConfig(
        nu=0.1, dt=0.1, space="p2p1", gmres_tol=1e-7, gmres_maxiter=100,
        pp_tol=1e-8,
    )
    st = solve_stokes(ops, cfg, g)
    step = jax.jit(
        make_projection_step(ops, cfg, g, mesh.tags["outlet"])
    )
    st2, m = step(st, 1.0)
    assert float(jnp.abs(st2.u - st.u).max()) < 1e-4
    assert float(m.poisson_res) < 1e-5
    # the increment solve saw a (near-)zero rhs: pressure is unchanged
    assert float(jnp.abs(st2.p - st.p).max()) < 1e-3


def test_projection_correction_reduces_divergence():
    """On a genuinely transient state the Poisson correction must
    reduce the weak divergence of the predictor (that is its job)."""
    mesh = cylinder_mesh(h_far=0.35, h_near=0.08)
    sp = build_spaces(mesh, "p1p1")
    ops = build_element_ops(sp)
    g = dirichlet_values(
        sp,
        {
            "inlet": lambda x, y: (np.ones_like(x), 0 * y),
            "walls": lambda x, y: (0 * x, 0 * y),
            "cylinder": lambda x, y: (0 * x, 0 * y),
        },
    )
    cfg = FEMConfig(nu=0.01, dt=0.05)
    step = jax.jit(make_projection_step(ops, cfg, g, mesh.tags["outlet"]))
    # impulsive start (Dirichlet lift only): strongly non-solenoidal
    from cfdsim_tpu.models.fem import FEMState

    st = FEMState(
        u=jnp.asarray(g, jnp.float32),
        p=jnp.zeros((ops.n_p,), jnp.float32),
        t=jnp.float32(0.0),
        step=jnp.int32(0),
    )
    div0 = None
    for _ in range(5):
        st, m = step(st, 1.0)
        assert bool(jnp.isfinite(st.u).all())
        if div0 is None:
            div0 = float(m.div_pre)
        # nodal weak divergence of the corrected field drops vs u*
        bu_star = float(m.div_pre)
        bu_new = float(m.div_post)
    # after the transient settles the corrected field is closer to
    # solenoidal than the predictor
    assert float(m.div_post) <= float(m.div_pre) * 1.05
    # and the discrete continuity residual B·u is small after correction
    res = float(jnp.linalg.norm(apply_div_u(ops, st.u)))
    res_star_free = float(jnp.linalg.norm(apply_div_u(ops, jnp.asarray(g))))
    assert res < 0.5 * res_star_free


def test_projection_tracks_monolithic_cylinder():
    """P1-P1 cylinder: the split scheme must track the monolithic
    saddle-point solve. Tolerance is loose on purpose — the monolithic
    system carries the τ∇p·∇q stabilization while the projection's
    stabilization is the implicit dt·K_p of the splitting, so the two
    discrete solutions differ at O(h) even at dt→0 (measured: the gap
    is dt-independent ~6% on this coarse mesh, shrinking with h)."""
    from cfdsim_tpu.cases import build

    kw = dict(re=100.0, h_near=0.06, h_far=0.3, dt=0.02, theta=0.5)
    cm = build("cylinder_fem", **kw)
    cp = build("cylinder_fem", scheme="projection", **kw)
    stepm = jax.jit(cm.step)
    stepp = jax.jit(cp.step)
    sm, sp_ = cm.state, cp.state
    for _ in range(10):
        sm, mm = stepm(sm, 1.0)
        sp_, mp = stepp(sp_, 1.0)
    um, up = np.asarray(sm.u), np.asarray(sp_.u)
    rel = np.linalg.norm(um - up) / np.linalg.norm(um)
    assert rel < 0.12
    # drag within 10% of the monolithic value, momentum solve converged
    assert abs(float(mp.fx) - float(mm.fx)) < 0.1 * abs(float(mm.fx))
    assert float(mp.poisson_res) < 1e-3


def test_projection_taylor_hood_exact_schur_stable():
    """P2-P1 projection uses the exact lumped Schur operator
    B P M_L⁻¹ Bᵀ (the assembled-K_p proxy leaves the P2 divergence
    uncorrected and the run drifts unstable — the regression this test
    pins): the weak continuity residual |B·u| must sit at CG tolerance
    and the field must stay bounded through the startup transient."""
    from cfdsim_tpu.cases import build

    case = build(
        "schafer_turek_fem", space="p2p1", h_near=0.03, h_far=0.1,
        theta=0.5, dt=0.002, scheme="projection",
    )
    ops = case.extras["ops"]
    step = jax.jit(case.step)
    st = case.state
    for _ in range(10):
        st, m = step(st, 1.0)
    assert float(m.poisson_res) < 1e-4  # momentum solve converged
    assert float(m.max_vel) < 3.0  # bounded (u_max = 1.5 inlet)
    bres = float(jnp.linalg.norm(apply_div_u(ops, st.u)))
    assert bres < 1e-4  # weak continuity at solver tolerance


def test_projection_supg_consistency_poiseuille():
    """SU stabilization τ(ā·∇v)(ā·∇u) vanishes identically on
    Poiseuille (ā·∇u = u_x·∂x u = 0), so the steady solution must stay
    a fixed point with supg on — consistency of the stabilized
    operator, rhs, and force paths."""
    mesh, sp, ops, g = _poiseuille_setup("p2p1")
    cfg = FEMConfig(
        nu=0.1, dt=0.1, space="p2p1", theta=0.5, supg=1.0,
        gmres_tol=1e-7, gmres_maxiter=100, pp_tol=1e-8,
    )
    st = solve_stokes(ops, cfg, g)
    step = jax.jit(make_projection_step(ops, cfg, g, mesh.tags["outlet"]))
    st2, m = step(st, 1.0)
    assert float(jnp.abs(st2.u - st.u).max()) < 1e-4
    assert float(m.poisson_res) < 1e-5


def test_projection_supg_stabilizes_high_peclet():
    """At cell-Péclet ≫ 1 the unstabilized P2 projection transient
    drifts unstable (BENCHNOTES: fp64-converged solves still blow);
    with supg=1.0 the same configuration must stay bounded. Short
    horizon here (full 500-step probe lives in BENCHNOTES); the
    with/without contrast is on the growth rate of max_vel."""
    from cfdsim_tpu.cases import build

    kw = dict(space="p2p1", h_near=0.02, h_far=0.08, theta=0.5,
              dt=0.002, scheme="projection")
    case = build("schafer_turek_fem", supg=1.0, **kw)
    step = jax.jit(case.step)
    st = case.state
    for _ in range(30):
        st, m = step(st, 1.0)
    assert bool(jnp.isfinite(st.u).all())
    assert float(m.max_vel) < 6.0
    assert float(m.poisson_res) < 1e-4


def test_point_sampler_exact_on_linear_fields():
    """point_sampler: FE-consistent probes at arbitrary points (the
    Δp front/back cylinder probes) — P1 interpolation must reproduce
    linear fields exactly at off-node points."""
    from cfdsim_tpu.fem.sample import point_sampler, sample_fields

    mesh = rectangle_mesh(16, 8, (0.0, 4.0), (0.0, 1.0))
    sp = build_spaces(mesh, "p1p1")
    u = jnp.stack(
        [
            jnp.asarray(2.0 * sp.u_points[:, 0] + sp.u_points[:, 1]),
            jnp.asarray(0.5 * sp.u_points[:, 1]),
        ],
        axis=1,
    ).astype(jnp.float32)
    p = jnp.asarray(3.0 - 0.7 * mesh.points[:, 0], jnp.float32)
    pts = [(0.33, 0.41), (1.77, 0.93), (3.99, 0.01)]
    f = sample_fields(point_sampler(sp, pts), u, p)
    for i, (x, y) in enumerate(pts):
        np.testing.assert_allclose(float(f["u"][0, i]), 2 * x + y, rtol=1e-5)
        np.testing.assert_allclose(float(f["p"][0, i]), 3 - 0.7 * x, rtol=1e-5)


def test_projection_case_builder_smoke():
    """schafer_turek_fem(scheme='projection') builds and steps with
    finite metrics and a populated force readout."""
    from cfdsim_tpu.cases import build

    case = build(
        "schafer_turek_fem", re=20.0, u_mean=0.2, dt=0.02,
        h_near=0.02, h_far=0.08, scheme="projection",
    )
    step = jax.jit(case.step)
    st = case.state
    for _ in range(3):
        st, m = step(st, 1.0)
    assert bool(jnp.isfinite(st.u).all()) and bool(jnp.isfinite(st.p).all())
    assert float(m.fx) != 0.0  # drag readout wired
    assert float(m.max_vel) < 1.0  # bounded (Um = 0.3)
