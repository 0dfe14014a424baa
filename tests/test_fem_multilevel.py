"""Two-level aggregation preconditioner tests (fem/multilevel.py).

Strategy: structural invariants of the aggregation (coverage, exclusion
of Dirichlet nodes), SPD-ness of the pc operator (required by CG),
a direct convergence contrast — within a fixed CG budget the two-level
pc must reach a far tighter residual than plain Jacobi on the same
masked K_p system — and scheme-level equivalence: the projection step
solves the same equations under either pc, so the stepped fields must
agree to solver tolerance on both FE spaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdsim_tpu.fem.mesh import cylinder_mesh
from cfdsim_tpu.fem.spaces import build_spaces, dirichlet_values
from cfdsim_tpu.fem.assembly import (
    apply_stiffness_p,
    build_element_ops,
    stiffness_p_diag,
)
from cfdsim_tpu.fem.multilevel import (
    build_pressure_coarse,
    coarse_correct,
    make_pressure_pc,
)


def _setup(kind="p1p1", h_near=0.06, h_far=0.3):
    mesh = cylinder_mesh(h_far=h_far, h_near=h_near)
    sp = build_spaces(mesh, kind)
    ops = build_element_ops(sp)
    out = np.asarray(mesh.tags["outlet"])
    return mesh, ops, out


def test_aggregation_covers_all_free_nodes():
    mesh, ops, out = _setup()
    level = build_pressure_coarse(ops, out)
    agg = np.asarray(level.agg)
    n_c = level.Kc_inv.shape[0]
    # excluded (outflow) nodes route to the dummy row n_c, all others
    # to a valid aggregate
    assert (agg[out] == n_c).all()
    free = np.ones(ops.n_p, dtype=bool)
    free[out] = False
    assert (agg[free] < n_c).all() and (agg[free] >= 0).all()
    # real coarsening: boundedly many aggregates
    assert 1 <= n_c < ops.n_p


def test_max_coarse_recursion():
    """Repeated aggregation must bound the coarse size."""
    mesh, ops, out = _setup(h_near=0.04, h_far=0.15)
    level = build_pressure_coarse(ops, out, max_coarse=50)
    assert level.Kc_inv.shape[0] <= 50


def test_pc_is_spd():
    """CG requires an SPD preconditioner: check symmetry of the
    additive form x·M(y) = y·M(x) and positivity x·M(x) > 0."""
    mesh, ops, out = _setup()
    level = build_pressure_coarse(ops, out)
    inv_dp = 1.0 / jnp.where(
        jnp.zeros((ops.n_p,), bool).at[jnp.asarray(out)].set(True),
        1.0,
        stiffness_p_diag(ops),
    )
    M = make_pressure_pc(level, inv_dp, kind="2level")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=ops.n_p), jnp.float32)
    y = jnp.asarray(rng.normal(size=ops.n_p), jnp.float32)
    xMy = float(jnp.vdot(x, M(y)))
    yMx = float(jnp.vdot(y, M(x)))
    np.testing.assert_allclose(xMy, yMx, rtol=1e-4)
    assert float(jnp.vdot(x, M(x))) > 0.0


def test_coarse_correct_zero_on_excluded():
    mesh, ops, out = _setup()
    level = build_pressure_coarse(ops, out)
    rng = np.random.default_rng(1)
    r = jnp.asarray(rng.normal(size=ops.n_p), jnp.float32)
    z = np.asarray(coarse_correct(level, r))
    assert np.all(z[out] == 0.0)
    assert np.linalg.norm(z) > 0.0


@pytest.mark.parametrize("kind", ["2level", "2level_v"])
def test_two_level_beats_jacobi_in_fixed_budget(kind):
    """The headline property: within a 30-iteration CG budget on the
    masked K_p Poisson, the two-level pc must reach the fp32 floor
    (~3e-5 for a white-noise rhs) while Jacobi is still ~2e-1 — four
    orders of magnitude apart (production measurement at 10.7k tris:
    308 Jacobi vs 18/9 two-level iterations to 1e-6)."""
    mesh, ops, out = _setup(h_near=0.04, h_far=0.15)
    pm = jnp.zeros((ops.n_p,), bool).at[jnp.asarray(out)].set(True)

    def Ap(q):
        y = apply_stiffness_p(ops, jnp.where(pm, 0.0, q))
        return jnp.where(pm, q, y)

    inv_dp = 1.0 / jnp.where(pm, 1.0, stiffness_p_diag(ops))
    level = build_pressure_coarse(ops, out)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.normal(size=ops.n_p), jnp.float32)
    b = jnp.where(pm, 0.0, b)

    def solve(M):
        x, _ = jax.scipy.sparse.linalg.cg(
            Ap, b, M=M, tol=0.0, atol=0.0, maxiter=30
        )
        r = Ap(x) - b
        return float(jnp.linalg.norm(r) / jnp.linalg.norm(b))

    res_j = solve(make_pressure_pc(None, inv_dp, kind="jacobi"))
    res_2 = solve(make_pressure_pc(level, inv_dp, Ap=Ap, kind=kind))
    assert res_2 < 1e-4, res_2
    assert res_2 < 1e-3 * res_j, (res_2, res_j)


@pytest.mark.parametrize("space", ["p1p1", "p2p1"])
def test_projection_step_pc_equivalence(space):
    """The pc changes the solver, not the equations: stepped fields
    under "2level" and "jacobi" must agree to solver tolerance on both
    spaces (P1-P1 K_p operator and the Taylor-Hood exact Schur)."""
    from cfdsim_tpu.cases import build
    import dataclasses

    kw = dict(
        re=100.0, h_near=0.08, h_far=0.3, dt=0.02, theta=0.5,
        scheme="projection", space=space,
    )
    c2 = build("cylinder_fem", **kw)
    ops = c2.extras["ops"]
    cj_cfg = dataclasses.replace(c2.cfg, pp_pc="jacobi", pp_maxiter=2000)
    from cfdsim_tpu.models.fem import make_projection_step

    stepj = jax.jit(
        make_projection_step(
            ops, cj_cfg, c2.extras["g"],
            c2.extras["mesh"].tags["outlet"],
        )
    )
    step2 = jax.jit(c2.step)
    s2 = sj = c2.state
    for _ in range(5):
        s2, m2 = step2(s2, 1.0)
        sj, mj = stepj(sj, 1.0)
    du = float(jnp.abs(s2.u - sj.u).max())
    dp = float(jnp.abs(s2.p - sj.p).max())
    assert du < 5e-4, du
    assert dp < 5e-3, dp
