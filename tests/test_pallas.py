"""Pallas VMEM red-black SOR kernel: exact agreement with the streaming
jnp implementation (runs in interpreter mode on the CPU test backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cfdsim_tpu.ops.pallas.poisson_rb import MAX_ELEMS, rbsor_pallas
from cfdsim_tpu.solvers.poisson import PoissonConfig, solve_poisson


@pytest.fixture()
def problem():
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    rhs = rhs - jnp.mean(rhs)
    return jnp.zeros_like(rhs), rhs, 1.0 / 32


@pytest.mark.parametrize("bc", ["neumann", "dirichlet"])
def test_pallas_matches_jnp_exactly(problem, bc):
    phi0, rhs, h = problem
    ref = solve_poisson(
        phi0, rhs, h, h, PoissonConfig(method="rbsor", iters=30, omega=1.7, bc=bc)
    )
    pal = rbsor_pallas(phi0, rhs, h, h, iters=30, omega=1.7, bc=bc)
    # identical algorithm; only summation association order differs
    np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), atol=1e-6)


def test_pallas_method_via_config(problem):
    phi0, rhs, h = problem
    ref = solve_poisson(phi0, rhs, h, h, PoissonConfig(method="rbsor", iters=20))
    pal = solve_poisson(phi0, rhs, h, h, PoissonConfig(method="rbsor_pallas", iters=20))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), atol=1e-6)


def test_oversize_and_masked_fall_back(problem):
    phi0, rhs, h = problem
    # masked problems use the streaming path (kernel has no mask input yet)
    solid = np.zeros(phi0.shape, dtype=bool)
    solid[10:14, 20:24] = True
    out = rbsor_pallas(phi0, rhs, h, h, iters=20, solid_mask=jnp.asarray(solid))
    assert np.all(np.asarray(out)[solid] == 0.0)
    # oversize arrays must not attempt the VMEM kernel
    big = int(np.ceil(np.sqrt(MAX_ELEMS))) + 8
    rhs_big = jnp.zeros((big, big), jnp.float32)
    out_big = rbsor_pallas(jnp.zeros_like(rhs_big), rhs_big, h, h, iters=2)
    assert out_big.shape == (big, big)


def test_blocked_rbsor_matches_streaming():
    # grid-blocked strip kernel (K sweeps per HBM pass, 2K-row halos) must
    # equal the streaming sweeps exactly, including non-divisible heights
    import numpy as np

    from cfdsim_tpu.ops.pallas.poisson_rb import rbsor_pallas_blocked
    from cfdsim_tpu.solvers.poisson import PoissonConfig, solve_poisson

    rng = np.random.RandomState(7)
    for ny, nx, R, K, iters in [(64, 48, 16, 3, 10), (72, 32, 32, 8, 9)]:
        rhs = jnp.asarray(rng.randn(ny, nx), jnp.float32)
        phi0 = jnp.asarray(rng.randn(ny, nx), jnp.float32)
        ref = solve_poisson(phi0, rhs, 0.02, 0.03,
                            PoissonConfig(method="rbsor", iters=iters, omega=1.7))
        got = rbsor_pallas_blocked(phi0, rhs, 0.02, 0.03, iters=iters,
                                   omega=1.7, rows_per_block=R,
                                   sweeps_per_pass=K, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=5e-6)


def test_rbsor_pallas_tol_early_exit():
    # method="rbsor_pallas" with tol must converge like the streaming
    # while_loop path (reference early exit v5.py:224-225)
    import numpy as np

    from cfdsim_tpu.solvers.poisson import (
        PoissonConfig, poisson_residual, solve_poisson,
    )

    rng = np.random.RandomState(1)
    n = 48
    rhs = jnp.asarray(rng.randn(n, n), jnp.float32)
    rhs = rhs - jnp.mean(rhs)
    cfg = PoissonConfig(method="rbsor_pallas", iters=4000, tol=1e-3,
                        check_every=50, omega=1.7)
    phi = solve_poisson(jnp.zeros((n, n), jnp.float32), rhs, 1.0 / n, 1.0 / n, cfg)
    res = float(poisson_residual(phi, rhs, 1.0 / n, 1.0 / n))
    assert res < 1e-3


def test_mg_pallas_smooth_large_level():
    # mg_pallas_smooth now covers levels beyond the single-block budget via
    # the strip kernel; result must match plain MG closely
    import numpy as np

    from cfdsim_tpu.solvers.poisson import PoissonConfig, solve_poisson

    rng = np.random.RandomState(2)
    n = 64
    rhs = jnp.asarray(rng.randn(n, n), jnp.float32)
    rhs = rhs - jnp.mean(rhs)
    phi_ref = solve_poisson(jnp.zeros((n, n), jnp.float32), rhs, 1.0 / n, 1.0 / n,
                            PoissonConfig(method="mg", iters=4))
    phi_pal = solve_poisson(jnp.zeros((n, n), jnp.float32), rhs, 1.0 / n, 1.0 / n,
                            PoissonConfig(method="mg", iters=4, mg_pallas_smooth=True))
    np.testing.assert_allclose(np.asarray(phi_pal), np.asarray(phi_ref),
                               rtol=0, atol=2e-4 * float(jnp.abs(phi_ref).max()))


def test_fused_predictor_matches_jnp_ops():
    import numpy as np

    from cfdsim_tpu.ops.convection import convection_central
    from cfdsim_tpu.ops.pallas.predictor import fused_predictor_central
    from cfdsim_tpu.ops.stencil import laplacian_coeff

    rng = np.random.RandomState(5)
    u = jnp.asarray(rng.randn(48, 64), jnp.float32)
    v = jnp.asarray(rng.randn(48, 64), jnp.float32)
    dt, nu, dx, dy = 1e-3, 0.01, 0.02, 0.03
    ur = u + dt * (laplacian_coeff(u, dx, dy, nu) - convection_central(u, v, u, dx, dy))
    vr = v + dt * (laplacian_coeff(v, dx, dy, nu) - convection_central(u, v, v, dx, dy))
    us, vs = fused_predictor_central(u, v, dt, nu, dx, dy,
                                     rows_per_block=16, interpret=True)
    np.testing.assert_allclose(np.asarray(us), np.asarray(ur), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vr), rtol=0, atol=1e-6)


def test_fused_predictor_step_equivalence():
    import numpy as np

    from cfdsim_tpu.cases import lid_cavity

    a = lid_cavity(n=32, Re=100.0)
    b = lid_cavity(n=32, Re=100.0, fused_predictor=True)
    import jax

    sa, sb = a.state, b.state
    for _ in range(5):
        sa, _ = jax.jit(a.step)(sa, jnp.float32(1.0))
        sb, _ = jax.jit(b.step)(sb, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(sa.u), np.asarray(sb.u),
                               rtol=0, atol=1e-5)


def test_fused_predictor_rejects_unsupported():
    import pytest

    from cfdsim_tpu.cases import lid_cavity

    with pytest.raises(ValueError, match="fused_predictor"):
        lid_cavity(n=32, Re=100.0, scheme="upwind", fused_predictor=True)
