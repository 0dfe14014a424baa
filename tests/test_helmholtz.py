"""DST-based exact Dirichlet Helmholtz solve (solvers/helmholtz.py) —
the implicit viscous backend replacing Jacobi iteration (capability of the
reference's implicit FEM step, v1.jl:130-167)."""

import jax
import jax.numpy as jnp
import numpy as np

from cfdsim_tpu.solvers.helmholtz import dst1, idst1, solve_helmholtz_dirichlet


def test_dst1_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(13, 9), jnp.float32)
    for axis in (0, 1):
        np.testing.assert_allclose(
            np.asarray(idst1(dst1(x, axis), axis)), np.asarray(x),
            rtol=0, atol=1e-5,
        )


def test_helmholtz_exact_solve():
    # manufactured solution: random u with a nonzero Dirichlet frame;
    # b = u − c∇²u on the interior (frame of b carries u's boundary values)
    rng = np.random.RandomState(1)
    u = jnp.asarray(rng.randn(24, 18), jnp.float32)
    dx, dy = 0.05, 0.08
    c = 3e-3
    lap = (u[1:-1, 2:] - 2 * u[1:-1, 1:-1] + u[1:-1, :-2]) / (dx * dx) + (
        u[2:, 1:-1] - 2 * u[1:-1, 1:-1] + u[:-2, 1:-1]
    ) / (dy * dy)
    b = u.at[1:-1, 1:-1].set(u[1:-1, 1:-1] - c * lap)
    u_rec = solve_helmholtz_dirichlet(b, c, dx, dy)
    np.testing.assert_allclose(np.asarray(u_rec), np.asarray(u),
                               rtol=0, atol=2e-5)
    # the boundary frame is passed through untouched
    np.testing.assert_array_equal(np.asarray(u_rec[0]), np.asarray(u[0]))


def test_implicit_dst_matches_tight_jacobi():
    # one implicit cavity step: the DST backend must agree with a
    # very-tight Jacobi solve to fp32 levels
    from cfdsim_tpu.cases import lid_cavity

    kw = dict(n=48, Re=100.0, diffusion="implicit")
    c_dst = lid_cavity(implicit_solver="dst", **kw)
    c_jac = lid_cavity(implicit_solver="jacobi", implicit_iters=400, **kw)
    s = c_dst.state
    for _ in range(3):
        s_dst, _ = jax.jit(c_dst.step)(s, jnp.float32(1.0))
        s_jac, _ = jax.jit(c_jac.step)(s, jnp.float32(1.0))
        np.testing.assert_allclose(
            np.asarray(s_dst.u), np.asarray(s_jac.u), rtol=0, atol=5e-5
        )
        s = s_dst


def test_implicit_dst_step_drops_viscous_dt_limit():
    # the implicit path runs stably with dt far above the explicit bound
    from cfdsim_tpu.cases import lid_cavity

    case = lid_cavity(n=32, Re=10.0, diffusion="implicit")
    # explicit viscous bound would be 0.2 h²/ν ≈ 2e-3·... ; implicit path
    # uses the pure CFL dt (~1.5e-2 here) and must stay healthy
    s = case.state
    step = jax.jit(case.step)
    for _ in range(50):
        s, m = step(s, jnp.float32(1.0))
    assert np.all(np.isfinite(np.asarray(s.u)))
    assert float(m.max_vel) < 1.5
