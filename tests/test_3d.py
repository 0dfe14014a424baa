"""3D solver: Poisson correctness, cavity physics, and mesh sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import cavity3d
from cfdsim_tpu.parallel.mesh import make_grid_mesh
from cfdsim_tpu.parallel.sharded import make_sharded_step, shard_state
from cfdsim_tpu.solvers.poisson3d import (
    Poisson3DConfig,
    lap_neumann_3d,
    residual_3d,
    solve_poisson_3d,
)


def _manufactured(n=32):
    x = np.linspace(0, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    phi = jnp.asarray(
        np.cos(np.pi * X) * np.cos(2 * np.pi * Y) * np.cos(np.pi * Z), jnp.float32
    )
    h = float(x[1] - x[0])
    rhs = lap_neumann_3d(phi, h, h, h)
    return phi, rhs, h


def test_dct3d_exact():
    phi_ex, rhs, h = _manufactured(32)
    phi = solve_poisson_3d(
        jnp.zeros_like(rhs), rhs, h, h, h, Poisson3DConfig(method="dct")
    )
    assert float(residual_3d(phi, rhs, h, h, h)) < 5e-2  # fp32 at 1/h² scale
    d = (phi - jnp.mean(phi)) - (phi_ex - jnp.mean(phi_ex))
    assert float(jnp.max(jnp.abs(d))) < 5e-3


def test_mg3d_converges():
    phi_ex, rhs, h = _manufactured(32)
    res0 = float(residual_3d(jnp.zeros_like(rhs), rhs, h, h, h))
    phi = solve_poisson_3d(
        jnp.zeros_like(rhs), rhs, h, h, h, Poisson3DConfig(method="mg", iters=5)
    )
    assert float(residual_3d(phi, rhs, h, h, h)) < 1e-2 * res0


def test_cavity3d_steps_healthy():
    case = cavity3d(n=24, Re=100.0)
    f = jax.jit(lambda s, c: jax.lax.scan(
        lambda st, _: case.step(st, c), s, None, length=50))
    st, m = f(case.state, jnp.float32(1.0))
    st, m = f(st, jnp.float32(1.0))
    assert bool(jnp.all(jnp.isfinite(st.u)))
    assert float(np.asarray(m.max_vel)[-1]) <= 1.0 + 1e-3
    assert float(np.asarray(m.div_post)[-1]) < 1.0
    # lid drives a primary vortex: interior x-velocity becomes negative
    # somewhere below the lid (return flow)
    assert float(jnp.min(st.u)) < -1e-3


def test_cavity3d_sharded_matches_single_device():
    mesh = make_grid_mesh(8, topology=(2, 4))
    case = cavity3d(n=16, Re=100.0)
    s1, m1 = jax.jit(case.step)(case.state, jnp.float32(1.0))
    s1, m1 = jax.jit(case.step)(s1, jnp.float32(1.0))

    st_sh = shard_state(case.state, mesh)
    step_sh = make_sharded_step(case.step, mesh)
    s2, m2 = step_sh(st_sh, jnp.float32(1.0))
    s2, m2 = step_sh(s2, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                               rtol=1e-4, atol=1e-5)
    assert len(s2.u.sharding.device_set) == 8


def test_mac3d_projection_exact_and_healthy():
    # 3D staggered solver: exact DCT projection leaves the discrete
    # divergence at fp32 roundoff in every cell (the collocated 3D module
    # is approximate); cavity spins up healthily
    from cfdsim_tpu.cases import cavity3d_mac

    case = cavity3d_mac(n=24, Re=100.0)
    step = jax.jit(case.step)
    s = case.state
    for _ in range(40):
        s, m = step(s, jnp.float32(1.0))
    assert bool(jnp.all(jnp.isfinite(s.u)))
    assert float(m.div_post) < 1e-3
    assert float(m.div_post) < 1e-3 * max(1.0, float(m.div_pre))
    assert 0.0 < float(m.energy) < 0.5
    assert float(m.max_vel) <= 1.0 + 1e-3


def test_mac3d_divergence_gradient_adjoint():
    # div(grad phi) through the 3D MAC pair equals the clamped-edge 7-point
    # operator the DCT solver diagonalizes
    import numpy as np

    from cfdsim_tpu.models.mac3d import divergence_mac3d
    from cfdsim_tpu.solvers.poisson3d import lap_neumann_3d

    rng = np.random.RandomState(0)
    phi = jnp.asarray(rng.randn(8, 10, 12), jnp.float32)
    dx, dy, dz = 0.1, 0.07, 0.09
    gu = jnp.pad((phi[:, :, 1:] - phi[:, :, :-1]) / dx, ((0, 0), (0, 0), (1, 1)))
    gv = jnp.pad((phi[:, 1:, :] - phi[:, :-1, :]) / dy, ((0, 0), (1, 1), (0, 0)))
    gw = jnp.pad((phi[1:] - phi[:-1]) / dz, ((1, 1), (0, 0), (0, 0)))
    div = divergence_mac3d(gu, gv, gw, dx, dy, dz)
    lap = np.asarray(lap_neumann_3d(phi, dx, dy, dz))
    np.testing.assert_allclose(np.asarray(div), lap, rtol=0,
                               atol=1e-5 * np.abs(lap).max())


def test_mac3d_matches_collocated_3d_physics():
    # both 3D cavities must agree on the bulk physics (energy within ~15%
    # after spin-up at matched n/Re) — they discretize the same problem
    from cfdsim_tpu.cases import cavity3d, cavity3d_mac

    def energy(case, n_steps=60):
        step = jax.jit(case.step)
        s = case.state
        for _ in range(n_steps):
            s, m = step(s, jnp.float32(1.0))
        return float(m.energy), float(s.t)

    e_mac, t_mac = energy(cavity3d_mac(n=16, Re=100.0))
    e_col, t_col = energy(cavity3d(n=16, Re=100.0))
    # compare at matched simulated time via a second run if needed — the
    # adaptive dt policies match (same CFL), so t should be close
    assert abs(t_mac - t_col) < 0.5 * max(t_mac, t_col)
    assert e_mac > 0 and e_col > 0
    assert 0.4 < e_mac / e_col < 2.5


def test_mac3d_upwind_and_tvd_schemes():
    # 3D MUSCL/upwind advection: healthy lid-driven development with the
    # exact projection; only the *monotone upwind* scheme is held to the
    # lid-speed bound (MUSCL + projection is not strictly monotone)
    from cfdsim_tpu.cases import cavity3d_mac

    for scheme in ("upwind", "tvd"):
        case = cavity3d_mac(n=16, Re=400.0, scheme=scheme)
        step = jax.jit(case.step)
        s = case.state
        for _ in range(30):
            s, m = step(s, jnp.float32(1.0))
        assert bool(jnp.all(jnp.isfinite(s.u))), scheme
        assert float(m.div_post) < 1e-3, scheme
        assert 0.0 < float(m.energy) < 0.5, scheme
        if scheme == "upwind":
            assert float(m.max_vel) <= 1.0 + 1e-3
