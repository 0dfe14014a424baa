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


def test_dct3d_rfftn_matches_per_axis():
    """Single-3D-FFT Makhoul path == per-axis transforms (and odd sizes
    fall back to per-axis, so both calls are identical there)."""
    rng = np.random.default_rng(0)
    for shape in [(16, 24, 32), (15, 24, 32)]:
        rhs = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        rhs = rhs - jnp.mean(rhs)
        z = jnp.zeros_like(rhs)
        a = solve_poisson_3d(z, rhs, 0.1, 0.2, 0.3,
                             Poisson3DConfig(method="dct", dct_variant="rfftn"))
        b = solve_poisson_3d(z, rhs, 0.1, 0.2, 0.3,
                             Poisson3DConfig(method="dct", dct_variant="rfft"))
        assert float(jnp.max(jnp.abs(a - b))) < 1e-6


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


def test_mac3d_les_constant_nu_matches_laplacian():
    # flux-form variable-ν diffusion with CONSTANT ν must reduce exactly
    # to ν·(7-point Laplacian) — discrete conservation identity
    import numpy as np

    from cfdsim_tpu.models.mac3d import (
        _diffuse_les3d,
        cavity3d_bcs,
        diffuse3d,
    )

    rng = np.random.RandomState(1)
    nz, ny, nx = 6, 7, 8
    u = jnp.asarray(rng.randn(nz, ny, nx + 1), jnp.float32)
    v = jnp.asarray(rng.randn(nz, ny + 1, nx), jnp.float32)
    w = jnp.asarray(rng.randn(nz + 1, ny, nx), jnp.float32)
    gh = cavity3d_bcs(0.7).ghosts(u, v, w)
    nu = 0.013
    nu_c = jnp.full((nz, ny, nx), nu, jnp.float32)
    l0 = diffuse3d(u, v, w, gh, 0.11, 0.09, 0.13)
    l1 = _diffuse_les3d(u, v, w, gh, nu_c, 0.11, 0.09, 0.13)
    for a, b in zip(l1, l0):
        np.testing.assert_allclose(
            np.asarray(a), nu * np.asarray(b), rtol=2e-5, atol=2e-5
        )


def test_mac3d_les_zero_for_rigid_rotation():
    # rigid rotation about z: zero strain rate → ν_t vanishes in the
    # interior (the 3D habitat of test_mac_les_zero_for_rigid_rotation)
    import numpy as np

    from cfdsim_tpu.models.mac3d import smagorinsky_viscosity_mac3d

    n = 16
    h = 1.0 / n
    yu = (np.arange(n) + 0.5) * h
    xv = (np.arange(n) + 0.5) * h
    om = 2.0
    u = np.broadcast_to(
        -om * (yu[None, :, None] - 0.5), (n, n, n + 1)
    ).astype(np.float32)
    v = np.broadcast_to(
        om * (xv[None, None, :] - 0.5), (n, n + 1, n)
    ).astype(np.float32)
    w = np.zeros((n + 1, n, n), np.float32)
    u, v, w = jnp.asarray(u), jnp.asarray(v), jnp.asarray(w)

    # linear-extrapolation ghosts (the interior formula continued)
    def ext(a, axis):
        lo = 2 * jax.lax.slice_in_dim(a, 0, 1, axis=axis) - \
            jax.lax.slice_in_dim(a, 1, 2, axis=axis)
        hi = 2 * jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis],
                                      axis=axis) - \
            jax.lax.slice_in_dim(a, a.shape[axis] - 2, a.shape[axis] - 1,
                                 axis=axis)
        return jnp.concatenate([lo, a, hi], axis=axis)

    gh = (ext(u, 1), ext(u, 0), ext(v, 2), ext(v, 0), ext(w, 2), ext(w, 1))
    nu_t = smagorinsky_viscosity_mac3d(u, v, w, gh, h, h, h, cs=0.17)
    assert float(jnp.abs(nu_t).max()) < 1e-5


def test_mac3d_les_adds_dissipation_taylor_green():
    # 3D Taylor–Green vortex in the free-slip [0,π]³ box: with LES on,
    # kinetic energy decays faster than molecular-ν only (ν_t ≥ 0)
    import numpy as np

    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.models import mac3d

    n = 24
    h = np.pi / n
    xf = np.arange(n + 1) * h          # face coords
    xc = (np.arange(n) + 0.5) * h      # center coords
    # u = sin x cos y cos z ; v = −cos x sin y cos z ; w = 0
    u0 = (np.sin(xf)[None, None, :] * np.cos(xc)[None, :, None]
          * np.cos(xc)[:, None, None]).astype(np.float32)
    v0 = (-np.cos(xc)[None, None, :] * np.sin(xf)[None, :, None]
          * np.cos(xc)[:, None, None]).astype(np.float32)

    def run(use_les):
        cfg = mac3d.MAC3DConfig(
            grid=Grid3D(nx=n, ny=n, nz=n, x_max=np.pi, y_max=np.pi,
                        z_max=np.pi, centering="cell"),
            nu=1e-4, use_les=use_les, adaptive_dt=False, dt_base=4e-3,
        )
        step = mac3d.make_step(cfg, mac3d.free_slip_bcs3d())
        s = mac3d.init_state(cfg)._replace(
            u=jnp.asarray(u0), v=jnp.asarray(v0)
        )
        s, ms = jax.jit(lambda s0: jax.lax.scan(
            lambda st, _: step(st, jnp.float32(1.0)), s0, None, length=150
        ))(s)
        assert bool(jnp.all(jnp.isfinite(s.u)))
        assert float(np.asarray(ms.div_post)[-1]) < 1e-3
        return float(np.asarray(ms.energy)[-1])

    e_plain = run(False)
    e_les = run(True)
    assert e_les < e_plain - 1e-5
    # implied eddy viscosity must be of the (C_s Δ)²|S| order (~1e-4)
    nu_t_eff = float(np.log(e_plain / e_les)) / (4.0 * 150 * 4e-3)
    assert 1e-5 < nu_t_eff < 2e-3


def test_incremental_projection_tiers_consistent():
    """projection='incremental' on the 3D and stretched tiers: exactly
    divergence-free and converging to the chorin flow (the O(dt)
    splitting defect is the only difference)."""
    import numpy as np

    from cfdsim_tpu.cases import cavity3d_mac, cavity_stretched

    outs = []
    for proj in ("chorin", "incremental"):
        case = cavity3d_mac(n=12, Re=100.0, projection=proj)
        f = jax.jit(case.step)
        s = case.state
        for _ in range(40):
            s, m = f(s, jnp.float32(1.0))
        assert float(m.div_post) < 1e-3, proj
        outs.append(np.asarray(s.u))
    d = np.abs(outs[0] - outs[1]).max()
    assert 0.0 < d < 1e-2, d

    outs = []
    for proj in ("chorin", "incremental"):
        case = cavity_stretched(n=16, Re=100.0, beta=1.5, projection=proj)
        f = jax.jit(case.step)
        s = case.state
        for _ in range(40):
            s, m = f(s, jnp.float32(1.0))
        assert float(m.div_post) < 1e-3, proj
        outs.append(np.asarray(s.u))
    d = np.abs(outs[0] - outs[1]).max()
    assert 0.0 < d < 1e-2, d
