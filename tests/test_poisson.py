"""Pressure-Poisson solver correctness: residual reduction, exactness of
direct solves, and agreement between backends (SURVEY.md §4: the reference's
runtime monitors turned into assertable tests)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.solvers.poisson import (
    PoissonConfig,
    lap_neumann,
    poisson_residual,
    solve_poisson,
    solve_poisson_periodic_fft,
    _dct2,
    _idct2,
)


def _manufactured_neumann(n=32):
    """A discrete problem whose exact solution is known: pick smooth phi*
    and take rhs = L phi* under the clamped-edge (Neumann) operator."""
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x, indexing="xy")
    phi_exact = jnp.asarray(
        np.cos(np.pi * X) * np.cos(2 * np.pi * Y), jnp.float32
    )
    h = float(x[1] - x[0])
    rhs = lap_neumann(phi_exact, h, h)
    return phi_exact, rhs, h


def _demean(a):
    return a - jnp.mean(a)


def test_dct_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((24, 40)), jnp.float32)
    y = _idct2(_dct2(x, axis=0), axis=0)
    np.testing.assert_allclose(y, x, atol=1e-4)
    y2 = _idct2(_dct2(x, axis=1), axis=1)
    np.testing.assert_allclose(y2, x, atol=1e-4)


def test_fft_periodic_exact():
    rng = np.random.default_rng(1)
    rhs = rng.standard_normal((64, 96)).astype(np.float32)
    rhs -= rhs.mean()
    rhs = jnp.asarray(rhs)
    dx, dy = 0.05, 0.07
    phi = solve_poisson_periodic_fft(rhs, dx, dy)
    # verify with a periodic 5-point laplacian (roll-based)
    lap = (
        (jnp.roll(phi, -1, 1) - 2 * phi + jnp.roll(phi, 1, 1)) / dx**2
        + (jnp.roll(phi, -1, 0) - 2 * phi + jnp.roll(phi, 1, 0)) / dy**2
    )
    np.testing.assert_allclose(lap, rhs, atol=5e-3)


def test_dct_neumann_exact():
    phi_exact, rhs, h = _manufactured_neumann(32)
    phi = solve_poisson(jnp.zeros_like(rhs), rhs, h, h, PoissonConfig(method="dct"))
    np.testing.assert_allclose(
        np.asarray(_demean(phi)), np.asarray(_demean(phi_exact)), atol=2e-3
    )
    assert float(poisson_residual(phi, rhs, h, h)) < 1e-2


@pytest.mark.parametrize("method", ["jacobi", "rbsor"])
def test_iterative_converges_to_manufactured(method):
    phi_exact, rhs, h = _manufactured_neumann(24)
    iters = 4000 if method == "jacobi" else 1200
    cfg = PoissonConfig(method=method, iters=iters, omega=1.8 if method == "rbsor" else 1.0)
    phi = solve_poisson(jnp.zeros_like(rhs), rhs, h, h, cfg)
    np.testing.assert_allclose(
        np.asarray(_demean(phi)), np.asarray(_demean(phi_exact)), atol=5e-3
    )


def test_rbsor_reduces_residual_monotonically_in_budget():
    phi_exact, rhs, h = _manufactured_neumann(32)
    res0 = poisson_residual(jnp.zeros_like(rhs), rhs, h, h)
    phi50 = solve_poisson(
        jnp.zeros_like(rhs), rhs, h, h, PoissonConfig(method="rbsor", iters=50)
    )
    res50 = poisson_residual(phi50, rhs, h, h)
    phi200 = solve_poisson(
        jnp.zeros_like(rhs), rhs, h, h, PoissonConfig(method="rbsor", iters=200)
    )
    res200 = poisson_residual(phi200, rhs, h, h)
    assert float(res50) < 0.5 * float(res0)
    assert float(res200) < float(res50)


def test_rbsor_early_exit_tolerance():
    # while_loop mode must reach the requested tolerance
    phi_exact, rhs, h = _manufactured_neumann(24)
    cfg = PoissonConfig(method="rbsor", iters=5000, tol=1e-2, check_every=10, omega=1.7)
    phi = solve_poisson(jnp.zeros_like(rhs), rhs, h, h, cfg)
    assert float(poisson_residual(phi, rhs, h, h)) < 1e-2


def test_multigrid_converges_fast():
    phi_exact, rhs, h = _manufactured_neumann(64)
    cfg = PoissonConfig(method="mg", iters=6, mg_pre=2, mg_post=2, mg_coarse=30)
    phi = solve_poisson(jnp.zeros_like(rhs), rhs, h, h, cfg)
    res_mg = float(poisson_residual(phi, rhs, h, h))
    res0 = float(poisson_residual(jnp.zeros_like(rhs), rhs, h, h))
    assert res_mg < 1e-2 * res0
    np.testing.assert_allclose(
        np.asarray(_demean(phi)), np.asarray(_demean(phi_exact)), atol=2e-2
    )


def test_multigrid_rejects_solid_mask():
    # embedded bodies go through IBM penalization + unmasked MG; the masked
    # problem must use rbsor (coarse/fine masked operators are inconsistent)
    phi_exact, rhs, h = _manufactured_neumann(64)
    solid = np.zeros((64, 64), dtype=bool)
    solid[28:36, 28:36] = True
    with pytest.raises(AssertionError):
        solve_poisson(
            jnp.zeros_like(rhs), rhs, h, h, PoissonConfig(method="mg"),
            solid_mask=jnp.asarray(solid),
        )


def test_solid_mask_cells_stay_fixed():
    # phi inside an embedded solid must remain at its initial value (0),
    # reproducing the reference's masked Gauss-Seidel (v5.py:213).
    phi_exact, rhs, h = _manufactured_neumann(24)
    solid = np.zeros((24, 24), dtype=bool)
    solid[10:14, 10:14] = True
    cfg = PoissonConfig(method="rbsor", iters=100)
    phi = solve_poisson(
        jnp.zeros_like(rhs), rhs, h, h, cfg, solid_mask=jnp.asarray(solid)
    )
    assert np.all(np.asarray(phi)[solid] == 0.0)
    assert np.any(np.asarray(phi)[~solid] != 0.0)


def test_dirichlet_bc_keeps_zero_frame():
    phi_exact, rhs, h = _manufactured_neumann(24)
    cfg = PoissonConfig(method="rbsor", iters=100, bc="dirichlet")
    phi = solve_poisson(jnp.zeros_like(rhs), rhs, h, h, cfg)
    a = np.asarray(phi)
    assert np.all(a[0, :] == 0) and np.all(a[-1, :] == 0)
    assert np.all(a[:, 0] == 0) and np.all(a[:, -1] == 0)
    res = float(poisson_residual(phi, rhs, h, h, bc="dirichlet"))
    res0 = float(poisson_residual(jnp.zeros_like(rhs), rhs, h, h, bc="dirichlet"))
    assert res < 0.2 * res0


def test_solve_is_jittable_and_warm_startable():
    phi_exact, rhs, h = _manufactured_neumann(24)
    cfg = PoissonConfig(method="rbsor", iters=50)
    f = jax.jit(lambda p0, r: solve_poisson(p0, r, h, h, cfg))
    phi1 = f(jnp.zeros_like(rhs), rhs)
    phi2 = f(phi1, rhs)  # warm start should not diverge
    assert float(poisson_residual(phi2, rhs, h, h)) <= float(
        poisson_residual(phi1, rhs, h, h)
    ) * 1.01


def test_packed_dct_matches_reference():
    # the half-FFT packed 2D DCT (kept for high-HBM-bandwidth hardware)
    # must agree with the per-axis Makhoul path to fp32 roundoff
    import numpy as np

    from cfdsim_tpu.solvers.poisson import (
        _dct2, _dct2d_packed, _idct2d_packed,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(32, 48), jnp.float32)
    ref = np.asarray(_dct2(_dct2(x, 0), 1))
    new = np.asarray(_dct2d_packed(x))
    assert np.abs(ref - new).max() < 1e-5 * np.abs(ref).max()
    rt = np.asarray(_idct2d_packed(_dct2d_packed(x)))
    assert np.abs(rt - np.asarray(x)).max() < 1e-5


def test_fft_split_matches_xla_fft():
    # explicit radix-2 DIT peels (the >2048-superlinearity escape) must
    # reproduce jnp.fft exactly at every depth, fwd and inverse
    import numpy as np

    from cfdsim_tpu.solvers.poisson import _fft_split, _ifft_split

    rng = np.random.RandomState(7)
    z = jnp.asarray(rng.randn(5, 64) + 1j * rng.randn(5, 64),
                    jnp.complex64)
    ref = np.asarray(jnp.fft.fft(z, axis=1))
    for depth in (1, 2, 3):
        got = np.asarray(_fft_split(z, 1, depth))
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max(), depth
        rt = np.asarray(_ifft_split(_fft_split(z, 1, depth), 1, depth))
        assert np.abs(rt - np.asarray(z)).max() < 1e-5, depth
