"""On-device whole-run fast path and the hybrid Poisson method."""

import numpy as np
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import lid_cavity
from cfdsim_tpu.runner import run_on_device
from cfdsim_tpu.solvers.poisson import PoissonConfig, poisson_residual, solve_poisson


def test_run_on_device_reaches_t_final():
    case = lid_cavity(n=32, Re=100.0)
    state, metrics = run_on_device(case.step, case.state, t_final=0.5)
    assert float(state.t) >= 0.5
    assert int(state.step) > 0
    assert np.all(np.isfinite(np.asarray(state.u)))
    assert float(metrics.max_vel) <= 1.0 + 1e-3


def test_run_on_device_matches_host_loop():
    import jax

    case = lid_cavity(n=32, Re=100.0)
    s_dev, _ = run_on_device(case.step, case.state, t_final=1e9, max_steps=7)
    s_host = case.state
    step = jax.jit(case.step)
    for _ in range(7):
        s_host, _ = step(s_host, jnp.float32(1.0))
    np.testing.assert_allclose(
        np.asarray(s_dev.u), np.asarray(s_host.u), rtol=1e-5, atol=1e-6
    )
    assert int(s_dev.step) == 7


def test_hybrid_poisson_repairs_masked_region():
    from cfdsim_tpu.solvers.poisson import lap_neumann

    rng = np.random.default_rng(0)
    n = 64
    h = 1.0 / n
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x)
    phi_ex = jnp.asarray(np.cos(np.pi * X) * np.cos(2 * np.pi * Y), jnp.float32)
    rhs = lap_neumann(phi_ex, h, h)
    solid = np.zeros((n, n), dtype=bool)
    solid[28:36, 28:36] = True
    solid = jnp.asarray(solid)

    cfg = PoissonConfig(method="hybrid", iters=30, omega=1.7)
    phi = solve_poisson(jnp.zeros_like(rhs), rhs, h, h, cfg, solid_mask=solid)
    assert np.all(np.asarray(phi)[np.asarray(solid)] == 0.0)
    res_h = float(poisson_residual(phi, rhs, h, h, solid_mask=solid))
    # pure rbsor with the same sweep budget is much worse
    phi_r = solve_poisson(
        jnp.zeros_like(rhs), rhs, h, h,
        PoissonConfig(method="rbsor", iters=30, omega=1.7), solid_mask=solid,
    )
    res_r = float(poisson_residual(phi_r, rhs, h, h, solid_mask=solid))
    assert res_h < 0.5 * res_r


def test_hybrid_without_mask_is_exact_dct():
    rng = np.random.default_rng(1)
    rhs = jnp.asarray(rng.standard_normal((32, 32)), jnp.float32)
    rhs = rhs - jnp.mean(rhs)
    h = 1.0 / 32
    a = solve_poisson(jnp.zeros_like(rhs), rhs, h, h, PoissonConfig(method="hybrid"))
    b = solve_poisson(jnp.zeros_like(rhs), rhs, h, h, PoissonConfig(method="dct"))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_run_on_device_mac_tier():
    # whole-run while_loop on the staggered tier (exact projection all the
    # way): reaches t_final with fp32-roundoff divergence
    from cfdsim_tpu.cases import lid_cavity_mac

    case = lid_cavity_mac(n=24, Re=100.0)
    state, metrics = run_on_device(case.step, case.state, t_final=0.5)
    assert float(state.t) >= 0.5
    assert bool(jnp.all(jnp.isfinite(state.u)))
    assert float(metrics.div_post) < 1e-3
