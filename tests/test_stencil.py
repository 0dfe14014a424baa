"""Stencil operator correctness against analytic fields."""

import numpy as np
import jax.numpy as jnp

from cfdsim_tpu.ops import (
    gradient,
    divergence,
    laplacian,
    laplacian_coeff,
    curl,
    convection_upwind,
    smagorinsky_viscosity,
)
from cfdsim_tpu.ops.convection import convection_central


def _grid(n=64):
    x = np.linspace(0.0, 1.0, n)
    y = np.linspace(0.0, 1.0, n)
    X, Y = np.meshgrid(x, y, indexing="xy")
    dx = x[1] - x[0]
    dy = y[1] - y[0]
    return X, Y, dx, dy


def test_gradient_quadratic_exact():
    # gradient of x^2 + 3y is (2x, 3); central differences are exact on quadratics
    X, Y, dx, dy = _grid()
    phi = jnp.asarray(X**2 + 3.0 * Y, jnp.float32)
    gx, gy = gradient(phi, dx, dy)
    np.testing.assert_allclose(gx[1:-1, 1:-1], 2.0 * X[1:-1, 1:-1], atol=1e-4)
    np.testing.assert_allclose(gy[1:-1, 1:-1], 3.0, atol=1e-4)
    assert np.all(np.asarray(gx)[0, :] == 0)  # zero frame like the reference


def test_divergence_linear_field():
    X, Y, dx, dy = _grid()
    u = jnp.asarray(2.0 * X, jnp.float32)
    v = jnp.asarray(-3.0 * Y, jnp.float32)
    div = divergence(u, v, dx, dy)
    np.testing.assert_allclose(div[1:-1, 1:-1], -1.0, atol=1e-4)


def test_laplacian_quadratic_exact():
    X, Y, dx, dy = _grid()
    phi = jnp.asarray(X**2 + 2.0 * Y**2, jnp.float32)
    lap = laplacian(phi, dx, dy)
    np.testing.assert_allclose(lap[1:-1, 1:-1], 6.0, rtol=1e-3)


def test_laplacian_coeff_scalar_and_field():
    X, Y, dx, dy = _grid()
    phi = jnp.asarray(X**2, jnp.float32)
    lap_s = laplacian_coeff(phi, dx, dy, 0.5)
    nu = jnp.full_like(phi, 0.5)
    lap_f = laplacian_coeff(phi, dx, dy, nu)
    np.testing.assert_allclose(lap_s, lap_f, atol=1e-5)
    np.testing.assert_allclose(lap_s[1:-1, 1:-1], 1.0, rtol=1e-2)


def test_curl_rigid_rotation():
    # u = -y, v = x has vorticity 2 everywhere
    X, Y, dx, dy = _grid()
    u = jnp.asarray(-Y, jnp.float32)
    v = jnp.asarray(X, jnp.float32)
    w = curl(u, v, dx, dy)
    np.testing.assert_allclose(w[1:-1, 1:-1], 2.0, atol=1e-4)


def test_upwind_convection_uniform_advection():
    # constant u advecting phi = x gives u * dphi/dx = u exactly
    X, Y, dx, dy = _grid()
    u = jnp.full_like(jnp.asarray(X, jnp.float32), 0.7)
    v = jnp.zeros_like(u)
    phi = jnp.asarray(X, jnp.float32)
    conv = convection_upwind(u, v, phi, dx, dy)
    np.testing.assert_allclose(conv[1:-1, 1:-1], 0.7, rtol=1e-4)
    # flipping the sign selects the forward difference; still exact on linear
    conv2 = convection_upwind(-u, v, phi, dx, dy)
    np.testing.assert_allclose(conv2[1:-1, 1:-1], -0.7, rtol=1e-4)


def test_central_convection_matches_analytic():
    X, Y, dx, dy = _grid()
    u = jnp.asarray(X * 0 + 1.0, jnp.float32)
    v = jnp.asarray(X * 0 + 2.0, jnp.float32)
    phi = jnp.asarray(X**2 + Y**2, jnp.float32)
    conv = convection_central(u, v, phi, dx, dy)
    expected = 2.0 * X + 4.0 * Y
    np.testing.assert_allclose(
        conv[1:-1, 1:-1], expected[1:-1, 1:-1], rtol=1e-3, atol=1e-3
    )


def test_smagorinsky_pure_shear():
    # u = y shear: |S| = |du/dy| = 1, nu_t = (cs*delta)^2
    X, Y, dx, dy = _grid()
    u = jnp.asarray(Y, jnp.float32)
    v = jnp.zeros_like(u)
    cs = 0.17
    nu_t = smagorinsky_viscosity(u, v, dx, dy, cs)
    expected = (cs * np.sqrt(dx * dy)) ** 2
    np.testing.assert_allclose(nu_t[1:-1, 1:-1], expected, rtol=1e-3)
