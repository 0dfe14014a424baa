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
