"""Pencil-decomposed distributed transforms must match the single-device
direct solvers to fp32 roundoff on the 8-device mesh (SURVEY.md §4 exact
multi-chip equality strategy)."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cfdsim_tpu.parallel.mesh import make_grid_mesh
from cfdsim_tpu.parallel.transforms import (
    dct2_local,
    dct_poisson_local,
    dst_helmholtz_local,
    idct2_local,
)
from cfdsim_tpu.solvers.helmholtz import solve_helmholtz_dirichlet
from cfdsim_tpu.solvers.poisson import (
    _dct_fwd,
    lap_neumann,
    solve_poisson_neumann_dct,
)


@pytest.fixture(scope="module")
def mesh():
    return make_grid_mesh(8, topology=(2, 4))


def _sharded(mesh, fn, x):
    f = jax.shard_map(fn, mesh=mesh, in_specs=P("y", "x"), out_specs=P("y", "x"))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("y", "x")))
    return np.asarray(jax.jit(f)(xs))


def test_distributed_dct2_matches(mesh):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((32, 64)).astype(np.float32)
    got = _sharded(mesh, lambda b: dct2_local(b, 2, 4), x)
    want = np.asarray(_dct_fwd(_dct_fwd(jnp.asarray(x), axis=0), axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_distributed_idct2_inverts(mesh):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((32, 32)).astype(np.float32)
    # _dct_inv is the exact inverse of _dct_fwd — round trip is identity
    got = _sharded(mesh, lambda b: idct2_local(dct2_local(b, 2, 4), 2, 4), x)
    np.testing.assert_allclose(got, x, rtol=1e-5, atol=1e-5)


def test_distributed_dct_poisson_matches_single_device(mesh):
    rng = np.random.default_rng(2)
    rhs = rng.standard_normal((32, 64)).astype(np.float32)
    rhs -= rhs.mean()
    got = _sharded(mesh, lambda b: dct_poisson_local(b, 0.1, 0.2, 2, 4), rhs)
    want = np.asarray(solve_poisson_neumann_dct(jnp.asarray(rhs), 0.1, 0.2))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    # and it actually solves the clamped-edge problem
    res = np.asarray(lap_neumann(jnp.asarray(got), 0.1, 0.2)) - rhs
    assert np.abs(res - res.mean()).max() < 1e-3


def test_distributed_dst_helmholtz_matches_single_device(mesh):
    rng = np.random.default_rng(3)
    b = rng.standard_normal((32, 64)).astype(np.float32)
    coeff = 0.037
    got = _sharded(
        mesh, lambda bb: dst_helmholtz_local(bb, coeff, 0.1, 0.2, 2, 4), b
    )
    want = np.asarray(
        solve_helmholtz_dirichlet(jnp.asarray(b), coeff, 0.1, 0.2)
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    # boundary frame preserved exactly
    np.testing.assert_array_equal(got[0, :], b[0, :])
    np.testing.assert_array_equal(got[:, -1], b[:, -1])


def test_distributed_fdm_matches_single_device(mesh):
    from cfdsim_tpu.models.mac_stretched import wall_clustered_faces
    from cfdsim_tpu.parallel.transforms import make_fdm_poisson_local
    from cfdsim_tpu.solvers.fdm import make_fdm_solver

    hx = np.diff(wall_clustered_faces(64, 1.0, beta=1.7))
    hy = np.diff(wall_clustered_faces(32, 1.0, beta=1.3))
    solve_loc = make_fdm_poisson_local(hx, hy, 2, 4)
    rng = np.random.default_rng(4)
    rhs = rng.standard_normal((32, 64)).astype(np.float32)
    got = _sharded(mesh, solve_loc, rhs)
    want = np.asarray(make_fdm_solver(hx, hy)(jnp.asarray(rhs)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_distributed_dct_poisson3d_matches_single_device(mesh):
    from functools import partial as _partial

    from cfdsim_tpu.parallel.transforms import dct_poisson3d_local
    from cfdsim_tpu.solvers.poisson3d import Poisson3DConfig, solve_poisson_3d

    rng = np.random.default_rng(5)
    rhs = rng.standard_normal((8, 16, 16)).astype(np.float32)
    f = jax.shard_map(
        lambda b: dct_poisson3d_local(b, 0.1, 0.2, 0.3, 2, 4),
        mesh=mesh, in_specs=P(None, "y", "x"), out_specs=P(None, "y", "x"),
    )
    xs = jax.device_put(jnp.asarray(rhs), NamedSharding(mesh, P(None, "y", "x")))
    got = np.asarray(jax.jit(f)(xs))
    want = np.asarray(solve_poisson_3d(
        jnp.zeros_like(jnp.asarray(rhs)), jnp.asarray(rhs), 0.1, 0.2, 0.3,
        Poisson3DConfig(method="dct"),
    ))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_pencil_shape_validation(mesh):
    # 8 rows over a (2,4) mesh → local rows 4, not divisible by px=4 after
    # the y-split? rows_l=4 divisible by 4; cols 12 → cols_l=3 not
    # divisible by py=2 → must raise at trace time
    with pytest.raises(ValueError, match="pencil"):
        _sharded(mesh, lambda b: dct2_local(b, 2, 4), np.zeros((8, 12), np.float32))
