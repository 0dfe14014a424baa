"""Fully explicit shard_map NS step must match the single-device step
exactly (same rbsor Poisson configuration)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import lid_cavity
from cfdsim_tpu.parallel.explicit import make_cavity_explicit_step
from cfdsim_tpu.parallel.mesh import make_grid_mesh
from cfdsim_tpu.parallel.sharded import shard_state
from cfdsim_tpu.solvers.poisson import PoissonConfig


@pytest.fixture(scope="module")
def setup():
    mesh = make_grid_mesh(8, topology=(2, 4))
    case = lid_cavity(
        n=32, Re=100.0, scheme="central",
        poisson=PoissonConfig(method="rbsor", iters=30, omega=1.7),
    )
    return mesh, case


def test_explicit_step_matches_single_device(setup):
    mesh, case = setup
    step_ref = jax.jit(case.step)
    s_ref = case.state
    for _ in range(3):
        s_ref, m_ref = step_ref(s_ref, jnp.float32(1.0))

    step_ex = jax.jit(make_cavity_explicit_step(case.cfg, mesh))
    s_ex = shard_state(case.state, mesh)
    for _ in range(3):
        s_ex, m_ex = step_ex(s_ex, jnp.float32(1.0))

    np.testing.assert_allclose(np.asarray(s_ex.u), np.asarray(s_ref.u),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_ex.v), np.asarray(s_ref.v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_ex.p), np.asarray(s_ref.p),
                               rtol=1e-4, atol=1e-5)
    assert len(s_ex.u.sharding.device_set) == 8
    # reductions agree too
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy), rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    np.testing.assert_allclose(float(m_ex.div_pre), float(m_ref.div_pre), rtol=1e-4)


def test_cylinder_explicit_step_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cfdsim_tpu.cases import cylinder
    from cfdsim_tpu.parallel.explicit import make_cylinder_explicit_step

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = cylinder(
        nx=64, ny=32, Re=100.0,
        poisson=PoissonConfig(method="rbsor", iters=20, omega=1.7),
        cleanup_iters=0, warmup_steps=2, warmup_dt=1e-4, ibm_ramp_steps=10,
    )
    step_ref = jax.jit(case.step)
    s_ref = case.state
    for _ in range(4):
        s_ref, m_ref = step_ref(s_ref, jnp.float32(1.0))

    step_ex = jax.jit(make_cylinder_explicit_step(
        case.cfg, mesh, case.extras["ibm_mask"], v_inf=1.0))
    s_ex = shard_state(case.state, mesh)
    ibm_sh = jax.device_put(case.extras["ibm_mask"], NamedSharding(mesh, P("y", "x")))
    y_sh = jax.device_put(
        jnp.asarray(case.grid.y_coords(), jnp.float32), NamedSharding(mesh, P("y"))
    )
    for _ in range(4):
        s_ex, m_ex = step_ex(s_ex, jnp.float32(1.0), ibm_sh, y_sh)

    np.testing.assert_allclose(np.asarray(s_ex.u), np.asarray(s_ref.u),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_ex.v), np.asarray(s_ref.v),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy), rtol=1e-5)
    assert len(s_ex.u.sharding.device_set) == 8


def test_explicit_step_runs_many_steps_healthy(setup):
    mesh, case = setup
    step_ex = make_cavity_explicit_step(case.cfg, mesh)
    f = jax.jit(lambda s, c: jax.lax.scan(
        lambda st, _: step_ex(st, c), s, None, length=100))
    s = shard_state(case.state, mesh)
    s, m = f(s, jnp.float32(1.0))
    assert bool(jnp.all(jnp.isfinite(s.u)))
    assert float(np.asarray(m.max_vel)[-1]) <= 1.0 + 1e-3
