"""The explicit shard_map MAC step (trimmed representation, ppermute
halos, masked-write BCs) must match the single-device mac.make_step on an
8-device mesh. This is the multi-chip path for the staggered accuracy
tier — the GSPMD route is blocked by the XLA uneven-shape miscompilation
(see test_parallel.py xfails)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import cylinder_mac, lid_cavity_mac
from cfdsim_tpu.parallel.mac_explicit import (
    make_cavity_mac_explicit_step,
    make_cylinder_mac_explicit_step,
    trim_face_masks,
)
from cfdsim_tpu.parallel.mac_sharded import shard_trimmed_state, trim_state
from cfdsim_tpu.parallel.mesh import make_grid_mesh
from cfdsim_tpu.solvers.poisson import PoissonConfig


@pytest.fixture(scope="module")
def mesh():
    return make_grid_mesh(8, topology=(2, 4))


def _run_pair(case, step_ex, mesh, extra=(), n_steps=5, seed=None):
    s_ref = case.state
    if seed is not None:
        rng = np.random.default_rng(seed)
        ny, nx = case.grid.ny, case.grid.nx
        s_ref = s_ref._replace(
            u=jnp.asarray(0.1 * rng.standard_normal((ny, nx + 1)), jnp.float32),
            v=jnp.asarray(0.1 * rng.standard_normal((ny + 1, nx)), jnp.float32),
        )
    step_ref = jax.jit(case.step)
    t = shard_trimmed_state(trim_state(s_ref), mesh)
    r = s_ref
    for _ in range(n_steps):
        t, m_ex = step_ex(t, jnp.float32(1.0), *extra)
        r, m_ref = step_ref(r, jnp.float32(1.0))
    return t, m_ex, r, m_ref


def _assert_equal(t, m_ex, r, m_ref, case, atol=1e-5):
    # compare the trimmed representations: the dropped boundary faces are
    # pure functions of these via set_normal (untrim_state would re-derive
    # them at the *post-step* counter, shifting a step-dependent inflow)
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :-1],
                               rtol=0, atol=atol)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:-1, :],
                               rtol=0, atol=atol)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=10 * atol)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.max_vel), float(m_ref.max_vel),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.div_pre), float(m_ref.div_pre),
                               rtol=1e-3, atol=10 * atol)
    np.testing.assert_allclose(float(m_ex.vort_max), float(m_ref.vort_max),
                               rtol=1e-4, atol=1e-4)
    assert len(t.u.sharding.device_set) == 8


def test_mac_explicit_cavity_rbsor_matches(mesh):
    case = lid_cavity_mac(
        n=32, Re=100.0, scheme="central",
        poisson=PoissonConfig(method="rbsor", iters=30, omega=1.7),
    )
    step_ex = make_cavity_mac_explicit_step(case.cfg, mesh)
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, seed=0)
    _assert_equal(t, m_ex, r, m_ref, case, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.poisson_res), float(m_ref.poisson_res),
                               rtol=1e-3, atol=1e-5)


def test_mac_explicit_cavity_tvd_dct_matches(mesh):
    # TVD (width-2 halos, limited slopes) + exact distributed DCT
    # projection: the sharded staggered tier keeps div_post at fp32 zero
    case = lid_cavity_mac(
        n=32, Re=400.0, scheme="tvd",
        poisson=PoissonConfig(method="dct"),
    )
    step_ex = make_cavity_mac_explicit_step(case.cfg, mesh)
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, seed=1)
    _assert_equal(t, m_ex, r, m_ref, case, atol=2e-5)
    assert float(m_ex.div_post) < 1e-3  # exact projection across the mesh


def test_mac_explicit_cavity_upwind_matches(mesh):
    case = lid_cavity_mac(
        n=32, Re=400.0, scheme="upwind",
        poisson=PoissonConfig(method="dct"),
    )
    step_ex = make_cavity_mac_explicit_step(case.cfg, mesh)
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, seed=2)
    _assert_equal(t, m_ex, r, m_ref, case, atol=2e-5)


def test_mac_explicit_cylinder_matches(mesh):
    # full external-flow config: perturbed inflow, mass-consistent
    # outflow, free-slip walls, face-sampled IBM + body-force metrics
    from jax.sharding import NamedSharding, PartitionSpec as P

    case = cylinder_mac(
        nx=64, ny=32, Re=100.0, scheme="tvd",
        domain=(24.0, 8.0), center=(8.0, 4.0), radius=0.75,
        poisson=PoissonConfig(method="dct"),
        ibm_ramp_steps=10, perturb_ramp_steps=10, warmup_steps=2,
        warmup_dt=1e-4,
    )
    mask_u_t, mask_v_t = trim_face_masks(
        case.extras["ibm_mask_u"], case.extras["ibm_mask_v"]
    )
    sh = NamedSharding(mesh, P("y", "x"))
    extra = (jax.device_put(mask_u_t, sh), jax.device_put(mask_v_t, sh))
    step_ex = make_cylinder_mac_explicit_step(
        case.cfg, mesh, v_inf=1.0, perturb_ramp_steps=10, ibm_ramp_steps=10
    )
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, extra=extra, n_steps=5)
    _assert_equal(t, m_ex, r, m_ref, case, atol=2e-5)
    # IBM body-force metrics agree (momentum sink of the penalization)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=1e-4, atol=1e-6)


def test_mac_explicit_soak_healthy(mesh):
    # 200 steps of chunked scan on the mesh: stays finite, exactly
    # divergence-free, lid speed bounded
    case = lid_cavity_mac(
        n=32, Re=100.0, scheme="central", poisson=PoissonConfig(method="dct"),
    )
    step_ex = make_cavity_mac_explicit_step(case.cfg, mesh)
    f = jax.jit(lambda s, c: jax.lax.scan(
        lambda st, _: step_ex(st, c), s, None, length=200))
    t = shard_trimmed_state(trim_state(case.state), mesh)
    t, m = f(t, jnp.float32(1.0))
    assert bool(jnp.all(jnp.isfinite(t.u)))
    assert float(np.asarray(m.div_post)[-1]) < 1e-3
    assert float(np.asarray(m.max_vel)[-1]) <= 1.0 + 1e-3


def test_mac_explicit_runner_soak_with_snapshots(mesh, tmp_path):
    # runner-driven multi-device MAC soak: chunked scan + periodic
    # snapshots of the sharded trimmed state + health checks
    from cfdsim_tpu.io_ import SnapshotWriter, list_steps
    from cfdsim_tpu.runner import RunnerConfig, Simulation

    case = lid_cavity_mac(
        n=32, Re=100.0, scheme="central", poisson=PoissonConfig(method="dct"),
    )
    step_ex = make_cavity_mac_explicit_step(case.cfg, mesh)
    writer = SnapshotWriter(tmp_path / "mac_soak.h5")

    def snapshot(state, step, t):
        writer.save(step, t, u=state.u, v=state.v, p=state.p)

    cfg = RunnerConfig(
        t_final=1e9, max_steps=600, chunk_steps=100, snapshot_interval=200,
        div_threshold=1e-2,  # the staggered projection is exact
    )
    t0 = shard_trimmed_state(trim_state(case.state), mesh)
    sim = Simulation(step_ex, t0, cfg, n_cells=32 * 32, snapshot_fn=snapshot)
    state, report = sim.run()
    assert int(state.step) == 600
    assert report["stopped_reason"] == ""
    assert len(list_steps(tmp_path / "mac_soak.h5")) >= 3
    assert len(state.u.sharding.device_set) == 8


def test_trim_face_masks_rejects_boundary_body():
    from cfdsim_tpu.grid import Grid
    from cfdsim_tpu.ibm import cylinder_masks_mac

    g = Grid(nx=32, ny=32, x_max=8.0, y_max=8.0, centering="cell")
    mu, mv = cylinder_masks_mac(g, center=(0.5, 4.0), radius=0.5)
    with pytest.raises(ValueError, match="boundary"):
        trim_face_masks(mu, mv)


@pytest.mark.parametrize("topo", [(1, 8), (8, 1), (4, 2)])
def test_mac_explicit_other_topologies(topo):
    # guard the x-split/y-split asymmetry bug class (the gather
    # miscompile surfaced only under x-splitting): every topology must
    # match the single-device step
    py, px = topo
    mesh = make_grid_mesh(8, topology=topo)
    case = lid_cavity_mac(
        n=32, Re=100.0, scheme="tvd", poisson=PoissonConfig(method="dct"),
    )
    step_ex = make_cavity_mac_explicit_step(case.cfg, mesh)
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, seed=3, n_steps=3)
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)


def test_mac_explicit_cavity_les_matches(mesh):
    # staggered Smagorinsky under sharding: ν_t window assembly, edge
    # replication, corner-ν averaging, flux-form diffusion, ν-aware dt
    case = lid_cavity_mac(
        n=32, Re=2000.0, scheme="tvd", use_les=True,
        poisson=PoissonConfig(method="dct"),
    )
    step_ex = make_cavity_mac_explicit_step(case.cfg, mesh)
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, seed=5)
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:-1, :],
                               rtol=0, atol=2e-5)
    # dt is ν_t-mean-dependent → psum reassociation tolerance
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)
