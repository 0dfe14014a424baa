"""Runner (health monitoring, CFL back-off, snapshots) and HDF5 I/O
round-trip + resume (SURVEY.md §5: checkpoint/resume the reference lacked)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import lid_cavity
from cfdsim_tpu.io_ import SnapshotWriter, list_steps, load_latest, load_step
from cfdsim_tpu.models.incompressible import init_state
from cfdsim_tpu.runner import RunnerConfig, Simulation


def test_simulation_runs_to_t_final(tmp_path):
    case = lid_cavity(n=32, Re=100.0)
    writer = SnapshotWriter(tmp_path / "cavity.h5")

    def snapshot(state, step, t):
        writer.save(step, t, u=state.u, v=state.v, p=state.p)

    cfg = RunnerConfig(
        t_final=0.5,
        chunk_steps=20,
        snapshot_interval=40,
        max_velocity=5.0,
        div_threshold=50.0,
    )
    sim = Simulation(case.step, case.state, cfg, case.grid.n_cells, snapshot)
    state, report = sim.run()
    assert float(state.t) >= 0.5
    assert report["total_steps"] > 0
    assert report["stopped_reason"] == ""
    steps = list_steps(tmp_path / "cavity.h5")
    assert len(steps) >= 2  # initial + at least one periodic snapshot
    fields, t = load_step(tmp_path / "cavity.h5", steps[-1])
    assert set(fields) == {"u", "v", "p"}
    assert np.all(np.isfinite(fields["u"]))


def test_resume_from_snapshot(tmp_path):
    case = lid_cavity(n=32, Re=100.0)
    writer = SnapshotWriter(tmp_path / "c.h5")

    def snapshot(state, step, t):
        writer.save(step, t, u=state.u, v=state.v, p=state.p)

    cfg = RunnerConfig(t_final=0.3, chunk_steps=20, snapshot_interval=20,
                       div_threshold=50.0)
    sim = Simulation(case.step, case.state, cfg, case.grid.n_cells, snapshot)
    state1, _ = sim.run()

    # resume: restore fields + step + t and continue
    fields, step, t = load_latest(tmp_path / "c.h5")
    resumed = init_state(case.cfg, u0=fields["u"], v0=fields["v"], p0=fields["p"])
    resumed = resumed._replace(t=jnp.float32(t), step=jnp.int32(step))
    cfg2 = RunnerConfig(t_final=0.6, chunk_steps=20, div_threshold=50.0)
    sim2 = Simulation(case.step, resumed, cfg2, case.grid.n_cells)
    state2, report2 = sim2.run()
    assert float(state2.t) >= 0.6
    assert int(state2.step) > step


def test_unhealthy_run_stops():
    # absurd velocity bound trips the health monitor immediately
    case = lid_cavity(n=32, Re=100.0)
    cfg = RunnerConfig(t_final=5.0, chunk_steps=10, max_velocity=1e-6,
                       on_unhealthy="stop")
    sim = Simulation(case.step, case.state, cfg, case.grid.n_cells)
    state, report = sim.run()
    assert "unhealthy" in report["stopped_reason"]
    assert float(state.t) < 5.0


def test_cfl_backoff_reduces_scale_then_stops():
    case = lid_cavity(n=32, Re=100.0)
    cfg = RunnerConfig(
        t_final=5.0, chunk_steps=10, max_velocity=1e-6,
        on_unhealthy="backoff", cfl_backoff=0.5, cfl_scale_min=0.3,
    )
    sim = Simulation(case.step, case.state, cfg, case.grid.n_cells)
    state, report = sim.run()
    assert sim.cfl_scale < 1.0  # back-off happened (cavity_flow_v1.py:481-488)
    assert "minimum CFL" in report["stopped_reason"]


def test_wall_clock_limit(monkeypatch):
    case = lid_cavity(n=32, Re=100.0)
    cfg = RunnerConfig(t_final=1e9, max_steps=10**9, chunk_steps=10,
                       wall_clock_limit_s=1e-9, div_threshold=50.0)
    sim = Simulation(case.step, case.state, cfg, case.grid.n_cells)
    state, report = sim.run()
    assert report["stopped_reason"] == "wall-clock limit"


def test_resume_is_bit_exact(tmp_path):
    # XLA determinism: restoring a snapshot and continuing must reproduce
    # the uninterrupted run exactly (fp32-exact snapshot round-trip)
    import jax

    from cfdsim_tpu.io_ import restore

    case = lid_cavity(n=24, Re=100.0)
    step = jax.jit(case.step)

    s = case.state
    for _ in range(10):
        s, _ = step(s, jnp.float32(1.0))
    w = SnapshotWriter(tmp_path / "ck.h5")
    w.save(int(s.step), float(s.t), u=s.u, v=s.v, p=s.p)
    s_cont = s
    for _ in range(5):
        s_cont, _ = step(s_cont, jnp.float32(1.0))

    s_res = restore(case.state, tmp_path / "ck.h5")
    for _ in range(5):
        s_res, _ = step(s_res, jnp.float32(1.0))

    np.testing.assert_array_equal(np.asarray(s_cont.u), np.asarray(s_res.u))
    np.testing.assert_array_equal(np.asarray(s_cont.p), np.asarray(s_res.p))


def test_snapshot_writer_skips_duplicates(tmp_path):
    w = SnapshotWriter(tmp_path / "d.h5")
    a = jnp.ones((4, 4))
    w.save(0, 0.0, u=a)
    w.save(0, 99.0, u=a * 2)  # duplicate step: kept as-is (reference behavior)
    fields, t = load_step(tmp_path / "d.h5", 0)
    assert t == 0.0
    np.testing.assert_allclose(fields["u"], 1.0)


def test_mac_runner_snapshot_restore_roundtrip(tmp_path):
    # the MAC and 3D-MAC states ride the same runner/io contract: snapshot
    # mid-run, restore, continue bit-exactly
    import jax

    from cfdsim_tpu.cases import cavity3d_mac, lid_cavity_mac
    from cfdsim_tpu.io_ import restore

    for case in (lid_cavity_mac(n=24, Re=100.0), cavity3d_mac(n=8, Re=100.0)):
        step = jax.jit(case.step)
        s = case.state
        for _ in range(8):
            s, _ = step(s, jnp.float32(1.0))
        w = SnapshotWriter(tmp_path / f"{case.name}.h5")
        fields = {k: getattr(s, k) for k in s._fields
                  if hasattr(getattr(s, k), "ndim") and getattr(s, k).ndim >= 2}
        w.save(int(s.step), float(s.t), **fields)
        s_cont = s
        for _ in range(4):
            s_cont, _ = step(s_cont, jnp.float32(1.0))
        s_res = restore(case.state, tmp_path / f"{case.name}.h5")
        for _ in range(4):
            s_res, _ = step(s_res, jnp.float32(1.0))
        for k in fields:
            np.testing.assert_array_equal(
                np.asarray(getattr(s_cont, k)), np.asarray(getattr(s_res, k)),
                err_msg=f"{case.name}.{k}",
            )


def test_fem_projection_snapshot_restore_roundtrip(tmp_path):
    # FEMState (incl. the projection scheme's phi warm-start carry)
    # rides the same snapshot/restore contract bit-exactly
    import jax

    from cfdsim_tpu.cases import build
    from cfdsim_tpu.io_ import restore

    case = build("cylinder_fem", re=80, h_far=0.5, h_near=0.12,
                 viz_shape=(24, 36), scheme="projection")
    step = jax.jit(case.step)
    s = case.state
    for _ in range(3):
        s, _ = step(s, 1.0)
    w = SnapshotWriter(tmp_path / "fem.h5")
    w.save(int(s.step), float(s.t), u=s.u, p=s.p, phi=s.phi)
    s_cont = s
    for _ in range(2):
        s_cont, _ = step(s_cont, 1.0)
    s_res = restore(case.state, tmp_path / "fem.h5")
    for _ in range(2):
        s_res, _ = step(s_res, 1.0)
    np.testing.assert_array_equal(np.asarray(s_cont.u), np.asarray(s_res.u))
    np.testing.assert_array_equal(np.asarray(s_cont.p), np.asarray(s_res.p))
