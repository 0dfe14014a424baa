"""The explicit shard_map stretched-MAC step (metric lookups by global
index + distributed FDM projection) must match the single-device
mac_stretched.make_step on an 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import cavity_stretched, cylinder_stretched
from cfdsim_tpu.parallel.mac_explicit import trim_face_masks
from cfdsim_tpu.parallel.mac_sharded import shard_trimmed_state, trim_state
from cfdsim_tpu.parallel.mac_stretched_explicit import (
    make_cavity_stretched_explicit_step,
    make_cylinder_stretched_explicit_step,
)
from cfdsim_tpu.parallel.mesh import make_grid_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_grid_mesh(8, topology=(2, 4))


def _run_pair(case, step_ex, mesh, extra=(), n_steps=5, seed=None):
    s_ref = case.state
    if seed is not None:
        rng = np.random.default_rng(seed)
        ny, nx = case.cfg.ny, case.cfg.nx
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


def _assert_equal(t, m_ex, r, m_ref, atol=2e-5):
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
    np.testing.assert_allclose(float(m_ex.vort_max), float(m_ref.vort_max),
                               rtol=1e-4, atol=1e-4)
    assert len(t.u.sharding.device_set) == 8


def test_stretched_explicit_cavity_central_matches(mesh):
    case = cavity_stretched(n=32, Re=100.0, beta=1.5, scheme="central")
    step_ex = make_cavity_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"]
    )
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, seed=0)
    _assert_equal(t, m_ex, r, m_ref)
    assert float(m_ex.div_post) < 1e-3  # exact distributed FDM projection


def test_stretched_explicit_cavity_tvd_matches(mesh):
    case = cavity_stretched(n=32, Re=400.0, beta=1.8, scheme="tvd")
    step_ex = make_cavity_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"]
    )
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, seed=1)
    _assert_equal(t, m_ex, r, m_ref)


def test_stretched_explicit_cavity_upwind_matches(mesh):
    case = cavity_stretched(n=32, Re=400.0, beta=1.3, scheme="upwind")
    step_ex = make_cavity_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"]
    )
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, seed=2)
    _assert_equal(t, m_ex, r, m_ref)


def test_stretched_explicit_cylinder_matches(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    case = cylinder_stretched(
        nx=64, ny=32, Re=100.0, scheme="tvd",
        domain=(24.0, 8.0), center=(8.0, 4.0), radius=0.75,
        ibm_ramp_steps=10, perturb_ramp_steps=10,
        warmup_steps=2, warmup_dt=1e-4,
    )
    mask_u_t, mask_v_t = trim_face_masks(
        case.extras["ibm_mask_u"], case.extras["ibm_mask_v"]
    )
    sh = NamedSharding(mesh, P("y", "x"))
    extra = (jax.device_put(mask_u_t, sh), jax.device_put(mask_v_t, sh))
    step_ex = make_cylinder_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"],
        v_inf=1.0, perturb_ramp_steps=10, ibm_ramp_steps=10,
    )
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, extra=extra, n_steps=5)
    _assert_equal(t, m_ex, r, m_ref)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("topo", [(1, 8), (8, 1), (4, 2)])
def test_stretched_explicit_other_topologies(topo):
    mesh = make_grid_mesh(8, topology=topo)
    case = cavity_stretched(n=32, Re=100.0, beta=1.5, scheme="central")
    step_ex = make_cavity_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"]
    )
    t, m_ex, r, m_ref = _run_pair(case, step_ex, mesh, seed=4, n_steps=3)
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)
