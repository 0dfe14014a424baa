"""The explicit shard_map 3D MAC step (trimmed state, y/x ppermute halos,
distributed 3D DCT projection) must match the single-device mac3d step on
an 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cfdsim_tpu.cases import cavity3d_mac
from cfdsim_tpu.parallel.mac3d_explicit import (
    make_cavity3d_mac_explicit_step,
    shard_trimmed_state3d,
    trim_state3d,
)
from cfdsim_tpu.parallel.mesh import make_grid_mesh


@pytest.fixture(scope="module")
def mesh():
    return make_grid_mesh(8, topology=(2, 4))


def test_mac3d_explicit_matches_single_device(mesh):
    n = 16
    case = cavity3d_mac(n=n, Re=100.0)
    rng = np.random.default_rng(0)
    s_ref = case.state._replace(
        u=jnp.asarray(0.1 * rng.standard_normal((n, n, n + 1)), jnp.float32),
        v=jnp.asarray(0.1 * rng.standard_normal((n, n + 1, n)), jnp.float32),
        w=jnp.asarray(0.1 * rng.standard_normal((n + 1, n, n)), jnp.float32),
    )
    step_ref = jax.jit(case.step)
    step_ex = make_cavity3d_mac_explicit_step(case.cfg, mesh)
    t = shard_trimmed_state3d(trim_state3d(s_ref), mesh)
    r = s_ref
    for _ in range(4):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.max_vel), float(m_ref.max_vel),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.vort_max), float(m_ref.vort_max),
                               rtol=1e-4, atol=1e-4)
    assert float(m_ex.div_post) < 1e-3  # exact distributed 3D projection
    assert len(t.u.sharding.device_set) == 8


@pytest.mark.parametrize(
    "scheme,use_les",
    [("upwind", False), ("tvd", False), ("central", True), ("tvd", True)],
)
def test_mac3d_explicit_schemes_les_match_single_device(mesh, scheme, use_les):
    """Width-2 window path: upwind/van-Leer-MUSCL advection and the 3D
    Smagorinsky LES tier must match the single-device mac3d step (LES
    runs carry one psum'd ν_t mean into dt, so equality is to roundoff,
    not bitwise)."""
    n = 16
    case = cavity3d_mac(n=n, Re=500.0, scheme=scheme, use_les=use_les)
    rng = np.random.default_rng(1)
    s_ref = case.state._replace(
        u=jnp.asarray(0.1 * rng.standard_normal((n, n, n + 1)), jnp.float32),
        v=jnp.asarray(0.1 * rng.standard_normal((n, n + 1, n)), jnp.float32),
        w=jnp.asarray(0.1 * rng.standard_normal((n + 1, n, n)), jnp.float32),
    )
    step_ref = jax.jit(case.step)
    step_ex = make_cavity3d_mac_explicit_step(case.cfg, mesh)
    t = shard_trimmed_state3d(trim_state3d(s_ref), mesh)
    r = s_ref
    for _ in range(4):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=3e-4)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)


def test_mac3d_explicit_cavity_develops(mesh):
    # 30 steps from rest: lid-driven flow develops, divergence-free, no
    # blow-up (z-ghost lid handling + projection under sharding)
    case = cavity3d_mac(n=16, Re=400.0)
    step_ex = make_cavity3d_mac_explicit_step(case.cfg, mesh)
    f = jax.jit(lambda s, c: jax.lax.scan(
        lambda st, _: step_ex(st, c), s, None, length=30))
    t = shard_trimmed_state3d(trim_state3d(case.state), mesh)
    t, m = f(t, jnp.float32(1.0))
    assert bool(jnp.all(jnp.isfinite(t.u)))
    assert float(np.asarray(m.div_post)[-1]) < 1e-3
    assert 0.0 < float(np.asarray(m.energy)[-1]) < 0.5
    assert float(np.asarray(m.max_vel)[-1]) <= 1.0 + 1e-3


def test_mac3d_stretched_explicit_matches_single_device(mesh):
    # the last cell of the multi-chip solver matrix: 3D wall-clustered
    # stretched MAC with the distributed 3D FDM projection
    from cfdsim_tpu.cases import cavity3d_stretched
    from cfdsim_tpu.parallel.mac_stretched3d_explicit import (
        make_cavity3d_stretched_explicit_step,
    )

    n = 16
    case = cavity3d_stretched(n=n, Re=100.0, beta=1.5)
    rng = np.random.default_rng(1)
    s_ref = case.state._replace(
        u=jnp.asarray(0.1 * rng.standard_normal((n, n, n + 1)), jnp.float32),
        v=jnp.asarray(0.1 * rng.standard_normal((n, n + 1, n)), jnp.float32),
        w=jnp.asarray(0.1 * rng.standard_normal((n + 1, n, n)), jnp.float32),
    )
    step_ref = jax.jit(case.step)
    step_ex = make_cavity3d_stretched_explicit_step(
        case.cfg, mesh,
        case.extras["x_faces"], case.extras["y_faces"], case.extras["z_faces"],
    )
    t = shard_trimmed_state3d(trim_state3d(s_ref), mesh)
    r = s_ref
    for _ in range(4):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.vort_max), float(m_ref.vort_max),
                               rtol=1e-4, atol=1e-4)
    assert float(m_ex.div_post) < 5e-3  # exact distributed FDM projection
    assert len(t.u.sharding.device_set) == 8


@pytest.mark.parametrize("scheme", ["central", "tvd"])
def test_sphere_explicit_matches_single_device(mesh, scheme):
    """External-flow BCs (Dirichlet inflow, psum'd mass-consistent
    outflow, free-slip far field) + 3D IBM penalization: the sharded
    sphere step must match the single-device sphere case, forces
    included."""
    from cfdsim_tpu.cases import sphere_mac3d
    from cfdsim_tpu.parallel.mac3d_explicit import (
        make_sphere_mac3d_explicit_step,
        trim_face_masks3d,
    )

    case = sphere_mac3d(
        nx=32, ny=16, nz=16, Re=100.0, domain=(8.0, 4.0, 4.0),
        center=(2.0, 2.0, 2.0), scheme=scheme, ibm_ramp_steps=4,
        compute_metrics=True,
    )
    step_ref = jax.jit(case.step)
    step_ex = make_sphere_mac3d_explicit_step(
        case.cfg, mesh, v_inf=case.extras["v_inf"], ibm_ramp_steps=4
    )
    masks_t = trim_face_masks3d(*case.extras["ibm_masks"])
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, "y", "x"))
    masks_t = tuple(jax.device_put(m, sh) for m in masks_t)

    t = shard_trimmed_state3d(trim_state3d(case.state), mesh)
    r = case.state
    for _ in range(6):
        t, m_ex = step_ex(t, jnp.float32(1.0), *masks_t)
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fz), float(m_ref.fz),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.max_vel), float(m_ref.max_vel),
                               rtol=1e-5)
    assert float(m_ex.fx) > 0.0
    assert len(t.u.sharding.device_set) == 8


def test_sphere_stretched_explicit_matches_single_device(mesh):
    """Sharded stretched-3D external flow + IBM (the sphere_stretched
    case on the central scheme): area-weighted psum'd outflow balance,
    dynamic-sliced metric volumes in the force accounting — must match
    the single-device mac_stretched3d step, forces included."""
    from cfdsim_tpu.cases import sphere_stretched
    from cfdsim_tpu.parallel.mac3d_explicit import trim_face_masks3d
    from cfdsim_tpu.parallel.mac_stretched3d_explicit import (
        make_sphere3d_stretched_explicit_step,
    )

    case = sphere_stretched(
        nx=32, ny=16, nz=16, Re=100.0, domain=(8.0, 4.0, 4.0),
        center=(2.0, 2.0, 2.0), scheme="central", refine_strength=1.5,
        refine_width=1.0, wake_length=2.0, ibm_ramp_steps=4,
        compute_metrics=True,
    )
    step_ref = jax.jit(case.step)
    step_ex = make_sphere3d_stretched_explicit_step(
        case.cfg, mesh, case.extras["x_faces"], case.extras["y_faces"],
        case.extras["z_faces"], v_inf=case.extras["v_inf"],
        ibm_ramp_steps=4,
    )
    masks_t = trim_face_masks3d(*case.extras["ibm_masks"])
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(None, "y", "x"))
    masks_t = tuple(jax.device_put(m, sh) for m in masks_t)

    t = shard_trimmed_state3d(trim_state3d(case.state), mesh)
    r = case.state
    for _ in range(6):
        t, m_ex = step_ex(t, jnp.float32(1.0), *masks_t)
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=3e-4)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-6)
    np.testing.assert_allclose(float(m_ex.fx), float(m_ref.fx),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fy), float(m_ref.fy),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_ex.fz), float(m_ref.fz),
                               rtol=2e-4, atol=1e-6)
    assert float(m_ex.fx) > 0.0
    assert len(t.u.sharding.device_set) == 8


def _multimode_faces(n, seed, amp=0.5, noise=0.05):
    """Low-k multi-mode + mild noise face fields — under-resolved enough
    that the Germano contraction yields a NONZERO coefficient (white
    noise alone gives negative <LM> which clips to 0 and would let a
    silently-dead contraction pass the equality test)."""
    rng = np.random.default_rng(seed)

    def f(shape, sd):
        r = np.random.default_rng(sd)
        zc = (np.arange(shape[0]) + 0.5) / n
        yc = (np.arange(shape[1]) + 0.5) / n
        xc = (np.arange(shape[2]) + 0.5) / n
        z, y, x = np.meshgrid(zc, yc, xc, indexing="ij")
        out = np.zeros(shape)
        for k in range(1, 6):
            out += (amp / k) * (
                np.sin(2 * np.pi * k * x + r.uniform(0, 6))
                * np.cos(2 * np.pi * k * y + r.uniform(0, 6))
                * np.cos(2 * np.pi * k * z + r.uniform(0, 6))
            )
        return out + noise * rng.standard_normal(shape)

    return (
        jnp.asarray(f((n, n, n + 1), seed + 10), jnp.float32),
        jnp.asarray(f((n, n + 1, n), seed + 20), jnp.float32),
        jnp.asarray(f((n + 1, n, n), seed + 30), jnp.float32),
    )


def test_mac3d_explicit_dynamic_les_matches_single_device(mesh):
    """Dynamic Germano-Lilly LES sharded: the Lilly integrand rides
    width-3 face halos (exact ±2-center windows) and the volume-averaged
    quotient reduces with psum, so C_s² — a global fp32 contraction —
    matches single-device to partial-sum rounding, not bitwise."""
    from cfdsim_tpu.models.mac3d import center_velocities_3d
    from cfdsim_tpu.ops.les_dynamic import dynamic_cs2_3d

    n = 16
    case = cavity3d_mac(n=n, Re=2000.0, scheme="central", use_les=True,
                        les_model="dynamic")
    u0, v0, w0 = _multimode_faces(n, seed=7)
    s_ref = case.state._replace(u=u0, v=v0, w=w0)

    # guard: the chosen field must actually engage the coefficient
    uc, vc, wc = center_velocities_3d(u0, v0, w0)
    dx = case.cfg.grid.dx
    cs2 = dynamic_cs2_3d(uc, vc, wc, 0.5 / dx, 0.5 / dx, 0.5 / dx, dx * dx)
    assert float(cs2) > 1e-5

    step_ref = jax.jit(case.step)
    step_ex = make_cavity3d_mac_explicit_step(case.cfg, mesh)
    t = shard_trimmed_state3d(trim_state3d(s_ref), mesh)
    r = s_ref
    for _ in range(4):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)
    assert len(t.u.sharding.device_set) == 8


def test_mac3d_explicit_dynamic_les_guards(mesh):
    from cfdsim_tpu.models.mac3d import MAC3DConfig
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.solvers.poisson3d import Poisson3DConfig

    # nz (unsharded) too small for boundary_skip=3
    cfg = MAC3DConfig(
        grid=Grid3D(nx=16, ny=16, nz=6, centering="cell"), nu=1e-3,
        poisson=Poisson3DConfig(method="dct"), use_les=True,
        les_model="dynamic",
    )
    with pytest.raises(ValueError, match="too small"):
        make_cavity3d_mac_explicit_step(cfg, mesh)

    # local blocks too narrow for the width-3 halo windows (8/4 = 2)
    case = cavity3d_mac(n=8, Re=100.0, use_les=True, les_model="dynamic")
    with pytest.raises(ValueError, match="width-3"):
        make_cavity3d_mac_explicit_step(case.cfg, mesh)


def test_sphere_explicit_dynamic_les_matches_single_device(mesh):
    """Sharded penalization-IBM sphere with les_model='dynamic': the
    contraction excludes body cells via halo'd trimmed face masks (the
    f32-mask twin of the ghost solid-mask path)."""
    from cfdsim_tpu.cases import sphere_mac3d
    from cfdsim_tpu.models.mac3d import center_velocities_3d
    from cfdsim_tpu.ops.les_dynamic import (
        dynamic_cs2_3d,
        ibm_fluid_mask_centers,
    )
    from cfdsim_tpu.parallel.mac3d_explicit import (
        make_sphere_mac3d_explicit_step,
        trim_face_masks3d,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    case = sphere_mac3d(
        nx=32, ny=16, nz=16, Re=500.0, domain=(8.0, 4.0, 4.0),
        center=(2.0, 2.0, 2.0), scheme="tvd", ibm_ramp_steps=4,
        compute_metrics=True, use_les=True, les_model="dynamic",
    )
    rng = np.random.default_rng(33)

    def modes(shape, sd, amp=0.3):
        r = np.random.default_rng(sd)
        z = (np.arange(shape[0]) + 0.5) / shape[0]
        y = (np.arange(shape[1]) + 0.5) / shape[1]
        x = (np.arange(shape[2]) + 0.5) / shape[2]
        Z, Y, X = np.meshgrid(z, y, x, indexing="ij")
        out = np.zeros(shape)
        for k in range(1, 6):
            out += (amp / k) * (
                np.sin(2 * np.pi * k * X + r.uniform(0, 6))
                * np.cos(2 * np.pi * k * Y + r.uniform(0, 6))
                * np.cos(2 * np.pi * k * Z + r.uniform(0, 6))
            )
        return out + 0.03 * rng.standard_normal(shape)

    s0 = case.state
    s_ref = s0._replace(
        u=s0.u + jnp.asarray(modes(s0.u.shape, 51), jnp.float32),
        v=s0.v + jnp.asarray(modes(s0.v.shape, 52), jnp.float32),
        w=s0.w + jnp.asarray(modes(s0.w.shape, 53), jnp.float32),
    )
    mu, mv, mw = case.extras["ibm_masks"]
    fluid = ibm_fluid_mask_centers(mu, mv, mw)
    uc, vc, wc = center_velocities_3d(s_ref.u, s_ref.v, s_ref.w)
    dx = case.cfg.grid.dx
    cs2 = dynamic_cs2_3d(uc, vc, wc, 0.5 / dx, 0.5 / dx, 0.5 / dx,
                         dx * dx, mask=fluid)
    assert float(cs2) > 1e-5

    step_ref = jax.jit(case.step)
    step_ex = make_sphere_mac3d_explicit_step(
        case.cfg, mesh, v_inf=case.extras["v_inf"], ibm_ramp_steps=4
    )
    masks_t = trim_face_masks3d(mu, mv, mw)
    sh = NamedSharding(mesh, P(None, "y", "x"))
    masks_t = tuple(jax.device_put(m, sh) for m in masks_t)
    t = shard_trimmed_state3d(trim_state3d(s_ref), mesh)
    r = s_ref
    for _ in range(4):
        t, m_ex = step_ex(t, jnp.float32(1.0), *masks_t)
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.p), np.asarray(r.p),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    assert len(t.u.sharding.device_set) == 8


@pytest.mark.parametrize("les_model", ["smagorinsky", "dynamic"])
def test_mac3d_stretched_explicit_les_matches_single_device(mesh, les_model):
    """Stretched sharded LES (round 4): window-based ν_t on the
    nonuniform metrics + flux-form variable-ν diffusion must match the
    single-device mac_stretched3d step; the dynamic variant adds the
    psum'd Lilly quotient on stretched inv_g2 / Δ²(x) metric slices."""
    from cfdsim_tpu.cases import cavity3d_stretched
    from cfdsim_tpu.parallel.mac_stretched3d_explicit import (
        make_cavity3d_stretched_explicit_step,
    )

    n = 16
    case = cavity3d_stretched(n=n, Re=2000.0, beta=1.5, use_les=True,
                              les_model=les_model)
    u0, v0, w0 = _multimode_faces(n, seed=3)
    s_ref = case.state._replace(u=u0, v=v0, w=w0)
    if les_model == "dynamic":
        # the contraction must engage: compute single-device cs2 > 0
        from cfdsim_tpu.models.mac_stretched3d import _metrics
        from cfdsim_tpu.ops.les_dynamic import dynamic_cs2_3d

        mx = _metrics(case.extras["x_faces"])
        my = _metrics(case.extras["y_faces"])
        mz = _metrics(case.extras["z_faces"])

        def g2(m):
            xg = np.concatenate([[m.xc[0]], m.xc, [m.xc[-1]]])
            return jnp.asarray(1.0 / (xg[2:] - xg[:-2]), jnp.float32)

        uc = 0.5 * (u0[:, :, 1:] + u0[:, :, :-1])
        vc = 0.5 * (v0[:, 1:, :] + v0[:, :-1, :])
        wc = 0.5 * (w0[1:] + w0[:-1])
        d2 = jnp.asarray(
            (mz.h[:, None, None] * my.h[None, :, None]
             * mx.h[None, None, :]) ** (2.0 / 3.0), jnp.float32)
        cs2 = dynamic_cs2_3d(
            uc, vc, wc, g2(mx)[None, None, :], g2(my)[None, :, None],
            g2(mz)[:, None, None], d2)
        assert float(cs2) > 1e-5

    step_ref = jax.jit(case.step)
    step_ex = make_cavity3d_stretched_explicit_step(
        case.cfg, mesh,
        case.extras["x_faces"], case.extras["y_faces"],
        case.extras["z_faces"],
    )
    t = shard_trimmed_state3d(trim_state3d(s_ref), mesh)
    r = s_ref
    for _ in range(4):
        t, m_ex = step_ex(t, jnp.float32(1.0))
        r, m_ref = step_ref(r, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(t.u), np.asarray(r.u)[:, :, :-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.v), np.asarray(r.v)[:, :-1, :],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.w), np.asarray(r.w)[:-1],
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(float(m_ex.dt), float(m_ref.dt), rtol=1e-5)
    np.testing.assert_allclose(float(m_ex.energy), float(m_ref.energy),
                               rtol=1e-5)
    assert len(t.u.sharding.device_set) == 8
