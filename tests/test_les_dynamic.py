"""Dynamic Smagorinsky (Germano–Lilly) model tests — ops/les_dynamic.py
and the mac3d ``les_model="dynamic"`` path.

The property under test is the one the dynamic procedure exists for
(beyond the reference's static-C_s model, v5.py:96-110): the
coefficient vanishes on smooth, well-resolved fields (where static
Smagorinsky over-damps) and activates on grid-scale content.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cfdsim_tpu.ops.les_dynamic import box_filter_3d, dynamic_coefficient_3d


def _tgv_centers(n, h, k=1.0):
    xc = (np.arange(n) + 0.5) * h
    u = (np.sin(k * xc)[None, None, :] * np.cos(k * xc)[None, :, None]
         * np.cos(k * xc)[:, None, None])
    v = (-np.cos(k * xc)[None, None, :] * np.sin(k * xc)[None, :, None]
         * np.cos(k * xc)[:, None, None])
    w = np.zeros((n, n, n))
    return (jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32),
            jnp.asarray(w, jnp.float32))


def test_box_filter_preserves_constants_and_smooths():
    f = jnp.full((8, 9, 10), 3.25, jnp.float32)
    assert float(jnp.abs(box_filter_3d(f) - 3.25).max()) < 1e-6
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((16, 16, 16)), jnp.float32)
    gf = box_filter_3d(g)
    assert float(gf.std()) < float(g.std())  # removes grid-scale noise
    # convex average: bounded by the input range
    assert float(gf.max()) <= float(g.max()) + 1e-6
    assert float(gf.min()) >= float(g.min()) - 1e-6


def test_dynamic_coefficient_small_on_resolved_field():
    # single-mode TGV at 32³: ~32 points per wavelength — essentially
    # fully resolved, so the Germano coefficient must come out far
    # below the static (0.17Δ)² prescription (it measures ~1e-8·Δ²)
    n = 32
    h = np.pi / n
    uc, vc, wc = _tgv_centers(n, h)
    c = float(dynamic_coefficient_3d(uc, vc, wc, h, h, h))
    c_static = (0.17**2) * h * h
    assert c < 0.02 * c_static, (c, c_static)


def test_dynamic_coefficient_activates_on_grid_scale_content():
    # broadband random field: energy at the grid scale → the model
    # must switch on (well above the resolved-field level), and the
    # clip must bound it by (0.3Δ)²
    n = 32
    h = np.pi / n
    rng = np.random.default_rng(1)
    uc = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    c = float(dynamic_coefficient_3d(uc, vc, wc, h, h, h))
    delta_sq = h * h
    assert 0.0 <= c <= (0.3**2) * delta_sq * (1.0 + 1e-5)  # fp32 clip
    # effective C_s well above the resolved-field level (~1e-4 there);
    # white noise is not Kolmogorov turbulence, so no 0.17 expectation —
    # the property under test is activation, not calibration
    cs_eff = np.sqrt(c / delta_sq)
    assert cs_eff > 0.02, cs_eff
    # and orders of magnitude above the resolved TGV mode
    uc_t, vc_t, wc_t = _tgv_centers(n, h)
    c_tgv = float(dynamic_coefficient_3d(uc_t, vc_t, wc_t, h, h, h))
    assert c > 100.0 * max(c_tgv, 1e-12), (c, c_tgv)


def test_dynamic_les_step_switches_off_in_laminar_shear():
    # decaying parallel shear u = cos(z) in the free-slip [0,π]³ box:
    # the nonlinear term vanishes exactly (u·∇u = 0), so this is the
    # canonical laminar state where static Smagorinsky over-damps
    # (|S| = |sin z| ≠ 0 → ν_t > 0) while the Germano contraction is
    # identically zero (for any parallel shear, the deviatoric
    # gradient Gram matrix is orthogonal to S: L·M ≡ 0) → the dynamic
    # model must track the molecular-ν decay
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.models import mac3d

    n = 24
    h = np.pi / n
    zc = (np.arange(n) + 0.5) * h
    u0 = np.broadcast_to(
        np.cos(zc)[:, None, None], (n, n, n + 1)
    ).astype(np.float32)

    def run(use_les, les_model="smagorinsky"):
        cfg = mac3d.MAC3DConfig(
            grid=Grid3D(nx=n, ny=n, nz=n, x_max=np.pi, y_max=np.pi,
                        z_max=np.pi, centering="cell"),
            nu=1e-3, use_les=use_les, les_model=les_model,
            adaptive_dt=False, dt_base=4e-3,
        )
        step = mac3d.make_step(cfg, mac3d.free_slip_bcs3d())
        s = mac3d.init_state(cfg)._replace(u=jnp.asarray(u0))
        s, ms = jax.jit(lambda s0: jax.lax.scan(
            lambda st, _: step(st, jnp.float32(1.0)), s0, None, length=150
        ))(s)
        assert bool(jnp.all(jnp.isfinite(s.u)))
        return float(np.asarray(ms.energy)[-1])

    e_plain = run(False)
    e_static = run(True, "smagorinsky")
    e_dynamic = run(True, "dynamic")
    # static dissipates visibly; dynamic must sit within 10% of that
    # static-model energy drop from the no-model curve
    drop_static = e_plain - e_static
    drop_dynamic = e_plain - e_dynamic
    assert drop_static > 1e-5
    assert drop_dynamic < 0.1 * drop_static, (drop_dynamic, drop_static)
    assert drop_dynamic > -1e-6  # never anti-dissipative (clip at 0)


def test_dynamic_les_step_stable_on_tgv_transition():
    # under-resolved TGV at Re=10⁴, 24³: vortex stretching steepens
    # gradients immediately — the dynamic model must activate (c > 0),
    # stay on the clip range, and keep the run stable and solenoidal
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.models import mac3d

    n = 24
    h = np.pi / n
    xf = np.arange(n + 1) * h
    xc = (np.arange(n) + 0.5) * h
    u0 = (np.sin(xf)[None, None, :] * np.cos(xc)[None, :, None]
          * np.cos(xc)[:, None, None]).astype(np.float32)
    v0 = (-np.cos(xc)[None, None, :] * np.sin(xf)[None, :, None]
          * np.cos(xc)[:, None, None]).astype(np.float32)

    cfg = mac3d.MAC3DConfig(
        grid=Grid3D(nx=n, ny=n, nz=n, x_max=np.pi, y_max=np.pi,
                    z_max=np.pi, centering="cell"),
        nu=1e-4, use_les=True, les_model="dynamic",
        adaptive_dt=False, dt_base=4e-3,
    )
    step = mac3d.make_step(cfg, mac3d.free_slip_bcs3d())
    s = mac3d.init_state(cfg)._replace(u=jnp.asarray(u0), v=jnp.asarray(v0))
    s, ms = jax.jit(lambda s0: jax.lax.scan(
        lambda st, _: step(st, jnp.float32(1.0)), s0, None, length=150
    ))(s)
    assert bool(jnp.all(jnp.isfinite(s.u)))
    assert float(np.asarray(ms.div_post)[-1]) < 1e-3
    e = np.asarray(ms.energy)
    assert e[-1] < 0.125  # dissipating
    assert e[-1] > 0.8 * 0.125  # not blowing energy away either


def test_dynamic_les_stretched_uniform_matches_mac3d():
    # with uniform faces the stretched dynamic-LES step must reproduce
    # the uniform mac3d dynamic-LES step (metric degeneration + the
    # same Germano quotient — boundary_skip excludes the frame where
    # the two gradient clamps differ)
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.models import mac3d
    from cfdsim_tpu.models import mac_stretched3d as ms3

    n = 16
    nu = 1e-3
    cfg_u = mac3d.MAC3DConfig(
        grid=Grid3D(nx=n, ny=n, nz=n, x_max=1.0, y_max=1.0, z_max=1.0,
                    centering="cell"),
        nu=nu, use_les=True, les_model="dynamic",
    )
    xf = np.linspace(0.0, 1.0, n + 1)
    cfg_s = ms3.StretchedMAC3DConfig(
        nx=n, ny=n, nz=n, nu=nu, use_les=True, les_model="dynamic",
        cfl_target=cfg_u.cfl_target, dt_max=cfg_u.dt_max,
        max_velocity=cfg_u.max_velocity,
    )
    step_u = jax.jit(mac3d.make_step(cfg_u, mac3d.cavity3d_bcs(1.0)))
    step_s = jax.jit(ms3.make_step(cfg_s, ms3.cavity3d_bcs(1.0),
                                   xf, xf, xf))
    su = mac3d.init_state(cfg_u)
    ss = ms3.init_state(cfg_s)
    for _ in range(5):
        su, mu = step_u(su, jnp.float32(1.0))
        ss, ms_ = step_s(ss, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(ss.u), np.asarray(su.u),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ss.w), np.asarray(su.w),
                               rtol=0, atol=3e-5)
    np.testing.assert_allclose(float(ms_.energy), float(mu.energy),
                               rtol=1e-4)


def test_dynamic_les_stretched_nonuniform_runs():
    # wall-clustered 3D cavity with the dynamic model: builds, steps,
    # stays finite and exactly projected (the local-Δ² identity path)
    from cfdsim_tpu.cases import cavity3d_stretched

    case = cavity3d_stretched(n=16, Re=1000.0, beta=1.5, use_les=True,
                              les_model="dynamic")
    f = jax.jit(case.step)
    s = case.state
    for _ in range(10):
        s, m = f(s, jnp.float32(1.0))
    assert bool(jnp.all(jnp.isfinite(s.u)))
    assert float(m.div_post) < 5e-3
    assert 0.0 < float(m.energy) < 0.5


def test_dynamic_les_model_builds_on_sharded_step():
    """The uniform sharded 3D MAC step now SUPPORTS les_model='dynamic'
    (round 4: width-3 halo windows + psum'd Lilly quotient; equality
    tests in test_mac3d_explicit/test_ghost_explicit) — building it must
    not raise. (The stretched sharded tier gained static+dynamic LES the
    same round — equality-tested in test_mac3d_explicit.)"""
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.models import mac3d
    from cfdsim_tpu.parallel.mac3d_explicit import (
        make_cavity3d_mac_explicit_step,
    )
    from cfdsim_tpu.parallel.mesh import make_grid_mesh

    cfg = mac3d.MAC3DConfig(
        grid=Grid3D(nx=16, ny=16, nz=16, x_max=1.0, y_max=1.0, z_max=1.0,
                    centering="cell"),
        nu=1e-3, use_les=True, les_model="dynamic",
    )
    mesh = make_grid_mesh(len(jax.devices()))
    make_cavity3d_mac_explicit_step(cfg, mesh)  # must not raise
