"""Staggered (MAC) incompressible solver: exact discrete projection,
Ghia accuracy, scheme options, runner compatibility.

The MAC tier is the accuracy upgrade over the reference's collocated
approximate projection (v5.py:375-441): divergence after correction must
be at solver precision, not O(0.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdsim_tpu.cases import lid_cavity_mac
from cfdsim_tpu.models import mac
from cfdsim_tpu.solvers.poisson import PoissonConfig
from cfdsim_tpu.validation import ghia_error_mac


def run_to(case, t_final, chunk=200):
    step = case.step

    def chunk_fn(s):
        def body(c, _):
            return step(c, jnp.float32(1.0))

        return jax.lax.scan(body, s, None, length=chunk)

    chunk_j = jax.jit(chunk_fn)
    s = case.state
    while float(s.t) < t_final:
        s, m = chunk_j(s)
    return s, m


def test_projection_is_exact():
    # with the DCT backend the corrected field is divergence-free to fp32
    # roundoff of the transform — orders of magnitude below the collocated
    # path's O(0.1) post-projection divergence
    case = lid_cavity_mac(n=32, Re=100.0)
    s, m = run_to(case, 1.0)
    assert float(jnp.max(m.div_post)) < 1e-4
    # relative to the pre-projection divergence it is machine-level
    assert float(jnp.max(m.div_post)) < 1e-4 * max(1.0, float(jnp.max(m.div_pre)))


def test_divergence_mac_adjoint_gradient():
    # div(grad phi) through the MAC pair equals the clamped-edge 5-point
    # Laplacian (the operator the Poisson solvers implement) on a field
    # with zero boundary-face gradient contributions
    from cfdsim_tpu.solvers.poisson import lap_neumann

    rng = np.random.RandomState(0)
    phi = jnp.asarray(rng.randn(12, 10), jnp.float32)
    dx, dy = 0.1, 0.07
    gu = jnp.pad((phi[:, 1:] - phi[:, :-1]) / dx, ((0, 0), (1, 1)))
    gv = jnp.pad((phi[1:, :] - phi[:-1, :]) / dy, ((1, 1), (0, 0)))
    div = mac.divergence_mac(gu, gv, dx, dy)
    lap = np.asarray(lap_neumann(phi, dx, dy))
    np.testing.assert_allclose(
        np.asarray(div), lap, rtol=0, atol=1e-5 * np.abs(lap).max()
    )


def test_ghia_cavity_64_re100():
    case = lid_cavity_mac(n=64, Re=100.0)
    s, _ = run_to(case, 30.0, chunk=500)
    eu, ev = ghia_error_mac(s.u, s.v, 100)
    # collocated path needs 128² for ~5e-3; MAC central is ~2e-3/4e-3 at 64²
    assert eu < 0.004 and ev < 0.006, (eu, ev)


@pytest.mark.parametrize("scheme", ["upwind", "tvd"])
def test_schemes_stable_and_sane(scheme):
    case = lid_cavity_mac(n=32, Re=400.0, scheme=scheme)
    s, m = run_to(case, 5.0)
    assert np.all(np.isfinite(np.asarray(s.u)))
    assert float(m.max_vel[-1]) < 1.5  # bounded by lid speed + margin
    # monotone upwind is more diffusive than tvd; both keep the cavity healthy
    assert float(m.energy[-1]) > 1e-4


def test_tvd_less_diffusive_than_upwind():
    su, _ = run_to(lid_cavity_mac(n=32, Re=400.0, scheme="upwind"), 8.0)
    st, _ = run_to(lid_cavity_mac(n=32, Re=400.0, scheme="tvd"), 8.0)
    sc, _ = run_to(lid_cavity_mac(n=32, Re=400.0, scheme="central"), 8.0)
    ucc_u, vcc_u = mac.center_velocities(su.u, su.v)
    ucc_t, vcc_t = mac.center_velocities(st.u, st.v)
    ucc_c, vcc_c = mac.center_velocities(sc.u, sc.v)
    e = lambda a, b: float(jnp.mean(0.5 * (a * a + b * b)))
    # kinetic energy ordering: upwind (most diffusive) < tvd <= ~central
    assert e(ucc_u, vcc_u) < e(ucc_t, vcc_t) <= e(ucc_c, vcc_c) * 1.05


def test_iterative_backends_work():
    # mg and rbsor share the clamped-edge operator, so they drop in
    case = lid_cavity_mac(n=32, Re=100.0, poisson=PoissonConfig(method="mg", iters=3))
    s, m = run_to(case, 0.5)
    assert np.all(np.isfinite(np.asarray(s.u)))
    assert float(jnp.max(m.div_post)) < 1.0  # iterative residual, not exact


def test_channel_bcs_poiseuille():
    # MAC channel: uniform inflow develops toward parabolic; mass conserved
    from cfdsim_tpu.grid import Grid
    from cfdsim_tpu.models.mac import MACConfig, channel_bcs, init_state, make_step

    nx, ny = 96, 24
    grid = Grid(nx=nx, ny=ny, x_max=4.0, y_max=1.0, centering="cell")
    cfg = MACConfig(grid=grid, nu=0.02, cfl_target=0.4,
                    dt_max=0.4 * grid.dy, max_velocity=10.0)
    bcs = channel_bcs(u_in=1.0)
    step = jax.jit(make_step(cfg, bcs))
    s = init_state(cfg)
    for _ in range(60):
        s, m = step(s, jnp.float32(1.0))
    assert np.all(np.isfinite(np.asarray(s.u)))
    # inflow and outflow mass flux agree (global continuity through the
    # exact projection)
    q_in = float(jnp.sum(s.u[:, 0])) * grid.dy
    q_out = float(jnp.sum(s.u[:, -1])) * grid.dy
    assert abs(q_out - q_in) < 0.05 * abs(q_in)


def test_runner_compatible():
    from cfdsim_tpu.runner import RunnerConfig, Simulation

    case = lid_cavity_mac(n=32, Re=100.0)
    cfg = RunnerConfig(t_final=0.3, chunk_steps=20, div_threshold=1e-2)
    sim = Simulation(case.step, case.state, cfg, case.grid.n_cells)
    state, report = sim.run()
    # the tight div_threshold only holds because the MAC projection is exact
    assert report["stopped_reason"] == ""
    assert float(state.t) >= 0.3


def test_cylinder_mac_healthy_with_exact_projection():
    # face-sampled IBM + TVD + exact projection: divergence stays at
    # solver precision even with penalization active
    from cfdsim_tpu.cases import cylinder_mac

    case = cylinder_mac(nx=96, ny=32, Re=100.0, ibm_ramp_steps=20,
                        perturb_ramp_steps=20)
    step = jax.jit(case.step)
    s = case.state
    for _ in range(80):
        s, m = step(s, jnp.float32(1.0))
    assert np.all(np.isfinite(np.asarray(s.u)))
    assert float(m.div_post) < 1e-4
    assert float(m.max_vel) < 3.0
    # the solid core is (nearly) stagnant under full-strength penalization
    core_u = np.asarray(s.u)[np.asarray(case.extras["ibm_mask_u"]) > 0.99]
    assert np.abs(core_u).max() < 0.15


def test_ibm_force_metrics_physical():
    # drag/lift from the penalization momentum sink: positive mean drag,
    # near-zero mean lift (symmetry), and drag decreasing from Re=40 to
    # Re=100 (the classic cylinder trend). Absolute values run high vs the
    # sharp-body literature because the Gaussian IBM shell enlarges the
    # effective body (documented in BENCHNOTES.md) — the reference never
    # measured forces at all.
    from cfdsim_tpu.cases import cylinder_mac

    def mean_forces(Re):
        case = cylinder_mac(nx=120, ny=40, Re=Re, ibm_ramp_steps=20,
                            perturb_ramp_steps=20)
        step = jax.jit(case.step)
        s = case.state
        fxs, fys = [], []
        for k in range(150):
            s, m = step(s, jnp.float32(1.0))
            if k >= 75:
                fxs.append(float(m.fx))
                fys.append(float(m.fy))
        return np.mean(fxs), np.mean(fys)

    fx40, fy40 = mean_forces(40.0)
    fx100, fy100 = mean_forces(100.0)
    assert fx40 > 0 and fx100 > 0
    assert abs(fy40) < 0.5 * fx40  # lift ~ 0 pre-shedding
    assert fx40 > fx100  # C_D decreases with Re in this regime


def test_mac_les_zero_for_rigid_rotation():
    # rigid-body rotation has zero strain rate: ν_t must vanish in the
    # interior (Galilean/rotation invariance of the Smagorinsky model)
    import numpy as np

    from cfdsim_tpu.models.mac import cavity_bcs, smagorinsky_viscosity_mac

    n = 32
    h = 1.0 / n
    xu = np.arange(n + 1) * h
    yu = (np.arange(n) + 0.5) * h
    xv = (np.arange(n) + 0.5) * h
    yv = np.arange(n + 1) * h
    omega = 2.0
    u = jnp.asarray(-omega * (yu[:, None] - 0.5) * np.ones((n, n + 1)),
                    jnp.float32)
    v = jnp.asarray(omega * (xv[None, :] - 0.5) * np.ones((n + 1, n)),
                    jnp.float32)
    ue = jnp.pad(u, ((1, 1), (0, 0)), mode="reflect")
    ue = ue.at[0, :].set(2 * u[0, :] - u[1, :])  # linear extrapolation
    ue = ue.at[-1, :].set(2 * u[-1, :] - u[-2, :])
    ve = jnp.pad(v, ((0, 0), (1, 1)), mode="reflect")
    ve = ve.at[:, 0].set(2 * v[:, 0] - v[:, 1])
    ve = ve.at[:, -1].set(2 * v[:, -1] - v[:, -2])
    nu_t = smagorinsky_viscosity_mac(u, v, ue, ve, h, h, cs=0.17)
    assert float(jnp.abs(nu_t).max()) < 1e-5


def test_mac_les_adds_dissipation_to_taylor_green():
    # with LES on, the Taylor–Green vortex loses kinetic energy faster
    # than the molecular-viscosity-only run (ν_t ≥ 0 everywhere)
    import numpy as np

    from cfdsim_tpu.grid import Grid
    from cfdsim_tpu.models import mac

    n = 48
    h = np.pi / n
    xu = np.arange(n + 1) * h
    yu = (np.arange(n) + 0.5) * h
    xv = (np.arange(n) + 0.5) * h
    yv = np.arange(n + 1) * h
    u0 = (np.sin(xu)[None, :] * np.cos(yu)[:, None]).astype(np.float32)
    v0 = (-np.cos(xv)[None, :] * np.sin(yv)[:, None]).astype(np.float32)

    def run(use_les):
        # tiny molecular ν so the eddy viscosity (ν_t ~ 2e-4 for this
        # resolved field) dominates the decay — LES adds little to an
        # already-resolved flow, which is the correct behavior
        cfg = mac.MACConfig(
            grid=Grid(nx=n, ny=n, x_max=np.pi, y_max=np.pi, centering="cell"),
            nu=1e-4, use_les=use_les, adaptive_dt=False, dt_base=2e-3,
            poisson=PoissonConfig(method="dct"),
        )
        step = mac.make_step(cfg, mac.free_slip_bcs())
        s = mac.init_state(cfg, u0=u0, v0=v0)
        s, ms = jax.jit(lambda s0: jax.lax.scan(
            lambda st, _: step(st, jnp.float32(1.0)), s0, None, length=400
        ))(s)
        assert bool(jnp.all(jnp.isfinite(s.u)))
        return float(np.asarray(ms.energy)[-1])

    e_plain = run(False)
    e_les = run(True)
    # LES measurably more dissipative (ΔE ≈ 9e-5 ≫ fp32 noise); the
    # implied extra decay rate 4·ν_t_eff must be of the ν_t ~ (C_s Δ)²|S|
    # order (≈1e-4 for this field), not wildly off
    assert e_les < e_plain - 3e-5
    nu_t_eff = float(np.log(e_plain / e_les)) / (4.0 * 400 * 2e-3)
    assert 1e-5 < nu_t_eff < 1e-3


def test_incremental_projection_consistent_with_chorin():
    """projection='incremental' (lagged-∇p predictor + increment solve):
    stays exactly divergence-free per step and converges to the same
    flow as the non-incremental scheme (the two differ by the O(dt)
    splitting defect only — the round-3 accuracy north-star fix)."""
    from cfdsim_tpu.cases import lid_cavity_mac

    states = {}
    for proj in ("chorin", "incremental"):
        case = lid_cavity_mac(n=48, Re=100.0, projection=proj)
        f = jax.jit(case.step)
        s = case.state
        for _ in range(200):
            s, m = f(s, jnp.float32(1.0))
        assert float(m.div_post) < 1e-4, proj
        assert bool(jnp.all(jnp.isfinite(s.u))), proj
        states[proj] = s
    # same flow to within the splitting defect O(dt·u)
    du = np.abs(np.asarray(states["chorin"].u)
                - np.asarray(states["incremental"].u)).max()
    assert du < 5e-2
    assert du > 0.0  # the schemes genuinely differ


def test_implicit_diffusion_matches_explicit_at_small_dt():
    """Crank–Nicolson viscous term via the mixed-basis fast
    diagonalization: at a dt far below the viscous limit the implicit
    and explicit steps agree to O(dt²); at 10x the explicit viscous
    limit the implicit step is stable where the physics demands it."""
    from cfdsim_tpu.cases import lid_cavity_mac

    n = 48
    nu = 1.0 / 100.0
    dt_visc = 0.2 / (n * n * nu)  # explicit stability bound

    def gap(dt, steps):
        ref = lid_cavity_mac(n=n, Re=100.0, adaptive_dt=False,
                             dt_base=dt)
        imp = lid_cavity_mac(n=n, Re=100.0, adaptive_dt=False,
                             dt_base=dt, diffusion="implicit")
        sr, si = ref.state, imp.state
        fr, fi = jax.jit(ref.step), jax.jit(imp.step)
        for _ in range(steps):
            sr, _ = fr(sr, jnp.float32(1.0))
            si, _ = fi(si, jnp.float32(1.0))
        return np.abs(np.asarray(sr.u) - np.asarray(si.u)).max()

    # the FE-vs-CN gap at fixed physical time is the FE temporal error
    # O(dt): it must shrink ~linearly under dt -> dt/4
    g1 = gap(0.08 * dt_visc, 50)
    g2 = gap(0.02 * dt_visc, 200)
    assert g1 < 0.05, g1
    assert g1 / g2 > 2.5, (g1, g2)

    # stability + steady-state equivalence well beyond the explicit
    # viscous bound: at Re=20 the advective CFL allows ~6x dt_visc
    # (implicit diffusion removes the viscous limit; advection remains
    # CFL-bound), and the steady state is dt-independent
    nu20 = 1.0 / 20.0
    dt_v20 = 0.2 / (n * n * nu20)

    def run_to(case, t_end):
        f = jax.jit(lambda s: jax.lax.scan(
            lambda st, _: case.step(st, jnp.float32(1.0)), s, None,
            length=500)[0])
        s = case.state
        while float(s.t) < t_end:
            s = f(s)
        _, m = jax.jit(case.step)(s, jnp.float32(1.0))
        return s, m

    big = lid_cavity_mac(n=n, Re=20.0, adaptive_dt=False,
                         dt_base=5.0 * dt_v20, diffusion="implicit",
                         projection="incremental")
    sb, m = run_to(big, 60.0)  # 3 viscous times: converged
    assert bool(jnp.all(jnp.isfinite(sb.u)))
    assert float(m.div_post) < 1e-4
    st = lid_cavity_mac(n=n, Re=20.0)  # explicit, viscous-limited dt
    se, _ = run_to(st, 60.0)
    # incremental pressure + CN diffusion: the steady state is
    # dt-INDEPENDENT to fp32 roundoff (measured 4.5e-7 at 5x dt_visc;
    # non-incremental implicit picks up an O(dt) corner defect ~0.04)
    du = np.abs(np.asarray(se.u) - np.asarray(sb.u)).max()
    assert du < 5e-5, du


def test_implicit_diffusion_free_slip_taylor_green():
    """Free-slip implicit kit on the Taylor–Green vortex: the analytic
    decay rate survives CN at 8x the explicit viscous limit."""
    from cfdsim_tpu.models import mac

    n = 32
    nu = 0.1
    L = np.pi
    grid = __import__("cfdsim_tpu.grid", fromlist=["Grid"]).Grid(
        nx=n, ny=n, x_max=L, y_max=L, centering="cell")
    dt_visc = 0.2 * (L / n) ** 2 / nu
    cfg = mac.MACConfig(grid=grid, nu=nu, adaptive_dt=False,
                        dt_base=4.0 * dt_visc, diffusion="implicit")
    kit = mac.free_slip_implicit_kit(grid)
    step = jax.jit(mac.make_step(cfg, mac.free_slip_bcs(),
                                 implicit_kit=kit))
    dx = dy = L / n
    xf = np.arange(n + 1) * dx
    yc = (np.arange(n) + 0.5) * dy
    xc = (np.arange(n) + 0.5) * dx
    yf = np.arange(n + 1) * dy
    # small amplitude: the FE-advection anti-diffusion (~A²dt/2) stays
    # well below ν, so the linear CN decay rate is what's measured
    A = 0.2
    u0 = A * np.sin(xf)[None, :] * np.cos(yc)[:, None]
    v0 = -A * np.cos(xc)[None, :] * np.sin(yf)[:, None]
    s = mac.init_state(cfg, u0=u0, v0=v0)
    e0 = t0 = None
    while float(s.t) < 0.5:
        s, m = step(s, jnp.float32(1.0))
        if e0 is None:
            e0, t0 = float(m.energy), float(s.t)
    rate = -np.log(float(m.energy) / e0) / (float(s.t) - t0)
    assert abs(rate - 4.0 * nu) / (4.0 * nu) < 0.05, rate
