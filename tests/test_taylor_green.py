"""Taylor–Green vortex: analytic-solution validation of the MAC solver.

u =  sin x · cos y · e^{−2νt}
v = −cos x · sin y · e^{−2νt}        on  [0, π]², free-slip walls.

The nonlinear term is exactly balanced by the pressure gradient, so the
exact solution is a pure viscous decay — any discrepancy is discretization
error. This measures the MAC scheme's *formal convergence order*: with
dt ∝ h² (forward-Euler time error scales like the spatial error), the L2
error must fall ~4× per grid doubling (2nd order). The reference has no
analytic-accuracy harness at all; this is the BASELINE "accuracy"
north-star evidence for the staggered tier."""

import numpy as np
import jax
import jax.numpy as jnp


from cfdsim_tpu.models import mac
from cfdsim_tpu.solvers.poisson import PoissonConfig

PI = np.pi
NU = 0.1


def _tg_faces(n):
    """Analytic TG fields sampled at MAC face locations on [0, π]²."""
    h = PI / n
    xu = np.arange(n + 1) * h            # u-face x
    yu = (np.arange(n) + 0.5) * h        # u-face y
    xv = (np.arange(n) + 0.5) * h
    yv = np.arange(n + 1) * h
    u = np.sin(xu)[None, :] * np.cos(yu)[:, None]
    v = -np.cos(xv)[None, :] * np.sin(yv)[:, None]
    return u.astype(np.float32), v.astype(np.float32)


def _run_tg(n, t_final):
    h = PI / n
    dt = 0.1 * h * h / NU  # well inside the viscous bound; O(dt) = O(h²)
    n_steps = int(round(t_final / dt))
    cfg = mac.MACConfig(
        grid=__import__("cfdsim_tpu.grid", fromlist=["Grid"]).Grid(
            nx=n, ny=n, x_max=PI, y_max=PI, centering="cell"
        ),
        nu=NU,
        scheme="central",
        poisson=PoissonConfig(method="dct"),
        adaptive_dt=False,
        dt_base=dt,
        compute_metrics=True,
    )
    bcs = mac.free_slip_bcs()
    step = mac.make_step(cfg, bcs)
    u0, v0 = _tg_faces(n)
    state = mac.init_state(cfg, u0=u0, v0=v0)

    def chunk(s, _):
        s, m = step(s, jnp.float32(1.0))
        return s, m.div_post

    state, divs = jax.jit(
        lambda s: jax.lax.scan(chunk, s, None, length=n_steps)
    )(state)
    t = n_steps * dt
    ue, ve = _tg_faces(n)
    decay = np.exp(-2.0 * NU * t)
    err_u = np.asarray(state.u) - ue * decay
    err_v = np.asarray(state.v) - ve * decay
    l2 = np.sqrt(np.mean(err_u**2) + np.mean(err_v**2))
    return l2, float(np.max(np.asarray(divs)))


def test_taylor_green_second_order_convergence():
    t_final = 0.5
    e16, div16 = _run_tg(16, t_final)
    e32, div32 = _run_tg(32, t_final)
    e64, div64 = _run_tg(64, t_final)
    r1 = e16 / e32
    r2 = e32 / e64
    # 2nd order: ratio 4 per doubling (allow fp32 floor / constant slack)
    assert 3.0 < r1 < 5.5, (e16, e32, e64)
    assert 2.8 < r2 < 5.5, (e16, e32, e64)
    # absolute accuracy at 64²: the analytic field is O(1)
    assert e64 < 3e-4
    # the projection stayed exact throughout
    assert max(div16, div32, div64) < 5e-4


def test_taylor_green_energy_decay_rate():
    # kinetic energy decays as e^{−4νt}; check the measured rate at 48²
    n, t_final = 48, 0.4
    h = PI / n
    dt = 0.1 * h * h / NU
    n_steps = int(round(t_final / dt))
    from cfdsim_tpu.grid import Grid

    cfg = mac.MACConfig(
        grid=Grid(nx=n, ny=n, x_max=PI, y_max=PI, centering="cell"),
        nu=NU, scheme="central", poisson=PoissonConfig(method="dct"),
        adaptive_dt=False, dt_base=dt,
    )
    step = mac.make_step(cfg, mac.free_slip_bcs())
    u0, v0 = _tg_faces(n)
    s = mac.init_state(cfg, u0=u0, v0=v0)
    s, ms = jax.jit(lambda s0: jax.lax.scan(
        lambda st, _: step(st, jnp.float32(1.0)), s0, None, length=n_steps
    ))(s)
    e = np.asarray(ms.energy)
    rate = np.log(e[0] / e[-1]) / ((n_steps - 1) * dt)
    np.testing.assert_allclose(rate, 4.0 * NU, rtol=0.02)


def _run_tg_fixed(n, dt, t_final, time_scheme, scheme="central"):
    """Fixed-dt TG run; returns final (u, v) arrays."""
    from cfdsim_tpu.grid import Grid

    cfg = mac.MACConfig(
        grid=Grid(nx=n, ny=n, x_max=PI, y_max=PI, centering="cell"),
        nu=NU, scheme=scheme, poisson=PoissonConfig(method="dct"),
        adaptive_dt=False, dt_base=dt, time_scheme=time_scheme,
        compute_metrics=True,
    )
    step = mac.make_step(cfg, mac.free_slip_bcs())
    u0, v0 = _tg_faces(n)
    s = mac.init_state(cfg, u0=u0, v0=v0)

    def body(s, _):
        s2, m = step(s, jnp.float32(1.0))
        return s2, m.div_post

    n_steps = int(round(t_final / dt))
    s, div = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=n_steps)
    )(s)
    return np.asarray(s.u), np.asarray(s.v), float(jnp.max(div))


def test_rk2_temporal_order():
    """Heun (time_scheme="rk2") vs forward Euler, measured by temporal
    refinement against a tiny-dt reference ON THE SAME GRID (isolates
    the time error from the h² spatial error): Euler must halve its
    error per dt halving (1st order), RK2 at the same dt must sit ≥20×
    below Euler (its dt² term is already at the fp32 floor here), and
    the stage-averaged field must stay exactly projected."""
    T = 0.512
    ur, vr, _ = _run_tg_fixed(32, 1e-3, T, "rk2")

    def err(ts, dt):
        u, v, divmax = _run_tg_fixed(32, dt, T, ts)
        e = np.sqrt(np.mean((u - ur) ** 2) + np.mean((v - vr) ** 2))
        return e, divmax

    e_eu1, _ = err("euler", 0.016)
    e_eu2, _ = err("euler", 0.008)
    assert 1.7 < e_eu1 / e_eu2 < 2.4  # clean 1st order (measured 2.04)
    e_rk, div_rk = err("rk2", 0.016)
    assert e_rk < 0.05 * e_eu1  # measured ~50x below Euler
    assert div_rk < 1e-5  # average of solenoidal stages is solenoidal


def test_rk2_mac3d_smoke():
    """3D habitat: the rk2 option on mac3d stays finite, exactly
    projected, and closer to the analytic TG box decay than Euler at
    the same coarse dt."""
    from cfdsim_tpu.grid import Grid3D
    from cfdsim_tpu.models import mac3d

    n = 16
    h = PI / n

    def run3d(ts):
        cfg = mac3d.MAC3DConfig(
            grid=Grid3D(nx=n, ny=n, nz=n, x_max=PI, y_max=PI, z_max=PI,
                        centering="cell"),
            nu=NU, scheme="central", time_scheme=ts,
            adaptive_dt=False, dt_base=0.02, compute_metrics=True,
        )
        step = jax.jit(mac3d.make_step(cfg, mac3d.free_slip_bcs3d()))
        xu = np.arange(n + 1) * h
        yc = (np.arange(n) + 0.5) * h
        zc = (np.arange(n) + 0.5) * h
        u0 = (np.sin(xu)[None, None, :] * np.cos(yc)[None, :, None]
              * np.cos(zc)[:, None, None]).astype(np.float32)
        xv = (np.arange(n) + 0.5) * h
        yf = np.arange(n + 1) * h
        v0 = (-np.cos(xv)[None, None, :] * np.sin(yf)[None, :, None]
              * np.cos(zc)[:, None, None]).astype(np.float32)
        s = mac3d.init_state(cfg)._replace(
            u=jnp.asarray(u0), v=jnp.asarray(v0)
        )
        for _ in range(10):
            s, m = step(s, jnp.float32(1.0))
        return s, m

    s_rk, m_rk = run3d("rk2")
    assert bool(jnp.isfinite(s_rk.u).all())
    assert float(m_rk.div_post) < 1e-4
