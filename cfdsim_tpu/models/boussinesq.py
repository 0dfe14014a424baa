"""Boussinesq natural convection on the staggered (MAC) grid.

Buoyancy-driven flow — the two-way-coupled extension of the passive
transport module (models/transport.py is one-way): temperature feeds back
into the momentum equation as a buoyancy force. Non-dimensionalized with
the thermal-diffusion velocity scale α/L (the standard benchmark form):

    ∂u/∂t + u·∇u = −∇p + Pr ∇²u + Ra·Pr·θ ĵ
    ∂θ/∂t + u·∇θ = ∇²θ

on the unit square: hot wall θ=1 at x=0, cold wall θ=0 at x=1, adiabatic
top/bottom, no-slip everywhere. Validated against the de Vahl Davis
(1983) benchmark (tests/test_boussinesq.py): average hot-wall Nusselt
number Nu = 1.118 at Ra=10³ and 2.243 at Ra=10⁴.

Discretization: MAC faces (exactly divergence-free projection via the
DCT solve), conservative upwind/central FV advection of θ at cell
centers with face velocities, buoyancy sampled at v-faces. The reference
has no buoyancy-coupled solver at all; this is a capability extension of
its transport/temperature ambitions (SURVEY §2.1 diagnostics)."""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from cfdsim_tpu.grid import Grid
from cfdsim_tpu.models import mac
from cfdsim_tpu.solvers.poisson import PoissonConfig, solve_poisson


class BoussinesqState(NamedTuple):
    u: jax.Array      # (ny, nx+1)
    v: jax.Array      # (ny+1, nx)
    p: jax.Array      # (ny, nx)
    theta: jax.Array  # (ny, nx) cell-centered temperature
    t: jax.Array
    step: jax.Array


class BoussinesqMetrics(NamedTuple):
    dt: jax.Array
    div_post: jax.Array
    max_vel: jax.Array
    energy: jax.Array
    nu_hot_wall: jax.Array  # avg Nusselt from the hot-wall gradient
    nu_mid: jax.Array       # avg Nusselt at the x=1/2 plane (2nd order)
    theta_min: jax.Array
    theta_max: jax.Array

    # runner/monitor interface passthrough
    @property
    def div_pre(self):
        return self.div_post

    @property
    def vort_max(self):
        return jnp.float32(0.0)

    @property
    def poisson_res(self):
        return jnp.float32(0.0)


@dataclasses.dataclass(frozen=True)
class BoussinesqConfig:
    grid: Grid
    rayleigh: float
    prandtl: float = 0.71
    theta_scheme: str = "central"  # central | upwind
    flow_scheme: str = "central"
    poisson: PoissonConfig = PoissonConfig(method="dct")
    adaptive_dt: bool = True
    cfl_target: float = 0.4
    dt_base: float = 1e-4
    dt_min: float = 1e-9
    dt_max: float = 1.0
    theta_hot: float = 1.0
    theta_cold: float = 0.0
    # "x": differentially heated side walls (hot at x=0 — the de Vahl
    # Davis cavity); "y": heated from below (hot at y=0 — Rayleigh–Bénard,
    # critical Ra = 1708 for rigid-rigid boundaries)
    heated_axis: str = "x"


def init_state(cfg: BoussinesqConfig, theta0=None) -> BoussinesqState:
    g = cfg.grid
    ny, nx = g.ny, g.nx
    if theta0 is None:
        # conducting initial temperature profile (linear hot→cold along
        # the heated axis)
        if cfg.heated_axis == "x":
            c = (jnp.arange(nx, dtype=jnp.float32) + 0.5) * g.dx / (
                g.x_max - g.x_min
            )
            prof = cfg.theta_hot + (cfg.theta_cold - cfg.theta_hot) * c
            theta0 = jnp.broadcast_to(prof[None, :], (ny, nx))
        else:
            c = (jnp.arange(ny, dtype=jnp.float32) + 0.5) * g.dy / (
                g.y_max - g.y_min
            )
            prof = cfg.theta_hot + (cfg.theta_cold - cfg.theta_hot) * c
            theta0 = jnp.broadcast_to(prof[:, None], (ny, nx))
    return BoussinesqState(
        u=jnp.zeros((ny, nx + 1), jnp.float32),
        v=jnp.zeros((ny + 1, nx), jnp.float32),
        p=jnp.zeros((ny, nx), jnp.float32),
        theta=jnp.asarray(theta0, jnp.float32),
        t=jnp.float32(0.0),
        step=jnp.int32(0),
    )


def _theta_ghost(theta, hot: float, cold: float, heated_axis: str = "x"):
    """(ny+2, nx+2) ghost-extended θ: Dirichlet on the heated pair of
    walls (ghost = 2θ_wall − interior, cell-centered mirror), adiabatic
    on the other pair. heated_axis="x": hot left / cold right (de Vahl
    Davis); "y": hot bottom / cold top (Rayleigh–Bénard)."""
    te = jnp.pad(theta, ((1, 1), (1, 1)))
    if heated_axis == "x":
        te = te.at[1:-1, 0].set(2.0 * hot - theta[:, 0])
        te = te.at[1:-1, -1].set(2.0 * cold - theta[:, -1])
        te = te.at[0, :].set(te[1, :])      # adiabatic bottom
        te = te.at[-1, :].set(te[-2, :])    # adiabatic top
    else:
        te = te.at[0, 1:-1].set(2.0 * hot - theta[0, :])
        te = te.at[-1, 1:-1].set(2.0 * cold - theta[-1, :])
        te = te.at[:, 0].set(te[:, 1])      # adiabatic left
        te = te.at[:, -1].set(te[:, -2])    # adiabatic right
    return te


def make_step(cfg: BoussinesqConfig) -> Callable:
    if cfg.theta_scheme not in ("central", "upwind"):
        raise ValueError(f"unknown theta_scheme {cfg.theta_scheme!r}")
    if cfg.heated_axis not in ("x", "y"):
        raise ValueError(f"unknown heated_axis {cfg.heated_axis!r}")
    g = cfg.grid
    dx, dy = g.dx, g.dy
    if cfg.poisson.dct_variant == "auto":
        # pin the autotuned DCT variant eagerly (see mac.make_step)
        import dataclasses as _dc

        from cfdsim_tpu.solvers.autotune import resolve_poisson_config

        cfg = _dc.replace(cfg, poisson=resolve_poisson_config(
            cfg.poisson, (g.ny, g.nx), dx, dy))
    nu = cfg.prandtl            # Pr in α-units
    buoy = cfg.rayleigh * cfg.prandtl
    bcs = mac.cavity_bcs(lid_velocity=0.0)  # all-no-slip closed box
    h = min(dx, dy)

    def step(state: BoussinesqState, cfl_scale):
        u, v = bcs.set_normal(state.u, state.v)
        theta = state.theta
        ue, ve = bcs.extend(u, v)

        # --- dt: convective CFL + the tighter of the two diffusivities
        # (κ = 1 in these units always ≥ stability-binds when Pr < 1)
        if cfg.adaptive_dt:
            vel_max = jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v))), 1e-10
            )
            dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
            dt_diff = 0.2 * h * h / max(nu, 1.0)
            dt = jnp.clip(jnp.minimum(dt_cfl, dt_diff), cfg.dt_min, cfg.dt_max)
            dt = dt.astype(jnp.float32)
        else:
            dt = jnp.float32(cfg.dt_base)

        # --- momentum predictor (MAC central/upwind/tvd + buoyancy)
        conv_u, conv_v = mac._advect(u, v, ue, ve, dx, dy, cfg.flow_scheme)
        lap_u, lap_v = mac._diffuse(ue, ve, dx, dy)
        # buoyancy at interior v-faces: θ averaged to the face
        th_face = 0.5 * (theta[:-1, :] + theta[1:, :])  # (ny−1, nx)
        u_star = u.at[:, 1:-1].add(dt * (nu * lap_u - conv_u))
        v_star = v.at[1:-1, :].add(
            dt * (nu * lap_v - conv_v + buoy * th_face)
        )
        u_star, v_star = bcs.set_normal(u_star, v_star)

        # --- exact projection
        div_star = mac.divergence_mac(u_star, v_star, dx, dy)
        rhs = div_star / dt
        if cfg.poisson.method not in ("dct", "fft"):
            rhs = rhs - jnp.mean(rhs)
        phi = solve_poisson(state.p, rhs, dx, dy, cfg.poisson)
        u_new = u_star.at[:, 1:-1].add(
            -dt * (phi[:, 1:] - phi[:, :-1]) * (1.0 / dx)
        )
        v_new = v_star.at[1:-1, :].add(
            -dt * (phi[1:, :] - phi[:-1, :]) * (1.0 / dy)
        )
        u_new, v_new = bcs.set_normal(u_new, v_new)

        # --- temperature: conservative FV advection with the projected
        # face velocities + diffusion (κ = 1)
        te = _theta_ghost(theta, cfg.theta_hot, cfg.theta_cold,
                          cfg.heated_axis)
        if cfg.theta_scheme == "upwind":
            thx = jnp.where(u_new >= 0.0, te[1:-1, :-1], te[1:-1, 1:])
            thy = jnp.where(v_new >= 0.0, te[:-1, 1:-1], te[1:, 1:-1])
        else:
            thx = 0.5 * (te[1:-1, :-1] + te[1:-1, 1:])
            thy = 0.5 * (te[:-1, 1:-1] + te[1:, 1:-1])
        fx = u_new * thx  # (ny, nx+1); wall faces carry u=0 → no flux
        fy = v_new * thy  # (ny+1, nx)
        adv = (fx[:, 1:] - fx[:, :-1]) * (1.0 / dx) + (
            fy[1:, :] - fy[:-1, :]
        ) * (1.0 / dy)
        lap_t = (te[1:-1, 2:] - 2.0 * theta + te[1:-1, :-2]) * (1.0 / dx**2) + (
            te[2:, 1:-1] - 2.0 * theta + te[:-2, 1:-1]
        ) * (1.0 / dy**2)
        theta_new = theta + dt * (lap_t - adv)

        new_state = BoussinesqState(
            u=u_new, v=v_new, p=phi, theta=theta_new,
            t=state.t + dt, step=state.step + 1,
        )

        # --- diagnostics: average Nusselt at the hot wall (ghost-gradient)
        # and through the domain mid-plane (2nd-order flux integral)
        div_post = mac.divergence_mac(u_new, v_new, dx, dy)
        dT = cfg.theta_hot - cfg.theta_cold
        # normalize by the conduction flux dT/L of the heated axis so
        # Nu = 1 in pure conduction for ANY domain extents
        lx = g.x_max - g.x_min
        ly = g.y_max - g.y_min
        if cfg.heated_axis == "x":
            nu_hot = jnp.mean(
                2.0 * (cfg.theta_hot - theta_new[:, 0]) / dx
            ) * lx / dT
            i_mid = g.nx // 2  # u-face index at mid-x (even nx)
            th_mid = 0.5 * (theta_new[:, i_mid - 1] + theta_new[:, i_mid])
            dth_mid = (theta_new[:, i_mid] - theta_new[:, i_mid - 1]) * (
                1.0 / dx
            )
            nu_mid = jnp.sum(u_new[:, i_mid] * th_mid - dth_mid) * dy * lx / (
                dT * ly
            )
        else:
            nu_hot = jnp.mean(
                2.0 * (cfg.theta_hot - theta_new[0, :]) / dy
            ) * ly / dT
            j_mid = g.ny // 2  # v-face row at mid-y
            th_mid = 0.5 * (theta_new[j_mid - 1, :] + theta_new[j_mid, :])
            dth_mid = (theta_new[j_mid, :] - theta_new[j_mid - 1, :]) * (
                1.0 / dy
            )
            nu_mid = jnp.sum(v_new[j_mid, :] * th_mid - dth_mid) * dx * ly / (
                dT * lx
            )
        ucc, vcc = mac.center_velocities(u_new, v_new)
        metrics = BoussinesqMetrics(
            dt=dt,
            div_post=jnp.max(jnp.abs(div_post)),
            max_vel=jnp.maximum(jnp.max(jnp.abs(u_new)), jnp.max(jnp.abs(v_new))),
            energy=jnp.mean(0.5 * (ucc * ucc + vcc * vcc)),
            nu_hot_wall=nu_hot,
            nu_mid=nu_mid,
            theta_min=jnp.min(theta_new),
            theta_max=jnp.max(theta_new),
        )
        return new_state, metrics

    return step
