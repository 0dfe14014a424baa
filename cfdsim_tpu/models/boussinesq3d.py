"""3D Boussinesq natural convection on the staggered (MAC) grid.

The differentially heated cube: hot wall θ=1 at x=0, cold wall θ=0 at
x=1, adiabatic elsewhere, no-slip everywhere, gravity in −z (buoyancy
Ra·Pr·θ on the w faces). Same α-scale non-dimensionalization as the 2D
module (models/boussinesq.py). Validated against the Tric, Labrosse &
Betrouni (2000) spectral benchmark for the air-filled cube
(tests/test_boussinesq.py / BENCHNOTES): Nu = 2.054 at Ra=10⁴ and 4.337
at Ra=10⁵.

Discretization: mac3d faces (exact 3D DCT projection), conservative FV
θ advection with face velocities, 7-point θ diffusion with one ghost
layer per side (Dirichlet x, adiabatic y/z)."""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from cfdsim_tpu.grid import Grid3D
from cfdsim_tpu.models import mac3d
from cfdsim_tpu.models.boussinesq import BoussinesqMetrics
from cfdsim_tpu.solvers.poisson3d import Poisson3DConfig, solve_poisson_3d


class Boussinesq3DState(NamedTuple):
    u: jax.Array      # (nz, ny, nx+1)
    v: jax.Array      # (nz, ny+1, nx)
    w: jax.Array      # (nz+1, ny, nx)
    p: jax.Array      # (nz, ny, nx)
    theta: jax.Array  # (nz, ny, nx)
    t: jax.Array
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class Boussinesq3DConfig:
    grid: Grid3D
    rayleigh: float
    prandtl: float = 0.71
    theta_scheme: str = "central"  # central | upwind
    flow_scheme: str = "central"   # central | upwind | tvd (mac3d.advect3d)
    poisson: Poisson3DConfig = Poisson3DConfig(method="dct")
    adaptive_dt: bool = True
    cfl_target: float = 0.4
    dt_base: float = 1e-4
    dt_min: float = 1e-9
    dt_max: float = 1.0
    theta_hot: float = 1.0
    theta_cold: float = 0.0


def init_state(cfg: Boussinesq3DConfig, theta0=None) -> Boussinesq3DState:
    g = cfg.grid
    nz, ny, nx = g.nz, g.ny, g.nx
    if theta0 is None:
        c = (jnp.arange(nx, dtype=jnp.float32) + 0.5) * g.dx / (
            g.x_max - g.x_min
        )
        prof = cfg.theta_hot + (cfg.theta_cold - cfg.theta_hot) * c
        theta0 = jnp.broadcast_to(prof[None, None, :], (nz, ny, nx))
    return Boussinesq3DState(
        u=jnp.zeros((nz, ny, nx + 1), jnp.float32),
        v=jnp.zeros((nz, ny + 1, nx), jnp.float32),
        w=jnp.zeros((nz + 1, ny, nx), jnp.float32),
        p=jnp.zeros((nz, ny, nx), jnp.float32),
        theta=jnp.asarray(theta0, jnp.float32),
        t=jnp.float32(0.0),
        step=jnp.int32(0),
    )


def _theta_ghost3d(theta, hot: float, cold: float):
    """(nz+2, ny+2, nx+2) ghost-extended θ: Dirichlet x walls (mirror),
    adiabatic y and z walls (copy)."""
    te = jnp.pad(theta, 1)
    te = te.at[1:-1, 1:-1, 0].set(2.0 * hot - theta[:, :, 0])
    te = te.at[1:-1, 1:-1, -1].set(2.0 * cold - theta[:, :, -1])
    te = te.at[:, 0, :].set(te[:, 1, :])
    te = te.at[:, -1, :].set(te[:, -2, :])
    te = te.at[0, :, :].set(te[1, :, :])
    te = te.at[-1, :, :].set(te[-2, :, :])
    return te


def make_step(cfg: Boussinesq3DConfig) -> Callable:
    if cfg.theta_scheme not in ("central", "upwind"):
        raise ValueError(f"unknown theta_scheme {cfg.theta_scheme!r}")
    g = cfg.grid
    dx, dy, dz = g.dx, g.dy, g.dz
    nu = cfg.prandtl
    buoy = cfg.rayleigh * cfg.prandtl
    h = min(dx, dy, dz)
    bcs = mac3d.cavity3d_bcs(lid_velocity=0.0)  # all-no-slip closed box

    def step(state: Boussinesq3DState, cfl_scale):
        u, v, w = bcs.set_normal(state.u, state.v, state.w)
        theta = state.theta

        if cfg.adaptive_dt:
            vel_max = jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v))),
                jnp.maximum(jnp.max(jnp.abs(w)), 1e-10),
            )
            dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
            dt_diff = 0.125 * h * h / max(nu, 1.0)
            dt = jnp.clip(
                jnp.minimum(dt_cfl, dt_diff), cfg.dt_min, cfg.dt_max
            ).astype(jnp.float32)
        else:
            dt = jnp.float32(cfg.dt_base)

        ghosts = bcs.ghosts(u, v, w)
        conv_u, conv_v, conv_w = mac3d.advect3d(
            u, v, w, ghosts, dx, dy, dz, cfg.flow_scheme
        )
        lap_u, lap_v, lap_w = mac3d.diffuse3d(u, v, w, ghosts, dx, dy, dz)
        ax, ay, az = 1.0 / dx**2, 1.0 / dy**2, 1.0 / dz**2

        # buoyancy on interior w-faces: θ averaged across the z-face
        th_face = 0.5 * (theta[:-1] + theta[1:])  # (nz−1, ny, nx)
        u_star = u.at[:, :, 1:-1].add(dt * (nu * lap_u - conv_u))
        v_star = v.at[:, 1:-1, :].add(dt * (nu * lap_v - conv_v))
        w_star = w.at[1:-1].add(
            dt * (nu * lap_w - conv_w + buoy * th_face)
        )
        u_star, v_star, w_star = bcs.set_normal(u_star, v_star, w_star)

        # --- exact 3D projection
        div_star = mac3d.divergence_mac3d(u_star, v_star, w_star, dx, dy, dz)
        rhs = div_star / dt
        if cfg.poisson.method != "dct":
            rhs = rhs - jnp.mean(rhs)  # Neumann solvability (mac3d.make_step)
        phi = solve_poisson_3d(state.p, rhs, dx, dy, dz, cfg.poisson)
        u_new = u_star.at[:, :, 1:-1].add(
            -dt * (phi[:, :, 1:] - phi[:, :, :-1]) * (1.0 / dx)
        )
        v_new = v_star.at[:, 1:-1, :].add(
            -dt * (phi[:, 1:, :] - phi[:, :-1, :]) * (1.0 / dy)
        )
        w_new = w_star.at[1:-1].add(-dt * (phi[1:] - phi[:-1]) * (1.0 / dz))
        u_new, v_new, w_new = bcs.set_normal(u_new, v_new, w_new)

        # --- temperature FV advection + diffusion
        te = _theta_ghost3d(theta, cfg.theta_hot, cfg.theta_cold)
        if cfg.theta_scheme == "upwind":
            thx = jnp.where(u_new >= 0.0, te[1:-1, 1:-1, :-1], te[1:-1, 1:-1, 1:])
            thy = jnp.where(v_new >= 0.0, te[1:-1, :-1, 1:-1], te[1:-1, 1:, 1:-1])
            thz = jnp.where(w_new >= 0.0, te[:-1, 1:-1, 1:-1], te[1:, 1:-1, 1:-1])
        else:
            thx = 0.5 * (te[1:-1, 1:-1, :-1] + te[1:-1, 1:-1, 1:])
            thy = 0.5 * (te[1:-1, :-1, 1:-1] + te[1:-1, 1:, 1:-1])
            thz = 0.5 * (te[:-1, 1:-1, 1:-1] + te[1:, 1:-1, 1:-1])
        fx = u_new * thx
        fy = v_new * thy
        fz = w_new * thz
        adv = (
            (fx[:, :, 1:] - fx[:, :, :-1]) * (1.0 / dx)
            + (fy[:, 1:, :] - fy[:, :-1, :]) * (1.0 / dy)
            + (fz[1:] - fz[:-1]) * (1.0 / dz)
        )
        lap_t = (
            (te[1:-1, 1:-1, 2:] - 2.0 * theta + te[1:-1, 1:-1, :-2]) * ax
            + (te[1:-1, 2:, 1:-1] - 2.0 * theta + te[1:-1, :-2, 1:-1]) * ay
            + (te[2:, 1:-1, 1:-1] - 2.0 * theta + te[:-2, 1:-1, 1:-1]) * az
        )
        theta_new = theta + dt * (lap_t - adv)

        new_state = Boussinesq3DState(
            u=u_new, v=v_new, w=w_new, p=phi, theta=theta_new,
            t=state.t + dt, step=state.step + 1,
        )

        # --- diagnostics (BoussinesqMetrics reused; Nu normalized by the
        # hot-wall conduction flux, unit-extent aware)
        div_post = mac3d.divergence_mac3d(u_new, v_new, w_new, dx, dy, dz)
        dT = cfg.theta_hot - cfg.theta_cold
        lx = g.x_max - g.x_min
        nu_hot = jnp.mean(
            2.0 * (cfg.theta_hot - theta_new[:, :, 0]) / dx
        ) * lx / dT
        i_mid = g.nx // 2
        th_mid = 0.5 * (theta_new[:, :, i_mid - 1] + theta_new[:, :, i_mid])
        dth_mid = (theta_new[:, :, i_mid] - theta_new[:, :, i_mid - 1]) * (
            1.0 / dx
        )
        area = dy * dz
        plane = (g.y_max - g.y_min) * (g.z_max - g.z_min)
        nu_mid = jnp.sum(u_new[:, :, i_mid] * th_mid - dth_mid) * area * lx / (
            dT * plane
        )
        ucc, vcc, wcc = mac3d.center_velocities_3d(u_new, v_new, w_new)
        metrics = BoussinesqMetrics(
            dt=dt,
            div_post=jnp.max(jnp.abs(div_post)),
            max_vel=jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(u_new)), jnp.max(jnp.abs(v_new))),
                jnp.max(jnp.abs(w_new)),
            ),
            energy=jnp.mean(0.5 * (ucc * ucc + vcc * vcc + wcc * wcc)),
            nu_hot_wall=nu_hot,
            nu_mid=nu_mid,
            theta_min=jnp.min(theta_new),
            theta_max=jnp.max(theta_new),
        )
        return new_state, metrics

    return step
