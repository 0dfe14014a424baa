"""3D incompressible Navier–Stokes: Chorin projection on (nz, ny, nx).

The 3D extension the reference never had (its largest runs are 2D,
SURVEY.md §6) — BASELINE.json config 5: 3D lid-driven cavity at 256³ with
geometric-multigrid pressure Poisson, sharded over a device mesh with the
z-axis replicated and (y, x) decomposed (see ``parallel.sharded``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from cfdsim_tpu.grid import Grid3D
from cfdsim_tpu.solvers.poisson3d import (
    Poisson3DConfig,
    residual_3d,
    solve_poisson_3d,
)


class Incompressible3DState(NamedTuple):
    u: jax.Array  # (nz, ny, nx)
    v: jax.Array
    w: jax.Array
    p: jax.Array
    t: jax.Array
    step: jax.Array


class Step3DMetrics(NamedTuple):
    dt: jax.Array
    div_pre: jax.Array
    div_post: jax.Array
    max_vel: jax.Array
    energy: jax.Array
    poisson_res: jax.Array


@dataclasses.dataclass(frozen=True)
class Incompressible3DConfig:
    grid: Grid3D
    nu: float
    poisson: Poisson3DConfig = Poisson3DConfig()
    cfl_target: float = 0.4
    dt_min: float = 1e-7
    dt_max: float = 1.0
    max_velocity: float = 1e3
    compute_metrics: bool = True


def _pad0(inner):
    return jnp.pad(inner, ((1, 1), (1, 1), (1, 1)))


def gradient3(phi, dx, dy, dz):
    gx = (phi[1:-1, 1:-1, 2:] - phi[1:-1, 1:-1, :-2]) * (0.5 / dx)
    gy = (phi[1:-1, 2:, 1:-1] - phi[1:-1, :-2, 1:-1]) * (0.5 / dy)
    gz = (phi[2:, 1:-1, 1:-1] - phi[:-2, 1:-1, 1:-1]) * (0.5 / dz)
    return _pad0(gx), _pad0(gy), _pad0(gz)


def divergence3(u, v, w, dx, dy, dz):
    d = (
        (u[1:-1, 1:-1, 2:] - u[1:-1, 1:-1, :-2]) * (0.5 / dx)
        + (v[1:-1, 2:, 1:-1] - v[1:-1, :-2, 1:-1]) * (0.5 / dy)
        + (w[2:, 1:-1, 1:-1] - w[:-2, 1:-1, 1:-1]) * (0.5 / dz)
    )
    return _pad0(d)


def laplacian3(phi, dx, dy, dz):
    lap = (
        (phi[1:-1, 1:-1, 2:] - 2 * phi[1:-1, 1:-1, 1:-1] + phi[1:-1, 1:-1, :-2]) / dx**2
        + (phi[1:-1, 2:, 1:-1] - 2 * phi[1:-1, 1:-1, 1:-1] + phi[1:-1, :-2, 1:-1]) / dy**2
        + (phi[2:, 1:-1, 1:-1] - 2 * phi[1:-1, 1:-1, 1:-1] + phi[:-2, 1:-1, 1:-1]) / dz**2
    )
    return _pad0(lap)


def convection3_upwind(u, v, w, phi, dx, dy, dz):
    """First-order upwind (u·∇)φ, zero on the boundary shell."""
    uc = u[1:-1, 1:-1, 1:-1]
    vc = v[1:-1, 1:-1, 1:-1]
    wc = w[1:-1, 1:-1, 1:-1]
    pc = phi[1:-1, 1:-1, 1:-1]
    ddx = jnp.where(
        uc > 0,
        (pc - phi[1:-1, 1:-1, :-2]) / dx,
        (phi[1:-1, 1:-1, 2:] - pc) / dx,
    )
    ddy = jnp.where(
        vc > 0,
        (pc - phi[1:-1, :-2, 1:-1]) / dy,
        (phi[1:-1, 2:, 1:-1] - pc) / dy,
    )
    ddz = jnp.where(
        wc > 0,
        (pc - phi[:-2, 1:-1, 1:-1]) / dz,
        (phi[2:, 1:-1, 1:-1] - pc) / dz,
    )
    return _pad0(uc * ddx + vc * ddy + wc * ddz)


def init_state(cfg: Incompressible3DConfig) -> Incompressible3DState:
    g = cfg.grid
    return Incompressible3DState(
        u=g.zeros(), v=g.zeros(), w=g.zeros(), p=g.zeros(),
        t=jnp.float32(0.0), step=jnp.int32(0),
    )


def lid_cavity3d_bcs(lid_velocity: float = 1.0) -> Callable:
    """Lid at z_hi moving in +x; no-slip on the other five faces."""

    def apply(u, v, w):
        u = u.at[0].set(0.0).at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
        u = u.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
        u = u.at[-1].set(lid_velocity)
        v = v.at[0].set(0.0).at[-1].set(0.0).at[:, 0, :].set(0.0)
        v = v.at[:, -1, :].set(0.0).at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
        w = w.at[0].set(0.0).at[-1].set(0.0).at[:, 0, :].set(0.0)
        w = w.at[:, -1, :].set(0.0).at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
        return u, v, w

    return apply


def make_step(cfg: Incompressible3DConfig, bc_fn: Callable) -> Callable:
    g = cfg.grid
    dx, dy, dz = g.dx, g.dy, g.dz

    def step(state: Incompressible3DState, cfl_scale):
        u, v, w = state.u, state.v, state.w
        h = min(dx, dy, dz)
        vel_max = jnp.maximum(
            jnp.max(jnp.maximum(jnp.abs(u), jnp.maximum(jnp.abs(v), jnp.abs(w)))),
            1e-10,
        )
        dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
        dt_visc = 0.15 * h * h / cfg.nu  # 3D explicit diffusion bound (1/6)
        dt = jnp.clip(jnp.minimum(dt_cfl, dt_visc), cfg.dt_min, cfg.dt_max).astype(
            jnp.float32
        )

        conv_u = convection3_upwind(u, v, w, u, dx, dy, dz)
        conv_v = convection3_upwind(u, v, w, v, dx, dy, dz)
        conv_w = convection3_upwind(u, v, w, w, dx, dy, dz)
        u_s = u + dt * (cfg.nu * laplacian3(u, dx, dy, dz) - conv_u)
        v_s = v + dt * (cfg.nu * laplacian3(v, dx, dy, dz) - conv_v)
        w_s = w + dt * (cfg.nu * laplacian3(w, dx, dy, dz) - conv_w)
        u_s, v_s, w_s = bc_fn(u_s, v_s, w_s)

        div = divergence3(u_s, v_s, w_s, dx, dy, dz)
        rhs = div / dt
        rhs = rhs - jnp.mean(rhs)
        phi = solve_poisson_3d(state.p, rhs, dx, dy, dz, cfg.poisson)
        gx, gy, gz = gradient3(phi, dx, dy, dz)
        u_n = u_s - dt * gx
        v_n = v_s - dt * gy
        w_n = w_s - dt * gz
        u_n, v_n, w_n = bc_fn(u_n, v_n, w_n)
        u_n = jnp.clip(u_n, -cfg.max_velocity, cfg.max_velocity)
        v_n = jnp.clip(v_n, -cfg.max_velocity, cfg.max_velocity)
        w_n = jnp.clip(w_n, -cfg.max_velocity, cfg.max_velocity)

        new_state = Incompressible3DState(
            u=u_n, v=v_n, w=w_n, p=phi, t=state.t + dt, step=state.step + 1
        )
        if cfg.compute_metrics:
            div_post = divergence3(u_n, v_n, w_n, dx, dy, dz)
            metrics = Step3DMetrics(
                dt=dt,
                div_pre=jnp.max(jnp.abs(div)),
                div_post=jnp.max(jnp.abs(div_post[2:-2, 2:-2, 2:-2])),
                max_vel=vel_max,
                energy=jnp.mean(0.5 * (u_n**2 + v_n**2 + w_n**2)),
                poisson_res=residual_3d(phi, rhs, dx, dy, dz),
            )
        else:
            z = jnp.float32(0.0)
            metrics = Step3DMetrics(dt, z, z, z, z, z)
        return new_state, metrics

    return step
