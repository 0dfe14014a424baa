"""3D compressible Euler finite-volume solver.

The 3D extension of ``models/compressible.py`` (the reference's shockwave
family is 2D only, v1_shock.py / cavity_flow_v1.py): conserved state
U = (ρ, ρu, ρv, ρw, ρE) stored component-leading, shape (5, nz, ny, nx),
with dimension-split whole-face fluxes from the dimension-generic Riemann
solvers (``solvers/riemann.py`` FLUXES_ND), acoustic CFL dt over all three
directions, positivity floors, and optional SSP-RK2. MUSCL minmod
reconstruction per sweep direction.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from cfdsim_tpu.grid import Grid3D
from cfdsim_tpu.models.compressible import CompressibleMetrics
from cfdsim_tpu.ops.limiters import SLOPE_LIMITERS
from cfdsim_tpu.solvers.riemann import (
    FLUXES_ND,
    cons_to_prim_nd,
    sound_speed,
)


class Compressible3DState(NamedTuple):
    U: jax.Array  # (5, nz, ny, nx)
    t: jax.Array
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class Compressible3DConfig:
    grid: Grid3D
    gamma: float = 1.4
    flux: str = "hllc"  # rusanov | hllc | roe
    reconstruction: str = "none"  # none | muscl
    limiter: str = "minmod"
    cfl: float = 0.3
    time_order: int = 1
    eps: float = 1e-8
    rho_min: float = 1e-8
    p_min: float = 1e-8
    max_val: float = 1e3
    compute_metrics: bool = True


def prim_to_cons_3d(rho, u, v, w, p, gamma: float):
    E = p / ((gamma - 1.0) * rho) + 0.5 * (u * u + v * v + w * w)
    return jnp.stack([rho, rho * u, rho * v, rho * w, rho * E])


def init_state(cfg: Compressible3DConfig, U0) -> Compressible3DState:
    return Compressible3DState(
        U=jnp.asarray(U0, jnp.float32), t=jnp.float32(0.0), step=jnp.int32(0)
    )


def acoustic_dt_3d(cfg: Compressible3DConfig, U, cfl_scale):
    rho, vels, p = cons_to_prim_nd(U, cfg.gamma, cfg.eps, cfg.max_val)
    a = sound_speed(rho, p, cfg.gamma, cfg.eps)
    g = cfg.grid
    dt = jnp.inf
    for h, vel in zip((g.dx, g.dy, g.dz), (vels[0], vels[1], vels[2])):
        s = jnp.minimum(jnp.max(jnp.abs(vel) + a), cfg.max_val)
        dt = jnp.minimum(dt, h / jnp.maximum(s, cfg.eps))
    return (cfg.cfl * cfl_scale * dt).astype(jnp.float32)


def _muscl_faces_nd(W, axis: int, limiter):
    n = W.shape[axis]
    Wm = jax.lax.slice_in_dim(W, 0, n - 2, axis=axis)
    Wc = jax.lax.slice_in_dim(W, 1, n - 1, axis=axis)
    Wp = jax.lax.slice_in_dim(W, 2, n, axis=axis)
    slope = limiter(Wc - Wm, Wp - Wc)
    pad = [(0, 0)] * W.ndim
    pad[axis] = (1, 1)
    slope = jnp.pad(slope, pad)
    WL = jax.lax.slice_in_dim(W + 0.5 * slope, 0, n - 1, axis=axis)
    WR = jax.lax.slice_in_dim(W - 0.5 * slope, 1, n, axis=axis)
    return WL, WR


def _face_states(cfg: Compressible3DConfig, U, sp_axis: int):
    """(UL, UR) at faces along spatial axis (0=z,1=y,2=x → array axis+1)."""
    arr_axis = sp_axis + 1
    n = U.shape[arr_axis]
    if cfg.reconstruction == "none":
        UL = jax.lax.slice_in_dim(U, 0, n - 1, axis=arr_axis)
        UR = jax.lax.slice_in_dim(U, 1, n, axis=arr_axis)
        return UL, UR
    limiter = SLOPE_LIMITERS[cfg.limiter]
    rho, vels, p = cons_to_prim_nd(U, cfg.gamma, cfg.eps, cfg.max_val)
    prims = [rho, *vels, p]
    faces = [_muscl_faces_nd(q, sp_axis, limiter) for q in prims]
    (rL, rR) = faces[0]
    (pL, pR) = faces[-1]
    rL = jnp.maximum(rL, cfg.rho_min)
    rR = jnp.maximum(rR, cfg.rho_min)
    pL = jnp.maximum(pL, cfg.p_min)
    pR = jnp.maximum(pR, cfg.p_min)
    vL = [f[0] for f in faces[1:-1]]
    vR = [f[1] for f in faces[1:-1]]
    return (
        prim_to_cons_3d(rL, vL[0], vL[1], vL[2], pL, cfg.gamma),
        prim_to_cons_3d(rR, vR[0], vR[1], vR[2], pR, cfg.gamma),
    )


def make_step(
    cfg: Compressible3DConfig,
    bc_fn: Callable,
    zero_momentum_mask: Optional[jax.Array] = None,
) -> Callable:
    """``bc_fn(U, step, t) -> U`` writes ghost/edge cells; the optional
    mask zeroes momentum inside an embedded solid."""
    import numpy as np

    g = cfg.grid
    flux_fn = FLUXES_ND[cfg.flux]
    hs = (g.dz, g.dy, g.dx)  # spatial axes 0,1,2
    # spatial axis s updates along array axis s+1; velocity component for
    # the sweep: z→w(2), y→v(1), x→u(0)
    vaxes = (2, 1, 0)
    # only the full interior updates (the one-cell frame is ghost space the
    # BCs own — the 2D module's .at[:, 1:-1, 1:-1] semantics)
    imask_np = np.zeros((1, g.nz, g.ny, g.nx), np.float32)
    imask_np[:, 1:-1, 1:-1, 1:-1] = 1.0
    imask = jnp.asarray(imask_np)

    def euler_update(U, dt):
        dU = jnp.zeros_like(U)
        for s in range(3):
            UL, UR = _face_states(cfg, U, s)
            F = flux_fn(UL, UR, cfg.gamma, vaxes[s], cfg.eps, cfg.max_val)
            arr_axis = s + 1
            n = F.shape[arr_axis]
            dF = (
                jax.lax.slice_in_dim(F, 1, n, axis=arr_axis)
                - jax.lax.slice_in_dim(F, 0, n - 1, axis=arr_axis)
            ) / hs[s]
            # valid for interior cells 1..n-1 along this axis
            pad = [(0, 0)] * U.ndim
            pad[arr_axis] = (1, 1)
            dU = dU + jnp.pad(dF, pad)
        U_new = U - dt * dU * imask
        rho_f = jnp.maximum(U_new[0], cfg.rho_min)
        mom = [
            jnp.clip(U_new[i], -cfg.max_val * rho_f, cfg.max_val * rho_f)
            for i in (1, 2, 3)
        ]
        return jnp.stack(
            [rho_f, *mom, jnp.maximum(U_new[4], cfg.eps * rho_f)]
        )

    def step(state: Compressible3DState, cfl_scale):
        U = bc_fn(state.U, state.step, state.t)
        dt = acoustic_dt_3d(cfg, U, cfl_scale)
        if cfg.time_order == 2:
            U1 = bc_fn(euler_update(U, dt), state.step, state.t)
            U_new = 0.5 * U + 0.5 * euler_update(U1, dt)
        else:
            U_new = euler_update(U, dt)
        if zero_momentum_mask is not None:
            keep = 1.0 - zero_momentum_mask.astype(U_new.dtype)
            for i in (1, 2, 3):
                U_new = U_new.at[i].mul(keep)
        U_new = bc_fn(U_new, state.step + 1, state.t + dt)
        new_state = Compressible3DState(
            U=U_new, t=state.t + dt, step=state.step + 1
        )
        if cfg.compute_metrics:
            rho, vels, p = cons_to_prim_nd(U_new, cfg.gamma, cfg.eps, cfg.max_val)
            a = sound_speed(rho, p, cfg.gamma, cfg.eps)
            vel = jnp.sqrt(sum(w * w for w in vels))
            metrics = CompressibleMetrics(
                dt=dt,
                max_vel=jnp.max(vel),
                min_rho=jnp.min(U_new[0]),
                min_p=jnp.min(p),
                energy=jnp.mean(0.5 * rho * vel * vel),
                max_mach=jnp.max(vel / a),
            )
        else:
            z = jnp.float32(0.0)
            metrics = CompressibleMetrics(dt, z, z, z, z, z)
        return new_state, metrics

    return step
