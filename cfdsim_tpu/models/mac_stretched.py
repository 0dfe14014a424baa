"""Incompressible MAC solver on stretched (nonuniform tensor-product) grids.

This closes the capability the reference obtained from its gmsh/FEM path
(v1.jl:24-97: boundary-layer refinement near walls and the cylinder,
h_near=0.02 → h_far=0.2): grid lines cluster where the physics needs
resolution while the discretization stays structured and TPU-shaped. The
pressure projection stays *exact* — the separable stretched operator is
solved directly by the fast-diagonalization method (``solvers/fdm.py``),
four dense MXU matmuls instead of the uniform grid's FFT-DCT.

Layout matches ``models/mac.py`` (u on x-faces (ny, nx+1), v on y-faces
(ny+1, nx), p at centers); all metric coefficients (cell widths, center
gaps, interpolation weights) are NumPy constants baked at trace time. The
wall-tangential ghost convention (ghost = 2·wall − first row, ghost gap =
first cell width) reproduces the half-cell wall gradient exactly, so the
same MACBCs closures work unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cfdsim_tpu.models.incompressible import StepMetrics
from cfdsim_tpu.models.mac import MACBCs, MACState
from cfdsim_tpu.ops.limiters import vanleer_slope
from cfdsim_tpu.solvers.fdm import make_fdm_solver


@dataclasses.dataclass(frozen=True)
class StretchedMACConfig:
    nx: int
    ny: int
    nu: float
    scheme: str = "central"  # central | upwind | tvd
    # "chorin" or "incremental" (see mac.MACConfig.projection)
    projection: str = "chorin"
    # "euler" or "rk2" (Heun with a projection per stage — see
    # mac.MACConfig.time_scheme)
    time_scheme: str = "euler"
    adaptive_dt: bool = True
    cfl_target: float = 0.4
    dt_base: float = 1e-3
    dt_min: float = 1e-7
    dt_max: float = 1.0
    warmup_steps: int = 0
    warmup_dt: float = 0.0
    max_velocity: float = 1e3
    compute_metrics: bool = True


def stretched_faces(n: int, length: float, refine=(), x_min: float = 0.0):
    """Monotone face coordinates (n+1,) on [x_min, x_min+length] whose
    spacing shrinks inside Gaussian refinement regions.

    ``refine`` is a sequence of (center, width, strength): local spacing is
    divided by (1 + strength·exp(−((x−center)/width)²)). strength=3 gives
    a ~4× finer mesh at the center than far away."""
    s = np.linspace(0.0, 1.0, 4 * n + 1)
    x_probe = x_min + s * length
    w = np.ones_like(s)
    for center, width, strength in refine:
        w += strength * np.exp(-(((x_probe - center) / width) ** 2))
    density = w / np.trapezoid(w, s)  # target #cells per unit s
    cdf = np.concatenate([[0.0], np.cumsum(0.5 * (density[1:] + density[:-1])
                                           * np.diff(s))])
    cdf /= cdf[-1]
    faces = x_min + np.interp(np.linspace(0, 1, n + 1), cdf, s) * length
    faces[0], faces[-1] = x_min, x_min + length
    return faces


def wall_clustered_faces(n: int, length: float, beta: float = 2.0,
                         x_min: float = 0.0):
    """tanh wall clustering at both ends (the classic cavity stretching):
    larger beta → finer wall cells."""
    s = np.linspace(-1.0, 1.0, n + 1)
    x = np.tanh(beta * s) / np.tanh(beta)
    return x_min + (x + 1.0) * 0.5 * length


class _Metrics1D(NamedTuple):
    h: np.ndarray      # cell widths (n,)
    xc: np.ndarray     # cell centers (n,)
    dc: np.ndarray     # interior center gaps (n-1,)
    dfull: np.ndarray  # center gaps incl. ghost gaps = h[0], h[-1]  (n+1,)
    wf: np.ndarray     # interior-face interpolation weight toward the
                       # higher-index cell: q(xf_i) = (1-wf)q_{i-1}+wf q_i


def _metrics(faces: np.ndarray) -> _Metrics1D:
    f = np.asarray(faces, np.float64)
    h = np.diff(f)
    xc = 0.5 * (f[:-1] + f[1:])
    dc = np.diff(xc)
    dfull = np.concatenate([[h[0]], dc, [h[-1]]])
    wf = (f[1:-1] - xc[:-1]) / dc
    return _Metrics1D(h, xc, dc, dfull, wf)


def init_state(cfg: StretchedMACConfig, u0=None, v0=None, p0=None) -> MACState:
    nx, ny = cfg.nx, cfg.ny
    return MACState(
        u=jnp.zeros((ny, nx + 1), jnp.float32) if u0 is None else jnp.asarray(u0, jnp.float32),
        v=jnp.zeros((ny + 1, nx), jnp.float32) if v0 is None else jnp.asarray(v0, jnp.float32),
        p=jnp.zeros((ny, nx), jnp.float32) if p0 is None else jnp.asarray(p0, jnp.float32),
        t=jnp.float32(0.0),
        step=jnp.int32(0),
    )


def _limited_gradient(dq_lo, dq_hi):
    """Van Leer limited gradient from one-sided gradients."""
    return vanleer_slope(dq_lo, dq_hi)


def make_step(
    cfg: StretchedMACConfig,
    bcs: MACBCs,
    x_faces,
    y_faces,
    ibm_mask_u: Optional[jax.Array] = None,
    ibm_mask_v: Optional[jax.Array] = None,
    ibm_ramp_steps: int = 0,
    moving_body=None,
    ibm_ghost=None,
    moving_scheme: str = "penalize",
) -> Callable:
    """Build ``step(state, cfl_scale) -> (state, StepMetrics)`` on the
    stretched grid defined by face coordinates ``x_faces`` (nx+1,) /
    ``y_faces`` (ny+1,).

    ``ibm_ghost`` (ibm_ghost.GhostIBM2D): sharp-interface ghost-cell
    direct forcing for a static body (mutually exclusive with
    ibm_mask_*; volume-weighted momentum-exchange forces).
    ``moving_scheme="ghost"``: the moving-body analog — stencils
    rebuilt on device each stage with a searchsorted probe lookup on
    the nonuniform metrics (ibm_ghost.moving_ghost_forcing_2d_
    nonuniform).

    ``moving_body`` (ibm.MovingBody): moving-geometry IBM on the
    stretched metrics — sharp masks rebuilt on device each step with a
    taper width of the MINIMUM grid spacing (design intent: the body
    stays inside the refined region), penalization toward u_b(t),
    volume-weighted momentum-exchange forces (mac.make_step's
    moving_body lifted to nonuniform control volumes)."""
    if ibm_ghost is not None and ibm_mask_u is not None:
        raise ValueError("ibm_ghost and ibm_mask_* are mutually exclusive")
    if moving_scheme not in ("penalize", "ghost"):
        raise ValueError(f"unknown moving_scheme {moving_scheme!r}")
    mx = _metrics(x_faces)
    my = _metrics(y_faces)
    nx, ny = cfg.nx, cfg.ny
    assert len(mx.h) == nx and len(my.h) == ny

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    # --- constants (trace-time)
    inv_hx = f32(1.0 / mx.h)[None, :]              # (1, nx)
    inv_hy = f32(1.0 / my.h)[:, None]              # (ny, 1)
    inv_dcx = f32(1.0 / mx.dc)[None, :]            # (1, nx-1) interior u faces
    inv_dcy = f32(1.0 / my.dc)[:, None]            # (ny-1, 1) interior v faces
    inv_dfx = f32(1.0 / mx.dfull)[None, :]         # (1, nx+1) u-center gaps + ghosts
    inv_dfy = f32(1.0 / my.dfull)[:, None]         # (ny+1, 1)
    h_min = float(min(mx.h.min(), my.h.min()))

    solve_p = make_fdm_solver(mx.h, my.h)

    if moving_body is not None:
        xf_np = np.asarray(x_faces)
        yf_np = np.asarray(y_faces)
        Xu_m, Yu_m = (jnp.asarray(a, jnp.float32) for a in np.meshgrid(
            xf_np, my.xc, indexing="xy"))
        Xv_m, Yv_m = (jnp.asarray(a, jnp.float32) for a in np.meshgrid(
            mx.xc, yf_np, indexing="xy"))
        area_u_mb = f32(np.outer(my.h, mx.dfull))
        area_v_mb = f32(np.outer(my.dfull, mx.h))

        def body_masks(t):
            cx, cy = moving_body.center(t)
            r = moving_body.radius
            du = jnp.sqrt((Xu_m - cx) ** 2 + (Yu_m - cy) ** 2)
            dv = jnp.sqrt((Xv_m - cx) ** 2 + (Yv_m - cy) ** 2)
            m_u = jnp.clip((r + 0.5 * h_min - du) / h_min, 0.0, 1.0)
            m_v = jnp.clip((r + 0.5 * h_min - dv) / h_min, 0.0, 1.0)
            return m_u, m_v

    def adaptive_dt(u, v, step, cfl_scale):
        if not cfg.adaptive_dt:
            return jnp.float32(cfg.dt_base)
        vel_max = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v))), 1e-10
        )
        dt_cfl = cfg.cfl_target * cfl_scale * h_min / vel_max
        dt_visc = 0.2 * h_min * h_min / cfg.nu
        dt = jnp.clip(jnp.minimum(dt_cfl, dt_visc), cfg.dt_min, cfg.dt_max)
        if cfg.warmup_steps > 0:
            dt = jnp.where(step < cfg.warmup_steps, jnp.float32(cfg.warmup_dt), dt)
        return dt.astype(jnp.float32)

    def advect(u, v, ue, ve):
        """Conservative advection on the stretched MAC layout; returns
        (conv_u, conv_v) on interior u-faces (ny, nx-1) / v-faces (ny-1, nx)."""
        # advecting velocities
        uc = 0.5 * (u[:, :-1] + u[:, 1:])        # at centers (ny, nx)
        vc = 0.5 * (v[:-1, :] + v[1:, :])        # at centers (ny, nx)
        # corner values (ny+1, nx+1): interpolate ue rows to y-faces, ve
        # cols to x-faces. ue has ghost rows at gap h (dfull); the linear
        # weight toward the upper row at y-face j is wcy[j].
        wcy = f32(np.concatenate([[0.5], my.wf, [0.5]]))[:, None]  # (ny+1,1)
        wcx = f32(np.concatenate([[0.5], mx.wf, [0.5]]))[None, :]  # (1,nx+1)
        u_y = (1.0 - wcy) * ue[:-1, :] + wcy * ue[1:, :]   # (ny+1, nx+1)
        v_x = (1.0 - wcx) * ve[:, :-1] + wcx * ve[:, 1:]   # (ny+1, nx+1)

        if cfg.scheme == "central":
            u_adv_c, u_adv_y = uc, u_y
            v_adv_c, v_adv_x = vc, v_x
        elif cfg.scheme in ("upwind", "tvd"):
            if cfg.scheme == "tvd":
                # limited gradients of u in x at u-faces (one-sided /gaps)
                gx = _limited_gradient(
                    (u[:, 1:-1] - u[:, :-2]) * inv_hx[:, :-1],
                    (u[:, 2:] - u[:, 1:-1]) * inv_hx[:, 1:],
                )
                gx = jnp.pad(gx, ((0, 0), (1, 1)))
                gy_u = _limited_gradient(
                    (ue[1:-1, :] - ue[:-2, :]) * inv_dfy[:-1, :],
                    (ue[2:, :] - ue[1:-1, :]) * inv_dfy[1:, :],
                )
                gy_u = jnp.pad(gy_u, ((1, 1), (0, 0)))
                gy = _limited_gradient(
                    (v[1:-1, :] - v[:-2, :]) * inv_hy[:-1, :],
                    (v[2:, :] - v[1:-1, :]) * inv_hy[1:, :],
                )
                gy = jnp.pad(gy, ((1, 1), (0, 0)))
                gx_v = _limited_gradient(
                    (ve[:, 1:-1] - ve[:, :-2]) * inv_dfx[:, :-1],
                    (ve[:, 2:] - ve[:, 1:-1]) * inv_dfx[:, 1:],
                )
                gx_v = jnp.pad(gx_v, ((0, 0), (1, 1)))
            else:
                gx = jnp.zeros_like(u)
                gy_u = jnp.zeros_like(ue)
                gy = jnp.zeros_like(v)
                gx_v = jnp.zeros_like(ve)
            # distances from donor sample to target point
            dxl = f32(mx.xc - np.asarray(x_faces)[:-1])[None, :]   # face i→center i
            dxr = f32(np.asarray(x_faces)[1:] - mx.xc)[None, :]
            u_lo = u[:, :-1] + gx[:, :-1] * dxl
            u_hi = u[:, 1:] - gx[:, 1:] * dxr
            u_adv_c = jnp.where(uc >= 0.0, u_lo, u_hi)
            # u to y-faces (corners): donor rows of ue at gap dfull
            yg = np.concatenate(
                [[my.xc[0] - my.h[0]], my.xc, [my.xc[-1] + my.h[-1]]]
            )
            dyl = f32(np.asarray(y_faces) - yg[:-1])[:, None]
            dyr = f32(yg[1:] - np.asarray(y_faces))[:, None]
            uy_lo = ue[:-1, :] + gy_u[:-1, :] * dyl
            uy_hi = ue[1:, :] - gy_u[1:, :] * dyr
            u_adv_y = jnp.where(v_x >= 0.0, uy_lo, uy_hi)
            # v to centers
            dyl_c = f32(my.xc - np.asarray(y_faces)[:-1])[:, None]
            dyr_c = f32(np.asarray(y_faces)[1:] - my.xc)[:, None]
            v_lo = v[:-1, :] + gy[:-1, :] * dyl_c
            v_hi = v[1:, :] - gy[1:, :] * dyr_c
            v_adv_c = jnp.where(vc >= 0.0, v_lo, v_hi)
            # v to x-faces (corners)
            xg = np.concatenate(
                [[mx.xc[0] - mx.h[0]], mx.xc, [mx.xc[-1] + mx.h[-1]]]
            )
            dxl_g = f32(np.asarray(x_faces) - xg[:-1])[None, :]
            dxr_g = f32(xg[1:] - np.asarray(x_faces))[None, :]
            vx_lo = ve[:, :-1] + gx_v[:, :-1] * dxl_g
            vx_hi = ve[:, 1:] - gx_v[:, 1:] * dxr_g
            v_adv_x = jnp.where(u_y >= 0.0, vx_lo, vx_hi)
        else:
            raise ValueError(f"unknown scheme {cfg.scheme!r}")

        F_u = uc * u_adv_c                     # x-flux of u at centers
        G_u = v_x * u_adv_y                    # y-flux of u at corners
        G_v = vc * v_adv_c                     # y-flux of v at centers
        F_v = u_y * v_adv_x                    # x-flux of v at corners

        conv_u = (F_u[:, 1:] - F_u[:, :-1]) * inv_dcx + (
            G_u[1:, 1:-1] - G_u[:-1, 1:-1]
        ) * inv_hy
        conv_v = (F_v[1:-1, 1:] - F_v[1:-1, :-1]) * inv_hx + (
            G_v[1:, :] - G_v[:-1, :]
        ) * inv_dcy
        return conv_u, conv_v

    def diffuse(ue, ve):
        """ν∇²: flux form with metric coefficients. Interior u-faces /
        v-faces."""
        # u: d/dx(du/dx): du/dx at centers uses hx; divided by dcx at faces
        dudx = (ue[1:-1, 1:] - ue[1:-1, :-1]) * inv_hx     # (ny, nx)
        lap_u_x = (dudx[:, 1:] - dudx[:, :-1]) * inv_dcx   # (ny, nx-1)
        dudy = (ue[1:, :] - ue[:-1, :]) * inv_dfy          # (ny+1, nx+1)
        lap_u_y = (dudy[1:, 1:-1] - dudy[:-1, 1:-1]) * inv_hy
        dvdy = (ve[1:, 1:-1] - ve[:-1, 1:-1]) * inv_hy
        lap_v_y = (dvdy[1:, :] - dvdy[:-1, :]) * inv_dcy
        dvdx = (ve[:, 1:] - ve[:, :-1]) * inv_dfx
        lap_v_x = (dvdx[1:-1, 1:] - dvdx[1:-1, :-1]) * inv_hx
        return lap_u_x + lap_u_y, lap_v_x + lap_v_y

    def divergence(u, v):
        return (u[:, 1:] - u[:, :-1]) * inv_hx + (v[1:, :] - v[:-1, :]) * inv_hy

    if cfg.time_scheme not in ("euler", "rk2"):
        raise ValueError(f"unknown time scheme {cfg.time_scheme!r}")

    def step(state: MACState, cfl_scale):
        u, v = bcs.set_normal(state.u, state.v, state.step, state.t)
        dt = adaptive_dt(u, v, state.step, cfl_scale)

        def stage(u, v, p_warm, t_s):
            """One projected Euler stage (mac.make_step stage pattern)."""
            ue, ve = bcs.extend(u, v, state.step, t_s)
            conv_u, conv_v = advect(u, v, ue, ve)
            lap_u, lap_v = diffuse(ue, ve)

            u_star = u.at[:, 1:-1].add(dt * (cfg.nu * lap_u - conv_u))
            v_star = v.at[1:-1, :].add(dt * (cfg.nu * lap_v - conv_v))
            if cfg.projection == "incremental":
                u_star = u_star.at[:, 1:-1].add(
                    -dt * (p_warm[:, 1:] - p_warm[:, :-1]) * inv_dcx
                )
                v_star = v_star.at[1:-1, :].add(
                    -dt * (p_warm[1:, :] - p_warm[:-1, :]) * inv_dcy
                )
            u_star, v_star = bcs.set_normal(
                u_star, v_star, state.step, t_s
            )

            fx = fy = jnp.float32(0.0)
            if ibm_mask_u is not None:
                from cfdsim_tpu.ibm import ibm_ramp

                strength = ibm_ramp(state.step, ibm_ramp_steps)
                du_ibm = u_star * (strength * ibm_mask_u)
                dv_ibm = v_star * (strength * ibm_mask_v)
                u_star = u_star - du_ibm
                v_star = v_star - dv_ibm
                if cfg.compute_metrics:
                    # momentum sink weighted by the face control volumes
                    area_u = f32(np.outer(my.h, mx.dfull))
                    area_v = f32(np.outer(my.dfull, mx.h))
                    fx = jnp.sum(du_ibm * area_u) / dt
                    fy = jnp.sum(dv_ibm * area_v) / dt

            if ibm_ghost is not None:
                from cfdsim_tpu.ibm import ibm_ramp
                from cfdsim_tpu.ibm_ghost import apply_ghost_forcing_2d

                strength = ibm_ramp(state.step, ibm_ramp_steps)
                u_star, du_g = apply_ghost_forcing_2d(
                    u_star, ibm_ghost.u, strength
                )
                v_star, dv_g = apply_ghost_forcing_2d(
                    v_star, ibm_ghost.v, strength
                )
                if cfg.compute_metrics:
                    fx = jnp.sum(du_g * f32(np.outer(my.h, mx.dfull))) / dt
                    fy = jnp.sum(dv_g * f32(np.outer(my.dfull, mx.h))) / dt

            if moving_body is not None:
                from cfdsim_tpu.ibm import ibm_ramp

                ub, vb = moving_body.velocity(t_s)
                strength = ibm_ramp(state.step, ibm_ramp_steps)
                if moving_scheme == "ghost":
                    from cfdsim_tpu.ibm_ghost import (
                        moving_ghost_forcing_2d_nonuniform,
                    )

                    ctr = moving_body.center(t_s)
                    r = moving_body.radius
                    delta = 1.5 * h_min
                    u_star, du_mb = moving_ghost_forcing_2d_nonuniform(
                        u_star, Xu_m, Yu_m, xf_np, my.xc, ctr, r, delta,
                        ub, strength,
                    )
                    v_star, dv_mb = moving_ghost_forcing_2d_nonuniform(
                        v_star, Xv_m, Yv_m, mx.xc, yf_np, ctr, r, delta,
                        vb, strength,
                    )
                else:
                    m_u, m_v = body_masks(t_s)
                    du_mb = (u_star - ub) * (strength * m_u)
                    dv_mb = (v_star - vb) * (strength * m_v)
                    u_star = u_star - du_mb
                    v_star = v_star - dv_mb
                if cfg.compute_metrics:
                    fx = fx + jnp.sum(du_mb * area_u_mb) / dt
                    fy = fy + jnp.sum(dv_mb * area_v_mb) / dt

            div_star = divergence(u_star, v_star)
            phi = solve_p(div_star / dt)  # exact FDM (4 MXU matmuls)
            # (incremental: phi is the increment; total p accumulated below)
            u_new = u_star.at[:, 1:-1].add(
                -dt * (phi[:, 1:] - phi[:, :-1]) * inv_dcx
            )
            v_new = v_star.at[1:-1, :].add(
                -dt * (phi[1:, :] - phi[:-1, :]) * inv_dcy
            )
            u_new, v_new = bcs.set_normal(u_new, v_new, state.step, t_s)
            u_new = jnp.clip(u_new, -cfg.max_velocity, cfg.max_velocity)
            v_new = jnp.clip(v_new, -cfg.max_velocity, cfg.max_velocity)
            if cfg.projection == "incremental":
                phi = p_warm + phi
            return u_new, v_new, phi, (fx, fy, div_star)

        u_new, v_new, phi, (fx, fy, div_star) = stage(u, v, state.p, state.t)
        if cfg.time_scheme == "rk2":
            # Heun: average with a second projected Euler stage (both
            # solenoidal ⇒ so is the average)
            u2, v2, phi2, (fx2, fy2, div_star) = stage(u_new, v_new, phi,
                                                       state.t + dt)
            u_new = 0.5 * (u + u2)
            v_new = 0.5 * (v + v2)
            u_new, v_new = bcs.set_normal(u_new, v_new, state.step, state.t + dt)
            phi = 0.5 * (phi + phi2)
            fx = 0.5 * (fx + fx2)
            fy = 0.5 * (fy + fy2)

        new_state = MACState(
            u=u_new, v=v_new, p=phi, t=state.t + dt, step=state.step + 1
        )

        if cfg.compute_metrics:
            div_post = divergence(u_new, v_new)
            ucc = 0.5 * (u_new[:, :-1] + u_new[:, 1:])
            vcc = 0.5 * (v_new[:-1, :] + v_new[1:, :])
            # energy: cell-volume-weighted mean kinetic energy
            w = f32(np.outer(my.h, mx.h))
            vol = float(np.sum(np.outer(my.h, mx.h)))
            vort = ((v_new[:, 1:] - v_new[:, :-1]) * inv_dcx)[1:-1, :] - (
                (u_new[1:, :] - u_new[:-1, :]) * inv_dcy
            )[:, 1:-1]
            metrics = StepMetrics(
                dt=dt,
                div_pre=jnp.max(jnp.abs(div_star)),
                div_post=jnp.max(jnp.abs(div_post)),
                max_vel=jnp.maximum(
                    jnp.max(jnp.abs(u_new)), jnp.max(jnp.abs(v_new))
                ),
                energy=jnp.sum(w * 0.5 * (ucc * ucc + vcc * vcc)) / vol,
                vort_max=jnp.max(jnp.abs(vort)),
                poisson_res=jnp.float32(0.0),  # FDM is exact (fp32 matmuls)
                fx=fx,
                fy=fy,
            )
        else:
            zero = jnp.float32(0.0)
            metrics = StepMetrics(dt, zero, zero, zero, zero, zero, zero)
        return new_state, metrics

    return step
