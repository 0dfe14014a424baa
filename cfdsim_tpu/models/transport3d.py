"""3D scalar (temperature) transport coupled to the staggered MAC flow —
the forced-convection tier.

The 3D habitat of ``models/transport.py`` (the reference's capability
ceiling is 2D scalar advection-diffusion): a passive temperature θ is
advected by the mac3d velocities (conservative FV fluxes) and diffused
with diffusivity α = ν/Pr, while the momentum step runs the full
external-flow + IBM machinery (``mac3d.make_step`` physics inlined so
the θ substep sees the updated velocities). An isothermal immersed body
is imposed by the same penalization as the velocity IBM —
θ ← θ + s·mask·(θ_body − θ) — and the heat the penalization injects is
the body's convective heat flux:

    Q = Σ Δθ·dV / dt   ⇒   Nu = Q / (π·D·α·Δθ)      (sphere, D = 2R)

validated against the Ranz–Marshall correlation
Nu = 2 + 0.6·Re^½·Pr^⅓ (examples/sphere_wake.py --heated /
tests/test_transport3d.py).

Flow BCs are any ``mac3d.MAC3DBCs``; θ boundary conditions are inflow
Dirichlet θ=θ_in at x_lo (ghost mirror), zero-gradient outflow at x_hi,
and adiabatic (zero-gradient) lateral faces — the open-domain analog of
boussinesq3d's closed-box ghosts.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from cfdsim_tpu.grid import Grid3D
from cfdsim_tpu.models import mac3d
from cfdsim_tpu.solvers.poisson3d import Poisson3DConfig, solve_poisson_3d


class Transport3DState(NamedTuple):
    u: jax.Array      # (nz, ny, nx+1)
    v: jax.Array      # (nz, ny+1, nx)
    w: jax.Array      # (nz+1, ny, nx)
    p: jax.Array      # (nz, ny, nx)
    theta: jax.Array  # (nz, ny, nx)
    t: jax.Array
    step: jax.Array


class Transport3DMetrics(NamedTuple):
    dt: jax.Array
    div_post: jax.Array
    max_vel: jax.Array
    energy: jax.Array
    fx: jax.Array          # body drag (penalization momentum sink)
    fy: jax.Array
    fz: jax.Array
    q_body: jax.Array      # body heat source Σ Δθ·dV/dt (per unit ρc_p)
    nusselt: jax.Array     # Q/(π·D·α·Δθ) — sphere surface-average Nu
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
class Transport3DConfig:
    grid: Grid3D
    nu: float                      # momentum diffusivity (from Re)
    prandtl: float = 0.7           # α = nu/prandtl
    scheme: str = "tvd"            # momentum advection (mac3d schemes)
    theta_scheme: str = "upwind"   # θ face values: upwind | central | tvd
    theta_body: float = 1.0        # isothermal body temperature
    theta_in: float = 0.0          # inflow temperature
    body_diameter: float = 1.0     # D for the Nusselt normalization
    poisson: Poisson3DConfig = Poisson3DConfig(method="dct")
    adaptive_dt: bool = True
    cfl_target: float = 0.4
    dt_base: float = 1e-3
    dt_min: float = 1e-6
    dt_max: float = 1.0
    max_velocity: float = 1e3
    compute_metrics: bool = True


def init_state(cfg: Transport3DConfig, u0=None, v0=None, w0=None,
               theta0=None) -> Transport3DState:
    g = cfg.grid
    nz, ny, nx = g.nz, g.ny, g.nx
    z3 = lambda shp: jnp.zeros(shp, jnp.float32)
    return Transport3DState(
        u=z3((nz, ny, nx + 1)) if u0 is None else jnp.asarray(u0, jnp.float32),
        v=z3((nz, ny + 1, nx)) if v0 is None else jnp.asarray(v0, jnp.float32),
        w=z3((nz + 1, ny, nx)) if w0 is None else jnp.asarray(w0, jnp.float32),
        p=z3((nz, ny, nx)),
        theta=jnp.full((nz, ny, nx), cfg.theta_in, jnp.float32)
        if theta0 is None else jnp.asarray(theta0, jnp.float32),
        t=jnp.float32(0.0),
        step=jnp.int32(0),
    )


def _theta_ghost_open(theta, theta_in: float):
    """(nz+2, ny+2, nx+2) ghost-extended θ for the open domain: Dirichlet
    inflow at x_lo (mirror), zero-gradient outflow at x_hi and adiabatic
    lateral faces (copy)."""
    te = jnp.pad(theta, 1)
    te = te.at[1:-1, 1:-1, 0].set(2.0 * theta_in - theta[:, :, 0])
    te = te.at[1:-1, 1:-1, -1].set(theta[:, :, -1])
    te = te.at[:, 0, :].set(te[:, 1, :])
    te = te.at[:, -1, :].set(te[:, -2, :])
    te = te.at[0, :, :].set(te[1, :, :])
    te = te.at[-1, :, :].set(te[-2, :, :])
    return te


def make_stretched_step(
    cfg: Transport3DConfig,
    bcs: mac3d.MAC3DBCs,
    x_faces,
    y_faces,
    z_faces,
    ibm_mask_u=None,
    ibm_mask_v=None,
    ibm_mask_w=None,
    ibm_mask_c=None,
    ibm_ramp_steps: int = 0,
    ibm_ghost=None,
    ibm_ghost_c=None,
) -> Callable:
    """The stretched-grid habitat of ``make_step``: composes the full
    stretched momentum step (``mac_stretched3d.make_step`` — metric
    advection/diffusion, exact FDM projection, volume-weighted IBM
    forces) with a metric-weighted FV θ update advected by the step's
    *projected* velocities, plus the isothermal-body θ penalization.
    ``cfg.grid`` is the nominal uniform descriptor; the face vectors
    define the real geometry. Note cfg.nx/ny/nz must match
    ``StretchedMAC3DConfig`` sizes.

    ``ibm_ghost`` / ``ibm_ghost_c`` select the sharp-interface
    ghost-cell treatment (ibm_ghost.py) for momentum / θ instead of
    the penalization masks: θ ghosts reflect θ - θ_body so the
    isothermal surface lands exactly on r = R (same Σ Δθ·dV/dt heat
    accounting)."""
    if ibm_ghost_c is not None and ibm_mask_c is not None:
        raise ValueError("ibm_ghost_c and ibm_mask_c are mutually "
                         "exclusive")
    import numpy as np

    from cfdsim_tpu.models import mac_stretched3d as ms3
    from cfdsim_tpu.models.mac_stretched import _metrics

    if cfg.poisson != Poisson3DConfig(method="dct"):
        raise ValueError(
            "make_stretched_step projects with the exact FDM solver; "
            "a non-default Transport3DConfig.poisson cannot be honored "
            "on the stretched path"
        )
    if cfg.theta_scheme not in ("central", "upwind", "tvd"):
        raise ValueError(f"unknown theta_scheme {cfg.theta_scheme!r}")
    mx = _metrics(x_faces)
    my = _metrics(y_faces)
    mz = _metrics(z_faces)
    alpha = cfg.nu / cfg.prandtl
    h_min = float(min(mx.h.min(), my.h.min(), mz.h.min()))
    flow_cfg = ms3.StretchedMAC3DConfig(
        nx=cfg.grid.nx, ny=cfg.grid.ny, nz=cfg.grid.nz, nu=cfg.nu,
        scheme=cfg.scheme, adaptive_dt=cfg.adaptive_dt,
        cfl_target=cfg.cfl_target, dt_base=cfg.dt_base, dt_min=cfg.dt_min,
        # the θ-diffusion stability bound joins the momentum one
        dt_max=min(cfg.dt_max, 0.125 * h_min * h_min / max(alpha, 1e-30)),
        max_velocity=cfg.max_velocity,
        compute_metrics=cfg.compute_metrics,
    )
    flow_step = ms3.make_step(
        flow_cfg, bcs, x_faces, y_faces, z_faces,
        ibm_mask_u=ibm_mask_u, ibm_mask_v=ibm_mask_v, ibm_mask_w=ibm_mask_w,
        ibm_ramp_steps=ibm_ramp_steps, ibm_ghost=ibm_ghost,
    )

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    inv_hx = f32(1.0 / mx.h)[None, None, :]
    inv_hy = f32(1.0 / my.h)[None, :, None]
    inv_hz = f32(1.0 / mz.h)[:, None, None]
    inv_dfx = f32(1.0 / mx.dfull)[None, None, :]
    inv_dfy = f32(1.0 / my.dfull)[None, :, None]
    inv_dfz = f32(1.0 / mz.dfull)[:, None, None]
    cellvol = f32(
        mz.h[:, None, None] * my.h[None, :, None] * mx.h[None, None, :]
    )
    qscale = 1.0 / (
        np.pi * cfg.body_diameter * alpha
        * max(abs(cfg.theta_body - cfg.theta_in), 1e-30)
    )
    if cfg.theta_scheme == "tvd":
        # MUSCL donor distances for the ghost-extended cell-center
        # samples advected to faces (the mac_stretched3d *_f pattern:
        # ghost centers mirrored one cell width outside)
        xf_np = np.asarray(x_faces)
        yf_np = np.asarray(y_faces)
        zf_np = np.asarray(z_faces)
        xg = np.concatenate(
            [[mx.xc[0] - mx.h[0]], mx.xc, [mx.xc[-1] + mx.h[-1]]])
        yg = np.concatenate(
            [[my.xc[0] - my.h[0]], my.xc, [my.xc[-1] + my.h[-1]]])
        zg = np.concatenate(
            [[mz.xc[0] - mz.h[0]], mz.xc, [mz.xc[-1] + mz.h[-1]]])
        dxl_f = f32(xf_np - xg[:-1])[None, None, :]
        dxr_f = f32(xg[1:] - xf_np)[None, None, :]
        dyl_f = f32(yf_np - yg[:-1])[None, :, None]
        dyr_f = f32(yg[1:] - yf_np)[None, :, None]
        dzl_f = f32(zf_np - zg[:-1])[:, None, None]
        dzr_f = f32(zg[1:] - zf_np)[:, None, None]

    def step(state: Transport3DState, cfl_scale):
        mac_state = mac3d.MAC3DState(
            u=state.u, v=state.v, w=state.w, p=state.p,
            t=state.t, step=state.step,
        )
        new_mac, fm = flow_step(mac_state, cfl_scale)
        dt = fm.dt
        u_new, v_new, w_new = new_mac.u, new_mac.v, new_mac.w
        theta = state.theta

        te = _theta_ghost_open(theta, cfg.theta_in)
        if cfg.theta_scheme == "upwind":
            thx = jnp.where(u_new >= 0.0, te[1:-1, 1:-1, :-1],
                            te[1:-1, 1:-1, 1:])
            # x_lo inflow face: the advective donor is theta_in itself,
            # not the mirrored diffusion ghost 2*theta_in - theta_0
            thx = thx.at[:, :, 0].set(jnp.where(
                u_new[:, :, 0] >= 0.0, jnp.float32(cfg.theta_in),
                theta[:, :, 0]))
            thy = jnp.where(v_new >= 0.0, te[1:-1, :-1, 1:-1],
                            te[1:-1, 1:, 1:-1])
            thz = jnp.where(w_new >= 0.0, te[:-1, 1:-1, 1:-1],
                            te[1:, 1:-1, 1:-1])
        elif cfg.theta_scheme == "tvd":
            # van-Leer-MUSCL donor values on the nonuniform metrics —
            # kills the 1st-order upwind's numerical diffusion in the
            # thin thermal boundary layer (the residual Nusselt
            # over-report once the wall is ghost-exact)
            from cfdsim_tpu.models.mac_stretched3d import _muscl_axis

            lox, hix = _muscl_axis(
                te[1:-1, 1:-1, :], inv_dfx, dxl_f, dxr_f, 2, True)
            thx = jnp.where(u_new >= 0.0, lox, hix)
            thx = thx.at[:, :, 0].set(jnp.where(
                u_new[:, :, 0] >= 0.0, jnp.float32(cfg.theta_in),
                theta[:, :, 0]))
            loy, hiy = _muscl_axis(
                te[1:-1, :, 1:-1], inv_dfy, dyl_f, dyr_f, 1, True)
            thy = jnp.where(v_new >= 0.0, loy, hiy)
            loz, hiz = _muscl_axis(
                te[:, 1:-1, 1:-1], inv_dfz, dzl_f, dzr_f, 0, True)
            thz = jnp.where(w_new >= 0.0, loz, hiz)
        else:
            thx = 0.5 * (te[1:-1, 1:-1, :-1] + te[1:-1, 1:-1, 1:])
            thy = 0.5 * (te[1:-1, :-1, 1:-1] + te[1:-1, 1:, 1:-1])
            thz = 0.5 * (te[:-1, 1:-1, 1:-1] + te[1:, 1:-1, 1:-1])
        fxa = u_new * thx
        fya = v_new * thy
        fza = w_new * thz
        adv = (
            (fxa[:, :, 1:] - fxa[:, :, :-1]) * inv_hx
            + (fya[:, 1:, :] - fya[:, :-1, :]) * inv_hy
            + (fza[1:] - fza[:-1]) * inv_hz
        )
        # flux-form diffusion with metric gaps (stretched3d lap pattern
        # for a cell-centered field)
        gx = (te[1:-1, 1:-1, 1:] - te[1:-1, 1:-1, :-1]) * inv_dfx
        gy = (te[1:-1, 1:, 1:-1] - te[1:-1, :-1, 1:-1]) * inv_dfy
        gz = (te[1:, 1:-1, 1:-1] - te[:-1, 1:-1, 1:-1]) * inv_dfz
        lap_t = (
            (gx[:, :, 1:] - gx[:, :, :-1]) * inv_hx
            + (gy[:, 1:, :] - gy[:, :-1, :]) * inv_hy
            + (gz[1:] - gz[:-1]) * inv_hz
        )
        theta_new = theta + dt * (alpha * lap_t - adv)

        q_body = nusselt = jnp.float32(0.0)
        if ibm_mask_c is not None:
            from cfdsim_tpu.ibm import ibm_ramp

            strength = ibm_ramp(state.step, ibm_ramp_steps)
            dth = (cfg.theta_body - theta_new) * (strength * ibm_mask_c)
            theta_new = theta_new + dth
            if cfg.compute_metrics:
                q_body = jnp.sum(dth * cellvol) / dt
                nusselt = q_body * qscale
        if ibm_ghost_c is not None:
            from cfdsim_tpu.ibm import ibm_ramp
            from cfdsim_tpu.ibm_ghost import apply_ghost_forcing

            strength = ibm_ramp(state.step, ibm_ramp_steps)
            shifted, dneg = apply_ghost_forcing(
                theta_new - cfg.theta_body, ibm_ghost_c, strength
            )
            theta_new = shifted + cfg.theta_body
            if cfg.compute_metrics:
                q_body = jnp.sum(-dneg * cellvol) / dt
                nusselt = q_body * qscale

        new_state = Transport3DState(
            u=u_new, v=v_new, w=w_new, p=new_mac.p, theta=theta_new,
            t=new_mac.t, step=new_mac.step,
        )
        if cfg.compute_metrics:
            metrics = Transport3DMetrics(
                dt=dt,
                div_post=fm.div_post,
                max_vel=fm.max_vel,
                energy=fm.energy,
                fx=fm.fx, fy=fm.fy, fz=fm.fz,
                q_body=q_body,
                nusselt=nusselt,
                theta_min=jnp.min(theta_new),
                theta_max=jnp.max(theta_new),
            )
        else:
            zero = jnp.float32(0.0)
            metrics = Transport3DMetrics(
                dt, zero, zero, zero, zero, zero, zero, zero, zero,
                zero, zero,
            )
        return new_state, metrics

    return step


def make_step(
    cfg: Transport3DConfig,
    bcs: mac3d.MAC3DBCs,
    ibm_mask_u=None,
    ibm_mask_v=None,
    ibm_mask_w=None,
    ibm_mask_c=None,
    ibm_ramp_steps: int = 0,
    ibm_ghost=None,
    ibm_ghost_c=None,
) -> Callable:
    """``step(state, cfl_scale) -> (state, Transport3DMetrics)``.

    ``ibm_mask_c`` is the cell-centered body mask for the θ penalization
    (1 inside; sharp profile sampled at cell centers). The momentum
    physics is mac3d.make_step's, inlined so θ advects with the
    *projected* velocities of the same step. ``ibm_ghost`` /
    ``ibm_ghost_c`` swap in the sharp-interface ghost-cell treatment
    (ibm_ghost.py) for momentum / θ — exact wall placement at r = R."""
    if ibm_ghost is not None and ibm_mask_u is not None:
        raise ValueError("ibm_ghost and ibm_mask_* are mutually exclusive")
    if ibm_ghost_c is not None and ibm_mask_c is not None:
        raise ValueError("ibm_ghost_c and ibm_mask_c are mutually "
                         "exclusive")
    if cfg.scheme not in ("central", "upwind", "tvd"):
        raise ValueError(f"unknown scheme {cfg.scheme!r}")
    if cfg.theta_scheme not in ("central", "upwind", "tvd"):
        raise ValueError(f"unknown theta_scheme {cfg.theta_scheme!r}")
    g = cfg.grid
    dx, dy, dz = g.dx, g.dy, g.dz
    h = min(dx, dy, dz)
    alpha = cfg.nu / cfg.prandtl
    ax, ay, az = 1.0 / dx**2, 1.0 / dy**2, 1.0 / dz**2
    import numpy as np

    qscale = 1.0 / (
        np.pi * cfg.body_diameter * alpha
        * max(abs(cfg.theta_body - cfg.theta_in), 1e-30)
    )

    def step(state: Transport3DState, cfl_scale):
        u, v, w = bcs.set_normal(state.u, state.v, state.w)
        ghosts = bcs.ghosts(u, v, w)
        theta = state.theta

        if cfg.adaptive_dt:
            vel_max = jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v))),
                jnp.maximum(jnp.max(jnp.abs(w)), 1e-10),
            )
            dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
            dt_diff = 0.125 * h * h / max(cfg.nu, alpha)
            dt = jnp.clip(
                jnp.minimum(dt_cfl, dt_diff), cfg.dt_min, cfg.dt_max
            ).astype(jnp.float32)
        else:
            dt = jnp.float32(cfg.dt_base)

        conv_u, conv_v, conv_w = mac3d.advect3d(
            u, v, w, ghosts, dx, dy, dz, cfg.scheme
        )
        lap_u, lap_v, lap_w = mac3d.diffuse3d(u, v, w, ghosts, dx, dy, dz)
        u_star = u.at[:, :, 1:-1].add(dt * (cfg.nu * lap_u - conv_u))
        v_star = v.at[:, 1:-1, :].add(dt * (cfg.nu * lap_v - conv_v))
        w_star = w.at[1:-1].add(dt * (cfg.nu * lap_w - conv_w))
        u_star, v_star, w_star = bcs.set_normal(u_star, v_star, w_star)

        fx = fy = fz = jnp.float32(0.0)
        if ibm_mask_u is not None:
            from cfdsim_tpu.ibm import ibm_ramp

            strength = ibm_ramp(state.step, ibm_ramp_steps)
            du_ibm = u_star * (strength * ibm_mask_u)
            dv_ibm = v_star * (strength * ibm_mask_v)
            dw_ibm = w_star * (strength * ibm_mask_w)
            u_star = u_star - du_ibm
            v_star = v_star - dv_ibm
            w_star = w_star - dw_ibm
            if cfg.compute_metrics:
                cell = dx * dy * dz
                fx = jnp.sum(du_ibm) * cell / dt
                fy = jnp.sum(dv_ibm) * cell / dt
                fz = jnp.sum(dw_ibm) * cell / dt

        if ibm_ghost is not None:
            from cfdsim_tpu.ibm import ibm_ramp
            from cfdsim_tpu.ibm_ghost import apply_ghost_forcing

            strength = ibm_ramp(state.step, ibm_ramp_steps)
            u_star, du_g = apply_ghost_forcing(u_star, ibm_ghost.u, strength)
            v_star, dv_g = apply_ghost_forcing(v_star, ibm_ghost.v, strength)
            w_star, dw_g = apply_ghost_forcing(w_star, ibm_ghost.w, strength)
            if cfg.compute_metrics:
                cell = dx * dy * dz
                fx = jnp.sum(du_g) * cell / dt
                fy = jnp.sum(dv_g) * cell / dt
                fz = jnp.sum(dw_g) * cell / dt

        div_star = mac3d.divergence_mac3d(u_star, v_star, w_star, dx, dy, dz)
        rhs = div_star / dt
        if cfg.poisson.method != "dct":
            rhs = rhs - jnp.mean(rhs)
        phi = solve_poisson_3d(state.p, rhs, dx, dy, dz, cfg.poisson)
        u_new = u_star.at[:, :, 1:-1].add(
            -dt * (phi[:, :, 1:] - phi[:, :, :-1]) * (1.0 / dx)
        )
        v_new = v_star.at[:, 1:-1, :].add(
            -dt * (phi[:, 1:, :] - phi[:, :-1, :]) * (1.0 / dy)
        )
        w_new = w_star.at[1:-1].add(-dt * (phi[1:] - phi[:-1]) * (1.0 / dz))
        u_new, v_new, w_new = bcs.set_normal(u_new, v_new, w_new)
        u_new = jnp.clip(u_new, -cfg.max_velocity, cfg.max_velocity)
        v_new = jnp.clip(v_new, -cfg.max_velocity, cfg.max_velocity)
        w_new = jnp.clip(w_new, -cfg.max_velocity, cfg.max_velocity)

        # --- θ: conservative FV advection with the projected velocities
        # + diffusion (boussinesq3d pattern, open-domain ghosts)
        te = _theta_ghost_open(theta, cfg.theta_in)
        if cfg.theta_scheme == "upwind":
            thx = jnp.where(u_new >= 0.0, te[1:-1, 1:-1, :-1],
                            te[1:-1, 1:-1, 1:])
            # x_lo inflow face: the advective donor is theta_in itself,
            # not the mirrored diffusion ghost 2*theta_in - theta_0
            thx = thx.at[:, :, 0].set(jnp.where(
                u_new[:, :, 0] >= 0.0, jnp.float32(cfg.theta_in),
                theta[:, :, 0]))
            thy = jnp.where(v_new >= 0.0, te[1:-1, :-1, 1:-1],
                            te[1:-1, 1:, 1:-1])
            thz = jnp.where(w_new >= 0.0, te[:-1, 1:-1, 1:-1],
                            te[1:, 1:-1, 1:-1])
        elif cfg.theta_scheme == "tvd":
            # van-Leer MUSCL donor values (uniform spacing: the
            # stretched _muscl_axis with scalar metrics)
            from cfdsim_tpu.models.mac_stretched3d import _muscl_axis

            lox, hix = _muscl_axis(
                te[1:-1, 1:-1, :], 1.0 / dx, 0.5 * dx, 0.5 * dx, 2, True)
            thx = jnp.where(u_new >= 0.0, lox, hix)
            thx = thx.at[:, :, 0].set(jnp.where(
                u_new[:, :, 0] >= 0.0, jnp.float32(cfg.theta_in),
                theta[:, :, 0]))
            loy, hiy = _muscl_axis(
                te[1:-1, :, 1:-1], 1.0 / dy, 0.5 * dy, 0.5 * dy, 1, True)
            thy = jnp.where(v_new >= 0.0, loy, hiy)
            loz, hiz = _muscl_axis(
                te[:, 1:-1, 1:-1], 1.0 / dz, 0.5 * dz, 0.5 * dz, 0, True)
            thz = jnp.where(w_new >= 0.0, loz, hiz)
        else:
            thx = 0.5 * (te[1:-1, 1:-1, :-1] + te[1:-1, 1:-1, 1:])
            thy = 0.5 * (te[1:-1, :-1, 1:-1] + te[1:-1, 1:, 1:-1])
            thz = 0.5 * (te[:-1, 1:-1, 1:-1] + te[1:, 1:-1, 1:-1])
        fxa = u_new * thx
        fya = v_new * thy
        fza = w_new * thz
        adv = (
            (fxa[:, :, 1:] - fxa[:, :, :-1]) * (1.0 / dx)
            + (fya[:, 1:, :] - fya[:, :-1, :]) * (1.0 / dy)
            + (fza[1:] - fza[:-1]) * (1.0 / dz)
        )
        lap_t = (
            (te[1:-1, 1:-1, 2:] - 2.0 * theta + te[1:-1, 1:-1, :-2]) * ax
            + (te[1:-1, 2:, 1:-1] - 2.0 * theta + te[1:-1, :-2, 1:-1]) * ay
            + (te[2:, 1:-1, 1:-1] - 2.0 * theta + te[:-2, 1:-1, 1:-1]) * az
        )
        theta_new = theta + dt * (alpha * lap_t - adv)

        q_body = nusselt = jnp.float32(0.0)
        if ibm_mask_c is not None:
            from cfdsim_tpu.ibm import ibm_ramp

            strength = ibm_ramp(state.step, ibm_ramp_steps)
            dth = (cfg.theta_body - theta_new) * (strength * ibm_mask_c)
            theta_new = theta_new + dth
            if cfg.compute_metrics:
                # heat the isothermal body injects, per unit ρc_p — the
                # surface convective flux at steady state
                q_body = jnp.sum(dth) * (dx * dy * dz) / dt
                nusselt = q_body * qscale
        if ibm_ghost_c is not None:
            from cfdsim_tpu.ibm import ibm_ramp
            from cfdsim_tpu.ibm_ghost import apply_ghost_forcing

            strength = ibm_ramp(state.step, ibm_ramp_steps)
            shifted, dneg = apply_ghost_forcing(
                theta_new - cfg.theta_body, ibm_ghost_c, strength
            )
            theta_new = shifted + cfg.theta_body
            if cfg.compute_metrics:
                q_body = jnp.sum(-dneg) * (dx * dy * dz) / dt
                nusselt = q_body * qscale

        new_state = Transport3DState(
            u=u_new, v=v_new, w=w_new, p=phi, theta=theta_new,
            t=state.t + dt, step=state.step + 1,
        )
        if cfg.compute_metrics:
            div_post = mac3d.divergence_mac3d(u_new, v_new, w_new,
                                              dx, dy, dz)
            ucc, vcc, wcc = mac3d.center_velocities_3d(u_new, v_new, w_new)
            metrics = Transport3DMetrics(
                dt=dt,
                div_post=jnp.max(jnp.abs(div_post)),
                max_vel=jnp.maximum(
                    jnp.maximum(jnp.max(jnp.abs(u_new)),
                                jnp.max(jnp.abs(v_new))),
                    jnp.max(jnp.abs(w_new)),
                ),
                energy=jnp.mean(0.5 * (ucc * ucc + vcc * vcc + wcc * wcc)),
                fx=fx, fy=fy, fz=fz,
                q_body=q_body,
                nusselt=nusselt,
                theta_min=jnp.min(theta_new),
                theta_max=jnp.max(theta_new),
            )
        else:
            zero = jnp.float32(0.0)
            metrics = Transport3DMetrics(
                dt, zero, zero, zero, zero, zero, zero, zero, zero,
                zero, zero,
            )
        return new_state, metrics

    return step
