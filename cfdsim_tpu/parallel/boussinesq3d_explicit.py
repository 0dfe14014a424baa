"""Explicit shard_map step for the 3D Boussinesq heated cube.

The last cell of the model × multi-chip matrix: 3D natural convection on
P(None, "y", "x") blocks. MAC faces ride the trimmed 3D representation of
``parallel/mac3d_explicit.py`` (z local, width-1 y/x ppermute halos,
masked-write no-slip BCs via the shared ``cavity3d_bc_kit``), temperature
rides width-1 halos with Dirichlet-x / adiabatic-y ghosts as masked
writes and local z ghosts, and the projection is the exact distributed 3D
DCT. Central flow scheme (the validated heated-cube configuration).
Equality with the single-device ``boussinesq3d.make_step`` on an 8-device
mesh: tests/test_boussinesq.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from cfdsim_tpu.models.boussinesq import BoussinesqMetrics
from cfdsim_tpu.models.boussinesq3d import Boussinesq3DConfig, Boussinesq3DState
from cfdsim_tpu.parallel.mac_explicit import _pmax, _psum
from cfdsim_tpu.parallel.mac3d_explicit import (
    _halo_yx,
    cavity3d_bc_kit,
    shard_trimmed_state3d,
    trim_state3d,
    untrim_state3d,
)
from cfdsim_tpu.parallel.transforms import dct_poisson3d_local


# The trimmed-representation helpers are field-generic over any NamedTuple
# with u/v/w faces (theta/p are plain 3D cell arrays and shard the same
# way) — reuse the mac3d ones rather than duplicating them.
trim_boussinesq3d_state = trim_state3d
untrim_boussinesq3d_state = untrim_state3d
shard_boussinesq3d_state = shard_trimmed_state3d


def make_heated_cube_explicit_step(cfg: Boussinesq3DConfig, mesh: Mesh):
    """Build ``step(tstate, cfl_scale) -> (tstate, BoussinesqMetrics)`` on
    the trimmed 3D representation, P(None, "y", "x")-sharded."""
    g = cfg.grid
    nx, ny, nz = g.nx, g.ny, g.nz
    dx, dy, dz = g.dx, g.dy, g.dz
    nu = cfg.prandtl
    buoy = cfg.rayleigh * cfg.prandtl
    h = min(dx, dy, dz)
    py = mesh.shape["y"]
    px = mesh.shape["x"]
    ny_l, nx_l = ny // py, nx // px
    if ny % py or nx % px:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {py}x{px}")
    if ny_l < 2 or nx_l < 2:
        raise ValueError("local blocks must be at least 2x2 for width-1 halos")
    if cfg.poisson.method != "dct":
        raise ValueError("explicit heated-cube step supports poisson 'dct'")
    if cfg.flow_scheme != "central":
        raise ValueError(
            "the explicit sharded heated-cube step implements the central "
            "flow scheme (upwind/tvd need width-2 halos)"
        )
    if cfg.theta_scheme not in ("central", "upwind"):
        raise ValueError(f"unknown theta_scheme {cfg.theta_scheme!r}")

    bc_kit = cavity3d_bc_kit(nx, ny, py, px, ny_l, nx_l)
    spec = P(None, "y", "x")
    state_spec = Boussinesq3DState(u=spec, v=spec, w=spec, p=spec,
                                   theta=spec, t=P(), step=P())
    metric_spec = BoussinesqMetrics(*([P()] * len(BoussinesqMetrics._fields)))

    def step_local(ts: Boussinesq3DState, cfl_scale):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        ro, co, rp, cp, set_normal, pad = bc_kit(iy, ix)

        u_t, v_t, w_t = set_normal(ts.u, ts.v, ts.w)
        theta = ts.theta

        def theta_ghost(th):
            """(nz+2, ny_l+2, nx_l+2) padded θ: y/x halos + masked-write
            ghosts (Dirichlet x walls, adiabatic y), local z ghosts."""
            te = _halo_yx(th, py, px)
            right = jnp.roll(te, -1, axis=2)
            left = jnp.roll(te, 1, axis=2)
            te = jnp.where(cp == -1, 2.0 * cfg.theta_hot - right, te)
            te = jnp.where(cp == nx, 2.0 * cfg.theta_cold - left, te)
            below = jnp.roll(te, -1, axis=1)
            above = jnp.roll(te, 1, axis=1)
            te = jnp.where(rp == -1, below, te)   # adiabatic y walls
            te = jnp.where(rp == ny, above, te)
            return jnp.concatenate([te[:1], te, te[-1:]], axis=0)  # adiabatic z

        U, V, Wz = pad(u_t, v_t, w_t)
        UZG = jnp.concatenate([-U[:1], U, -U[-1:]], axis=0)  # no-slip z walls
        VZG = jnp.concatenate([-V[:1], V, -V[-1:]], axis=0)

        if cfg.adaptive_dt:
            vel_max = _pmax(
                jnp.maximum(
                    jnp.maximum(jnp.max(jnp.abs(u_t)), jnp.max(jnp.abs(v_t))),
                    jnp.maximum(jnp.max(jnp.abs(w_t)), 1e-10),
                )
            )
            dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
            dt_diff = 0.125 * h * h / max(nu, 1.0)
            dt = jnp.clip(
                jnp.minimum(dt_cfl, dt_diff), cfg.dt_min, cfg.dt_max
            ).astype(jnp.float32)
        else:
            dt = jnp.float32(cfg.dt_base)

        # --- central conservative advection + diffusion on padded blocks
        # (index maps exactly as mac3d_explicit.make_cavity3d_mac_…)
        UC = 0.5 * (U[:, :, :-1] + U[:, :, 1:])
        VCC = 0.5 * (V[:, :-1, :] + V[:, 1:, :])
        WCC = 0.5 * (Wz[:-1] + Wz[1:])
        UY = 0.5 * (U[:, :-1, :] + U[:, 1:, :])
        VX = 0.5 * (V[:, :, :-1] + V[:, :, 1:])
        UZ = 0.5 * (UZG[:-1] + UZG[1:])
        WX = 0.5 * (Wz[:, :, :-1] + Wz[:, :, 1:])
        VZ = 0.5 * (VZG[:-1] + VZG[1:])
        WY = 0.5 * (Wz[:, :-1, :] + Wz[:, 1:, :])

        FU = UC * UC
        GU = VX[:, 1:, :] * UY[:, :, 1:]
        HU = WX[:, 1:-1, :] * UZ[:, 1:-1, 1:]
        conv_u = (
            (FU[:, 1 : 1 + ny_l, 1:] - FU[:, 1 : 1 + ny_l, :-1]) * (1.0 / dx)
        )[:, :, :nx_l] + (
            (GU[:, 1:, :] - GU[:, :-1, :]) * (1.0 / dy)
        )[:, :, :nx_l] + (
            (HU[1:] - HU[:-1]) * (1.0 / dz)
        )[:, :, :nx_l]
        GVC = VCC * VCC
        HV = WY[:, :ny_l, 1 : 1 + nx_l] * VZ[:, 1 : 1 + ny_l, 1 : 1 + nx_l]
        conv_v = (
            (GU[:, :, 1:] - GU[:, :, :-1]) * (1.0 / dx)
        )[:, :ny_l, :] + (
            (GVC[:, 1:, :] - GVC[:, :-1, :]) * (1.0 / dy)
        )[:, :ny_l, 1 : 1 + nx_l] + (HV[1:] - HV[:-1]) * (1.0 / dz)
        FW = UZ[:, 1:-1, 1:] * WX[:, 1:-1, :]
        GW = VZ[:, 1:, 1 : 1 + nx_l] * WY[:, :, 1 : 1 + nx_l]
        HWC = WCC * WCC
        dHW = jnp.pad(
            (HWC[1:] - HWC[:-1]) * (1.0 / dz), ((1, 0), (0, 0), (0, 0))
        )
        conv_w = (
            (FW[:, :, 1:] - FW[:, :, :-1]) * (1.0 / dx)
        )[:nz] + (
            (GW[:, 1:, :] - GW[:, :-1, :]) * (1.0 / dy)
        )[:nz] + dHW[:, 1 : 1 + ny_l, 1 : 1 + nx_l]

        ax, ay, az = 1.0 / dx**2, 1.0 / dy**2, 1.0 / dz**2
        lap_u = (
            (U[:, 1:-1, 2:] - 2.0 * U[:, 1:-1, 1:-1] + U[:, 1:-1, :-2]) * ax
            + (U[:, 2:, 1:-1] - 2.0 * U[:, 1:-1, 1:-1] + U[:, :-2, 1:-1]) * ay
            + (UZG[2:, 1:-1, 1:-1] - 2.0 * U[:, 1:-1, 1:-1]
               + UZG[:-2, 1:-1, 1:-1]) * az
        )
        lap_v = (
            (V[:, 1:-1, 2:] - 2.0 * V[:, 1:-1, 1:-1] + V[:, 1:-1, :-2]) * ax
            + (V[:, 2:, 1:-1] - 2.0 * V[:, 1:-1, 1:-1] + V[:, :-2, 1:-1]) * ay
            + (VZG[2:, 1:-1, 1:-1] - 2.0 * V[:, 1:-1, 1:-1]
               + VZG[:-2, 1:-1, 1:-1]) * az
        )
        Wp = Wz[:nz]
        lap_w = (
            (Wp[:, 1:-1, 2:] - 2.0 * Wp[:, 1:-1, 1:-1] + Wp[:, 1:-1, :-2]) * ax
            + (Wp[:, 2:, 1:-1] - 2.0 * Wp[:, 1:-1, 1:-1] + Wp[:, :-2, 1:-1]) * ay
            + (Wz[1:nz + 1, 1:-1, 1:-1] - 2.0 * Wp[:, 1:-1, 1:-1]
               + jnp.concatenate([Wz[:1], Wz[: nz - 1]], axis=0)[:, 1:-1, 1:-1])
            * az
        )

        TE = theta_ghost(theta)  # (nz+2, ny_l+2, nx_l+2)
        # buoyancy at owned interior w z-faces: cells zf−1, zf
        th_face = 0.5 * (TE[1:nz, 1:-1, 1:-1] + TE[2 : nz + 1, 1:-1, 1:-1])
        u_star = u_t + jnp.where(co >= 1, dt * (nu * lap_u - conv_u), 0.0)
        v_star = v_t + jnp.where(ro >= 1, dt * (nu * lap_v - conv_v), 0.0)
        w_star = w_t.at[1:].add(
            dt * ((nu * lap_w - conv_w)[1:] + buoy * th_face)
        )
        u_star, v_star, w_star = set_normal(u_star, v_star, w_star)

        # --- exact distributed 3D projection
        US, VS, WSz = pad(u_star, v_star, w_star)
        div_star = (
            (US[:, 1:-1, 2:] - US[:, 1:-1, 1:-1]) * (1.0 / dx)
            + (VS[:, 2:, 1:-1] - VS[:, 1:-1, 1:-1]) * (1.0 / dy)
            + (WSz[1:, 1:-1, 1:-1] - WSz[:-1, 1:-1, 1:-1]) * (1.0 / dz)
        )
        phi = dct_poisson3d_local(div_star / dt, dx, dy, dz, py, px)
        PH = _halo_yx(phi, py, px)
        gx = (PH[:, 1:-1, 1:-1] - PH[:, 1:-1, :-2]) * (1.0 / dx)
        gy_ = (PH[:, 1:-1, 1:-1] - PH[:, :-2, 1:-1]) * (1.0 / dy)
        u_new = u_star - jnp.where(co >= 1, dt * gx, 0.0)
        v_new = v_star - jnp.where(ro >= 1, dt * gy_, 0.0)
        w_new = w_star.at[1:].add(-dt * (phi[1:] - phi[:-1]) * (1.0 / dz))
        u_new, v_new, w_new = set_normal(u_new, v_new, w_new)

        # --- temperature FV advection + diffusion with padded faces
        UN, VN, WNz = pad(u_new, v_new, w_new)
        uf = UN[:, 1:-1, 1:]       # faces gx0..gx0+nx_l
        vf = VN[:, 1:, 1:-1]       # y-faces gy0..gy0+ny_l
        wf = WNz[:, 1:-1, 1:-1]    # z-faces 0..nz (local)
        te_lo_x = TE[1:-1, 1:-1, :-1]
        te_hi_x = TE[1:-1, 1:-1, 1:]
        te_lo_y = TE[1:-1, :-1, 1:-1]
        te_hi_y = TE[1:-1, 1:, 1:-1]
        te_lo_z = TE[:-1, 1:-1, 1:-1]
        te_hi_z = TE[1:, 1:-1, 1:-1]
        if cfg.theta_scheme == "upwind":
            thx = jnp.where(uf >= 0.0, te_lo_x, te_hi_x)
            thy = jnp.where(vf >= 0.0, te_lo_y, te_hi_y)
            thz = jnp.where(wf >= 0.0, te_lo_z, te_hi_z)
        else:
            thx = 0.5 * (te_lo_x + te_hi_x)
            thy = 0.5 * (te_lo_y + te_hi_y)
            thz = 0.5 * (te_lo_z + te_hi_z)
        fx = uf * thx
        fy = vf * thy
        fz = wf * thz
        adv = (
            (fx[:, :, 1:] - fx[:, :, :-1]) * (1.0 / dx)
            + (fy[:, 1:, :] - fy[:, :-1, :]) * (1.0 / dy)
            + (fz[1:] - fz[:-1]) * (1.0 / dz)
        )
        lap_t = (
            (TE[1:-1, 1:-1, 2:] - 2.0 * theta + TE[1:-1, 1:-1, :-2]) * ax
            + (TE[1:-1, 2:, 1:-1] - 2.0 * theta + TE[1:-1, :-2, 1:-1]) * ay
            + (TE[2:, 1:-1, 1:-1] - 2.0 * theta + TE[:-2, 1:-1, 1:-1]) * az
        )
        theta_new = theta + dt * (lap_t - adv)

        new_ts = Boussinesq3DState(
            u=u_new, v=v_new, w=w_new, p=phi, theta=theta_new,
            t=ts.t + dt, step=ts.step + 1,
        )

        # --- diagnostics (boussinesq3d.make_step, distributed reductions)
        div_post = (
            (UN[:, 1:-1, 2:] - UN[:, 1:-1, 1:-1]) * (1.0 / dx)
            + (VN[:, 2:, 1:-1] - VN[:, 1:-1, 1:-1]) * (1.0 / dy)
            + (WNz[1:, 1:-1, 1:-1] - WNz[:-1, 1:-1, 1:-1]) * (1.0 / dz)
        )
        dT = cfg.theta_hot - cfg.theta_cold
        lx = g.x_max - g.x_min
        n_wall = float(nz * ny)
        nu_hot = _psum(jnp.sum(jnp.where(
            (co == 0)[None], 2.0 * (cfg.theta_hot - theta_new) / dx, 0.0
        ))) * lx / (n_wall * dT)
        TEn = theta_ghost(theta_new)
        i_mid = nx // 2
        th_mid = 0.5 * (TEn[1:-1, 1:-1, :-1] + TEn[1:-1, 1:-1, 1:])
        dthdx = (TEn[1:-1, 1:-1, 1:] - TEn[1:-1, 1:-1, :-1]) * (1.0 / dx)
        gface = co[0, 0, :]
        col_sel = (gface == i_mid)[None, None, :]
        plane = (g.y_max - g.y_min) * (g.z_max - g.z_min)
        nu_mid = _psum(jnp.sum(jnp.where(
            col_sel,
            uf[:, :, :nx_l] * th_mid[:, :, :nx_l] - dthdx[:, :, :nx_l],
            0.0,
        ))) * dy * dz * lx / (dT * plane)
        ucc = 0.5 * (UN[:, 1:-1, 1:-1] + UN[:, 1:-1, 2:])
        vcc = 0.5 * (VN[:, 1:-1, 1:-1] + VN[:, 2:, 1:-1])
        wcc = 0.5 * (WNz[:-1, 1:-1, 1:-1] + WNz[1:, 1:-1, 1:-1])
        metrics = BoussinesqMetrics(
            dt=dt,
            div_post=_pmax(jnp.max(jnp.abs(div_post))),
            max_vel=_pmax(
                jnp.maximum(
                    jnp.maximum(jnp.max(jnp.abs(u_new)), jnp.max(jnp.abs(v_new))),
                    jnp.max(jnp.abs(w_new)),
                )
            ),
            energy=_psum(
                jnp.sum(0.5 * (ucc * ucc + vcc * vcc + wcc * wcc))
            ) / float(nx * ny * nz),
            nu_hot_wall=nu_hot,
            nu_mid=nu_mid,
            theta_min=-_pmax(jnp.max(-theta_new)),
            theta_max=_pmax(jnp.max(theta_new)),
        )
        return new_ts, metrics

    return jax.jit(jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=(state_spec, P()),
        out_specs=(state_spec, metric_spec),
    ))
