"""Explicit shard_map step for the 2D Boussinesq solver (both the
side-heated cavity and the bottom-heated Rayleigh–Bénard orientation).

Multi-chip natural convection: the MAC faces ride the trimmed
representation of ``parallel/mac_explicit.py`` (width-2 ppermute halos,
masked-write no-slip BCs, exact distributed DCT projection) and the
cell-centered temperature rides width-1 halos with its Dirichlet/adiabatic
ghosts written by global-index masks. Buoyancy, the conservative FV θ
advection, and the Nusselt diagnostics mirror ``models/boussinesq.py``
term for term; equality with the single-device step on an 8-device mesh
is asserted in tests/test_boussinesq.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cfdsim_tpu.models.boussinesq import (
    BoussinesqConfig,
    BoussinesqMetrics,
    BoussinesqState,
)
from cfdsim_tpu.parallel.halo import halo_exchange
from cfdsim_tpu.parallel.mac_explicit import (
    _advect_local,
    _grids,
    _pmax,
    _psum,
    cavity_mac_local_bcs,
)
from cfdsim_tpu.parallel.transforms import dct_poisson_local


def shard_boussinesq_state(tstate: BoussinesqState, mesh: Mesh):
    sh = NamedSharding(mesh, P("y", "x"))

    def place(x):
        x = jnp.asarray(x)
        if jnp.ndim(x) == 2:
            return jax.device_put(x, sh)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tstate)


def trim_boussinesq_state(state: BoussinesqState) -> BoussinesqState:
    return state._replace(u=state.u[:, :-1], v=state.v[:-1, :])


def untrim_boussinesq_state(tstate: BoussinesqState) -> BoussinesqState:
    """Closed no-slip box: all dropped boundary faces are zero."""
    return tstate._replace(
        u=jnp.pad(tstate.u, ((0, 0), (0, 1))),
        v=jnp.pad(tstate.v, ((0, 1), (0, 0))),
    )


def make_heated_cavity_explicit_step(cfg: BoussinesqConfig, mesh: Mesh):
    """Build ``step(tstate, cfl_scale) -> (tstate, BoussinesqMetrics)`` on
    the trimmed representation, P("y","x")-sharded."""
    g = cfg.grid
    ny, nx = g.ny, g.nx
    dx, dy = g.dx, g.dy
    nu = cfg.prandtl
    buoy = cfg.rayleigh * cfg.prandtl
    h = min(dx, dy)
    py = mesh.shape["y"]
    px = mesh.shape["x"]
    ny_l, nx_l = ny // py, nx // px
    if ny % py or nx % px:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {py}x{px}")
    if ny_l < 4 or nx_l < 4:
        raise ValueError("local blocks must be at least 4x4 for width-2 halos")
    if cfg.poisson.method != "dct":
        raise ValueError("explicit heated-cavity step supports poisson 'dct'")
    if cfg.heated_axis not in ("x", "y"):
        raise ValueError(f"unknown heated_axis {cfg.heated_axis!r}")
    if cfg.theta_scheme not in ("central", "upwind"):
        raise ValueError(f"unknown theta_scheme {cfg.theta_scheme!r}")

    bcs = cavity_mac_local_bcs(ny, nx, lid_velocity=0.0)
    spec = P("y", "x")
    state_spec = BoussinesqState(u=spec, v=spec, p=spec, theta=spec,
                                 t=P(), step=P())
    metric_spec = BoussinesqMetrics(
        *([P()] * len(BoussinesqMetrics._fields))
    )

    def step_local(ts: BoussinesqState, cfl_scale):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        gr0, gc0 = _grids((ny_l, nx_l), iy, ix, ny_l, nx_l, 0)

        u_t, v_t = bcs.pre(ts.u, ts.v, gc0, gr0, ts)
        theta = ts.theta

        def pad_faces(u_t, v_t, w: int):
            U = halo_exchange(u_t, py, px, width=w)
            V = halo_exchange(v_t, py, px, width=w)
            grU, gfU = _grids(U.shape, iy, ix, ny_l, nx_l, w)
            grV, gcV = _grids(V.shape, iy, ix, ny_l, nx_l, w)
            U = bcs.post_u(U, grU, gfU, ts, ())
            V = bcs.post_v(V, grV, gcV, ts, ())
            return U, V, (grU, gfU, grV, gcV)

        def theta_ghost(th):
            """Width-1 padded θ with the ghosts written by global-index
            masks (boussinesq._theta_ghost sharded): Dirichlet on the
            heated pair of walls, adiabatic on the other."""
            te = halo_exchange(th, py, px, width=1)
            gr, gc = _grids(te.shape, iy, ix, ny_l, nx_l, 1)
            right = jnp.roll(te, -1, axis=1)
            left = jnp.roll(te, 1, axis=1)
            below = jnp.roll(te, -1, axis=0)
            above = jnp.roll(te, 1, axis=0)
            if cfg.heated_axis == "x":
                te = jnp.where(gc == -1, 2.0 * cfg.theta_hot - right, te)
                te = jnp.where(gc == nx, 2.0 * cfg.theta_cold - left, te)
                below = jnp.roll(te, -1, axis=0)
                above = jnp.roll(te, 1, axis=0)
                te = jnp.where(gr == -1, below, te)   # adiabatic bottom
                te = jnp.where(gr == ny, above, te)   # adiabatic top
            else:  # heated from below (Rayleigh–Bénard)
                te = jnp.where(gr == -1, 2.0 * cfg.theta_hot - below, te)
                te = jnp.where(gr == ny, 2.0 * cfg.theta_cold - above, te)
                right = jnp.roll(te, -1, axis=1)
                left = jnp.roll(te, 1, axis=1)
                te = jnp.where(gc == -1, right, te)   # adiabatic left
                te = jnp.where(gc == nx, left, te)    # adiabatic right
            return te

        U, V, (grU, gfU, grV, gcV) = pad_faces(u_t, v_t, w=2)

        if cfg.adaptive_dt:
            real_u = (grU >= 0) & (grU < ny) & (gfU >= 0) & (gfU <= nx)
            real_v = (grV >= 0) & (grV <= ny) & (gcV >= 0) & (gcV < nx)
            vel_max = _pmax(
                jnp.maximum(
                    jnp.max(jnp.where(real_u, jnp.abs(U), 0.0)),
                    jnp.max(jnp.where(real_v, jnp.abs(V), 0.0)),
                )
            )
            vel_max = jnp.maximum(vel_max, 1e-10)
            dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
            dt_diff = 0.2 * h * h / max(nu, 1.0)
            dt = jnp.clip(jnp.minimum(dt_cfl, dt_diff), cfg.dt_min, cfg.dt_max)
            dt = dt.astype(jnp.float32)
        else:
            dt = jnp.float32(cfg.dt_base)

        # --- momentum predictor + buoyancy at owned v-faces
        conv_u, conv_v = _advect_local(
            U, V, grU, gfU, grV, gcV, ny, nx, dx, dy, cfg.flow_scheme
        )
        ax, ay = 1.0 / (dx * dx), 1.0 / (dy * dy)
        lap_u = (U[2:-2, 3:-1] - 2.0 * U[2:-2, 2:-2] + U[2:-2, 1:-3]) * ax + (
            U[3:-1, 2:-2] - 2.0 * U[2:-2, 2:-2] + U[1:-3, 2:-2]
        ) * ay
        lap_v = (V[2:-2, 3:-1] - 2.0 * V[2:-2, 2:-2] + V[2:-2, 1:-3]) * ax + (
            V[3:-1, 2:-2] - 2.0 * V[2:-2, 2:-2] + V[1:-3, 2:-2]
        ) * ay
        TE = theta_ghost(theta)
        # θ at owned v-faces (gy0+j): cells gy0+j−1, gy0+j → TE rows j, j+1
        th_face = 0.5 * (TE[:-2, 1:-1] + TE[1:-1, 1:-1])
        u_star = u_t + jnp.where(gc0 >= 1, dt * (nu * lap_u - conv_u), 0.0)
        v_star = v_t + jnp.where(
            gr0 >= 1, dt * (nu * lap_v - conv_v + buoy * th_face), 0.0
        )
        u_star, v_star = bcs.pre(u_star, v_star, gc0, gr0, ts)

        # --- exact distributed projection
        US, VS, _ = pad_faces(u_star, v_star, w=1)
        div_star = (US[1:-1, 2:] - US[1:-1, 1:-1]) * (1.0 / dx) + (
            VS[2:, 1:-1] - VS[1:-1, 1:-1]
        ) * (1.0 / dy)
        phi = dct_poisson_local(div_star / dt, dx, dy, py, px)
        PH = halo_exchange(phi, py, px, width=1)
        gx = (PH[1:-1, 1:-1] - PH[1:-1, :-2]) * (1.0 / dx)
        gy_ = (PH[1:-1, 1:-1] - PH[:-2, 1:-1]) * (1.0 / dy)
        u_new = u_star - jnp.where(gc0 >= 1, dt * gx, 0.0)
        v_new = v_star - jnp.where(gr0 >= 1, dt * gy_, 0.0)
        u_new, v_new = bcs.pre(u_new, v_new, gc0, gr0, ts)

        # --- temperature: conservative FV advection with projected faces
        UN, VN, _ = pad_faces(u_new, v_new, w=1)
        # owned u-faces gx0..gx0+nx_l: UN[1:-1, 1:] (the +1 face from halo
        # or the dropped-face write); θ neighbors from TE
        uf = UN[1:-1, 1:]  # (ny_l, nx_l+1): faces gx0..gx0+nx_l
        vf = VN[1:, 1:-1]  # (ny_l+1, nx_l): row-faces gy0..gy0+ny_l
        te_lo_x = TE[1:-1, :-1]  # cell left of face (ny_l, nx_l+1)
        te_hi_x = TE[1:-1, 1:]
        te_lo_y = TE[:-1, 1:-1]
        te_hi_y = TE[1:, 1:-1]
        if cfg.theta_scheme == "upwind":
            thx = jnp.where(uf >= 0.0, te_lo_x, te_hi_x)
            thy = jnp.where(vf >= 0.0, te_lo_y, te_hi_y)
        else:
            thx = 0.5 * (te_lo_x + te_hi_x)
            thy = 0.5 * (te_lo_y + te_hi_y)
        fx_ = uf * thx
        fy_ = vf * thy
        adv = (fx_[:, 1:] - fx_[:, :-1]) * (1.0 / dx) + (
            fy_[1:, :] - fy_[:-1, :]
        ) * (1.0 / dy)
        lap_t = (TE[1:-1, 2:] - 2.0 * theta + TE[1:-1, :-2]) * (1.0 / dx**2) + (
            TE[2:, 1:-1] - 2.0 * theta + TE[:-2, 1:-1]
        ) * (1.0 / dy**2)
        theta_new = theta + dt * (lap_t - adv)

        new_ts = BoussinesqState(
            u=u_new, v=v_new, p=phi, theta=theta_new,
            t=ts.t + dt, step=ts.step + 1,
        )

        # --- diagnostics (boussinesq.make_step, distributed reductions;
        # per heated-axis orientation)
        div_post = (UN[1:-1, 2:] - UN[1:-1, 1:-1]) * (1.0 / dx) + (
            VN[2:, 1:-1] - VN[1:-1, 1:-1]
        ) * (1.0 / dy)
        dT = cfg.theta_hot - cfg.theta_cold
        lx = g.x_max - g.x_min
        ly = g.y_max - g.y_min
        TEn = theta_ghost(theta_new)
        if cfg.heated_axis == "x":
            nu_hot = _psum(jnp.sum(jnp.where(
                gc0 == 0, 2.0 * (cfg.theta_hot - theta_new) / dx, 0.0
            ))) * lx / (float(ny) * dT)
            i_mid = nx // 2
            th_mid = 0.5 * (TEn[1:-1, :-1] + TEn[1:-1, 1:])    # at faces
            dthdx = (TEn[1:-1, 1:] - TEn[1:-1, :-1]) * (1.0 / dx)
            gface = gc0[0, :]  # owned face indices per local col
            col_sel = (gface == i_mid)[None, :]
            nu_mid = _psum(jnp.sum(jnp.where(
                col_sel, uf[:, :nx_l] * th_mid[:, :nx_l] - dthdx[:, :nx_l],
                0.0,
            ))) * dy * lx / (dT * ly)
        else:
            nu_hot = _psum(jnp.sum(jnp.where(
                gr0 == 0, 2.0 * (cfg.theta_hot - theta_new) / dy, 0.0
            ))) * ly / (float(nx) * dT)
            j_mid = ny // 2
            th_mid = 0.5 * (TEn[:-1, 1:-1] + TEn[1:, 1:-1])    # at y-faces
            dthdy = (TEn[1:, 1:-1] - TEn[:-1, 1:-1]) * (1.0 / dy)
            grow = gr0[:, 0]
            row_sel = (grow == j_mid)[:, None]
            nu_mid = _psum(jnp.sum(jnp.where(
                row_sel, vf[:ny_l, :] * th_mid[:ny_l, :] - dthdy[:ny_l, :],
                0.0,
            ))) * dx * ly / (dT * lx)
        ucc = 0.5 * (UN[1:-1, 1:-1] + UN[1:-1, 2:])
        vcc = 0.5 * (VN[1:-1, 1:-1] + VN[2:, 1:-1])
        metrics = BoussinesqMetrics(
            dt=dt,
            div_post=_pmax(jnp.max(jnp.abs(div_post))),
            max_vel=_pmax(
                jnp.maximum(jnp.max(jnp.abs(u_new)), jnp.max(jnp.abs(v_new)))
            ),
            energy=_psum(jnp.sum(0.5 * (ucc * ucc + vcc * vcc)))
            / float(ny * nx),
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
