"""Explicit shard_map step for the 3D staggered (MAC) solver.

The multi-chip path for the 3D accuracy tier (models/mac3d.py): the face
arrays are uneven in one axis each, so GSPMD hits the same XLA SPMD
miscompilation as the 2D MAC state (see test_parallel.py xfails). Here
the *trimmed* 3D state (last boundary face of each component dropped —
u[..., :-1], v[:, :-1, :], w[:-1] — all (nz, ny, nx)) is sharded
P(None, "y", "x"): z stays local (the cavity3d layout, BASELINE config
5), y/x ride width-1 ``ppermute`` halos, boundary faces and tangential
ghosts are global-index masked writes (z-direction ghosts are plain local
concatenations), and the projection is the exact distributed 3D DCT
(``transforms.dct_poisson3d_local``).

Cavity BCs only (lid at z_hi moving in +x — the only 3D MAC case);
central conservative advection, matching mac3d.make_step. Equality with
the single-device step on an 8-device mesh: tests/test_mac3d_explicit.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from cfdsim_tpu.models.incompressible import StepMetrics
from cfdsim_tpu.models.mac3d import MAC3DConfig, MAC3DState
from cfdsim_tpu.parallel.halo import _exchange_axis
from cfdsim_tpu.parallel.mac_explicit import _pmax, _psum


def trim_state3d(state: MAC3DState) -> MAC3DState:
    """Full 3D MAC state → mesh-divisible trimmed state."""
    return state._replace(
        u=state.u[:, :, :-1], v=state.v[:, :-1, :], w=state.w[:-1]
    )


def untrim_state3d(tstate: MAC3DState, lid_velocity: float = 1.0) -> MAC3DState:
    """Trimmed → full (cavity BCs: all dropped boundary faces are 0)."""
    del lid_velocity  # the lid is tangential; dropped normal faces are 0
    return tstate._replace(
        u=jnp.pad(tstate.u, ((0, 0), (0, 0), (0, 1))),
        v=jnp.pad(tstate.v, ((0, 0), (0, 1), (0, 0))),
        w=jnp.pad(tstate.w, ((0, 1), (0, 0), (0, 0))),
    )


def shard_trimmed_state3d(tstate: MAC3DState, mesh: Mesh) -> MAC3DState:
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P(None, "y", "x"))

    def place(x):
        x = jnp.asarray(x)
        if jnp.ndim(x) == 3:
            return jax.device_put(x, sh)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tstate)


def _halo_yx(block, py: int, px: int, w: int = 1):
    """Halo-pad a (nz, ny_l, nx_l) block along y (axis 1) and x (axis 2)."""
    lo, hi = _exchange_axis(block, "y", py, axis=1, width=w)
    block = jnp.concatenate([lo, block, hi], axis=1)
    lo, hi = _exchange_axis(block, "x", px, axis=2, width=w)
    return jnp.concatenate([lo, block, hi], axis=2)


def cavity3d_bc_kit(nx: int, ny: int, py: int, px: int,
                    ny_l: int, nx_l: int):
    """Shared trimmed-state cavity BC machinery for the 3D explicit steps
    (uniform and stretched): ``build(iy, ix)`` → (ro, co, rp, cp,
    set_normal, pad), where ``set_normal`` applies the in-trimmed-array
    normal-face writes and ``pad`` halo-pads + writes the dropped boundary
    faces and tangential ghosts (no-slip side walls; the z-direction lid
    ghosts are applied by the caller since they carry the lid velocity)."""

    def build(iy, ix):
        gy0 = iy * ny_l
        gx0 = ix * nx_l
        ro = gy0 + lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 0)[None]
        co = gx0 + lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 1)[None]
        shp_p = (ny_l + 2, nx_l + 2)
        rp = gy0 - 1 + lax.broadcasted_iota(jnp.int32, shp_p, 0)[None]
        cp = gx0 - 1 + lax.broadcasted_iota(jnp.int32, shp_p, 1)[None]

        def set_normal(u_t, v_t, w_t):
            u_t = jnp.where(co == 0, 0.0, u_t)   # u x-face 0
            v_t = jnp.where(ro == 0, 0.0, v_t)   # v y-face 0
            w_t = w_t.at[0].set(0.0)             # w z-face 0 (local)
            return u_t, v_t, w_t

        def pad(u_t, v_t, w_t):
            """Halo-pad + all boundary-face and tangential-ghost writes →
            the padded arrays agree with mac3d's ghost-extended arrays at
            every in-domain and ghost position."""
            U = _halo_yx(u_t, py, px)
            V = _halo_yx(v_t, py, px)
            W = _halo_yx(w_t, py, px)
            # dropped normal boundary faces (cavity: all zero)
            U = jnp.where(cp == nx, 0.0, U)
            V = jnp.where(rp == ny, 0.0, V)
            Wz = jnp.concatenate(
                [W, jnp.zeros_like(W[:1])], axis=0
            )  # w z-face nz = 0
            # tangential ghosts in y (u, w) and x (v, w): no-slip walls
            U = jnp.where(rp == -1, -jnp.roll(U, -1, axis=1), U)
            U = jnp.where(rp == ny, -jnp.roll(U, 1, axis=1), U)
            V = jnp.where(cp == -1, -jnp.roll(V, -1, axis=2), V)
            V = jnp.where(cp == nx, -jnp.roll(V, 1, axis=2), V)
            Wz = jnp.where(rp == -1, -jnp.roll(Wz, -1, axis=1), Wz)
            Wz = jnp.where(rp == ny, -jnp.roll(Wz, 1, axis=1), Wz)
            Wz = jnp.where(cp == -1, -jnp.roll(Wz, -1, axis=2), Wz)
            Wz = jnp.where(cp == nx, -jnp.roll(Wz, 1, axis=2), Wz)
            return U, V, Wz

        return ro, co, rp, cp, set_normal, pad

    return build


def make_cavity3d_mac_explicit_step(cfg: MAC3DConfig, mesh: Mesh,
                                    lid_velocity: float = 1.0):
    """Build ``step(tstate, cfl_scale) -> (tstate, StepMetrics)`` on the
    trimmed 3D representation, P(None, "y", "x")-sharded."""
    g = cfg.grid
    nx, ny, nz = g.nx, g.ny, g.nz
    dx, dy, dz = g.dx, g.dy, g.dz
    ax, ay, az = 1.0 / dx**2, 1.0 / dy**2, 1.0 / dz**2
    h = min(dx, dy, dz)
    py = mesh.shape["y"]
    px = mesh.shape["x"]
    ny_l, nx_l = ny // py, nx // px
    if ny % py or nx % px:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {py}x{px}")
    if ny_l < 2 or nx_l < 2:
        raise ValueError("local blocks must be at least 2x2 for width-1 halos")
    if cfg.poisson.method != "dct":
        raise ValueError("explicit 3D MAC step supports poisson method 'dct'")
    if getattr(cfg, "scheme", "central") != "central":
        raise ValueError(
            "the explicit sharded 3D MAC step implements the central "
            "scheme; upwind/tvd need width-2 halos (run single-device)"
        )

    from cfdsim_tpu.parallel.transforms import dct_poisson3d_local

    spec = P(None, "y", "x")
    state_spec = MAC3DState(u=spec, v=spec, w=spec, p=spec, t=P(), step=P())
    metric_spec = StepMetrics(*([P()] * len(StepMetrics._fields)))

    bc_kit = cavity3d_bc_kit(nx, ny, py, px, ny_l, nx_l)

    def step_local(ts: MAC3DState, cfl_scale):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        ro, co, rp, cp, set_normal, pad = bc_kit(iy, ix)

        u_t, v_t, w_t = set_normal(ts.u, ts.v, ts.w)
        U, V, Wz = pad(u_t, v_t, w_t)
        # z-direction ghosts (local): no-slip bottom, moving lid at z_hi
        UZG = jnp.concatenate(
            [-U[:1], U, 2.0 * lid_velocity - U[-1:]], axis=0
        )
        VZG = jnp.concatenate([-V[:1], V, -V[-1:]], axis=0)

        # --- adaptive dt (mac3d; dropped faces are all 0 for the cavity,
        # so the trimmed max equals the full-array max)
        if cfg.adaptive_dt:
            vel_max = _pmax(
                jnp.maximum(
                    jnp.maximum(jnp.max(jnp.abs(u_t)), jnp.max(jnp.abs(v_t))),
                    jnp.maximum(jnp.max(jnp.abs(w_t)), 1e-10),
                )
            )
            dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
            dt_visc = 0.125 * h * h / cfg.nu
            dt = jnp.clip(
                jnp.minimum(dt_cfl, dt_visc), cfg.dt_min, cfg.dt_max
            ).astype(jnp.float32)
        else:
            dt = jnp.float32(cfg.dt_base)

        # --- edge interpolants (index maps: U[z,r,c] ↔ u(z, gy0−1+r,
        # face gx0−1+c); UY rows / VX cols are corner-aligned at +0)
        UC = 0.5 * (U[:, :, :-1] + U[:, :, 1:])
        VCC = 0.5 * (V[:, :-1, :] + V[:, 1:, :])
        WCC = 0.5 * (Wz[:-1] + Wz[1:])
        UY = 0.5 * (U[:, :-1, :] + U[:, 1:, :])     # (nz, ny_l+1, nx_l+2)
        VX = 0.5 * (V[:, :, :-1] + V[:, :, 1:])     # (nz, ny_l+2, nx_l+1)
        UZ = 0.5 * (UZG[:-1] + UZG[1:])             # (nz+1, ny_l+2, nx_l+2)
        WX = 0.5 * (Wz[:, :, :-1] + Wz[:, :, 1:])   # (nz+1, ny_l+2, nx_l+1)
        VZ = 0.5 * (VZG[:-1] + VZG[1:])             # (nz+1, ny_l+2, nx_l+2)
        WY = 0.5 * (Wz[:, :-1, :] + Wz[:, 1:, :])   # (nz+1, ny_l+1, nx_l+2)

        # --- conservative central fluxes (mac3d.make_step)
        FU = UC * UC
        GU = VX[:, 1:, :] * UY[:, :, 1:]       # (zf·row: y-face gy0+a, x-face gx0+b)
        HU = WX[:, 1:-1, :] * UZ[:, 1:-1, 1:]  # (z-face, row gy0+r, x-face gx0+c)
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

        # --- 7-point diffusion on owned faces
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
        Wp = Wz[:nz]  # trimmed-aligned padded w (z-faces 0..nz−1)
        lap_w = (
            (Wp[:, 1:-1, 2:] - 2.0 * Wp[:, 1:-1, 1:-1] + Wp[:, 1:-1, :-2]) * ax
            + (Wp[:, 2:, 1:-1] - 2.0 * Wp[:, 1:-1, 1:-1] + Wp[:, :-2, 1:-1]) * ay
            + (Wz[1:nz + 1, 1:-1, 1:-1] - 2.0 * Wp[:, 1:-1, 1:-1]
               + jnp.concatenate([Wz[:1], Wz[: nz - 1]], axis=0)[:, 1:-1, 1:-1])
            * az
        )

        u_star = u_t + jnp.where(co >= 1, dt * (cfg.nu * lap_u - conv_u), 0.0)
        v_star = v_t + jnp.where(ro >= 1, dt * (cfg.nu * lap_v - conv_v), 0.0)
        w_star = w_t.at[1:].add(
            dt * (cfg.nu * lap_w - conv_w)[1:]
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
        u_new = jnp.clip(u_new, -cfg.max_velocity, cfg.max_velocity)
        v_new = jnp.clip(v_new, -cfg.max_velocity, cfg.max_velocity)
        w_new = jnp.clip(w_new, -cfg.max_velocity, cfg.max_velocity)

        new_ts = MAC3DState(
            u=u_new, v=v_new, w=w_new, p=phi,
            t=ts.t + dt, step=ts.step + 1,
        )

        if cfg.compute_metrics:
            UN, VN, WNz = pad(u_new, v_new, w_new)
            div_post = (
                (UN[:, 1:-1, 2:] - UN[:, 1:-1, 1:-1]) * (1.0 / dx)
                + (VN[:, 2:, 1:-1] - VN[:, 1:-1, 1:-1]) * (1.0 / dy)
                + (WNz[1:, 1:-1, 1:-1] - WNz[:-1, 1:-1, 1:-1]) * (1.0 / dz)
            )
            ucc = 0.5 * (UN[:, 1:-1, 1:-1] + UN[:, 1:-1, 2:])
            vcc = 0.5 * (VN[:, 1:-1, 1:-1] + VN[:, 2:, 1:-1])
            wcc = 0.5 * (WNz[:-1, 1:-1, 1:-1] + WNz[1:, 1:-1, 1:-1])
            # ω_x at interior (z-face, y-face) edges (mac3d diagnostic)
            dwdy = (
                (WNz[:, 1 : 1 + ny_l, 1 : 1 + nx_l]
                 - WNz[:, 0:ny_l, 1 : 1 + nx_l]) * (1.0 / dy)
            )[1:nz]
            dvdz = (
                VN[1:, 1 : 1 + ny_l, 1 : 1 + nx_l]
                - VN[:-1, 1 : 1 + ny_l, 1 : 1 + nx_l]
            ) * (1.0 / dz)
            vort = jnp.where((ro >= 1), dwdy - dvdz, 0.0)
            metrics = StepMetrics(
                dt=dt,
                div_pre=_pmax(jnp.max(jnp.abs(div_star))),
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
                vort_max=_pmax(jnp.max(jnp.abs(vort))),
                poisson_res=jnp.float32(0.0),
            )
        else:
            zero = jnp.float32(0.0)
            metrics = StepMetrics(dt, zero, zero, zero, zero, zero, zero)
        return new_ts, metrics

    return jax.jit(jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=(state_spec, P()),
        out_specs=(state_spec, metric_spec),
    ))
