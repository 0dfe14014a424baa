"""Explicit shard_map step for the 3D forced-convection tier — the
multi-chip twin of models/transport3d.py (the ``heated_sphere`` case).

Composition: the sharded external-flow + IBM momentum step
(``mac3d_explicit.make_sphere_mac3d_explicit_step``) advances the
velocities; a second shard_map advances θ with the conservative FV
fluxes of the *projected* velocities. θ is cell-centered (nz, ny, nx) —
evenly shardable P(None, "y", "x") — with width-1 ppermute halos and
the open-domain ghosts (Dirichlet inflow mirror, zero-gradient
outflow/lateral, adiabatic z) as global-index masked writes; the
velocity faces the θ fluxes need (including the dropped mass-consistent
outflow face) are rebuilt with the same external-flow pad machinery the
momentum step uses. The isothermal-body θ penalization and its psum'd
heat flux (→ Nusselt) mirror the single-device step exactly
(equality-tested in tests/test_moving_ibm.py's transport section /
tests/test_transport3d.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from cfdsim_tpu.models.mac3d import MAC3DState
from cfdsim_tpu.models.transport3d import (
    Transport3DConfig,
    Transport3DMetrics,
    Transport3DState,
)
from cfdsim_tpu.parallel.mac_explicit import _psum
from cfdsim_tpu.parallel.mac3d_explicit import (
    _halo_yx,
    external_flow3d_local_bcs,
    make_mac3d_explicit_step,
)


def make_heated_sphere_explicit_step(
    cfg: Transport3DConfig,
    mesh: Mesh,
    v_inf: float,
    ibm_ramp_steps: int = 0,
    ghost=None,
    ghost_c=None,
):
    """Build ``step(tstate, cfl_scale, mask_u_t, mask_v_t, mask_w_t,
    mask_c) -> (tstate, Transport3DMetrics)`` on the trimmed state
    (Transport3DState with trimmed faces), P(None, "y", "x")-sharded;
    ``mask_c`` is the (nz, ny, nx) cell mask (ibm.sphere_mask_cells),
    face masks from ``mac3d_explicit.trim_face_masks3d``.

    ``ghost``/``ghost_c`` (the host-built ``GhostIBM3D`` +
    cell-centered ``GhostFaceSet`` from the heated-sphere case with
    ``ibm_scheme="ghost"``) swap in the sharp-interface ghost-cell
    treatment on BOTH momentum and θ. The builder then returns
    ``(step, tables, table_c)`` and the call signature becomes
    ``step(tstate, cfl_scale, tables, table_c)`` — the per-shard tables
    travel as shard_map args (gather-on-constants miscompile rules)."""
    from cfdsim_tpu.models import mac3d as m3

    use_ghost = ghost is not None
    if use_ghost != (ghost_c is not None):
        raise ValueError("ghost and ghost_c must be given together")
    if cfg.theta_scheme not in ("central", "upwind"):
        raise ValueError(
            "the sharded transport step implements theta_scheme "
            "central/upwind (tvd needs width-2 halos; single-device only)"
        )
    g = cfg.grid
    nx, ny, nz = g.nx, g.ny, g.nz
    dx, dy, dz = g.dx, g.dy, g.dz
    alpha = cfg.nu / cfg.prandtl
    h = min(dx, dy, dz)
    flow_cfg = m3.MAC3DConfig(
        grid=g, nu=cfg.nu, scheme=cfg.scheme,
        adaptive_dt=cfg.adaptive_dt, cfl_target=cfg.cfl_target,
        dt_base=cfg.dt_base, dt_min=cfg.dt_min,
        # θ-diffusion stability joins the momentum bound (as the
        # single-device step's dt_diff = 0.125h²/max(ν, α))
        dt_max=min(cfg.dt_max, 0.125 * h * h / max(alpha, cfg.nu, 1e-30)),
        max_velocity=cfg.max_velocity,
        compute_metrics=cfg.compute_metrics,
        poisson=cfg.poisson,  # the sharded step raises unless "dct"
    )
    bcs = external_flow3d_local_bcs(nx, ny, nz, v_inf)
    if use_ghost:
        from cfdsim_tpu.parallel.ibm_ghost_explicit import (
            partition_ghost_ibm3d,
            shard_ghost_tables,
        )

        py_, px_ = mesh.shape["y"], mesh.shape["x"]
        tables, width, table_c = partition_ghost_ibm3d(
            ghost, nx, ny, nz, py_, px_, extra=ghost_c
        )
        tables = shard_ghost_tables(tables, mesh)
        table_c = shard_ghost_tables(table_c, mesh)
        flow_step = jax.jit(make_mac3d_explicit_step(
            flow_cfg, mesh, bcs, ghost_halo=width,
            ibm_ramp_steps=ibm_ramp_steps,
        ))
    else:
        flow_step = jax.jit(make_mac3d_explicit_step(
            flow_cfg, mesh, bcs, use_ibm=True,
            ibm_ramp_steps=ibm_ramp_steps,
        ))

    py = mesh.shape["y"]
    px = mesh.shape["x"]
    ny_l, nx_l = ny // py, nx // px
    ax, ay, az = 1.0 / dx**2, 1.0 / dy**2, 1.0 / dz**2
    qscale = 1.0 / (
        np.pi * cfg.body_diameter * alpha
        * max(abs(cfg.theta_body - cfg.theta_in), 1e-30)
    )
    spec = P(None, "y", "x")

    def theta_local(theta, u_t, v_t, w_t, dt, step_i, mask_c):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        gy0 = iy * ny_l
        gx0 = ix * nx_l
        shp_p = (ny_l + 2, nx_l + 2)
        rp = gy0 - 1 + lax.broadcasted_iota(jnp.int32, shp_p, 0)[None]
        cp = gx0 - 1 + lax.broadcasted_iota(jnp.int32, shp_p, 1)[None]

        # --- velocity faces for the owned cells: halo-pad trimmed faces
        # and re-impose the BC values exactly as the momentum step's pad
        # (inflow Dirichlet is already inside u_t via its own pre; the
        # dropped outflow face needs the psum'd shift)
        ro = gy0 + lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 0)[None]
        co = gx0 + lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 1)[None]
        a = bcs.aux(u_t, v_t, w_t, ro, co, None)
        U = _halo_yx(u_t, py, px)
        V = _halo_yx(v_t, py, px)
        W = _halo_yx(w_t, py, px)
        Wz = jnp.concatenate([W, jnp.zeros_like(W[:1])], axis=0)
        U, V, Wz = bcs.pad_writes(U, V, Wz, rp, cp, None, a)
        u_w = U[:, 1:-1, 1:-1]   # west faces of owned cells
        u_e = U[:, 1:-1, 2:]     # east faces
        v_s = V[:, 1:-1, 1:-1]
        v_n = V[:, 2:, 1:-1]
        w_b = Wz[:-1, 1:-1, 1:-1]
        w_t_ = Wz[1:, 1:-1, 1:-1]

        # --- θ ghosts: width-1 halo + open-domain global-edge writes
        TH = _halo_yx(theta, py, px)
        # inflow Dirichlet mirror / outflow + lateral zero-gradient
        TH = jnp.where(cp == -1,
                       2.0 * cfg.theta_in - jnp.roll(TH, -1, axis=2), TH)
        TH = jnp.where(cp == nx, jnp.roll(TH, 1, axis=2), TH)
        TH = jnp.where(rp == -1, jnp.roll(TH, -1, axis=1), TH)
        TH = jnp.where(rp == ny, jnp.roll(TH, 1, axis=1), TH)
        te = jnp.concatenate([TH[:1], TH, TH[-1:]], axis=0)  # adiabatic z

        th_c = te[1:-1, 1:-1, 1:-1]
        th_wv = te[1:-1, 1:-1, :-2]
        th_ev = te[1:-1, 1:-1, 2:]
        th_sv = te[1:-1, :-2, 1:-1]
        th_nv = te[1:-1, 2:, 1:-1]
        th_bv = te[:-2, 1:-1, 1:-1]
        th_tv = te[2:, 1:-1, 1:-1]
        if cfg.theta_scheme == "upwind":
            donor_w = jnp.where(u_w >= 0.0, th_wv, th_c)
            # global x_lo inflow face: the advective donor is theta_in
            # itself, not the mirrored diffusion ghost (matches the
            # single-device step's face-0 override)
            donor_w = jnp.where((co == 0) & (u_w >= 0.0),
                                jnp.float32(cfg.theta_in), donor_w)
            fxa_w = u_w * donor_w
            fxa_e = u_e * jnp.where(u_e >= 0.0, th_c, th_ev)
            fya_s = v_s * jnp.where(v_s >= 0.0, th_sv, th_c)
            fya_n = v_n * jnp.where(v_n >= 0.0, th_c, th_nv)
            fza_b = w_b * jnp.where(w_b >= 0.0, th_bv, th_c)
            fza_t = w_t_ * jnp.where(w_t_ >= 0.0, th_c, th_tv)
        else:
            fxa_w = u_w * 0.5 * (th_wv + th_c)
            fxa_e = u_e * 0.5 * (th_c + th_ev)
            fya_s = v_s * 0.5 * (th_sv + th_c)
            fya_n = v_n * 0.5 * (th_c + th_nv)
            fza_b = w_b * 0.5 * (th_bv + th_c)
            fza_t = w_t_ * 0.5 * (th_c + th_tv)
        adv = (
            (fxa_e - fxa_w) * (1.0 / dx)
            + (fya_n - fya_s) * (1.0 / dy)
            + (fza_t - fza_b) * (1.0 / dz)
        )
        lap_t = (
            (th_ev - 2.0 * th_c + th_wv) * ax
            + (th_nv - 2.0 * th_c + th_sv) * ay
            + (th_tv - 2.0 * th_c + th_bv) * az
        )
        theta_new = theta + dt * (alpha * lap_t - adv)

        from cfdsim_tpu.ibm import ibm_ramp

        strength = ibm_ramp(step_i, ibm_ramp_steps)
        if use_ghost:
            # sharded twin of transport3d.make_step's ibm_ghost_c block:
            # ghost forcing on the θ excess over the body temperature
            from cfdsim_tpu.parallel.ibm_ghost_explicit import (
                apply_ghost_forcing_local,
            )

            shifted, dneg = apply_ghost_forcing_local(
                theta_new - cfg.theta_body, mask_c, py, px, width,
                strength,
            )
            theta_new = shifted + cfg.theta_body
            q_body = _psum(jnp.sum(-dneg)) * (dx * dy * dz) / dt
        else:
            dth = (cfg.theta_body - theta_new) * (strength * mask_c)
            theta_new = theta_new + dth
            q_body = _psum(jnp.sum(dth)) * (dx * dy * dz) / dt
        nusselt = q_body * qscale
        th_min = lax.pmin(lax.pmin(jnp.min(theta_new), "y"), "x")
        th_max = lax.pmax(lax.pmax(jnp.max(theta_new), "y"), "x")
        return theta_new, q_body, nusselt, th_min, th_max

    if use_ghost:
        from cfdsim_tpu.parallel.ibm_ghost_explicit import ghost_set_spec

        c_spec = ghost_set_spec()
    else:
        c_spec = spec
    theta_step = jax.jit(jax.shard_map(
        theta_local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, P(), P(), c_spec),
        out_specs=(spec, P(), P(), P(), P()),
    ))

    def step(ts: Transport3DState, cfl_scale, *ibm_args):
        mac_ts = MAC3DState(u=ts.u, v=ts.v, w=ts.w, p=ts.p,
                            t=ts.t, step=ts.step)
        if use_ghost:
            flow_tables, c_table = ibm_args
            new_mac, fm = flow_step(mac_ts, cfl_scale, flow_tables)
        else:
            mask_u_t, mask_v_t, mask_w_t, c_table = ibm_args
            new_mac, fm = flow_step(mac_ts, cfl_scale, mask_u_t,
                                    mask_v_t, mask_w_t)
        theta_new, q_body, nusselt, th_min, th_max = theta_step(
            ts.theta, new_mac.u, new_mac.v, new_mac.w, fm.dt, ts.step,
            c_table,
        )
        new_ts = Transport3DState(
            u=new_mac.u, v=new_mac.v, w=new_mac.w, p=new_mac.p,
            theta=theta_new, t=new_mac.t, step=new_mac.step,
        )
        metrics = Transport3DMetrics(
            dt=fm.dt, div_post=fm.div_post, max_vel=fm.max_vel,
            energy=fm.energy, fx=fm.fx, fy=fm.fy, fz=fm.fz,
            q_body=q_body, nusselt=nusselt,
            theta_min=th_min, theta_max=th_max,
        )
        return new_ts, metrics

    if use_ghost:
        return step, tables, table_c
    return step


def make_heated_sphere_stretched_explicit_step(
    cfg: Transport3DConfig,
    mesh: Mesh,
    x_faces,
    y_faces,
    z_faces,
    v_inf: float,
    ibm_ramp_steps: int = 0,
    ghost=None,
    ghost_c=None,
):
    """The stretched-grid habitat of ``make_heated_sphere_explicit_step``
    — the multi-chip twin of ``transport3d.make_stretched_step`` (the
    ``heated_sphere_stretched`` case, central scheme): the sharded
    stretched momentum step (``mac_stretched3d_explicit``, distributed
    FDM projection, area-weighted outflow) advances the velocities; a
    second shard_map advances θ with metric-weighted conservative FV
    fluxes — per-axis gaps enter as ``_lut3`` dynamic slices (never
    gathers), z metrics as local lines. Same call signature:
    ``step(tstate, cfl_scale, mask_u_t, mask_v_t, mask_w_t, mask_c)``.
    Equality vs the single-device step: tests/test_transport3d.py.

    ``ghost``/``ghost_c`` swap in the sharp-interface ghost-cell
    treatment (heated_sphere_stretched with ``ibm_scheme="ghost"``);
    the builder then returns ``(step, tables, table_c)`` and the call
    signature becomes ``step(tstate, cfl_scale, tables, table_c)``."""
    from cfdsim_tpu.models.mac_stretched import _metrics
    from cfdsim_tpu.models import mac_stretched3d as ms3
    from cfdsim_tpu.parallel.mac3d_explicit import (
        external_flow3d_local_bcs,
    )
    from cfdsim_tpu.parallel.mac_stretched3d_explicit import (
        _lut3,
        _zc,
        make_sphere3d_stretched_explicit_step,
    )

    use_ghost = ghost is not None
    if use_ghost != (ghost_c is not None):
        raise ValueError("ghost and ghost_c must be given together")
    if cfg.scheme != "central":
        raise ValueError(
            "the sharded stretched heated-sphere step implements "
            "scheme='central' (the sharded stretched momentum path)"
        )
    if cfg.theta_scheme not in ("central", "upwind"):
        raise ValueError(
            "the sharded transport step implements theta_scheme "
            "central/upwind (tvd needs width-2 halos; single-device only)"
        )
    g = cfg.grid
    nx, ny, nz = g.nx, g.ny, g.nz
    mx = _metrics(x_faces)
    my = _metrics(y_faces)
    mz = _metrics(z_faces)
    alpha = cfg.nu / cfg.prandtl
    h_min = float(min(mx.h.min(), my.h.min(), mz.h.min()))
    flow_cfg = ms3.StretchedMAC3DConfig(
        nx=nx, ny=ny, nz=nz, nu=cfg.nu, scheme=cfg.scheme,
        adaptive_dt=cfg.adaptive_dt, cfl_target=cfg.cfl_target,
        dt_base=cfg.dt_base, dt_min=cfg.dt_min,
        # θ-diffusion stability joins the momentum bound (single-device
        # transport3d.make_stretched_step's dt_max fold)
        dt_max=min(cfg.dt_max, 0.125 * h_min * h_min / max(alpha, 1e-30)),
        max_velocity=cfg.max_velocity,
        compute_metrics=cfg.compute_metrics,
    )
    if use_ghost:
        from cfdsim_tpu.parallel.ibm_ghost_explicit import (
            partition_ghost_ibm3d,
            shard_ghost_tables,
        )
        py_, px_ = mesh.shape["y"], mesh.shape["x"]
        tables, width, table_c = partition_ghost_ibm3d(
            ghost, nx, ny, nz, py_, px_, extra=ghost_c
        )
        tables = shard_ghost_tables(tables, mesh)
        table_c = shard_ghost_tables(table_c, mesh)
        # build the flow step directly with the SAME width so momentum
        # and θ share one partition pass
        from cfdsim_tpu.parallel.mac_stretched3d_explicit import (
            make_stretched3d_explicit_step,
        )

        hy_fw = np.diff(np.asarray(y_faces))
        hz_fw = np.diff(np.asarray(z_faces))
        fw_g = hz_fw[:, None] * hy_fw[None, :]
        flow_bcs = external_flow3d_local_bcs(
            nx, ny, nz, v_inf, face_weights=fw_g
        )
        flow_step = jax.jit(make_stretched3d_explicit_step(
            flow_cfg, mesh, x_faces, y_faces, z_faces, flow_bcs,
            ghost_halo=width, ibm_ramp_steps=ibm_ramp_steps,
        ))
    else:
        flow_step = make_sphere3d_stretched_explicit_step(
            flow_cfg, mesh, x_faces, y_faces, z_faces, v_inf=v_inf,
            ibm_ramp_steps=ibm_ramp_steps,
        )
    hy_w = np.diff(np.asarray(y_faces))
    hz_w = np.diff(np.asarray(z_faces))
    fw = hz_w[:, None] * hy_w[None, :]
    bcs = external_flow3d_local_bcs(nx, ny, nz, v_inf, face_weights=fw)

    py = mesh.shape["y"]
    px = mesh.shape["x"]
    ny_l, nx_l = ny // py, nx // px
    # metric lookups (y/x dynamic slices; z local lines)
    inv_hx_at = _lut3(1.0 / mx.h, 2)
    inv_hy_at = _lut3(1.0 / my.h, 1)
    inv_dfx_at = _lut3(1.0 / mx.dfull, 2)   # face k gap, k = cell col
    inv_dfy_at = _lut3(1.0 / my.dfull, 1)
    hx_at = _lut3(mx.h, 2)
    hy_at = _lut3(my.h, 1)
    inv_hz = _zc(1.0 / mz.h)
    inv_dfz_b = _zc(1.0 / mz.dfull[:nz])    # bottom-face gaps
    inv_dfz_t = _zc(1.0 / mz.dfull[1:])     # top-face gaps
    hz_c = _zc(mz.h)
    qscale = 1.0 / (
        np.pi * cfg.body_diameter * alpha
        * max(abs(cfg.theta_body - cfg.theta_in), 1e-30)
    )
    spec = P(None, "y", "x")

    def theta_local(theta, u_t, v_t, w_t, dt, step_i, mask_c):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        gy0 = iy * ny_l
        gx0 = ix * nx_l
        shp_p = (ny_l + 2, nx_l + 2)
        rp = gy0 - 1 + lax.broadcasted_iota(jnp.int32, shp_p, 0)[None]
        cp = gx0 - 1 + lax.broadcasted_iota(jnp.int32, shp_p, 1)[None]
        ro = gy0 + lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 0)[None]
        co = gx0 + lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 1)[None]
        a = bcs.aux(u_t, v_t, w_t, ro, co, None)
        U = _halo_yx(u_t, py, px)
        V = _halo_yx(v_t, py, px)
        W = _halo_yx(w_t, py, px)
        Wz = jnp.concatenate([W, jnp.zeros_like(W[:1])], axis=0)
        U, V, Wz = bcs.pad_writes(U, V, Wz, rp, cp, None, a)
        u_w = U[:, 1:-1, 1:-1]
        u_e = U[:, 1:-1, 2:]
        v_s = V[:, 1:-1, 1:-1]
        v_n = V[:, 2:, 1:-1]
        w_b = Wz[:-1, 1:-1, 1:-1]
        w_t_ = Wz[1:, 1:-1, 1:-1]

        TH = _halo_yx(theta, py, px)
        TH = jnp.where(cp == -1,
                       2.0 * cfg.theta_in - jnp.roll(TH, -1, axis=2), TH)
        TH = jnp.where(cp == nx, jnp.roll(TH, 1, axis=2), TH)
        TH = jnp.where(rp == -1, jnp.roll(TH, -1, axis=1), TH)
        TH = jnp.where(rp == ny, jnp.roll(TH, 1, axis=1), TH)
        te = jnp.concatenate([TH[:1], TH, TH[-1:]], axis=0)

        th_c = te[1:-1, 1:-1, 1:-1]
        th_wv = te[1:-1, 1:-1, :-2]
        th_ev = te[1:-1, 1:-1, 2:]
        th_sv = te[1:-1, :-2, 1:-1]
        th_nv = te[1:-1, 2:, 1:-1]
        th_bv = te[:-2, 1:-1, 1:-1]
        th_tv = te[2:, 1:-1, 1:-1]
        if cfg.theta_scheme == "upwind":
            donor_w = jnp.where(u_w >= 0.0, th_wv, th_c)
            donor_w = jnp.where((co == 0) & (u_w >= 0.0),
                                jnp.float32(cfg.theta_in), donor_w)
            fxa_w = u_w * donor_w
            fxa_e = u_e * jnp.where(u_e >= 0.0, th_c, th_ev)
            fya_s = v_s * jnp.where(v_s >= 0.0, th_sv, th_c)
            fya_n = v_n * jnp.where(v_n >= 0.0, th_c, th_nv)
            fza_b = w_b * jnp.where(w_b >= 0.0, th_bv, th_c)
            fza_t = w_t_ * jnp.where(w_t_ >= 0.0, th_c, th_tv)
        else:
            fxa_w = u_w * 0.5 * (th_wv + th_c)
            fxa_e = u_e * 0.5 * (th_c + th_ev)
            fya_s = v_s * 0.5 * (th_sv + th_c)
            fya_n = v_n * 0.5 * (th_c + th_nv)
            fza_b = w_b * 0.5 * (th_bv + th_c)
            fza_t = w_t_ * 0.5 * (th_c + th_tv)
        inv_hx_o = inv_hx_at(gx0, nx_l)
        inv_hy_o = inv_hy_at(gy0, ny_l)
        adv = (
            (fxa_e - fxa_w) * inv_hx_o
            + (fya_n - fya_s) * inv_hy_o
            + (fza_t - fza_b) * inv_hz
        )
        # metric flux-form diffusion (transport3d.make_stretched_step)
        gx_w = (th_c - th_wv) * inv_dfx_at(gx0, nx_l)
        gx_e = (th_ev - th_c) * inv_dfx_at(gx0 + 1, nx_l)
        gy_s = (th_c - th_sv) * inv_dfy_at(gy0, ny_l)
        gy_n = (th_nv - th_c) * inv_dfy_at(gy0 + 1, ny_l)
        gz_b = (th_c - th_bv) * inv_dfz_b
        gz_t = (th_tv - th_c) * inv_dfz_t
        lap_t = (
            (gx_e - gx_w) * inv_hx_o
            + (gy_n - gy_s) * inv_hy_o
            + (gz_t - gz_b) * inv_hz
        )
        theta_new = theta + dt * (alpha * lap_t - adv)

        from cfdsim_tpu.ibm import ibm_ramp

        strength = ibm_ramp(step_i, ibm_ramp_steps)
        cellvol = hz_c * hy_at(gy0, ny_l) * hx_at(gx0, nx_l)
        if use_ghost:
            # sharded twin of transport3d.make_stretched_step's
            # ibm_ghost_c block (volume-weighted heat flux)
            from cfdsim_tpu.parallel.ibm_ghost_explicit import (
                apply_ghost_forcing_local,
            )

            shifted, dneg = apply_ghost_forcing_local(
                theta_new - cfg.theta_body, mask_c, py, px, width,
                strength,
            )
            theta_new = shifted + cfg.theta_body
            q_body = _psum(jnp.sum(-dneg * cellvol)) / dt
        else:
            dth = (cfg.theta_body - theta_new) * (strength * mask_c)
            theta_new = theta_new + dth
            q_body = _psum(jnp.sum(dth * cellvol)) / dt
        nusselt = q_body * qscale
        th_min = lax.pmin(lax.pmin(jnp.min(theta_new), "y"), "x")
        th_max = lax.pmax(lax.pmax(jnp.max(theta_new), "y"), "x")
        return theta_new, q_body, nusselt, th_min, th_max

    if use_ghost:
        from cfdsim_tpu.parallel.ibm_ghost_explicit import ghost_set_spec

        c_spec = ghost_set_spec()
    else:
        c_spec = spec
    theta_step = jax.jit(jax.shard_map(
        theta_local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, P(), P(), c_spec),
        out_specs=(spec, P(), P(), P(), P()),
    ))

    def step(ts: Transport3DState, cfl_scale, *ibm_args):
        mac_ts = MAC3DState(u=ts.u, v=ts.v, w=ts.w, p=ts.p,
                            t=ts.t, step=ts.step)
        if use_ghost:
            flow_tables, c_table = ibm_args
            new_mac, fm = flow_step(mac_ts, cfl_scale, flow_tables)
        else:
            mask_u_t, mask_v_t, mask_w_t, c_table = ibm_args
            new_mac, fm = flow_step(mac_ts, cfl_scale, mask_u_t,
                                    mask_v_t, mask_w_t)
        theta_new, q_body, nusselt, th_min, th_max = theta_step(
            ts.theta, new_mac.u, new_mac.v, new_mac.w, fm.dt, ts.step,
            c_table,
        )
        new_ts = Transport3DState(
            u=new_mac.u, v=new_mac.v, w=new_mac.w, p=new_mac.p,
            theta=theta_new, t=new_mac.t, step=new_mac.step,
        )
        metrics = Transport3DMetrics(
            dt=fm.dt, div_post=fm.div_post, max_vel=fm.max_vel,
            energy=fm.energy, fx=fm.fx, fy=fm.fy, fz=fm.fz,
            q_body=q_body, nusselt=nusselt,
            theta_min=th_min, theta_max=th_max,
        )
        return new_ts, metrics

    if use_ghost:
        return step, tables, table_c
    return step
