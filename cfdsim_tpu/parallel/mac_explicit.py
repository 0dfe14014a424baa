"""Explicit shard_map step for the staggered (MAC) solver.

The GSPMD route for MAC (``parallel/mac_sharded.py``) is blocked by an
XLA SPMD miscompilation of elementwise ops with uneven derived shapes on
the current jax/XLA (see tests/test_parallel.py xfails). This module is
the robust multi-chip path: inside ``shard_map`` every op sees only local
blocks, so the SPMD partitioner never touches uneven shapes.

Representation: the *trimmed* MAC state (mac_sharded.trim_state) — the
last boundary face of u and v is dropped, every array is (ny, nx) and
P("y","x")-shardable; u_t[j,i] is the u-face at global face index i,
v_t[j,i] the v-face at global row-face j. Inside the kernel, width-2
``ppermute`` halo exchanges rebuild each block's neighborhood and all
boundary handling is done with *global-index masked writes*:

- ``pre``: set_normal writes that land inside the trimmed arrays (u face
  0, v row-face 0) — applied before the halo exchange so neighbors
  receive post-BC values;
- ``post``: writes on the halo-padded arrays for positions outside the
  trimmed arrays — the dropped boundary faces (u face nx, v row-face ny)
  and the tangential ghost lines of MACBCs.extend, each expressed as a
  ``jnp.where(global_index == …, f(roll(·)), ·)`` so only the shards that
  own those positions are affected.

The advection/diffusion formulas mirror ``models/mac.py`` exactly (same
divergence-form fluxes, same van Leer MUSCL slopes), with the
single-device functions' implicit array-boundary behavior (zero slopes at
the first/last face) reproduced by global-index masks. The pressure solve
is either the distributed red-black SOR (``sharded.rbsor_local``) or the
exact pencil-decomposed DCT (``transforms.dct_poisson_local``) — with
"dct" the projection stays exact to fp32 roundoff across the mesh, the
whole point of the staggered tier.

Equality with the single-device ``mac.make_step`` on an 8-device mesh is
asserted in tests/test_mac_explicit.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from cfdsim_tpu.models.incompressible import StepMetrics
from cfdsim_tpu.models.mac import MACConfig, MACState, _face_value, _limited_slope
from cfdsim_tpu.parallel.halo import clamp_global_edges, halo_exchange
from cfdsim_tpu.parallel.sharded import rbsor_local
from cfdsim_tpu.parallel.transforms import dct_poisson_local


def _pmax(x):
    return lax.pmax(lax.pmax(x, "y"), "x")


def _psum(x):
    return lax.psum(lax.psum(x, "y"), "x")


def _grids(shape, iy, ix, ny_l: int, nx_l: int, w: int):
    """(grow, gcol) int32 global-index grids for a w-halo-padded block."""
    gr = iy * ny_l - w + lax.broadcasted_iota(jnp.int32, shape, 0)
    gc = ix * nx_l - w + lax.broadcasted_iota(jnp.int32, shape, 1)
    return gr, gc


class MACLocalBCs(NamedTuple):
    """MAC boundary conditions in the masked-write local form.

    ``pre(u_t, v_t, gfu, grv, state)`` applies the set_normal writes that
    live inside the trimmed arrays. ``aux(u_t, v_t, gfu, grv, state)``
    computes BC scalars needing global reductions (e.g. the
    mass-consistent outflow correction). ``post_u(U, gr, gf, state, aux)``
    / ``post_v(V, gr, gc, state, aux)`` write the dropped boundary face
    and the tangential ghost lines on a padded block.
    """

    pre: Callable
    aux: Callable
    post_u: Callable
    post_v: Callable


def cavity_mac_local_bcs(ny: int, nx: int, lid_velocity: float = 1.0) -> MACLocalBCs:
    """Masked-write form of mac.cavity_bcs (no-slip walls, moving lid)."""

    def pre(u_t, v_t, gfu, grv, state):
        u_t = jnp.where(gfu == 0, 0.0, u_t)
        v_t = jnp.where(grv == 0, 0.0, v_t)
        return u_t, v_t

    def aux(u_t, v_t, gfu, grv, state):
        return ()

    def post_u(U, gr, gf, state, aux_):
        U = jnp.where(gf == nx, 0.0, U)  # dropped right-wall face
        below = jnp.roll(U, -1, axis=0)  # value one real row up (gr+1)
        above = jnp.roll(U, 1, axis=0)
        U = jnp.where(gr == -1, -below, U)  # bottom wall: u_t = 0
        U = jnp.where(gr == ny, 2.0 * lid_velocity - above, U)  # lid
        return U

    def post_v(V, gr, gc, state, aux_):
        V = jnp.where(gr == ny, 0.0, V)  # dropped top-wall face
        right = jnp.roll(V, -1, axis=1)
        left = jnp.roll(V, 1, axis=1)
        V = jnp.where(gc == -1, -right, V)  # left wall: v_t = 0
        V = jnp.where(gc == nx, -left, V)  # right wall
        return V

    return MACLocalBCs(pre, aux, post_u, post_v)


def free_slip_mac_local_bcs(ny: int, nx: int) -> MACLocalBCs:
    """Masked-write form of mac.free_slip_bcs (symmetry box: zero normal
    velocity, zero tangential shear) — the far-field kit for moving-body
    cases in quiescent fluid."""

    def pre(u_t, v_t, gfu, grv, state):
        u_t = jnp.where(gfu == 0, 0.0, u_t)
        v_t = jnp.where(grv == 0, 0.0, v_t)
        return u_t, v_t

    def aux(u_t, v_t, gfu, grv, state):
        return ()

    def post_u(U, gr, gf, state, aux_):
        U = jnp.where(gf == nx, 0.0, U)  # dropped right-wall face
        below = jnp.roll(U, -1, axis=0)
        above = jnp.roll(U, 1, axis=0)
        U = jnp.where(gr == -1, below, U)  # free slip: ∂u/∂y = 0
        U = jnp.where(gr == ny, above, U)
        return U

    def post_v(V, gr, gc, state, aux_):
        V = jnp.where(gr == ny, 0.0, V)
        right = jnp.roll(V, -1, axis=1)
        left = jnp.roll(V, 1, axis=1)
        V = jnp.where(gc == -1, right, V)  # free slip: ∂v/∂x = 0
        V = jnp.where(gc == nx, left, V)
        return V

    return MACLocalBCs(pre, aux, post_u, post_v)


def external_flow_mac_local_bcs(
    ny: int,
    nx: int,
    dy: float,
    y_min: float,
    y_max: float,
    v_inf: float,
    perturb_amp: float = 0.01,
    perturb_ramp_steps: int = 1000,
    y_centers=None,
) -> MACLocalBCs:
    """Masked-write form of mac.external_flow_bcs: perturbed inflow at
    x_lo, mass-consistent zero-gradient outflow at x_hi, free-slip
    top/bottom. The inflow profile is recomputed from the global row index
    with the exact expression cases.cylinder_mac feeds the single-device
    BCs, so the two paths agree bitwise. For stretched grids pass the
    u-row center coordinates as ``y_centers`` (a length-ny vector; looked
    up by global row index instead of the uniform (g+½)·dy formula)."""
    if y_centers is None:
        yc_pad = None
    else:
        # edge-padded for dynamic_slice by global row offset — gathers
        # inside shard_map miscompile on this XLA CPU build (see
        # mac_stretched_explicit._lut), so the lookup is a 1D slice: the
        # row indices of every BC grid are affine in the local iota
        import numpy as _np

        _pad = 4
        yc_pad = jnp.asarray(
            _np.pad(_np.asarray(y_centers, _np.float32), _pad, mode="edge")
        )

    def _inflow(gr, step):
        if yc_pad is None:
            y = y_min + (gr.astype(jnp.float32) + 0.5) * dy
        else:
            start = gr[0, 0] + _pad  # gr rows are gy0−w + iota
            y = lax.dynamic_slice(yc_pad, (start,), (gr.shape[0],))[:, None]
        scale = jnp.minimum(1.0, step / perturb_ramp_steps) * perturb_amp
        pert = scale * jnp.sin(2.0 * jnp.pi * y / y_max + 0.02 * step)
        return v_inf * (1.0 + pert)

    def pre(u_t, v_t, gfu, grv, state):
        gru = grv  # same global row grid shape for trimmed blocks
        u_t = jnp.where(gfu == 0, _inflow(gru, state.step), u_t)
        v_t = jnp.where(grv == 0, 0.0, v_t)
        return u_t, v_t

    def aux(u_t, v_t, gfu, grv, state):
        # mass-consistent outflow shift: mean(u[:,0] − u[:,nx−1]) over the
        # global rows (mac.py external_flow_bcs set_normal)
        ix = lax.axis_index("x")
        px = lax.axis_size("x")
        s0 = _psum(jnp.sum(jnp.where(gfu == 0, u_t, 0.0)))
        s1 = _psum(
            jnp.where(ix == px - 1, jnp.sum(u_t[:, -1]), jnp.float32(0.0))
        )
        return (s0 - s1) / ny

    def post_u(U, gr, gf, state, mcorr):
        left = jnp.roll(U, 1, axis=1)  # value at face gf−1
        U = jnp.where(gf == nx, left + mcorr, U)  # outflow copy + shift
        below = jnp.roll(U, -1, axis=0)
        above = jnp.roll(U, 1, axis=0)
        U = jnp.where(gr == -1, below, U)  # free slip: ∂u/∂y = 0
        U = jnp.where(gr == ny, above, U)
        return U

    def post_v(V, gr, gc, state, aux_):
        V = jnp.where(gr == ny, 0.0, V)  # far-field wall face
        right = jnp.roll(V, -1, axis=1)
        left = jnp.roll(V, 1, axis=1)
        V = jnp.where(gc == -1, -right, V)  # inflow: v = 0
        V = jnp.where(gc == nx, left, V)  # outflow: ∂v/∂x = 0
        return V

    return MACLocalBCs(pre, aux, post_u, post_v)


def make_mac_explicit_step(
    cfg: MACConfig,
    mesh: Mesh,
    bcs: MACLocalBCs,
    use_ibm: bool = False,
    ibm_ramp_steps: int = 0,
    moving_body=None,
    moving_scheme: str = "penalize",
):
    """Build the explicit-comm MAC step on the trimmed representation.

    Returns ``step(tstate, cfl_scale[, mask_u_t, mask_v_t]) ->
    (tstate, StepMetrics)`` operating on P("y","x")-sharded (ny, nx)
    blocks. The optional IBM masks are the face-sampled penalization
    masks *trimmed* (mask_u[:, :-1], mask_v[:-1, :]); exactness requires
    their boundary-adjacent lines to be exactly zero (asserted by
    ``trim_face_masks``), which holds for any body ≥ radius+5dx from the
    domain boundary — the Gaussian shell is hard-cut to 0 there
    (ibm._gaussian_shell, reference v5.py:275-283).

    ``moving_scheme="ghost"`` upgrades ``moving_body`` to the sharded
    sharp-interface moving ghost
    (ibm_ghost_explicit.moving_ghost_forcing_2d_local): on-device
    classification from the shard's global index offsets, probe gathers
    through measured-width halo windows re-exchanged each sweep — the
    multi-chip habitat of mac.make_step's moving_scheme="ghost" (the
    Dütsch KC=5 configuration).
    """
    if moving_scheme not in ("penalize", "ghost"):
        raise ValueError(f"unknown moving_scheme {moving_scheme!r}")
    g = cfg.grid
    ny, nx = g.ny, g.nx
    dx, dy = g.dx, g.dy
    ax, ay = 1.0 / (dx * dx), 1.0 / (dy * dy)
    py = mesh.shape["y"]
    px = mesh.shape["x"]
    ny_l, nx_l = ny // py, nx // px
    if ny % py or nx % px:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {py}x{px}")
    if ny_l < 4 or nx_l < 4:
        raise ValueError("local blocks must be at least 4x4 for width-2 halos")
    if cfg.poisson.method not in ("rbsor", "dct"):
        raise ValueError(
            "explicit MAC step supports poisson method 'rbsor' or 'dct'"
        )
    if cfg.poisson.method == "rbsor" and cfg.poisson.tol > 0.0:
        raise ValueError("explicit MAC rbsor runs a fixed sweep budget (tol=0)")
    if getattr(cfg, "time_scheme", "euler") != "euler":
        raise ValueError(
            "the explicit sharded MAC step implements time_scheme='euler'"
        )
    if getattr(cfg, "projection", "chorin") != "chorin":
        raise ValueError(
            "the explicit sharded MAC step implements projection='chorin'"
        )

    spec = P("y", "x")
    state_spec = MACState(u=spec, v=spec, p=spec, t=P(), step=P())
    metric_spec = StepMetrics(*([P()] * len(StepMetrics._fields)))
    in_specs = [state_spec, P()]
    if use_ibm:
        in_specs += [spec, spec]

    if moving_body is not None:
        _g = cfg.grid
        _hb = min(dx, dy)
        if moving_scheme == "ghost":
            from cfdsim_tpu.parallel.ibm_ghost_explicit import (
                moving_ghost_width_2d,
            )

            _mg_delta = 1.5 * _hb  # = models/mac.py's moving-ghost δ
            _mg_width = moving_ghost_width_2d(_mg_delta, dx, dy)
            if _mg_width >= min(ny_l, nx_l):
                raise ValueError(
                    f"moving-ghost halo width {_mg_width} needs local "
                    f"blocks > {_mg_width}; got {ny_l}x{nx_l}"
                )

        def _mb_masks(gr0, gc0, t):
            # u faces: x = x_min + gc·dx, y = y_min + (gr+½)·dy on the
            # trimmed (ny_l, nx_l) block; v faces swap the offsets
            cx, cy = moving_body.center(t)
            r = moving_body.radius
            xg = _g.x_min + gc0.astype(jnp.float32) * dx
            yg = _g.y_min + gr0.astype(jnp.float32) * dy
            du = jnp.sqrt((xg - cx) ** 2 + (yg + 0.5 * dy - cy) ** 2)
            dv = jnp.sqrt((xg + 0.5 * dx - cx) ** 2 + (yg - cy) ** 2)
            hb = min(dx, dy)  # isotropic taper, = models/mac.py's
            m_u = jnp.clip((r + 0.5 * hb - du) / hb, 0.0, 1.0)
            m_v = jnp.clip((r + 0.5 * hb - dv) / hb, 0.0, 1.0)
            return m_u, m_v

    def step_local(tstate: MACState, cfl_scale, *extras):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        gr0, gc0 = _grids((ny_l, nx_l), iy, ix, ny_l, nx_l, 0)

        def set_normal(u_t, v_t):
            """Trimmed-array set_normal + the BC scalars for post writes."""
            u_t, v_t = bcs.pre(u_t, v_t, gc0, gr0, tstate)
            a = bcs.aux(u_t, v_t, gc0, gr0, tstate)
            return u_t, v_t, a

        def pad(u_t, v_t, a, w: int):
            """Halo-pad trimmed fields and apply the post BC writes
            (dropped faces + tangential ghosts) → full local MAC arrays."""
            U = halo_exchange(u_t, py, px, width=w)
            V = halo_exchange(v_t, py, px, width=w)
            grU, gfU = _grids(U.shape, iy, ix, ny_l, nx_l, w)
            grV, gcV = _grids(V.shape, iy, ix, ny_l, nx_l, w)
            U = bcs.post_u(U, grU, gfU, tstate, a)
            V = bcs.post_v(V, grV, gcV, tstate, a)
            return U, V, (grU, gfU, grV, gcV)

        u_t, v_t, a = set_normal(tstate.u, tstate.v)
        U, V, (grU, gfU, grV, gcV) = pad(u_t, v_t, a, w=2)

        # --- staggered Smagorinsky LES (mac.smagorinsky_viscosity_mac /
        # _diffuse_les on the padded blocks): ν_t at a width-1 cell window
        # around the owned cells, with the single-device edge-padding of
        # ν reproduced by global-index roll substitutions at domain edges
        if cfg.use_les:
            idx = 1.0 / dx
            idy = 1.0 / dy
            DUX0 = (U[:, 1:] - U[:, :-1]) * idx      # cells (gy0−2+r, gx0−2+c)
            DVY0 = (V[1:, :] - V[:-1, :]) * idy
            DUDY = (U[1:, :] - U[:-1, :]) * idy      # corners (gy0−1+r, ·)
            DVDX = (V[:, 1:] - V[:, :-1]) * idx      # corners (·, gx0−1+c)
            SH = DUDY[:, 1:] + DVDX[1:, :]           # canonical corners
            SHC = 0.25 * (
                SH[:-1, :-1] + SH[:-1, 1:] + SH[1:, :-1] + SH[1:, 1:]
            )  # cells (gy0−1+i, gx0−1+j), (ny_l+2, nx_l+2)
            DUXw = DUX0[1:-1, 1:]
            DVYw = DVY0[1:, 1:-1]
            s_mag = jnp.sqrt(
                2.0 * (DUXw * DUXw + DVYw * DVYw) + SHC * SHC
            )
            cs_d2 = (cfg.smagorinsky_constant * (dx * dy) ** 0.5) ** 2
            NUT = cs_d2 * s_mag
            gri = gr0[0, 0] - 1 + lax.broadcasted_iota(jnp.int32, NUT.shape, 0)
            gci = gc0[0, 0] - 1 + lax.broadcasted_iota(jnp.int32, NUT.shape, 1)
            NUT = jnp.where(gri == -1, jnp.roll(NUT, -1, axis=0), NUT)
            NUT = jnp.where(gri == ny, jnp.roll(NUT, 1, axis=0), NUT)
            NUT = jnp.where(gci == -1, jnp.roll(NUT, -1, axis=1), NUT)
            NUT = jnp.where(gci == nx, jnp.roll(NUT, 1, axis=1), NUT)
            nu_mean = _psum(jnp.sum(NUT[1:-1, 1:-1])) / float(ny * nx)
            nu_total = cfg.nu + nu_mean
        else:
            nu_total = None

        # --- adaptive dt (mac.py _adaptive_dt); max is association-free so
        # the duplicated halo faces cost nothing
        real_u = (grU >= 0) & (grU < ny) & (gfU >= 0) & (gfU <= nx)
        real_v = (grV >= 0) & (grV <= ny) & (gcV >= 0) & (gcV < nx)
        if cfg.adaptive_dt:
            vel_max = _pmax(
                jnp.maximum(
                    jnp.max(jnp.where(real_u, jnp.abs(U), 0.0)),
                    jnp.max(jnp.where(real_v, jnp.abs(V), 0.0)),
                )
            )
            vel_max = jnp.maximum(vel_max, 1e-10)
            h = min(dx, dy)
            dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
            dt_visc = 0.2 * h * h / (cfg.nu if nu_total is None else nu_total)
            dt = jnp.clip(jnp.minimum(dt_cfl, dt_visc), cfg.dt_min, cfg.dt_max)
            if cfg.warmup_steps > 0:
                dt = jnp.where(
                    tstate.step < cfg.warmup_steps, jnp.float32(cfg.warmup_dt), dt
                )
            dt = dt.astype(jnp.float32)
        else:
            dt = jnp.float32(cfg.dt_base)

        # --- advection + diffusion on the padded arrays (mac.py _advect /
        # _diffuse with the array-boundary behavior as global-index masks)
        conv_u, conv_v = _advect_local(
            U, V, grU, gfU, grV, gcV, ny, nx, dx, dy, cfg.scheme
        )
        if cfg.use_les:
            # flux-form variable-ν diffusion (mac._diffuse_les sharded)
            NUE = cfg.nu + NUT
            NU_K = 0.25 * (
                NUE[:-1, :-1] + NUE[:-1, 1:] + NUE[1:, :-1] + NUE[1:, 1:]
            )  # corners (gy0+a, gx0+b), (ny_l+1, nx_l+1)
            FUX = NUE[1:-1, :] * DUXw[1:-1, :]
            lap_u_x = (FUX[:, 1 : 1 + nx_l] - FUX[:, 0:nx_l]) * (1.0 / dx)
            DUDYc = DUDY[:, 1:][1 : ny_l + 2, 1 : nx_l + 2]
            FUY = NU_K * DUDYc
            lap_u_y = ((FUY[1:, :] - FUY[:-1, :]) * (1.0 / dy))[:, :nx_l]
            visc_u = lap_u_x + lap_u_y
            FVY = NUE[:, 1:-1] * DVYw[:, 1:-1]
            lap_v_y = (FVY[1 : 1 + ny_l, :] - FVY[0:ny_l, :]) * (1.0 / dy)
            DVDXc = DVDX[1:, :][1 : ny_l + 2, 1 : nx_l + 2]
            FVX = NU_K * DVDXc
            lap_v_x = (FVX[:ny_l, 1:] - FVX[:ny_l, :-1]) * (1.0 / dx)
            visc_v = lap_v_x + lap_v_y
        else:
            lap_u = (U[2:-2, 3:-1] - 2.0 * U[2:-2, 2:-2] + U[2:-2, 1:-3]) * ax + (
                U[3:-1, 2:-2] - 2.0 * U[2:-2, 2:-2] + U[1:-3, 2:-2]
            ) * ay
            lap_v = (V[2:-2, 3:-1] - 2.0 * V[2:-2, 2:-2] + V[2:-2, 1:-3]) * ax + (
                V[3:-1, 2:-2] - 2.0 * V[2:-2, 2:-2] + V[1:-3, 2:-2]
            ) * ay
            visc_u = cfg.nu * lap_u
            visc_v = cfg.nu * lap_v

        # predictor on interior faces only (mac.py u.at[:,1:-1] / v.at[1:-1])
        u_star = u_t + jnp.where(gc0 >= 1, dt * (visc_u - conv_u), 0.0)
        v_star = v_t + jnp.where(gr0 >= 1, dt * (visc_v - conv_v), 0.0)
        u_star, v_star, a = set_normal(u_star, v_star)

        # --- IBM penalization + body force (mac.py make_step ibm block)
        fx = fy = jnp.float32(0.0)
        if use_ibm:
            mask_u_t, mask_v_t = extras
            from cfdsim_tpu.ibm import ibm_ramp

            strength = ibm_ramp(tstate.step, ibm_ramp_steps)
            du_ibm = u_star * (strength * mask_u_t)
            dv_ibm = v_star * (strength * mask_v_t)
            u_star = u_star - du_ibm
            v_star = v_star - dv_ibm
            if cfg.compute_metrics:
                cell = dx * dy
                fx = _psum(jnp.sum(du_ibm)) * cell / dt
                fy = _psum(jnp.sum(dv_ibm)) * cell / dt

        if moving_body is not None:
            from cfdsim_tpu.ibm import ibm_ramp

            ub, vb = moving_body.velocity(tstate.t)
            strength = ibm_ramp(tstate.step, ibm_ramp_steps)
            if moving_scheme == "ghost":
                from cfdsim_tpu.parallel.ibm_ghost_explicit import (
                    moving_ghost_forcing_2d_local,
                )

                ctr = moving_body.center(tstate.t)
                r = moving_body.radius
                gy0s = iy * ny_l
                gx0s = ix * nx_l
                u_star, du_mb = moving_ghost_forcing_2d_local(
                    u_star, _g.x_min, dx, _g.y_min + 0.5 * dy, dy,
                    nx + 1, ny, gy0s, gx0s, ctr, r, _mg_delta, ub,
                    strength, py, px, _mg_width,
                )
                v_star, dv_mb = moving_ghost_forcing_2d_local(
                    v_star, _g.x_min + 0.5 * dx, dx, _g.y_min, dy,
                    nx, ny + 1, gy0s, gx0s, ctr, r, _mg_delta, vb,
                    strength, py, px, _mg_width,
                )
            else:
                m_u, m_v = _mb_masks(gr0, gc0, tstate.t)
                du_mb = (u_star - ub) * (strength * m_u)
                dv_mb = (v_star - vb) * (strength * m_v)
                u_star = u_star - du_mb
                v_star = v_star - dv_mb
            if cfg.compute_metrics:
                cell = dx * dy
                fx = fx + _psum(jnp.sum(du_mb)) * cell / dt
                fy = fy + _psum(jnp.sum(dv_mb)) * cell / dt

        # --- exact projection (mac.py: adjoint MAC divergence/gradient)
        US, VS, _ = pad(u_star, v_star, a, w=1)
        div_star = (US[1:-1, 2:] - US[1:-1, 1:-1]) * (1.0 / dx) + (
            VS[2:, 1:-1] - VS[1:-1, 1:-1]
        ) * (1.0 / dy)
        rhs = div_star / dt
        if cfg.poisson.method == "dct":
            phi = dct_poisson_local(rhs, dx, dy, py, px)
        else:
            rhs = rhs - _psum(jnp.sum(rhs)) / float(ny * nx)
            phi = rbsor_local(
                tstate.p, rhs, py, px, ax, ay, cfg.poisson.iters,
                cfg.poisson.omega,
            )
        PH = halo_exchange(phi, py, px, width=1)
        gx = (PH[1:-1, 1:-1] - PH[1:-1, :-2]) * (1.0 / dx)  # at owned u-faces
        gy_ = (PH[1:-1, 1:-1] - PH[:-2, 1:-1]) * (1.0 / dy)  # at owned v-faces
        u_new = u_star - jnp.where(gc0 >= 1, dt * gx, 0.0)
        v_new = v_star - jnp.where(gr0 >= 1, dt * gy_, 0.0)
        u_new, v_new, a = set_normal(u_new, v_new)

        u_new = jnp.clip(u_new, -cfg.max_velocity, cfg.max_velocity)
        v_new = jnp.clip(v_new, -cfg.max_velocity, cfg.max_velocity)

        new_tstate = MACState(
            u=u_new, v=v_new, p=phi, t=tstate.t + dt, step=tstate.step + 1
        )

        if cfg.compute_metrics:
            UN, VN, (grn, gfn, grvn, gcvn) = pad(u_new, v_new, a, w=1)
            div_post = (UN[1:-1, 2:] - UN[1:-1, 1:-1]) * (1.0 / dx) + (
                VN[2:, 1:-1] - VN[1:-1, 1:-1]
            ) * (1.0 / dy)
            ucc = 0.5 * (UN[1:-1, 1:-1] + UN[1:-1, 2:])
            vcc = 0.5 * (VN[1:-1, 1:-1] + VN[2:, 1:-1])
            # vorticity at interior corners (mac.py vorticity_mac): the
            # corner at an owned cell's lower-left reads one halo line
            dvdx = (VN[1:-1, 1:-1] - VN[1:-1, :-2]) * (1.0 / dx)
            dudy = (UN[1:-1, 1:-1] - UN[:-2, 1:-1]) * (1.0 / dy)
            corner_ok = (gr0 >= 1) & (gc0 >= 1)  # global corners 1..n−1
            vort = jnp.where(corner_ok, dvdx - dudy, 0.0)
            # poisson_res: |lap_neumann(phi) − rhs| over all cells (PH
            # already holds the width-1 exchange from the correction)
            PP = clamp_global_edges(PH, width=1)
            lap_n = (
                ax * (PP[1:-1, 2:] + PP[1:-1, :-2])
                + ay * (PP[2:, 1:-1] + PP[:-2, 1:-1])
                - 2.0 * (ax + ay) * phi
            )
            real_un = (grn >= 0) & (grn < ny) & (gfn >= 0) & (gfn <= nx)
            real_vn = (grvn >= 0) & (grvn <= ny) & (gcvn >= 0) & (gcvn < nx)
            metrics = StepMetrics(
                dt=dt,
                div_pre=_pmax(jnp.max(jnp.abs(div_star))),
                div_post=_pmax(jnp.max(jnp.abs(div_post))),
                max_vel=_pmax(
                    jnp.maximum(
                        jnp.max(jnp.where(real_un, jnp.abs(UN), 0.0)),
                        jnp.max(jnp.where(real_vn, jnp.abs(VN), 0.0)),
                    )
                ),
                energy=_psum(jnp.sum(0.5 * (ucc * ucc + vcc * vcc)))
                / float(ny * nx),
                vort_max=_pmax(jnp.max(jnp.abs(vort))),
                poisson_res=_pmax(jnp.max(jnp.abs(lap_n - rhs))),
                fx=fx,
                fy=fy,
            )
        else:
            zero = jnp.float32(0.0)
            metrics = StepMetrics(dt, zero, zero, zero, zero, zero, zero)
        return new_tstate, metrics

    return jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(state_spec, metric_spec),
    )


def _advect_local(U, V, grU, gfU, grV, gcV, ny, nx, dx, dy, scheme: str):
    """Divergence-form MAC advection on width-2 padded local blocks,
    returning (conv_u, conv_v) on the *owned* faces (ny_l, nx_l); entries
    at global boundary faces are garbage and must be masked by the caller
    (the predictor only updates interior faces, as in mac.py).

    Index map (W=2): U[r,c] ↔ u(row gy0−2+r, face gx0−2+c) with the
    tangential ghost rows −1/ny written by post_u; V[r,c] ↔ v(row-face
    gy0−2+r, col gx0−2+c) with ghost cols −1/nx. The canonical corner
    window is CO[a,b] ↔ corner (gy0−1+a, gx0−1+b), shape (ny_l+3, nx_l+3).
    """
    # advecting velocities (mac.py _advect)
    UC = 0.5 * (U[:, :-1] + U[:, 1:])  # cell (gy0−2+r, gx0−2+c)
    VC = 0.5 * (V[:-1, :] + V[1:, :])  # cell (gy0−2+r, gx0−2+c)
    UY = 0.5 * (U[:-1, :] + U[1:, :])  # corner (gy0−1+r, face gx0−2+c)
    VX = 0.5 * (V[:, :-1] + V[:, 1:])  # corner (gy0−2+r, gx0−1+c)
    UYc = UY[:, 1:]  # corner window (gy0−1+a, gx0−1+b)
    VXc = VX[1:, :]

    if scheme == "central":
        FU = UC * UC
        GU = VXc * UYc
        FV = UYc * VXc
        GV = VC * VC
    elif scheme in ("upwind", "tvd"):
        tvd = scheme == "tvd"

        def slopes_x(q, mask_zero):
            s = _limited_slope(q[:, 1:-1] - q[:, :-2], q[:, 2:] - q[:, 1:-1])
            s = jnp.pad(s, ((0, 0), (1, 1)))
            return jnp.where(mask_zero, 0.0, s)

        def slopes_y(q, mask_zero):
            s = _limited_slope(q[1:-1, :] - q[:-2, :], q[2:, :] - q[1:-1, :])
            s = jnp.pad(s, ((1, 1), (0, 0)))
            return jnp.where(mask_zero, 0.0, s)

        if tvd:
            # _slopes_* zero their slopes at the single-device arrays'
            # boundary lines; reproduce by global index (and zero them
            # outside the domain so halo junk stays inert)
            SXU = slopes_x(U, (gfU <= 0) | (gfU >= nx))
            SYU = slopes_y(U, (grU <= -1) | (grU >= ny))  # ue ghost rows
            SYV = slopes_y(V, (grV <= 0) | (grV >= ny))
            SXV = slopes_x(V, (gcV <= -1) | (gcV >= nx))  # ve ghost cols
        else:
            SXU = jnp.zeros_like(U)
            SYU = jnp.zeros_like(U)
            SYV = jnp.zeros_like(V)
            SXV = jnp.zeros_like(V)

        FU = UC * _face_value(U[:, :-1], U[:, 1:], UC, SXU[:, :-1], SXU[:, 1:])
        GU = VXc * _face_value(
            U[:-1, 1:], U[1:, 1:], VXc, SYU[:-1, 1:], SYU[1:, 1:]
        )
        GV = VC * _face_value(V[:-1, :], V[1:, :], VC, SYV[:-1, :], SYV[1:, :])
        FV = UYc * _face_value(
            V[1:, :-1], V[1:, 1:], UYc, SXV[1:, :-1], SXV[1:, 1:]
        )
    else:
        raise ValueError(f"unknown MAC scheme {scheme!r}")

    ny_l = U.shape[0] - 4
    nx_l = U.shape[1] - 4
    # conv_u at owned face (gy0+j, gx0+i):
    #   (F_u[cell i] − F_u[cell i−1])/dx + (G_u[corner j+1] − G_u[corner j])/dy
    conv_u = (
        FU[2 : 2 + ny_l, 2 : 2 + nx_l] - FU[2 : 2 + ny_l, 1 : 1 + nx_l]
    ) * (1.0 / dx) + (
        GU[2 : 2 + ny_l, 1 : 1 + nx_l] - GU[1 : 1 + ny_l, 1 : 1 + nx_l]
    ) * (1.0 / dy)
    # conv_v at owned row-face (gy0+j, gx0+i):
    #   (F_v[corner i+1] − F_v[corner i])/dx + (G_v[cell j] − G_v[cell j−1])/dy
    conv_v = (
        FV[1 : 1 + ny_l, 2 : 2 + nx_l] - FV[1 : 1 + ny_l, 1 : 1 + nx_l]
    ) * (1.0 / dx) + (
        GV[2 : 2 + ny_l, 2 : 2 + nx_l] - GV[1 : 1 + ny_l, 2 : 2 + nx_l]
    ) * (1.0 / dy)
    return conv_u, conv_v


def trim_face_masks(mask_u, mask_v):
    """Trim face-sampled IBM masks to the shardable (ny, nx) shape,
    asserting the boundary-adjacent lines the explicit step cannot see
    are exactly zero (true for any body ≥ radius+5dx from the domain
    boundary: the Gaussian shell is hard-cut to 0 there)."""
    import numpy as np

    mu = np.asarray(mask_u)
    mv = np.asarray(mask_v)
    if not (
        np.all(mu[:, 0] == 0.0)
        and np.all(mu[:, -2:] == 0.0)
        and np.all(mv[0, :] == 0.0)
        and np.all(mv[-2:, :] == 0.0)
    ):
        raise ValueError(
            "IBM body touches the domain boundary; the trimmed sharded "
            "representation requires zero mask on boundary-adjacent faces"
        )
    return jnp.asarray(mu[:, :-1]), jnp.asarray(mv[:-1, :])


def make_cavity_mac_explicit_step(cfg: MACConfig, mesh: Mesh,
                                  lid_velocity: float = 1.0):
    """Explicit-comm MAC step for the lid-driven cavity."""
    bcs = cavity_mac_local_bcs(cfg.grid.ny, cfg.grid.nx, lid_velocity)
    return jax.jit(make_mac_explicit_step(cfg, mesh, bcs))


def make_cylinder_mac_explicit_step(cfg: MACConfig, mesh: Mesh,
                                    v_inf: float = 1.0,
                                    perturb_amp: float = 0.01,
                                    perturb_ramp_steps: int = 1000,
                                    ibm_ramp_steps: int = 0):
    """Explicit-comm MAC step for the external-flow (cylinder) case.

    Call as ``step(tstate, cfl_scale, mask_u_t, mask_v_t)`` with the
    trimmed, P("y","x")-sharded face masks from ``trim_face_masks``.
    """
    g = cfg.grid
    bcs = external_flow_mac_local_bcs(
        g.ny, g.nx, g.dy, g.y_min, g.y_max, v_inf,
        perturb_amp=perturb_amp, perturb_ramp_steps=perturb_ramp_steps,
    )
    return jax.jit(make_mac_explicit_step(cfg, mesh, bcs, use_ibm=True,
                                          ibm_ramp_steps=ibm_ramp_steps))


def make_moving_body_mac_explicit_step(cfg: MACConfig, mesh: Mesh,
                                       moving_body,
                                       ibm_ramp_steps: int = 0,
                                       moving_scheme: str = "penalize"):
    """Explicit-comm MAC step for a moving body (ibm.MovingBody) in a
    quiescent free-slip box — the sharded twin of the
    ``cylinder_oscillating`` case: masks are rebuilt per step from the
    shard's global index grids (elementwise — no constants, no
    gathers), forces psum'd. ``moving_scheme="ghost"`` selects the
    sharded sharp-interface moving ghost instead of penalization."""
    g = cfg.grid
    bcs = free_slip_mac_local_bcs(g.ny, g.nx)
    return jax.jit(make_mac_explicit_step(
        cfg, mesh, bcs, moving_body=moving_body,
        ibm_ramp_steps=ibm_ramp_steps, moving_scheme=moving_scheme,
    ))
