"""Explicit shard_map step for the 3D staggered (MAC) solver.

The multi-chip path for the 3D accuracy tier (models/mac3d.py): the face
arrays are uneven in one axis each, so GSPMD hits the same XLA SPMD
miscompilation as the 2D MAC state (see test_parallel.py xfails). Here
the *trimmed* 3D state (last boundary face of each component dropped —
u[..., :-1], v[:, :-1, :], w[:-1] — all (nz, ny, nx)) is sharded
P(None, "y", "x"): z stays local (the cavity3d layout, BASELINE config
5), y/x ride ``ppermute`` halos, boundary faces and tangential ghosts
are global-index masked writes (z-direction ghosts are plain local
concatenations), and the projection is the exact distributed 3D DCT
(``transforms.dct_poisson3d_local``).

Advection/diffusion run the SINGLE-DEVICE mac3d operators on a width-2
halo window (the ±2-center virtual local domain) and crop to owned
faces — every window position within the stencil radius of an owned
face holds the exact global value, so all schemes (central/upwind/tvd
via ``advect3d`` + a slope_fix zeroing MUSCL slopes at global boundary
lines the window runs through) and the Smagorinsky LES tier
(``use_les``, with the global edge-clamp of ν_t emulated by masked
rolls) come along for free. Cavity BCs (lid at z_hi moving in +x — the
only 3D MAC case). Equality with the single-device step on an 8-device
mesh: tests/test_mac3d_explicit.py.

Dynamic Germano–Lilly LES (``les_model="dynamic"``, round 4): the Lilly
integrand at a cell reads center velocities within ±2 cells only, so
width-3 FACE halos give exact ±2-CENTER windows; per-shard partial
contractions reduce with ``psum`` and the volume-averaged C_s² matches
the single-device value to fp32 partial-sum rounding (the one
deliberately non-bitwise quantity — everything downstream of it
inherits that rounding; tests assert 5e-5). IBM bodies are excluded
from the contraction via width-1 halos of the trimmed face masks
(penalization) or ghost-table ``solid`` masks.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

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


def _dynamic_cs2_local(u_t, v_t, w_t, py, px, ny_l, nx_l, nz, ny, nx,
                       ro, co, inv_g2x, inv_g2y, inv_g2z, delta_sq,
                       use_ibm, ghost_halo, extras):
    """psum'd volume-averaged Germano–Lilly C_s² from trimmed face
    blocks — shared by the uniform and stretched sharded 3D tiers
    (call inside shard_map). The Lilly integrand at a cell reads center
    velocities within ±2 cells (one test filter + one gradient each
    way), so width-3 FACE halos give exact ±2-CENTER windows; the
    boundary_skip=3 interior mask excludes every cell the window-edge
    clamp could contaminate. ``inv_g2*``/``delta_sq`` are 0.5/h scalars
    (uniform) or the ±2-window metric slices (stretched). IBM body
    cells leave the contraction via width-1 halos of the trimmed face
    masks (``use_ibm``) or ghost-table ``solid`` masks
    (``ghost_halo``) — the sharded twin of
    ops.les_dynamic.ibm_fluid_mask_centers."""
    from cfdsim_tpu.ops.les_dynamic import lilly_integrand_3d

    U3 = _halo_yx(u_t, py, px, w=3)  # x-faces gx0-3..+nx_l+2
    V3 = _halo_yx(v_t, py, px, w=3)
    W3 = _halo_yx(w_t, py, px, w=3)
    uc_w = (0.5 * (U3[:, :, :-1] + U3[:, :, 1:]))[:, 1:-1, 1:]
    vc_w = (0.5 * (V3[:, :-1, :] + V3[:, 1:, :]))[:, 1:, 1:-1]
    wz3 = jnp.concatenate([W3, jnp.zeros_like(W3[:1])], axis=0)
    wc_w = (0.5 * (wz3[:-1] + wz3[1:]))[:, 1:-1, 1:-1]
    lm_w, mm_w = lilly_integrand_3d(
        uc_w, vc_w, wc_w, inv_g2x, inv_g2y, inv_g2z, delta_sq,
    )
    lm_o = lm_w[:, 2 : 2 + ny_l, 2 : 2 + nx_l]
    mm_o = mm_w[:, 2 : 2 + ny_l, 2 : 2 + nx_l]
    # boundary_skip=3 from every GLOBAL wall (z is local)
    kz = lax.broadcasted_iota(jnp.int32, (nz, 1, 1), 0)
    inc = (
        (kz >= 3) & (kz <= nz - 4)
        & (ro >= 3) & (ro <= ny - 4)
        & (co >= 3) & (co <= nx - 4)
    )
    # centers need the +1 face -> width-1 mask halos; the dropped
    # boundary-face planes only feed interior-masked cells, so their
    # zero fill is harmless
    if use_ibm:
        mask_u_t, mask_v_t, mask_w_t = extras
        _, mu_hi = _exchange_axis(mask_u_t, "x", px, axis=2, width=1)
        _, mv_hi = _exchange_axis(mask_v_t, "y", py, axis=1, width=1)
        mu = jnp.concatenate([mask_u_t, mu_hi], axis=2)
        mv = jnp.concatenate([mask_v_t, mv_hi], axis=1)
        mw = jnp.concatenate(
            [mask_w_t, jnp.zeros_like(mask_w_t[:1])], axis=0
        )
        solid = jnp.maximum(
            jnp.maximum(
                jnp.maximum(mu[:, :, 1:], mu[:, :, :-1]),
                jnp.maximum(mv[:, 1:, :], mv[:, :-1, :]),
            ),
            jnp.maximum(mw[1:], mw[:-1]),
        )
        inc = inc & (solid < 0.5)
    elif ghost_halo is not None:
        (tables,) = extras
        su, sv, sw = tables.u.solid, tables.v.solid, tables.w.solid
        _, su_hi = _exchange_axis(su, "x", px, axis=2, width=1)
        _, sv_hi = _exchange_axis(sv, "y", py, axis=1, width=1)
        su = jnp.concatenate([su, su_hi], axis=2)
        sv = jnp.concatenate([sv, sv_hi], axis=1)
        sw = jnp.concatenate([sw, jnp.zeros_like(sw[:1])], axis=0)
        solid_c = (
            (su[:, :, 1:] | su[:, :, :-1])
            | (sv[:, 1:, :] | sv[:, :-1, :])
            | (sw[1:] | sw[:-1])
        )
        inc = inc & ~solid_c
    lm_s = _psum(jnp.sum(jnp.where(inc, lm_o, 0.0)))
    mm_s = _psum(jnp.sum(jnp.where(inc, mm_o, 0.0)))
    return jnp.clip(lm_s / (mm_s + 1e-20), 0.0, 0.3**2)


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


class MAC3DLocalBCs(NamedTuple):
    """3D MAC boundary conditions in the masked-write local form (the 3D
    analog of mac_explicit.MACLocalBCs).

    ``pre(u_t, v_t, w_t, ro, co, state)`` applies the set_normal writes
    living inside the trimmed arrays; ``aux(...)`` computes BC scalars
    needing global reductions (the mass-consistent outflow shift);
    ``win(U2, V2, W2, r2, c2, state, aux)`` writes dropped boundary faces
    and y/x tangential ghosts on the width-2 halo windows;
    ``zghost_u/zghost_v`` build the z-direction ghost extensions of the
    window arrays; ``pad_writes(U, V, Wz, rp, cp, state, aux)`` the same
    BC writes on width-1 padded blocks (divergence/metrics);
    ``velmax_extra(u_t, aux)`` the |value| bound of dropped faces the
    trimmed max cannot see (the outflow face)."""

    pre: Callable
    aux: Callable
    win: Callable
    zghost_u: Callable
    zghost_v: Callable
    pad_writes: Callable
    velmax_extra: Callable


def cavity3d_local_bcs(nx: int, ny: int,
                       lid_velocity: float = 1.0) -> MAC3DLocalBCs:
    """Masked-write form of mac3d.cavity3d_bcs (no-slip box, lid at z_hi
    moving in +x)."""

    def pre(u_t, v_t, w_t, ro, co, state):
        u_t = jnp.where(co == 0, 0.0, u_t)
        v_t = jnp.where(ro == 0, 0.0, v_t)
        w_t = w_t.at[0].set(0.0)
        return u_t, v_t, w_t

    def aux(u_t, v_t, w_t, ro, co, state):
        return ()

    def win(U2, V2, W2, r2, c2, state, a):
        # u: columns are x-faces — dropped/virtual faces ≥ nx are 0
        U2 = jnp.where(c2 >= nx, 0.0, U2)
        # tangential wall ghosts in y: u(−1) = −u(0), u(ny) = −u(ny−1)
        U2 = jnp.where(r2 == -1, -jnp.roll(U2, -1, axis=1), U2)
        U2 = jnp.where(r2 == ny, -jnp.roll(U2, 1, axis=1), U2)
        # v: rows are y-faces — dropped/virtual faces ≥ ny are 0
        V2 = jnp.where(r2 >= ny, 0.0, V2)
        V2 = jnp.where(c2 == -1, -jnp.roll(V2, -1, axis=2), V2)
        V2 = jnp.where(c2 == nx, -jnp.roll(V2, 1, axis=2), V2)
        # w: planes are z-faces (local); tangential ghosts in y AND x
        W2 = jnp.where(r2 == -1, -jnp.roll(W2, -1, axis=1), W2)
        W2 = jnp.where(r2 == ny, -jnp.roll(W2, 1, axis=1), W2)
        W2 = jnp.where(c2 == -1, -jnp.roll(W2, -1, axis=2), W2)
        W2 = jnp.where(c2 == nx, -jnp.roll(W2, 1, axis=2), W2)
        return U2, V2, W2

    def zghost_u(u_win):
        return jnp.concatenate(
            [-u_win[:1], u_win, 2.0 * lid_velocity - u_win[-1:]], axis=0
        )

    def zghost_v(v_win):
        return jnp.concatenate([-v_win[:1], v_win, -v_win[-1:]], axis=0)

    def pad_writes(U, V, Wz, rp, cp, state, a):
        U = jnp.where(cp == nx, 0.0, U)
        V = jnp.where(rp == ny, 0.0, V)
        U = jnp.where(rp == -1, -jnp.roll(U, -1, axis=1), U)
        U = jnp.where(rp == ny, -jnp.roll(U, 1, axis=1), U)
        V = jnp.where(cp == -1, -jnp.roll(V, -1, axis=2), V)
        V = jnp.where(cp == nx, -jnp.roll(V, 1, axis=2), V)
        Wz = jnp.where(rp == -1, -jnp.roll(Wz, -1, axis=1), Wz)
        Wz = jnp.where(rp == ny, -jnp.roll(Wz, 1, axis=1), Wz)
        Wz = jnp.where(cp == -1, -jnp.roll(Wz, -1, axis=2), Wz)
        Wz = jnp.where(cp == nx, -jnp.roll(Wz, 1, axis=2), Wz)
        return U, V, Wz

    def velmax_extra(u_t, a):
        return jnp.float32(0.0)

    return MAC3DLocalBCs(pre, aux, win, zghost_u, zghost_v, pad_writes,
                         velmax_extra)


def free_slip3d_local_bcs(nx: int, ny: int) -> MAC3DLocalBCs:
    """Masked-write form of mac3d.free_slip_bcs3d (symmetry box: zero
    normal velocity, zero tangential shear on all six faces) — the
    far-field kit for moving-body cases in quiescent fluid (the 3D
    habitat of mac_explicit.free_slip_mac_local_bcs)."""

    def pre(u_t, v_t, w_t, ro, co, state):
        u_t = jnp.where(co == 0, 0.0, u_t)
        v_t = jnp.where(ro == 0, 0.0, v_t)
        w_t = w_t.at[0].set(0.0)
        return u_t, v_t, w_t

    def aux(u_t, v_t, w_t, ro, co, state):
        return ()

    def win(U2, V2, W2, r2, c2, state, a):
        U2 = jnp.where(c2 >= nx, 0.0, U2)
        U2 = jnp.where(r2 == -1, jnp.roll(U2, -1, axis=1), U2)
        U2 = jnp.where(r2 == ny, jnp.roll(U2, 1, axis=1), U2)
        V2 = jnp.where(r2 >= ny, 0.0, V2)
        V2 = jnp.where(c2 == -1, jnp.roll(V2, -1, axis=2), V2)
        V2 = jnp.where(c2 == nx, jnp.roll(V2, 1, axis=2), V2)
        W2 = jnp.where(r2 == -1, jnp.roll(W2, -1, axis=1), W2)
        W2 = jnp.where(r2 == ny, jnp.roll(W2, 1, axis=1), W2)
        W2 = jnp.where(c2 == -1, jnp.roll(W2, -1, axis=2), W2)
        W2 = jnp.where(c2 == nx, jnp.roll(W2, 1, axis=2), W2)
        return U2, V2, W2

    def zghost_u(u_win):
        return jnp.concatenate([u_win[:1], u_win, u_win[-1:]], axis=0)

    def zghost_v(v_win):
        return jnp.concatenate([v_win[:1], v_win, v_win[-1:]], axis=0)

    def pad_writes(U, V, Wz, rp, cp, state, a):
        U = jnp.where(cp == nx, 0.0, U)
        V = jnp.where(rp == ny, 0.0, V)
        U = jnp.where(rp == -1, jnp.roll(U, -1, axis=1), U)
        U = jnp.where(rp == ny, jnp.roll(U, 1, axis=1), U)
        V = jnp.where(cp == -1, jnp.roll(V, -1, axis=2), V)
        V = jnp.where(cp == nx, jnp.roll(V, 1, axis=2), V)
        Wz = jnp.where(rp == -1, jnp.roll(Wz, -1, axis=1), Wz)
        Wz = jnp.where(rp == ny, jnp.roll(Wz, 1, axis=1), Wz)
        Wz = jnp.where(cp == -1, jnp.roll(Wz, -1, axis=2), Wz)
        Wz = jnp.where(cp == nx, jnp.roll(Wz, 1, axis=2), Wz)
        return U, V, Wz

    def velmax_extra(u_t, a):
        return jnp.float32(0.0)

    return MAC3DLocalBCs(pre, aux, win, zghost_u, zghost_v, pad_writes,
                         velmax_extra)


def external_flow3d_local_bcs(nx: int, ny: int, nz: int, v_inf: float,
                              face_weights=None) -> MAC3DLocalBCs:
    """Masked-write form of mac3d.external_flow_bcs3d: Dirichlet inflow
    at x_lo, mass-consistent zero-gradient outflow at x_hi (the dropped
    u face nx, reconstructed as u(nx−1) + the psum'd global shift),
    free-slip far-field on the four lateral faces.

    ``face_weights`` (optional, (nz, ny)): x-face areas h_y⊗h_z for the
    area-weighted mass balance on a stretched grid — looked up per
    shard by ``lax.dynamic_slice`` of the y-padded array (never a
    gather: backend miscompile, CLAUDE.md)."""
    import numpy as np

    if face_weights is not None:
        _pad = 4
        fw_total = float(np.sum(face_weights))
        fw_pad = jnp.asarray(
            np.pad(np.asarray(face_weights, np.float32),
                   ((0, 0), (_pad, _pad)), mode="edge")
        )

    def _weights_local(ro):
        # ro is (1, ny_l, nx_l) of global row indices gy0..; weights vary
        # over (z, y) only
        gy0 = ro[0, 0, 0]
        ny_l = ro.shape[1]
        w = lax.dynamic_slice(
            fw_pad, (0, gy0 + _pad), (fw_pad.shape[0], ny_l)
        )
        return w[:, :, None]

    def pre(u_t, v_t, w_t, ro, co, state):
        u_t = jnp.where(co == 0, v_inf, u_t)
        v_t = jnp.where(ro == 0, 0.0, v_t)
        w_t = w_t.at[0].set(0.0)
        return u_t, v_t, w_t

    def aux(u_t, v_t, w_t, ro, co, state):
        # mass-consistent outflow shift: (area-weighted) mean over the
        # (nz, ny) plane of u(face 0) − u(face nx−1)
        # (mac3d.external_flow_bcs3d set_normal)
        if face_weights is None:
            s0 = _psum(jnp.sum(jnp.where(co == 0, u_t, 0.0)))
            s1 = _psum(jnp.sum(jnp.where(co == nx - 1, u_t, 0.0)))
            return (s0 - s1) / float(ny * nz)
        w = _weights_local(ro)
        s0 = _psum(jnp.sum(w * jnp.where(co == 0, u_t, 0.0)))
        s1 = _psum(jnp.sum(w * jnp.where(co == nx - 1, u_t, 0.0)))
        return (s0 - s1) / fw_total

    def win(U2, V2, W2, r2, c2, state, mcorr):
        # u: virtual faces > nx are 0; the dropped outflow face nx is the
        # zero-gradient copy of face nx−1 plus the global shift
        U2 = jnp.where(c2 > nx, 0.0, U2)
        U2 = jnp.where(c2 == nx, jnp.roll(U2, 1, axis=2) + mcorr, U2)
        # free-slip lateral ghosts: edge copy (zero tangential shear)
        U2 = jnp.where(r2 == -1, jnp.roll(U2, -1, axis=1), U2)
        U2 = jnp.where(r2 == ny, jnp.roll(U2, 1, axis=1), U2)
        V2 = jnp.where(r2 >= ny, 0.0, V2)
        V2 = jnp.where(c2 == -1, -jnp.roll(V2, -1, axis=2), V2)  # inflow v=0
        V2 = jnp.where(c2 == nx, jnp.roll(V2, 1, axis=2), V2)  # outflow ∂v/∂x=0
        W2 = jnp.where(r2 == -1, jnp.roll(W2, -1, axis=1), W2)
        W2 = jnp.where(r2 == ny, jnp.roll(W2, 1, axis=1), W2)
        W2 = jnp.where(c2 == -1, -jnp.roll(W2, -1, axis=2), W2)
        W2 = jnp.where(c2 == nx, jnp.roll(W2, 1, axis=2), W2)
        return U2, V2, W2

    def zghost_u(u_win):
        # free slip in z: ∂u/∂z = 0
        return jnp.concatenate([u_win[:1], u_win, u_win[-1:]], axis=0)

    def zghost_v(v_win):
        return jnp.concatenate([v_win[:1], v_win, v_win[-1:]], axis=0)

    def pad_writes(U, V, Wz, rp, cp, state, mcorr):
        U = jnp.where(cp == nx, jnp.roll(U, 1, axis=2) + mcorr, U)
        V = jnp.where(rp == ny, 0.0, V)
        U = jnp.where(rp == -1, jnp.roll(U, -1, axis=1), U)
        U = jnp.where(rp == ny, jnp.roll(U, 1, axis=1), U)
        V = jnp.where(cp == -1, -jnp.roll(V, -1, axis=2), V)
        V = jnp.where(cp == nx, jnp.roll(V, 1, axis=2), V)
        Wz = jnp.where(rp == -1, jnp.roll(Wz, -1, axis=1), Wz)
        Wz = jnp.where(rp == ny, jnp.roll(Wz, 1, axis=1), Wz)
        Wz = jnp.where(cp == -1, -jnp.roll(Wz, -1, axis=2), Wz)
        Wz = jnp.where(cp == nx, jnp.roll(Wz, 1, axis=2), Wz)
        return U, V, Wz

    def velmax_extra(u_t, mcorr):
        # the dropped outflow face (≈ v_inf) must join the CFL max —
        # it exists only on the last x-rank
        ix = lax.axis_index("x")
        px = lax.axis_size("x")
        return jnp.where(
            ix == px - 1,
            jnp.max(jnp.abs(u_t[:, :, -1] + mcorr)),
            jnp.float32(0.0),
        )

    return MAC3DLocalBCs(pre, aux, win, zghost_u, zghost_v, pad_writes,
                         velmax_extra)


def trim_face_masks3d(mask_u, mask_v, mask_w):
    """Trim 3D face-sampled IBM masks to the shardable (nz, ny, nx)
    shape, asserting the boundary-adjacent entries the explicit step
    cannot see are exactly zero (any body well inside the domain)."""
    import numpy as np

    mu = np.asarray(mask_u)
    mv = np.asarray(mask_v)
    mw = np.asarray(mask_w)
    if not (
        np.all(mu[:, :, 0] == 0.0)
        and np.all(mu[:, :, -2:] == 0.0)
        and np.all(mv[:, 0, :] == 0.0)
        and np.all(mv[:, -2:, :] == 0.0)
        and np.all(mw[0] == 0.0)
        and np.all(mw[-2:] == 0.0)
    ):
        raise ValueError(
            "IBM body touches the domain boundary; the trimmed sharded "
            "representation requires zero mask on boundary-adjacent faces"
        )
    return (
        jnp.asarray(mu[:, :, :-1]),
        jnp.asarray(mv[:, :-1, :]),
        jnp.asarray(mw[:-1]),
    )


def make_mac3d_explicit_step(cfg: MAC3DConfig, mesh: Mesh,
                             bcs: MAC3DLocalBCs,
                             use_ibm: bool = False,
                             ibm_ramp_steps: int = 0,
                             moving_body=None,
                             moving_scheme: str = "penalize",
                             ghost_halo: int | None = None):
    """Build ``step(tstate, cfl_scale[, mask_u_t, mask_v_t, mask_w_t]) ->
    (tstate, StepMetrics)`` on the trimmed 3D representation,
    P(None, "y", "x")-sharded. Optional IBM masks are the trimmed
    face-sampled penalization masks from ``trim_face_masks3d``.
    ``moving_body`` (ibm.MovingBody3D) enables the sharded moving-
    geometry IBM: sharp face masks are rebuilt per step from the shard's
    global index grids (pure elementwise iota arithmetic — no gathers,
    no closed-over coordinate constants, per the shard_map backend-bug
    rules in CLAUDE.md), penalization toward u_b(t), forces psum'd —
    the 3D habitat of mac_explicit's moving_body. ``ghost_halo``
    enables the sharded ghost-cell direct-forcing IBM instead: the step
    then takes the per-shard ``ShardedGhostIBM3D`` tables as a trailing
    argument (tables-as-args per the shard_map backend-bug rules) and
    ``ghost_halo`` is the static probe halo width returned by
    ``ibm_ghost_explicit.partition_ghost_ibm3d``. ``moving_scheme=
    "ghost"`` upgrades ``moving_body`` to the sharded sharp-interface
    moving ghost (ibm_ghost_explicit.moving_ghost_forcing_3d_local)."""
    if ghost_halo is not None and use_ibm:
        raise ValueError("ghost_halo and use_ibm are mutually exclusive")
    if moving_scheme not in ("penalize", "ghost"):
        raise ValueError(f"unknown moving_scheme {moving_scheme!r}")
    g = cfg.grid
    nx, ny, nz = g.nx, g.ny, g.nz
    dx, dy, dz = g.dx, g.dy, g.dz
    h = min(dx, dy, dz)
    py = mesh.shape["y"]
    px = mesh.shape["x"]
    ny_l, nx_l = ny // py, nx // px
    if ny % py or nx % px:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {py}x{px}")
    if ny_l < 2 or nx_l < 2:
        raise ValueError("local blocks must be at least 2x2 for width-2 halos")
    if cfg.poisson.method != "dct":
        raise ValueError("explicit 3D MAC step supports poisson method 'dct'")
    if cfg.scheme not in ("central", "upwind", "tvd"):
        raise ValueError(f"unknown MAC3D scheme {cfg.scheme!r}")
    if getattr(cfg, "time_scheme", "euler") != "euler":
        raise ValueError(
            "the explicit sharded 3D MAC step implements time_scheme='euler'"
        )
    if getattr(cfg, "projection", "chorin") != "chorin":
        raise ValueError("the explicit sharded step implements projection='chorin'")
    les_model = getattr(cfg, "les_model", "smagorinsky")
    if les_model not in ("smagorinsky", "dynamic"):
        raise ValueError(f"unknown les_model {les_model!r}")
    dynamic_les = cfg.use_les and les_model == "dynamic"
    if dynamic_les:
        # the Lilly integrand at a cell depends on center velocities
        # within ±2 cells (one test filter + one gradient each way), so
        # a width-3 FACE halo provides exact ±2-center windows; the
        # volume-averaged quotient reduces with psum. Matches
        # models/mac3d.py's single-device value up to partial-sum
        # rounding (the contraction is a global fp32 sum).
        if moving_body is not None:
            raise ValueError(
                "les_model='dynamic' does not support moving_body yet "
                "(matches models/mac3d.py)"
            )
        if any(d <= 6 for d in (nz, ny, nx)):
            raise ValueError(
                f"grid {(nz, ny, nx)} too small for the dynamic model's "
                "boundary_skip=3 (needs > 6 cells per axis)"
            )
        if ny_l < 3 or nx_l < 3:
            raise ValueError(
                "les_model='dynamic' needs local blocks >= 3x3 for its "
                f"width-3 halo windows; got {ny_l}x{nx_l}"
            )

    from cfdsim_tpu.models.mac3d import (
        _diffuse_les3d,
        advect3d,
        diffuse3d,
        smagorinsky_viscosity_mac3d,
        strain_magnitude_mac3d,
    )
    from cfdsim_tpu.parallel.transforms import dct_poisson3d_local

    if moving_body is not None:
        hb = min(dx, dy, dz)  # isotropic taper = models/mac3d.py's
        if moving_scheme == "ghost":
            from cfdsim_tpu.parallel.ibm_ghost_explicit import (
                moving_ghost_width_2d,
            )

            _mg_delta = 1.5 * hb  # = models/mac3d.py's moving-ghost δ
            _mg_width = moving_ghost_width_2d(
                _mg_delta, min(dx, dy, dz), max(dx, dy, dz)
            )
            if _mg_width >= min(ny_l, nx_l):
                raise ValueError(
                    f"moving-ghost halo width {_mg_width} needs local "
                    f"blocks > {_mg_width}; got {ny_l}x{nx_l}"
                )

        def _mb_masks3d(ro, co, t):
            cx, cy, cz = moving_body.center(t)
            r = moving_body.radius
            xg = g.x_min + co.astype(jnp.float32) * dx   # (1, ny_l, nx_l)
            yg = g.y_min + ro.astype(jnp.float32) * dy
            zci = g.z_min + (lax.broadcasted_iota(
                jnp.float32, (nz, 1, 1), 0) + 0.5) * dz  # cell centers
            zfi = g.z_min + lax.broadcasted_iota(
                jnp.float32, (nz, 1, 1), 0) * dz         # z faces 0..nz-1

            def m(X, Y, Z):
                d = jnp.sqrt(
                    (X - cx) ** 2 + (Y - cy) ** 2 + (Z - cz) ** 2
                )
                return jnp.clip((r + 0.5 * hb - d) / hb, 0.0, 1.0)

            return (
                m(xg, yg + 0.5 * dy, zci),
                m(xg + 0.5 * dx, yg, zci),
                m(xg + 0.5 * dx, yg + 0.5 * dy, zfi),
            )

    spec = P(None, "y", "x")
    state_spec = MAC3DState(u=spec, v=spec, w=spec, p=spec, t=P(), step=P())
    metric_spec = StepMetrics(*([P()] * len(StepMetrics._fields)))
    in_specs = [state_spec, P()]
    if use_ibm:
        in_specs += [spec, spec, spec]
    if ghost_halo is not None:
        from cfdsim_tpu.parallel.ibm_ghost_explicit import ghost_ibm_spec

        in_specs += [ghost_ibm_spec()]

    def step_local(ts: MAC3DState, cfl_scale, *extras):
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        gy0 = iy * ny_l
        gx0 = ix * nx_l
        ro = gy0 + lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 0)[None]
        co = gx0 + lax.broadcasted_iota(jnp.int32, (ny_l, nx_l), 1)[None]
        shp_p = (ny_l + 2, nx_l + 2)
        rp = gy0 - 1 + lax.broadcasted_iota(jnp.int32, shp_p, 0)[None]
        cp = gx0 - 1 + lax.broadcasted_iota(jnp.int32, shp_p, 1)[None]

        def set_normal(u_t, v_t, w_t):
            u_t, v_t, w_t = bcs.pre(u_t, v_t, w_t, ro, co, ts)
            a = bcs.aux(u_t, v_t, w_t, ro, co, ts)
            return u_t, v_t, w_t, a

        def pad(u_t, v_t, w_t, a):
            """Halo-pad + all boundary-face and tangential-ghost writes →
            the padded arrays agree with mac3d's ghost-extended arrays at
            every in-domain and ghost position."""
            U = _halo_yx(u_t, py, px)
            V = _halo_yx(v_t, py, px)
            W = _halo_yx(w_t, py, px)
            Wz = jnp.concatenate(
                [W, jnp.zeros_like(W[:1])], axis=0
            )  # w z-face nz = 0
            return bcs.pad_writes(U, V, Wz, rp, cp, ts, a)

        u_t, v_t, w_t, a = set_normal(ts.u, ts.v, ts.w)

        # --- width-2 halo windows: the ±2-center virtual local domain
        # on which the SINGLE-DEVICE mac3d operators run verbatim. Every
        # window position within the stencil radius of an owned face
        # holds the exact global value: halo lines from neighbors
        # (zero-filled past the chain ends by _exchange_axis), global
        # boundary faces/tangential ghosts as masked writes. The cropped
        # outputs are therefore bitwise the single-device ones.
        U2 = _halo_yx(u_t, py, px, w=2)  # (nz, ny_l+4, nx_l+4)
        V2 = _halo_yx(v_t, py, px, w=2)
        W2 = _halo_yx(w_t, py, px, w=2)
        shp2 = (ny_l + 4, nx_l + 4)
        r2 = gy0 - 2 + lax.broadcasted_iota(jnp.int32, shp2, 0)[None]
        c2 = gx0 - 2 + lax.broadcasted_iota(jnp.int32, shp2, 1)[None]
        U2, V2, W2 = bcs.win(U2, V2, W2, r2, c2, ts, a)

        def zpad(a, axis):
            z = jnp.zeros_like(lax.slice_in_dim(a, 0, 1, axis=axis))
            return jnp.concatenate([z, a, z], axis=axis)

        # virtual-domain arrays in mac3d's (u, v, w) + ghosts layout
        # (NY = ny_l+4, NX = nx_l+4 centers); the single zero lines
        # appended beyond the window feed only cropped positions or
        # slope lines zeroed below
        zcol = jnp.zeros_like(U2[:, :, :1])
        u_win = jnp.concatenate([U2, zcol], axis=2)      # (nz, NY, NX+1)
        zrow = jnp.zeros_like(V2[:, :1, :])
        v_win = jnp.concatenate([V2, zrow], axis=1)      # (nz, NY+1, NX)
        w_win = jnp.concatenate(
            [W2, jnp.zeros_like(W2[:1])], axis=0
        )                                                # (nz+1, NY, NX)
        u_gy = zpad(u_win, 1)
        u_gz = bcs.zghost_u(u_win)
        v_gx = zpad(v_win, 2)
        v_gz = bcs.zghost_v(v_win)
        w_gx = zpad(w_win, 2)
        w_gy = zpad(w_win, 1)
        ghosts_win = (u_gy, u_gz, v_gx, v_gz, w_gx, w_gy)

        def slope_fix(name, s):
            # zero MUSCL slopes at GLOBAL boundary lines: the global
            # arrays end there (`_slopes_axis` zeroes its own boundary
            # lines), but on the halo window those lines are interior
            if name in ("uz", "vz", "wz"):
                return s  # z is local — window boundary IS the global one
            base, bnds = {
                "ux": (gx0 - 2, (0, nx)),   # slopes of u along x-faces
                "uy": (gy0 - 3, (-1, ny)),  # of u_gy along y-centers
                "vx": (gx0 - 3, (-1, nx)),  # of v_gx along x-centers
                "vy": (gy0 - 2, (0, ny)),   # of v along y-faces
                "wx": (gx0 - 3, (-1, nx)),
                "wy": (gy0 - 3, (-1, ny)),
            }[name]
            axis = 2 if name[1] == "x" else 1
            idx = base + lax.broadcasted_iota(jnp.int32, s.shape, axis)
            return jnp.where((idx == bnds[0]) | (idx == bnds[1]), 0.0, s)

        # --- LES eddy viscosity (valid on the ±1 ring around owned
        # cells; the window-boundary ring uses the fake zero ghost lines
        # and is never read for owned faces)
        if cfg.use_les:
            if dynamic_les:
                delta_sq = (dx * dy * dz) ** (2.0 / 3.0)
                cs2 = _dynamic_cs2_local(
                    u_t, v_t, w_t, py, px, ny_l, nx_l, nz, ny, nx,
                    ro, co, 0.5 / dx, 0.5 / dy, 0.5 / dz, delta_sq,
                    use_ibm, ghost_halo, extras,
                )
                NUT = (cs2 * delta_sq) * strain_magnitude_mac3d(
                    u_win, v_win, w_win, ghosts_win, dx, dy, dz
                )
            else:
                NUT = smagorinsky_viscosity_mac3d(
                    u_win, v_win, w_win, ghosts_win, dx, dy, dz,
                    cfg.smagorinsky_constant,
                )
            # single-device edge-clamp (pad mode="edge") at GLOBAL edges
            NUT = jnp.where(r2 == -1, jnp.roll(NUT, -1, axis=1), NUT)
            NUT = jnp.where(r2 == ny, jnp.roll(NUT, 1, axis=1), NUT)
            NUT = jnp.where(c2 == -1, jnp.roll(NUT, -1, axis=2), NUT)
            NUT = jnp.where(c2 == nx, jnp.roll(NUT, 1, axis=2), NUT)
            nu_mean = _psum(
                jnp.sum(NUT[:, 2 : 2 + ny_l, 2 : 2 + nx_l])
            ) / float(nx * ny * nz)
            nu_stab = cfg.nu + nu_mean
        else:
            NUT = None
            nu_stab = cfg.nu

        # --- adaptive dt (mac3d; dropped faces are 0 for the cavity and
        # supplied by velmax_extra for external flow — max is
        # association-free, so the reduction matches single-device)
        if cfg.adaptive_dt:
            vel_max = _pmax(
                jnp.maximum(
                    jnp.maximum(jnp.max(jnp.abs(u_t)), jnp.max(jnp.abs(v_t))),
                    jnp.maximum(
                        jnp.maximum(
                            jnp.max(jnp.abs(w_t)), bcs.velmax_extra(u_t, a)
                        ),
                        1e-10,
                    ),
                )
            )
            dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
            dt_visc = 0.125 * h * h / nu_stab
            dt = jnp.clip(
                jnp.minimum(dt_cfl, dt_visc), cfg.dt_min, cfg.dt_max
            ).astype(jnp.float32)
        else:
            dt = jnp.float32(cfg.dt_base)

        # --- single-device advection/diffusion on the window, cropped
        # to owned faces
        conv_u, conv_v, conv_w = advect3d(
            u_win, v_win, w_win, ghosts_win, dx, dy, dz, cfg.scheme,
            slope_fix=slope_fix,
        )
        if cfg.use_les:
            visc_u, visc_v, visc_w = _diffuse_les3d(
                u_win, v_win, w_win, ghosts_win, cfg.nu + NUT, dx, dy, dz
            )
        else:
            lap_u, lap_v, lap_w = diffuse3d(
                u_win, v_win, w_win, ghosts_win, dx, dy, dz
            )
            visc_u = cfg.nu * lap_u
            visc_v = cfg.nu * lap_v
            visc_w = cfg.nu * lap_w
        # crops: conv/visc_u rows = window centers (owned = 2..2+ny_l),
        # cols = window interior x-faces gx0−1+j (owned = 1..1+nx_l);
        # conv/visc_v rows = interior y-faces gy0−1+i; conv/visc_w planes
        # = interior z-faces 1..nz−1 (all of them owned, z is local)
        du = (visc_u - conv_u)[:, 2 : 2 + ny_l, 1 : 1 + nx_l]
        dv = (visc_v - conv_v)[:, 1 : 1 + ny_l, 2 : 2 + nx_l]
        dw = (visc_w - conv_w)[:, 2 : 2 + ny_l, 2 : 2 + nx_l]

        u_star = u_t + jnp.where(co >= 1, dt * du, 0.0)
        v_star = v_t + jnp.where(ro >= 1, dt * dv, 0.0)
        w_star = w_t.at[1:].add(dt * dw)
        u_star, v_star, w_star, a = set_normal(u_star, v_star, w_star)

        # --- IBM penalization + body force (mac3d.make_step ibm block)
        fx = fy = fz = jnp.float32(0.0)
        if use_ibm:
            mask_u_t, mask_v_t, mask_w_t = extras
            from cfdsim_tpu.ibm import ibm_ramp

            strength = ibm_ramp(ts.step, ibm_ramp_steps)
            du_ibm = u_star * (strength * mask_u_t)
            dv_ibm = v_star * (strength * mask_v_t)
            dw_ibm = w_star * (strength * mask_w_t)
            u_star = u_star - du_ibm
            v_star = v_star - dv_ibm
            w_star = w_star - dw_ibm
            if cfg.compute_metrics:
                cell = dx * dy * dz
                fx = _psum(jnp.sum(du_ibm)) * cell / dt
                fy = _psum(jnp.sum(dv_ibm)) * cell / dt
                fz = _psum(jnp.sum(dw_ibm)) * cell / dt

        if ghost_halo is not None:
            # sharded twin of mac3d.make_step's ibm_ghost block: apply
            # the sharp-interface ghost forcing to the BC-consistent
            # provisional fields, forces psum'd (same momentum-exchange
            # accounting). Tables arrive as a shard_map ARG (never
            # closed over — gather-on-constants miscompile rules).
            from cfdsim_tpu.ibm import ibm_ramp
            from cfdsim_tpu.parallel.ibm_ghost_explicit import (
                apply_ghost_forcing_local,
            )

            (tables,) = extras
            strength = ibm_ramp(ts.step, ibm_ramp_steps)
            u_star, du_g = apply_ghost_forcing_local(
                u_star, tables.u, py, px, ghost_halo, strength
            )
            v_star, dv_g = apply_ghost_forcing_local(
                v_star, tables.v, py, px, ghost_halo, strength
            )
            w_star, dw_g = apply_ghost_forcing_local(
                w_star, tables.w, py, px, ghost_halo, strength
            )
            if cfg.compute_metrics:
                cell = dx * dy * dz
                fx = _psum(jnp.sum(du_g)) * cell / dt
                fy = _psum(jnp.sum(dv_g)) * cell / dt
                fz = _psum(jnp.sum(dw_g)) * cell / dt

        if moving_body is not None:
            from cfdsim_tpu.ibm import ibm_ramp

            ub, vb, wb = moving_body.velocity(ts.t)
            strength = ibm_ramp(ts.step, ibm_ramp_steps)
            if moving_scheme == "ghost":
                from cfdsim_tpu.parallel.ibm_ghost_explicit import (
                    moving_ghost_forcing_3d_local,
                )

                ctr = moving_body.center(ts.t)
                r = moving_body.radius
                gy0s = iy * ny_l
                gx0s = ix * nx_l
                sp = (dx, dy, dz)
                u_star, du_mb = moving_ghost_forcing_3d_local(
                    u_star,
                    (g.x_min, g.y_min + 0.5 * dy, g.z_min + 0.5 * dz),
                    sp, (nz, ny, nx + 1), gy0s, gx0s, ctr, r, _mg_delta,
                    ub, strength, py, px, _mg_width,
                )
                v_star, dv_mb = moving_ghost_forcing_3d_local(
                    v_star,
                    (g.x_min + 0.5 * dx, g.y_min, g.z_min + 0.5 * dz),
                    sp, (nz, ny + 1, nx), gy0s, gx0s, ctr, r, _mg_delta,
                    vb, strength, py, px, _mg_width,
                )
                w_star, dw_mb = moving_ghost_forcing_3d_local(
                    w_star,
                    (g.x_min + 0.5 * dx, g.y_min + 0.5 * dy, g.z_min),
                    sp, (nz + 1, ny, nx), gy0s, gx0s, ctr, r, _mg_delta,
                    wb, strength, py, px, _mg_width,
                )
            else:
                m_u, m_v, m_w = _mb_masks3d(ro, co, ts.t)
                du_mb = (u_star - ub) * (strength * m_u)
                dv_mb = (v_star - vb) * (strength * m_v)
                dw_mb = (w_star - wb) * (strength * m_w)
                u_star = u_star - du_mb
                v_star = v_star - dv_mb
                w_star = w_star - dw_mb
            if cfg.compute_metrics:
                cell = dx * dy * dz
                fx = fx + _psum(jnp.sum(du_mb)) * cell / dt
                fy = fy + _psum(jnp.sum(dv_mb)) * cell / dt
                fz = fz + _psum(jnp.sum(dw_mb)) * cell / dt

        # --- exact distributed 3D projection
        US, VS, WSz = pad(u_star, v_star, w_star, a)
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
        u_new, v_new, w_new, a = set_normal(u_new, v_new, w_new)
        u_new = jnp.clip(u_new, -cfg.max_velocity, cfg.max_velocity)
        v_new = jnp.clip(v_new, -cfg.max_velocity, cfg.max_velocity)
        w_new = jnp.clip(w_new, -cfg.max_velocity, cfg.max_velocity)

        new_ts = MAC3DState(
            u=u_new, v=v_new, w=w_new, p=phi,
            t=ts.t + dt, step=ts.step + 1,
        )

        if cfg.compute_metrics:
            UN, VN, WNz = pad(u_new, v_new, w_new, a)
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
                fx=fx,
                fy=fy,
                fz=fz,
            )
        else:
            zero = jnp.float32(0.0)
            metrics = StepMetrics(dt, zero, zero, zero, zero, zero, zero)
        return new_ts, metrics

    return jax.shard_map(
        step_local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(state_spec, metric_spec),
    )


def make_cavity3d_mac_explicit_step(cfg: MAC3DConfig, mesh: Mesh,
                                    lid_velocity: float = 1.0):
    """Explicit-comm 3D MAC step for the lid-driven cavity (BASELINE
    config 5): ``step(tstate, cfl_scale) -> (tstate, StepMetrics)``."""
    g = cfg.grid
    bcs = cavity3d_local_bcs(g.nx, g.ny, lid_velocity)
    return jax.jit(make_mac3d_explicit_step(cfg, mesh, bcs))


def make_sphere_mac3d_explicit_step(cfg: MAC3DConfig, mesh: Mesh,
                                    v_inf: float = 1.0,
                                    ibm_ramp_steps: int = 0):
    """Explicit-comm 3D MAC step for external flow past an immersed body
    (the ``sphere`` case). Call as ``step(tstate, cfl_scale, mask_u_t,
    mask_v_t, mask_w_t)`` with the trimmed, P(None, "y", "x")-sharded
    face masks from ``trim_face_masks3d``."""
    g = cfg.grid
    bcs = external_flow3d_local_bcs(g.nx, g.ny, g.nz, v_inf)
    return jax.jit(make_mac3d_explicit_step(
        cfg, mesh, bcs, use_ibm=True, ibm_ramp_steps=ibm_ramp_steps
    ))


def make_sphere_ghost_mac3d_explicit_step(cfg: MAC3DConfig, mesh: Mesh,
                                          ghost, v_inf: float = 1.0,
                                          ibm_ramp_steps: int = 0):
    """Sharded ghost-cell sphere step — the multi-chip habitat of the
    sharp-interface wall treatment (``sphere`` with ``ibm_scheme=
    "ghost"``; cut Re=3900 LES drag error from +23% to +7.2% vs DNS).

    ``ghost`` is the host-built ``ibm_ghost.GhostIBM3D``
    (``sphere_ghost_ibm``); it is partitioned per shard here and the
    per-shard tables are returned ALONGSIDE the step because they must
    travel as a shard_map argument (gathers on closed-over constants
    miscompile — CLAUDE.md "SECOND backend bug").

    Returns ``(step, tables)``; call ``step(tstate, cfl_scale,
    tables)``."""
    from cfdsim_tpu.parallel.ibm_ghost_explicit import (
        partition_ghost_ibm3d,
        shard_ghost_tables,
    )

    g = cfg.grid
    bcs = external_flow3d_local_bcs(g.nx, g.ny, g.nz, v_inf)
    py, px = mesh.shape["y"], mesh.shape["x"]
    tables, width = partition_ghost_ibm3d(ghost, g.nx, g.ny, g.nz, py, px)
    tables = shard_ghost_tables(tables, mesh)
    step = jax.jit(make_mac3d_explicit_step(
        cfg, mesh, bcs, ghost_halo=width, ibm_ramp_steps=ibm_ramp_steps
    ))
    return step, tables


def make_moving_body_mac3d_explicit_step(cfg: MAC3DConfig, mesh: Mesh,
                                         moving_body,
                                         ibm_ramp_steps: int = 0,
                                         moving_scheme: str = "penalize"):
    """Explicit-comm 3D MAC step for a moving body (ibm.MovingBody3D) in
    a quiescent free-slip box — the sharded twin of mac3d.make_step's
    moving_body (the oscillating-sphere configuration): masks rebuilt
    per step from the shard's global index grids, forces psum'd.
    ``moving_scheme="ghost"`` selects the sharded sharp-interface
    moving ghost instead of penalization."""
    g = cfg.grid
    bcs = free_slip3d_local_bcs(g.nx, g.ny)
    return jax.jit(make_mac3d_explicit_step(
        cfg, mesh, bcs, moving_body=moving_body,
        ibm_ramp_steps=ibm_ramp_steps, moving_scheme=moving_scheme,
    ))
