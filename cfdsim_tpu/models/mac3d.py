"""3D incompressible Navier–Stokes on a staggered (MAC) grid.

The 3D member of the accuracy tier (models/mac.py is the 2D version): face
velocities u (nz, ny, nx+1) / v (nz, ny+1, nx) / w (nz+1, ny, nx), cell
pressures, exactly adjoint divergence/gradient pair, and the exact 3D DCT
projection (``solvers/poisson3d.py`` method="dct") — divergence-free to
fp32 roundoff, vs the collocated 3D module's approximate projection.
Conservative central advection in divergence form; the six edge-centered
flux interpolants are shared pairwise between the three momentum
equations. Lid at z_hi moving in +x (the ``cavity3d`` convention,
BASELINE config 5).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from cfdsim_tpu.grid import Grid3D
from cfdsim_tpu.models.incompressible import StepMetrics
from cfdsim_tpu.solvers.poisson3d import (
    Poisson3DConfig,
    solve_poisson_3d,
)


class MAC3DState(NamedTuple):
    u: jax.Array  # (nz, ny, nx+1)
    v: jax.Array  # (nz, ny+1, nx)
    w: jax.Array  # (nz+1, ny, nx)
    p: jax.Array  # (nz, ny, nx)
    t: jax.Array
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class MAC3DConfig:
    grid: Grid3D
    nu: float
    scheme: str = "central"  # central | upwind | tvd (van Leer MUSCL)
    # Smagorinsky LES (the 3D habitat of the reference's 2D model,
    # v5.py:96-110): ν_t = (C_s Δ)²|S|, Δ = (dx·dy·dz)^{1/3}, with
    # flux-form variable-ν diffusion (exactly conservative)
    use_les: bool = False
    smagorinsky_constant: float = 0.17
    # "smagorinsky" (static C_s) or "dynamic" (Germano–Lilly: the
    # coefficient computed from the resolved field via a 2Δ test
    # filter, clipped ≥0 — self-switches off in laminar regions where
    # the static model over-damps; ops/les_dynamic.py)
    les_model: str = "smagorinsky"
    poisson: Poisson3DConfig = Poisson3DConfig(method="dct")
    # "chorin" or "incremental" (lagged-∇p predictor + increment solve:
    # O(dt²) steady splitting error — see mac.MACConfig.projection)
    projection: str = "chorin"
    # "euler" or "rk2" (Heun with a projection per stage — see
    # mac.MACConfig.time_scheme)
    time_scheme: str = "euler"
    adaptive_dt: bool = True
    cfl_target: float = 0.4
    dt_base: float = 1e-3
    dt_min: float = 1e-7
    dt_max: float = 1.0
    max_velocity: float = 1e3
    compute_metrics: bool = True


def init_state(cfg: MAC3DConfig) -> MAC3DState:
    g = cfg.grid
    nz, ny, nx = g.nz, g.ny, g.nx
    return MAC3DState(
        u=jnp.zeros((nz, ny, nx + 1), jnp.float32),
        v=jnp.zeros((nz, ny + 1, nx), jnp.float32),
        w=jnp.zeros((nz + 1, ny, nx), jnp.float32),
        p=jnp.zeros((nz, ny, nx), jnp.float32),
        t=jnp.float32(0.0),
        step=jnp.int32(0),
    )


class MAC3DBCs(NamedTuple):
    """set_normal writes the boundary faces of each component;
    ghosts(u, v, w) returns the six one-sided ghost extensions
    (u_gy, u_gz, v_gx, v_gz, w_gx, w_gy), each padded by one layer in the
    named direction with reflective tangential wall values."""

    set_normal: Callable
    ghosts: Callable


def cavity3d_bcs(lid_velocity: float = 1.0) -> MAC3DBCs:
    """Lid at z_hi moving in +x; no-slip on the other five faces
    (parity: incompressible3d.lid_cavity3d_bcs)."""

    def set_normal(u, v, w):
        u = u.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
        v = v.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
        w = w.at[0].set(0.0).at[-1].set(0.0)
        return u, v, w

    def ghosts(u, v, w):
        u_gy = jnp.concatenate([-u[:, :1], u, -u[:, -1:]], axis=1)
        u_gz = jnp.concatenate(
            [-u[:1], u, 2.0 * lid_velocity - u[-1:]], axis=0
        )
        v_gx = jnp.concatenate([-v[:, :, :1], v, -v[:, :, -1:]], axis=2)
        v_gz = jnp.concatenate([-v[:1], v, -v[-1:]], axis=0)
        w_gx = jnp.concatenate([-w[:, :, :1], w, -w[:, :, -1:]], axis=2)
        w_gy = jnp.concatenate([-w[:, :1], w, -w[:, -1:]], axis=1)
        return u_gy, u_gz, v_gx, v_gz, w_gx, w_gy

    return MAC3DBCs(set_normal, ghosts)


def free_slip_bcs3d() -> MAC3DBCs:
    """Free-slip (symmetry) box: zero normal velocity, zero tangential
    shear on all six faces — the 3D habitat of mac.free_slip_bcs; lets
    the [0,π]³ Taylor–Green vortex (whose symmetry planes are exactly
    free-slip) run as the analytic LES/convergence harness."""

    def set_normal(u, v, w):
        u = u.at[:, :, 0].set(0.0).at[:, :, -1].set(0.0)
        v = v.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
        w = w.at[0].set(0.0).at[-1].set(0.0)
        return u, v, w

    def ghosts(u, v, w):
        u_gy = jnp.concatenate([u[:, :1], u, u[:, -1:]], axis=1)
        u_gz = jnp.concatenate([u[:1], u, u[-1:]], axis=0)
        v_gx = jnp.concatenate([v[:, :, :1], v, v[:, :, -1:]], axis=2)
        v_gz = jnp.concatenate([v[:1], v, v[-1:]], axis=0)
        w_gx = jnp.concatenate([w[:, :, :1], w, w[:, :, -1:]], axis=2)
        w_gy = jnp.concatenate([w[:, :1], w, w[:, -1:]], axis=1)
        return u_gy, u_gz, v_gx, v_gz, w_gx, w_gy

    return MAC3DBCs(set_normal, ghosts)


def external_flow_bcs3d(v_inf: float, inlet_profile=None,
                        face_weights=None) -> MAC3DBCs:
    """External flow along +x (sphere / bluff-body cases): Dirichlet
    inflow at x_lo (optionally scaled by a static (nz, ny) profile — a
    steady symmetry-breaking trigger for supercritical Re; below the
    sphere's Hopf bifurcation at Re≈270 none is needed, unlike the 2D
    cylinder's unsteady trigger mac.external_flow_bcs / v5.py:349-360),
    mass-consistent zero-gradient outflow at x_hi (keeps the all-Neumann
    DCT pressure problem solvable, exactly as the 2D version), and
    free-slip far-field on the four lateral faces.

    On a stretched grid pass ``face_weights`` = the (nz, ny) x-face area
    array (h_y⊗h_z), so the outflow shift balances the *area-weighted*
    mass flux rather than the plain face mean."""
    if face_weights is not None:
        fw = jnp.asarray(face_weights, jnp.float32)
        fw = fw / jnp.sum(fw)

    def set_normal(u, v, w):
        uin = v_inf if inlet_profile is None else v_inf * inlet_profile
        u = u.at[:, :, 0].set(uin)
        # shift the outflow so outflow flux exactly equals inflow flux
        if face_weights is None:
            shift = jnp.mean(u[:, :, 0] - u[:, :, -2])
        else:
            shift = jnp.sum(fw * (u[:, :, 0] - u[:, :, -2]))
        u = u.at[:, :, -1].set(u[:, :, -2] + shift)
        v = v.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
        w = w.at[0].set(0.0).at[-1].set(0.0)
        return u, v, w

    def ghosts(u, v, w):
        # lateral far-field: free slip (zero tangential shear)
        u_gy = jnp.concatenate([u[:, :1], u, u[:, -1:]], axis=1)
        u_gz = jnp.concatenate([u[:1], u, u[-1:]], axis=0)
        # inflow: tangential v,w = 0 on the inlet plane (reflective
        # ghost); outflow: zero-gradient
        v_gx = jnp.concatenate([-v[:, :, :1], v, v[:, :, -1:]], axis=2)
        v_gz = jnp.concatenate([v[:1], v, v[-1:]], axis=0)
        w_gx = jnp.concatenate([-w[:, :, :1], w, w[:, :, -1:]], axis=2)
        w_gy = jnp.concatenate([w[:, :1], w, w[:, -1:]], axis=1)
        return u_gy, u_gz, v_gx, v_gz, w_gx, w_gy

    return MAC3DBCs(set_normal, ghosts)


def strain_magnitude_mac3d(u, v, w, ghosts, dx, dy, dz):
    """|S| = √(2 S_ij S_ij) at cell centers from the staggered field
    (reference strain physics v5.py:96-110 lifted to the 3D staggered
    layout): the three normal strains live at centers; each of the
    three shear sums 2S_ij lives on the matching cell-edge set and is
    averaged back to centers.
    |S| = √(2(S_xx²+S_yy²+S_zz²) + (2S_xy)²+(2S_xz)²+(2S_yz)²)."""
    u_gy, u_gz, v_gx, v_gz, w_gx, w_gy = ghosts
    sxx = (u[:, :, 1:] - u[:, :, :-1]) * (1.0 / dx)   # (nz, ny, nx)
    syy = (v[:, 1:, :] - v[:, :-1, :]) * (1.0 / dy)
    szz = (w[1:] - w[:-1]) * (1.0 / dz)

    def to_c(e, ax1, ax2):
        """average an edge-centered field back to cell centers over the
        two staggered axes"""
        lo1 = jax.lax.slice_in_dim(e, 0, e.shape[ax1] - 1, axis=ax1)
        hi1 = jax.lax.slice_in_dim(e, 1, e.shape[ax1], axis=ax1)
        s = 0.5 * (lo1 + hi1)
        lo2 = jax.lax.slice_in_dim(s, 0, s.shape[ax2] - 1, axis=ax2)
        hi2 = jax.lax.slice_in_dim(s, 1, s.shape[ax2], axis=ax2)
        return 0.5 * (lo2 + hi2)

    # 2S_xy at z-edges (nz, ny+1, nx+1)
    sh_xy = (u_gy[:, 1:, :] - u_gy[:, :-1, :]) * (1.0 / dy) + (
        v_gx[:, :, 1:] - v_gx[:, :, :-1]
    ) * (1.0 / dx)
    # 2S_xz at y-edges (nz+1, ny, nx+1)
    sh_xz = (u_gz[1:] - u_gz[:-1]) * (1.0 / dz) + (
        w_gx[:, :, 1:] - w_gx[:, :, :-1]
    ) * (1.0 / dx)
    # 2S_yz at x-edges (nz+1, ny+1, nx)
    sh_yz = (v_gz[1:] - v_gz[:-1]) * (1.0 / dz) + (
        w_gy[:, 1:, :] - w_gy[:, :-1, :]
    ) * (1.0 / dy)
    s2 = (
        2.0 * (sxx * sxx + syy * syy + szz * szz)
        + to_c(sh_xy * sh_xy, 1, 2)
        + to_c(sh_xz * sh_xz, 0, 2)
        + to_c(sh_yz * sh_yz, 0, 1)
    )
    return jnp.sqrt(s2)


def smagorinsky_viscosity_mac3d(u, v, w, ghosts, dx, dy, dz, cs: float):
    """Static-coefficient Smagorinsky ν_t = (C_s Δ)²|S| at cell
    centers, Δ = (dx dy dz)^{1/3} (reference v5.py:96-110 in 3D)."""
    delta = (dx * dy * dz) ** (1.0 / 3.0)
    return (cs * delta) ** 2 * strain_magnitude_mac3d(
        u, v, w, ghosts, dx, dy, dz
    )


def _les_viscosity_mac3d(cfg, u, v, w, ghosts, dx, dy, dz,
                         fluid_mask=None):
    """Dispatch on cfg.les_model: static Smagorinsky or the dynamic
    Germano–Lilly coefficient (ops.les_dynamic) times the staggered
    strain magnitude — both at cell centers, feeding _diffuse_les3d.
    ``fluid_mask`` (0 = IBM body) excludes solid cells from the dynamic
    contraction (matching the stretched tier)."""
    if cfg.les_model == "dynamic":
        from cfdsim_tpu.ops.les_dynamic import dynamic_cs2_3d

        uc, vc, wc = center_velocities_3d(u, v, w)
        delta_sq = (dx * dy * dz) ** (2.0 / 3.0)
        cs2 = dynamic_cs2_3d(
            uc, vc, wc, 0.5 / dx, 0.5 / dy, 0.5 / dz, delta_sq,
            mask=fluid_mask,
        )
        return (cs2 * delta_sq) * strain_magnitude_mac3d(
            u, v, w, ghosts, dx, dy, dz
        )
    return smagorinsky_viscosity_mac3d(
        u, v, w, ghosts, dx, dy, dz, cfg.smagorinsky_constant
    )


def _diffuse_les3d(u, v, w, ghosts, nu_eff_c, dx, dy, dz):
    """Flux-form variable-ν diffusion ∇·(ν_eff ∇·) on interior u/v/w
    faces (the 3D habitat of mac._diffuse_les). ν_eff lives at cell
    centers; cross-derivative fluxes use edge-averaged ν from the
    edge-clamped padded field. With constant ν this reduces exactly to
    ν·diffuse3d (tested)."""
    u_gy, u_gz, v_gx, v_gz, w_gx, w_gy = ghosts
    nu_e = jnp.pad(nu_eff_c, 1, mode="edge")  # (nz+2, ny+2, nx+2)
    # edge-averaged ν on the three edge sets
    nu_xy = 0.25 * (
        nu_e[1:-1, :-1, :-1] + nu_e[1:-1, :-1, 1:]
        + nu_e[1:-1, 1:, :-1] + nu_e[1:-1, 1:, 1:]
    )  # (nz, ny+1, nx+1)
    nu_xz = 0.25 * (
        nu_e[:-1, 1:-1, :-1] + nu_e[:-1, 1:-1, 1:]
        + nu_e[1:, 1:-1, :-1] + nu_e[1:, 1:-1, 1:]
    )  # (nz+1, ny, nx+1)
    nu_yz = 0.25 * (
        nu_e[:-1, :-1, 1:-1] + nu_e[:-1, 1:, 1:-1]
        + nu_e[1:, :-1, 1:-1] + nu_e[1:, 1:, 1:-1]
    )  # (nz+1, ny+1, nx)
    ax, ay, az = 1.0 / dx, 1.0 / dy, 1.0 / dz

    # u-momentum, interior faces (nz, ny, nx-1)
    fux = nu_eff_c * (u[:, :, 1:] - u[:, :, :-1]) * ax
    fuy = nu_xy * (u_gy[:, 1:, :] - u_gy[:, :-1, :]) * ay
    fuz = nu_xz * (u_gz[1:] - u_gz[:-1]) * az
    lap_u = (
        (fux[:, :, 1:] - fux[:, :, :-1]) * ax
        + (fuy[:, 1:, 1:-1] - fuy[:, :-1, 1:-1]) * ay
        + (fuz[1:, :, 1:-1] - fuz[:-1, :, 1:-1]) * az
    )
    # v-momentum, interior faces (nz, ny-1, nx)
    fvy = nu_eff_c * (v[:, 1:, :] - v[:, :-1, :]) * ay
    fvx = nu_xy * (v_gx[:, :, 1:] - v_gx[:, :, :-1]) * ax
    fvz = nu_yz * (v_gz[1:] - v_gz[:-1]) * az
    lap_v = (
        (fvx[:, 1:-1, 1:] - fvx[:, 1:-1, :-1]) * ax
        + (fvy[:, 1:, :] - fvy[:, :-1, :]) * ay
        + (fvz[1:, 1:-1, :] - fvz[:-1, 1:-1, :]) * az
    )
    # w-momentum, interior faces (nz-1, ny, nx)
    fwz = nu_eff_c * (w[1:] - w[:-1]) * az
    fwx = nu_xz * (w_gx[:, :, 1:] - w_gx[:, :, :-1]) * ax
    fwy = nu_yz * (w_gy[:, 1:, :] - w_gy[:, :-1, :]) * ay
    lap_w = (
        (fwx[1:-1, :, 1:] - fwx[1:-1, :, :-1]) * ax
        + (fwy[1:-1, 1:, :] - fwy[1:-1, :-1, :]) * ay
        + (fwz[1:] - fwz[:-1]) * az
    )
    return lap_u, lap_v, lap_w


def divergence_mac3d(u, v, w, dx, dy, dz):
    return (
        (u[:, :, 1:] - u[:, :, :-1]) * (1.0 / dx)
        + (v[:, 1:, :] - v[:, :-1, :]) * (1.0 / dy)
        + (w[1:, :, :] - w[:-1, :, :]) * (1.0 / dz)
    )


def center_velocities_3d(u, v, w):
    return (
        0.5 * (u[:, :, :-1] + u[:, :, 1:]),
        0.5 * (v[:, :-1, :] + v[:, 1:, :]),
        0.5 * (w[:-1] + w[1:]),
    )


def _slopes_axis(q, axis: int):
    """Van-Leer-limited MUSCL slopes along ``axis``, zero at the array's
    boundary lines (the 3D analog of mac._slopes_x/_slopes_y)."""
    from cfdsim_tpu.models.mac import _limited_slope

    n = q.shape[axis]
    qm = jax.lax.slice_in_dim(q, 0, n - 2, axis=axis)
    q0 = jax.lax.slice_in_dim(q, 1, n - 1, axis=axis)
    qp = jax.lax.slice_in_dim(q, 2, n, axis=axis)
    s = _limited_slope(q0 - qm, qp - q0)
    pads = [(0, 0)] * q.ndim
    pads[axis] = (1, 1)
    return jnp.pad(s, pads)


def advect3d(u, v, w, ghosts, dx: float, dy: float, dz: float,
             scheme: str = "central", slope_fix=None):
    """Conservative divergence-form 3D MAC advection (central, or
    upwind/van-Leer-MUSCL face values exactly as the 2D mac._advect);
    ``ghosts`` = (u_gy, u_gz, v_gx, v_gz, w_gx, w_gy) from MAC3DBCs.
    Returns (conv_u, conv_v, conv_w) on interior faces. Shared by the
    momentum solvers (make_step) and the Boussinesq tier.

    ``slope_fix(name, s) -> s`` (optional) post-processes each MUSCL
    slope array — the sharded step (parallel/mac3d_explicit.py) uses it
    to zero slopes at *global*-domain boundary lines, which on a local
    halo window are interior positions `_slopes_axis` cannot see. Names:
    "ux","uy","uz","vx","vy","vz","wx","wy","wz" (component, axis)."""
    u_gy, u_gz, v_gx, v_gz, w_gx, w_gy = ghosts
    # shared edge interpolants (each used by two momentum equations)
    u_y = 0.5 * (u_gy[:, :-1, :] + u_gy[:, 1:, :])  # (nz, ny+1, nx+1)
    v_x = 0.5 * (v_gx[:, :, :-1] + v_gx[:, :, 1:])  # (nz, ny+1, nx+1)
    u_z = 0.5 * (u_gz[:-1] + u_gz[1:])              # (nz+1, ny, nx+1)
    w_x = 0.5 * (w_gx[:, :, :-1] + w_gx[:, :, 1:])  # (nz+1, ny, nx+1)
    v_z = 0.5 * (v_gz[:-1] + v_gz[1:])              # (nz+1, ny+1, nx)
    w_y = 0.5 * (w_gy[:, :-1, :] + w_gy[:, 1:, :])  # (nz+1, ny+1, nx)
    uc, vc, wc = center_velocities_3d(u, v, w)

    if scheme == "central":
        F_u = uc * uc
        G_u = v_x * u_y
        H_u = w_x * u_z
        F_v = u_y * v_x
        G_v = vc * vc
        H_v = w_y * v_z
        F_w = u_z * w_x
        G_w = v_z * w_y
        H_w = wc * wc
    elif scheme in ("upwind", "tvd"):
        from cfdsim_tpu.models.mac import _face_value as fv

        tvd = scheme == "tvd"
        z3 = jnp.zeros_like
        fix = (lambda name, s: s) if slope_fix is None else slope_fix
        sux = fix("ux", _slopes_axis(u, 2)) if tvd else z3(u)
        suy = fix("uy", _slopes_axis(u_gy, 1)) if tvd else z3(u_gy)
        suz = fix("uz", _slopes_axis(u_gz, 0)) if tvd else z3(u_gz)
        svx = fix("vx", _slopes_axis(v_gx, 2)) if tvd else z3(v_gx)
        svy = fix("vy", _slopes_axis(v, 1)) if tvd else z3(v)
        svz = fix("vz", _slopes_axis(v_gz, 0)) if tvd else z3(v_gz)
        swx = fix("wx", _slopes_axis(w_gx, 2)) if tvd else z3(w_gx)
        swy = fix("wy", _slopes_axis(w_gy, 1)) if tvd else z3(w_gy)
        swz = fix("wz", _slopes_axis(w, 0)) if tvd else z3(w)
        F_u = uc * fv(u[:, :, :-1], u[:, :, 1:], uc,
                      sux[:, :, :-1], sux[:, :, 1:])
        G_u = v_x * fv(u_gy[:, :-1, :], u_gy[:, 1:, :], v_x,
                       suy[:, :-1, :], suy[:, 1:, :])
        H_u = w_x * fv(u_gz[:-1], u_gz[1:], w_x, suz[:-1], suz[1:])
        F_v = u_y * fv(v_gx[:, :, :-1], v_gx[:, :, 1:], u_y,
                       svx[:, :, :-1], svx[:, :, 1:])
        G_v = vc * fv(v[:, :-1, :], v[:, 1:, :], vc,
                      svy[:, :-1, :], svy[:, 1:, :])
        H_v = w_y * fv(v_gz[:-1], v_gz[1:], w_y, svz[:-1], svz[1:])
        F_w = u_z * fv(w_gx[:, :, :-1], w_gx[:, :, 1:], u_z,
                       swx[:, :, :-1], swx[:, :, 1:])
        G_w = v_z * fv(w_gy[:, :-1, :], w_gy[:, 1:, :], v_z,
                       swy[:, :-1, :], swy[:, 1:, :])
        H_w = wc * fv(w[:-1], w[1:], wc, swz[:-1], swz[1:])
    else:
        raise ValueError(f"unknown MAC3D scheme {scheme!r}")
    conv_u = (
        (F_u[:, :, 1:] - F_u[:, :, :-1]) * (1.0 / dx)
        + (G_u[:, 1:, 1:-1] - G_u[:, :-1, 1:-1]) * (1.0 / dy)
        + (H_u[1:, :, 1:-1] - H_u[:-1, :, 1:-1]) * (1.0 / dz)
    )
    conv_v = (
        (F_v[:, 1:-1, 1:] - F_v[:, 1:-1, :-1]) * (1.0 / dx)
        + (G_v[:, 1:, :] - G_v[:, :-1, :]) * (1.0 / dy)
        + (H_v[1:, 1:-1, :] - H_v[:-1, 1:-1, :]) * (1.0 / dz)
    )
    conv_w = (
        (F_w[1:-1, :, 1:] - F_w[1:-1, :, :-1]) * (1.0 / dx)
        + (G_w[1:-1, 1:, :] - G_w[1:-1, :-1, :]) * (1.0 / dy)
        + (H_w[1:, :, :] - H_w[:-1, :, :]) * (1.0 / dz)
    )
    return conv_u, conv_v, conv_w


def diffuse3d(u, v, w, ghosts, dx: float, dy: float, dz: float):
    """7-point Laplacians on interior faces using the ghost extensions;
    returns (lap_u, lap_v, lap_w)."""
    u_gy, u_gz, v_gx, v_gz, w_gx, w_gy = ghosts
    ax, ay, az = 1.0 / dx**2, 1.0 / dy**2, 1.0 / dz**2
    lap_u = (
        (u[:, :, 2:] - 2 * u[:, :, 1:-1] + u[:, :, :-2]) * ax
        + (u_gy[:, 2:, 1:-1] - 2 * u[:, :, 1:-1] + u_gy[:, :-2, 1:-1]) * ay
        + (u_gz[2:, :, 1:-1] - 2 * u[:, :, 1:-1] + u_gz[:-2, :, 1:-1]) * az
    )
    lap_v = (
        (v_gx[:, 1:-1, 2:] - 2 * v[:, 1:-1, :] + v_gx[:, 1:-1, :-2]) * ax
        + (v[:, 2:, :] - 2 * v[:, 1:-1, :] + v[:, :-2, :]) * ay
        + (v_gz[2:, 1:-1, :] - 2 * v[:, 1:-1, :] + v_gz[:-2, 1:-1, :]) * az
    )
    lap_w = (
        (w_gx[1:-1, :, 2:] - 2 * w[1:-1] + w_gx[1:-1, :, :-2]) * ax
        + (w_gy[1:-1, 2:, :] - 2 * w[1:-1] + w_gy[1:-1, :-2, :]) * ay
        + (w[2:] - 2 * w[1:-1] + w[:-2]) * az
    )
    return lap_u, lap_v, lap_w


def make_step(
    cfg: MAC3DConfig,
    bcs: MAC3DBCs,
    ibm_mask_u=None,
    ibm_mask_v=None,
    ibm_mask_w=None,
    ibm_ramp_steps: int = 0,
    moving_body=None,
    ibm_ghost=None,
    moving_scheme: str = "penalize",
) -> Callable:
    """Build ``step(state, cfl_scale) -> (state, StepMetrics)``.

    ``ibm_mask_{u,v,w}`` are face-sampled Gaussian-shell penalization
    masks (the reference's IBM, v5.py:228-237, lifted to 3D faces —
    ibm.sphere_masks_mac3d); the momentum each penalization removes is
    reported as the body force (fx, fy, fz), exactly as the 2D
    mac.make_step. ``moving_body`` (an ``ibm.MovingBody3D``) enables
    the moving-geometry IBM: sharp face masks rebuilt on device each
    step from center(t), penalization toward the body velocity — the
    3D habitat of mac.make_step's moving_body. ``ibm_ghost``
    (ibm_ghost.GhostIBM3D): sharp-interface ghost-cell direct forcing
    — second-order wall placement at the exact body surface, mutually
    exclusive with ibm_mask_* (same momentum-exchange forces).
    ``moving_scheme="ghost"`` upgrades ``moving_body`` to the same
    treatment with on-device per-stage stencil rebuild
    (ibm_ghost.moving_ghost_forcing_3d)."""
    if ibm_ghost is not None and ibm_mask_u is not None:
        raise ValueError("ibm_ghost and ibm_mask_* are mutually exclusive")
    if moving_scheme not in ("penalize", "ghost"):
        raise ValueError(f"unknown moving_scheme {moving_scheme!r}")
    if cfg.scheme not in ("central", "upwind", "tvd"):
        raise ValueError(f"unknown MAC3D scheme {cfg.scheme!r}")
    if cfg.time_scheme not in ("euler", "rk2"):
        raise ValueError(f"unknown MAC3D time scheme {cfg.time_scheme!r}")
    if cfg.les_model not in ("smagorinsky", "dynamic"):
        raise ValueError(f"unknown les_model {cfg.les_model!r}")
    g = cfg.grid
    dx, dy, dz = g.dx, g.dy, g.dz
    h = min(dx, dy, dz)

    if moving_body is not None:
        import numpy as _np

        def _coords(face_axis):
            xs = g.x_min + (
                _np.arange(g.nx + 1) * dx if face_axis == 0
                else (_np.arange(g.nx) + 0.5) * dx
            )
            ys = g.y_min + (
                _np.arange(g.ny + 1) * dy if face_axis == 1
                else (_np.arange(g.ny) + 0.5) * dy
            )
            zs = g.z_min + (
                _np.arange(g.nz + 1) * dz if face_axis == 2
                else (_np.arange(g.nz) + 0.5) * dz
            )
            Z, Y, X = _np.meshgrid(zs, ys, xs, indexing="ij")
            return (jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32),
                    jnp.asarray(Z, jnp.float32))

        XU, YU, ZU = _coords(0)
        XV, YV, ZV = _coords(1)
        XW, YW, ZW = _coords(2)

        def body_masks(t):
            cx, cy, cz = moving_body.center(t)
            r = moving_body.radius

            def m(X, Y, Z):
                d = jnp.sqrt(
                    (X - cx) ** 2 + (Y - cy) ** 2 + (Z - cz) ** 2
                )
                return jnp.clip((r + 0.5 * h - d) / h, 0.0, 1.0)

            return m(XU, YU, ZU), m(XV, YV, ZV), m(XW, YW, ZW)

    # BOOL fluid indicator for the dynamic-LES contraction (False =
    # IBM body), shared with the stretched tier
    if cfg.use_les and cfg.les_model == "dynamic":
        if moving_body is not None:
            # the moving masks are rebuilt per step inside step(); an
            # unmasked contraction would feed the staircase-interface
            # Leonard stress into the coefficient -- scope it out loudly
            raise ValueError(
                "les_model='dynamic' does not support moving_body yet "
                "(the Germano contraction needs the body masked per "
                "step); use the static les_model='smagorinsky'"
            )
        from cfdsim_tpu.ops.les_dynamic import ibm_fluid_mask_centers

        les_fluid_mask = ibm_fluid_mask_centers(
            ibm_mask_u, ibm_mask_v, ibm_mask_w, ibm_ghost
        )
    else:
        les_fluid_mask = None

    def step(state: MAC3DState, cfl_scale):
        u, v, w = bcs.set_normal(state.u, state.v, state.w)
        ghosts = bcs.ghosts(u, v, w)

        if cfg.use_les:
            nu_t = _les_viscosity_mac3d(cfg, u, v, w, ghosts, dx, dy, dz,
                                        les_fluid_mask)
            nu_stab = cfg.nu + jnp.mean(nu_t)
        else:
            nu_t = None
            nu_stab = cfg.nu
        if cfg.adaptive_dt:
            vel_max = jnp.maximum(
                jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v))),
                jnp.maximum(jnp.max(jnp.abs(w)), 1e-10),
            )
            dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
            dt_visc = 0.125 * h * h / nu_stab  # 3D bound h²/6ν, margin
            dt = jnp.clip(
                jnp.minimum(dt_cfl, dt_visc), cfg.dt_min, cfg.dt_max
            ).astype(jnp.float32)
        else:
            dt = jnp.float32(cfg.dt_base)

        def stage(u, v, w, ghosts, nu_t, p_warm, t_s):
            """One projected Euler stage from BC-consistent (u, v, w)."""
            conv_u, conv_v, conv_w = advect3d(
                u, v, w, ghosts, dx, dy, dz, cfg.scheme
            )
            if cfg.use_les:
                visc_u, visc_v, visc_w = _diffuse_les3d(
                    u, v, w, ghosts, cfg.nu + nu_t, dx, dy, dz
                )
            else:
                lap_u, lap_v, lap_w = diffuse3d(u, v, w, ghosts, dx, dy, dz)
                visc_u = cfg.nu * lap_u
                visc_v = cfg.nu * lap_v
                visc_w = cfg.nu * lap_w

            u_star = u.at[:, :, 1:-1].add(dt * (visc_u - conv_u))
            v_star = v.at[:, 1:-1, :].add(dt * (visc_v - conv_v))
            w_star = w.at[1:-1].add(dt * (visc_w - conv_w))
            if cfg.projection == "incremental":
                u_star = u_star.at[:, :, 1:-1].add(
                    -dt * (p_warm[:, :, 1:] - p_warm[:, :, :-1]) * (1.0 / dx)
                )
                v_star = v_star.at[:, 1:-1, :].add(
                    -dt * (p_warm[:, 1:, :] - p_warm[:, :-1, :]) * (1.0 / dy)
                )
                w_star = w_star.at[1:-1].add(
                    -dt * (p_warm[1:] - p_warm[:-1]) * (1.0 / dz)
                )
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
                    # force on the body = momentum sink of the
                    # penalization, per unit density (2D: mac.make_step)
                    cell = dx * dy * dz
                    fx = jnp.sum(du_ibm) * cell / dt
                    fy = jnp.sum(dv_ibm) * cell / dt
                    fz = jnp.sum(dw_ibm) * cell / dt

            if ibm_ghost is not None:
                from cfdsim_tpu.ibm import ibm_ramp
                from cfdsim_tpu.ibm_ghost import apply_ghost_forcing

                strength = ibm_ramp(state.step, ibm_ramp_steps)
                u_star, du_g = apply_ghost_forcing(
                    u_star, ibm_ghost.u, strength
                )
                v_star, dv_g = apply_ghost_forcing(
                    v_star, ibm_ghost.v, strength
                )
                w_star, dw_g = apply_ghost_forcing(
                    w_star, ibm_ghost.w, strength
                )
                if cfg.compute_metrics:
                    cell = dx * dy * dz
                    fx = jnp.sum(du_g) * cell / dt
                    fy = jnp.sum(dv_g) * cell / dt
                    fz = jnp.sum(dw_g) * cell / dt

            if moving_body is not None:
                from cfdsim_tpu.ibm import ibm_ramp

                ub, vb, wb = moving_body.velocity(t_s)
                strength = ibm_ramp(state.step, ibm_ramp_steps)
                if moving_scheme == "ghost":
                    from cfdsim_tpu.ibm_ghost import moving_ghost_forcing_3d

                    ctr = moving_body.center(t_s)
                    r = moving_body.radius
                    delta = 1.5 * h
                    sp = (dx, dy, dz)
                    u_star, du_mb = moving_ghost_forcing_3d(
                        u_star, XU, YU, ZU,
                        (g.x_min, g.y_min + 0.5 * dy, g.z_min + 0.5 * dz),
                        sp, ctr, r, delta, ub, strength,
                    )
                    v_star, dv_mb = moving_ghost_forcing_3d(
                        v_star, XV, YV, ZV,
                        (g.x_min + 0.5 * dx, g.y_min, g.z_min + 0.5 * dz),
                        sp, ctr, r, delta, vb, strength,
                    )
                    w_star, dw_mb = moving_ghost_forcing_3d(
                        w_star, XW, YW, ZW,
                        (g.x_min + 0.5 * dx, g.y_min + 0.5 * dy, g.z_min),
                        sp, ctr, r, delta, wb, strength,
                    )
                else:
                    m_u, m_v, m_w = body_masks(t_s)
                    du_mb = (u_star - ub) * (strength * m_u)
                    dv_mb = (v_star - vb) * (strength * m_v)
                    dw_mb = (w_star - wb) * (strength * m_w)
                    u_star = u_star - du_mb
                    v_star = v_star - dv_mb
                    w_star = w_star - dw_mb
                if cfg.compute_metrics:
                    cell = dx * dy * dz
                    fx = fx + jnp.sum(du_mb) * cell / dt
                    fy = fy + jnp.sum(dv_mb) * cell / dt
                    fz = fz + jnp.sum(dw_mb) * cell / dt

            # --- exact projection
            div_star = divergence_mac3d(u_star, v_star, w_star, dx, dy, dz)
            rhs = div_star / dt
            if cfg.poisson.method != "dct":
                rhs = rhs - jnp.mean(rhs)
            warm = (jnp.zeros_like(p_warm)
                    if cfg.projection == "incremental" else p_warm)
            phi = solve_poisson_3d(warm, rhs, dx, dy, dz, cfg.poisson)
            u_new = u_star.at[:, :, 1:-1].add(
                -dt * (phi[:, :, 1:] - phi[:, :, :-1]) * (1.0 / dx)
            )
            v_new = v_star.at[:, 1:-1, :].add(
                -dt * (phi[:, 1:, :] - phi[:, :-1, :]) * (1.0 / dy)
            )
            w_new = w_star.at[1:-1].add(
                -dt * (phi[1:] - phi[:-1]) * (1.0 / dz)
            )
            u_new, v_new, w_new = bcs.set_normal(u_new, v_new, w_new)
            u_new = jnp.clip(u_new, -cfg.max_velocity, cfg.max_velocity)
            v_new = jnp.clip(v_new, -cfg.max_velocity, cfg.max_velocity)
            w_new = jnp.clip(w_new, -cfg.max_velocity, cfg.max_velocity)
            if cfg.projection == "incremental":
                phi = p_warm + phi
            return u_new, v_new, w_new, phi, (fx, fy, fz, div_star)

        u_new, v_new, w_new, phi, (fx, fy, fz, div_star) = stage(
            u, v, w, ghosts, nu_t, state.p, state.t
        )
        if cfg.time_scheme == "rk2":
            # Heun: average with a second projected Euler stage (both
            # solenoidal ⇒ so is the average); ν_t refreshed from stage 1
            ghosts1 = bcs.ghosts(u_new, v_new, w_new)
            if cfg.use_les:
                nu_t = _les_viscosity_mac3d(
                    cfg, u_new, v_new, w_new, ghosts1, dx, dy, dz,
                    les_fluid_mask,
                )
            u2, v2, w2, phi2, (fx2, fy2, fz2, div_star) = stage(
                u_new, v_new, w_new, ghosts1, nu_t, phi, state.t + dt
            )
            u_new = 0.5 * (u + u2)
            v_new = 0.5 * (v + v2)
            w_new = 0.5 * (w + w2)
            u_new, v_new, w_new = bcs.set_normal(u_new, v_new, w_new)
            phi = 0.5 * (phi + phi2)
            fx = 0.5 * (fx + fx2)
            fy = 0.5 * (fy + fy2)
            fz = 0.5 * (fz + fz2)

        new_state = MAC3DState(
            u=u_new, v=v_new, w=w_new, p=phi,
            t=state.t + dt, step=state.step + 1,
        )

        if cfg.compute_metrics:
            div_post = divergence_mac3d(u_new, v_new, w_new, dx, dy, dz)
            ucc, vcc, wcc = center_velocities_3d(u_new, v_new, w_new)
            # ω_x at interior (z-face, y-face) edges — one representative
            # vorticity component as the rotation diagnostic
            dwdy = ((w_new[:, 1:, :] - w_new[:, :-1, :]) * (1.0 / dy))[1:-1]
            dvdz = ((v_new[1:] - v_new[:-1]) * (1.0 / dz))[:, 1:-1, :]
            metrics = StepMetrics(
                dt=dt,
                div_pre=jnp.max(jnp.abs(div_star)),
                div_post=jnp.max(jnp.abs(div_post)),
                max_vel=jnp.maximum(
                    jnp.maximum(jnp.max(jnp.abs(u_new)), jnp.max(jnp.abs(v_new))),
                    jnp.max(jnp.abs(w_new)),
                ),
                energy=jnp.mean(
                    0.5 * (ucc * ucc + vcc * vcc + wcc * wcc)
                ),
                vort_max=jnp.max(jnp.abs(dwdy - dvdz)),
                poisson_res=jnp.float32(0.0),
                fx=fx,
                fy=fy,
                fz=fz,
            )
        else:
            zero = jnp.float32(0.0)
            metrics = StepMetrics(dt, zero, zero, zero, zero, zero, zero)
        return new_state, metrics

    return step
