"""Incompressible Navier–Stokes on a staggered (MAC) grid.

The collocated module (``models/incompressible.py``) reproduces the
reference's cell-centered approximate projection (v5.py:375-441), which
leaves an O(h²) checkerboard-null-space divergence after correction. This
module is the accuracy tier the reference never had: velocities live on
cell *faces* (Harlow–Welch MAC layout), the discrete divergence/gradient
pair is exactly adjoint, and the pressure solve makes the corrected field
divergence-free to solver precision — with the exact DCT projection, to
fp32 roundoff. That is the route to the BASELINE.json Ghia north star.

Layout (grid of ny × nx cells, centering="cell"):

- ``u``: (ny, nx+1) — x-velocity on vertical faces, u[j,i] at (i·dx, (j+½)dy)
- ``v``: (ny+1, nx) — y-velocity on horizontal faces, v[j,i] at ((i+½)dx, j·dy)
- ``p``: (ny, nx)   — pressure at cell centers

Tangential wall values enter through one ghost line per side (reflection:
ghost = 2·wall − interior), built functionally per step. The cell-centered
Neumann pressure operator (ghost = edge) is exactly the clamped-edge
operator the solvers in ``solvers/poisson.py`` already implement, so every
backend (dct/mg/rbsor/jacobi) works unchanged.

Convection schemes: "central" (2nd-order divergence form, the accuracy
default), "upwind" (1st-order monotone), "tvd" (2nd-order MUSCL with a
van Leer limited slope — the TVD/central hybrid named in the round-1
verdict for Strouhal closure).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from cfdsim_tpu.grid import Grid
from cfdsim_tpu.models.incompressible import StepMetrics
from cfdsim_tpu.solvers.poisson import (
    PoissonConfig,
    poisson_residual,
    solve_poisson,
)


class MACState(NamedTuple):
    """Pytree state for the staggered solver (the reference's u/v/p field
    set, v5.py:285-297, on MAC faces instead of nodes)."""

    u: jax.Array  # (ny, nx+1)
    v: jax.Array  # (ny+1, nx)
    p: jax.Array  # (ny, nx)
    t: jax.Array
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class MACConfig:
    """Static configuration (mirrors IncompressibleConfig where concepts
    overlap; reference dataclass configs v5.py:41-94)."""

    grid: Grid
    nu: float
    scheme: str = "central"  # central | upwind | tvd
    # Smagorinsky LES on the staggered layout (the reference's LES,
    # v5.py:96-110, paired with the exactly divergence-free solver):
    # |S| is assembled on natural MAC locations — normal strains at cell
    # centers, the shear at corners — and the variable-ν diffusion runs
    # in flux form, so the scheme stays conservative
    use_les: bool = False
    smagorinsky_constant: float = 0.17
    poisson: PoissonConfig = PoissonConfig(method="dct")
    # "chorin" (non-incremental: solve for the full pressure each step;
    # steady-state splitting error O(dt)) or "incremental" (predictor
    # carries ∇p^n, the Poisson solve yields the increment δp, p += δp:
    # splitting error O(dt²) — measured on the Re=1000 cavity the
    # steady-state extrema error drops to the pure spatial error, the
    # round-3 1e-4 north-star fix). Same cost: one extra gradient axpy.
    projection: str = "chorin"
    # "explicit" (reference parity: forward-Euler viscous term, dt bound
    # by 0.2h²/ν) or "implicit" — Crank–Nicolson viscous term solved
    # exactly by the mixed-basis fast diagonalization
    # (solvers/helmholtz.make_mac_helmholtz): the viscous dt restriction
    # disappears, so high-resolution runs are CFL-limited only (2.5×
    # fewer steps at 1024², ~10× at 4096²). Needs an ``implicit_kit``
    # matching the BCs (cavity_implicit_kit / free_slip_implicit_kit).
    diffusion: str = "explicit"
    # "euler" (reference parity, v5.py:375-441) or "rk2" — Heun's method
    # with a projection per stage (u_{n+1} = ½u_n + ½·E(E(u_n)), E one
    # projected Euler stage): 2nd order in time, ~2× cost/step; the
    # average of two solenoidal fields stays exactly solenoidal
    time_scheme: str = "euler"
    # Inter-step storage precision for u/v (p always fp32 — it warm-
    # starts the projection). "bf16" halves the state's HBM bytes: the
    # step upcasts to fp32 on entry, computes everything (stencils,
    # Poisson) in fp32, and rounds the velocities once on exit. The
    # per-step rounding injects ~4e-3 relative noise into the stored
    # field, so this is a bandwidth experiment for HBM-bound grids
    # (VERDICT r4 #3), not an accuracy-neutral default — measure the
    # B&P error before adopting (reference's own precision move:
    # v5.py:80-82 fp64→fp32).
    storage: str = "fp32"  # fp32 | bf16
    adaptive_dt: bool = True
    cfl_target: float = 0.5
    dt_base: float = 1e-3
    dt_min: float = 1e-7
    dt_max: float = 1.0
    warmup_steps: int = 0
    warmup_dt: float = 0.0
    max_velocity: float = 1e3
    compute_metrics: bool = True


def init_state(cfg: MACConfig, u0=None, v0=None, p0=None) -> MACState:
    ny, nx = cfg.grid.ny, cfg.grid.nx
    vdt = jnp.bfloat16 if cfg.storage == "bf16" else jnp.float32
    return MACState(
        u=jnp.zeros((ny, nx + 1), vdt) if u0 is None else jnp.asarray(u0, vdt),
        v=jnp.zeros((ny + 1, nx), vdt) if v0 is None else jnp.asarray(v0, vdt),
        p=jnp.zeros((ny, nx), jnp.float32) if p0 is None else jnp.asarray(p0, jnp.float32),
        t=jnp.float32(0.0),
        step=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# boundary conditions
# ---------------------------------------------------------------------------

class MACBCs(NamedTuple):
    """MAC boundary conditions as a pair of pure closures.

    ``set_normal(u, v, step, t) -> (u, v)`` writes the boundary *faces*
    (normal velocity components: Dirichlet walls/inflow, zero-gradient
    outflow). ``extend(u, v, step, t) -> (ue, ve)`` adds one tangential
    ghost line per side (ue: (ny+2, nx+1), ve: (ny+1, nx+2)) encoding the
    tangential wall velocity by reflection.
    """

    set_normal: Callable
    extend: Callable


def cavity_bcs(lid_velocity: float = 1.0) -> MACBCs:
    """Lid-driven cavity on MAC faces: no-slip walls, moving lid at y_hi
    (capability parity with boundary.lid_cavity_bcs / reference
    v5.py:349-360 wall handling)."""

    def set_normal(u, v, step=None, t=None):
        u = u.at[:, 0].set(0.0).at[:, -1].set(0.0)
        v = v.at[0, :].set(0.0).at[-1, :].set(0.0)
        return u, v

    def extend(u, v, step=None, t=None):
        ue = jnp.pad(u, ((1, 1), (0, 0)))
        ue = ue.at[0, :].set(-u[0, :])  # bottom wall: u_t = 0
        ue = ue.at[-1, :].set(2.0 * lid_velocity - u[-1, :])  # moving lid
        ve = jnp.pad(v, ((0, 0), (1, 1)))
        ve = ve.at[:, 0].set(-v[:, 0])  # left wall: v_t = 0
        ve = ve.at[:, -1].set(-v[:, -1])  # right wall
        return ue, ve

    return MACBCs(set_normal, extend)


def free_slip_bcs() -> MACBCs:
    """Free-slip (symmetry) box: zero normal velocity, zero tangential
    shear on all four walls. The Taylor–Green vortex on [0, π]² satisfies
    these exactly (u = sin x cos y, v = −cos x sin y: normal components
    and tangential gradients vanish on the walls), making this the
    analytic-solution convergence harness for the MAC discretization
    (tests/test_taylor_green.py)."""

    def set_normal(u, v, step=None, t=None):
        u = u.at[:, 0].set(0.0).at[:, -1].set(0.0)
        v = v.at[0, :].set(0.0).at[-1, :].set(0.0)
        return u, v

    def extend(u, v, step=None, t=None):
        ue = jnp.pad(u, ((1, 1), (0, 0)))
        ue = ue.at[0, :].set(u[0, :])  # ∂u/∂y = 0
        ue = ue.at[-1, :].set(u[-1, :])
        ve = jnp.pad(v, ((0, 0), (1, 1)))
        ve = ve.at[:, 0].set(v[:, 0])  # ∂v/∂x = 0
        ve = ve.at[:, -1].set(v[:, -1])
        return ue, ve

    return MACBCs(set_normal, extend)


class MACImplicitKit(NamedTuple):
    """Implicit-viscous solvers + inhomogeneous-BC RHS corrections for
    one MACBCs family (the homogeneous-form 1D operators are folded into
    the transform bases; wall VALUES enter the RHS)."""

    solve_u: Callable  # (rhs_interior, c) -> u_interior
    solve_v: Callable
    rhs_fix_u: Callable  # (rhs, c, step, t) -> rhs
    rhs_fix_v: Callable


def cavity_implicit_kit(grid: Grid, lid_velocity: float = 1.0) -> MACImplicitKit:
    """Implicit-viscous kit for ``cavity_bcs``: Dirichlet normal faces
    (DST-I), odd-mirror no-slip tangential ghosts (DST-II); the moving
    lid contributes c·2·U_lid/dy² on the top u-row."""
    from cfdsim_tpu.solvers.helmholtz import make_mac_helmholtz

    ny, nx = grid.ny, grid.nx
    dx, dy = grid.dx, grid.dy
    solve_u = make_mac_helmholtz((ny, nx - 1), ("dst2", "dst1"), dx, dy)
    solve_v = make_mac_helmholtz((ny - 1, nx), ("dst1", "dst2"), dx, dy)
    ay = 1.0 / (dy * dy)

    def rhs_fix_u(r, c, step, t):
        return r.at[-1, :].add(c * 2.0 * lid_velocity * ay)

    def rhs_fix_v(r, c, step, t):
        return r

    return MACImplicitKit(solve_u, solve_v, rhs_fix_u, rhs_fix_v)


def free_slip_implicit_kit(grid: Grid) -> MACImplicitKit:
    """Implicit-viscous kit for ``free_slip_bcs``: Dirichlet normal
    faces (DST-I), even-mirror tangential ghosts (DCT-II); fully
    homogeneous."""
    from cfdsim_tpu.solvers.helmholtz import make_mac_helmholtz

    ny, nx = grid.ny, grid.nx
    dx, dy = grid.dx, grid.dy
    solve_u = make_mac_helmholtz((ny, nx - 1), ("dct2", "dst1"), dx, dy)
    solve_v = make_mac_helmholtz((ny - 1, nx), ("dst1", "dct2"), dx, dy)
    fix = lambda r, c, step, t: r
    return MACImplicitKit(solve_u, solve_v, fix, fix)


def channel_bcs(u_in: float = 1.0, profile=None) -> MACBCs:
    """Channel: Dirichlet inflow at x_lo (uniform or a (ny,) profile at
    u-row centers), zero-gradient outflow at x_hi, no-slip walls."""

    def set_normal(u, v, step=None, t=None):
        u = u.at[:, 0].set(u_in if profile is None else profile)
        # zero-gradient outflow, shifted so the outflow flux exactly equals
        # the inflow flux — the all-Neumann pressure problem is only
        # solvable when the net boundary flux vanishes, and enforcing it
        # here (instead of leaning on the rhs mean-subtraction) keeps the
        # projection exact in every cell
        out = u[:, -2] + jnp.mean(u[:, 0] - u[:, -2])
        u = u.at[:, -1].set(out)
        v = v.at[0, :].set(0.0).at[-1, :].set(0.0)
        return u, v

    def extend(u, v, step=None, t=None):
        ue = jnp.pad(u, ((1, 1), (0, 0)))
        ue = ue.at[0, :].set(-u[0, :])
        ue = ue.at[-1, :].set(-u[-1, :])
        ve = jnp.pad(v, ((0, 0), (1, 1)))
        ve = ve.at[:, 0].set(-v[:, 0])  # inflow: v = 0
        ve = ve.at[:, -1].set(v[:, -1])  # outflow: ∂v/∂x = 0
        return ue, ve

    return MACBCs(set_normal, extend)


def external_flow_bcs(
    v_inf: float,
    y_face_centers,
    y_max: float,
    perturb_amp: float = 0.01,
    perturb_ramp_steps: int = 1000,
) -> MACBCs:
    """External flow (cylinder case): perturbed inflow at x_lo (the
    vortex-shedding trigger, reference v5.py:349-360), zero-gradient
    outflow at x_hi, free-slip top/bottom (far-field walls)."""
    y = jnp.asarray(y_face_centers, jnp.float32)

    def set_normal(u, v, step, t=None):
        scale = jnp.minimum(1.0, step / perturb_ramp_steps) * perturb_amp
        pert = scale * jnp.sin(2.0 * jnp.pi * y / y_max + 0.02 * step)
        u = u.at[:, 0].set(v_inf * (1.0 + pert))
        out = u[:, -2] + jnp.mean(u[:, 0] - u[:, -2])  # mass-consistent outflow
        u = u.at[:, -1].set(out)
        v = v.at[0, :].set(0.0).at[-1, :].set(0.0)
        return u, v

    def extend(u, v, step=None, t=None):
        ue = jnp.pad(u, ((1, 1), (0, 0)))
        ue = ue.at[0, :].set(u[0, :])  # free slip: ∂u/∂y = 0
        ue = ue.at[-1, :].set(u[-1, :])
        ve = jnp.pad(v, ((0, 0), (1, 1)))
        ve = ve.at[:, 0].set(-v[:, 0])  # inflow v = 0
        ve = ve.at[:, -1].set(v[:, -1])  # outflow
        return ue, ve

    return MACBCs(set_normal, extend)


# ---------------------------------------------------------------------------
# advection
# ---------------------------------------------------------------------------

def _limited_slope(dm, dp):
    """Van Leer harmonic-mean limited slope: 2·dm·dp/(dm+dp) where the
    one-sided differences agree in sign, else 0 (local extremum)."""
    prod = dm * dp
    den = dm + dp
    den = jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)
    return jnp.where(prod > 0.0, 2.0 * prod / den, 0.0)


def _face_value(q_lo, q_hi, adv, slope_lo, slope_hi):
    """MUSCL upwind-biased value at the midpoint between samples q_lo/q_hi
    given the advecting velocity there: q_lo + σ_lo/2 when adv ≥ 0, else
    q_hi − σ_hi/2. Zero slopes recover first-order upwind."""
    qL = q_lo + 0.5 * slope_lo
    qR = q_hi - 0.5 * slope_hi
    return jnp.where(adv >= 0.0, qL, qR)


def _slopes_x(q):
    """Limited slopes along axis 1, zero at the two boundary columns."""
    s = _limited_slope(q[:, 1:-1] - q[:, :-2], q[:, 2:] - q[:, 1:-1])
    return jnp.pad(s, ((0, 0), (1, 1)))


def _slopes_y(q):
    s = _limited_slope(q[1:-1, :] - q[:-2, :], q[2:, :] - q[1:-1, :])
    return jnp.pad(s, ((1, 1), (0, 0)))


def _advect(u, v, ue, ve, dx: float, dy: float, scheme: str):
    """Divergence-form MAC advection: returns (conv_u, conv_v) on interior
    u-faces (ny, nx−1) and interior v-faces (ny−1, nx).

    The x-flux of u-momentum lives at cell centers, the y-flux at cell
    corners (and symmetrically for v) so each momentum balance telescopes —
    the scheme conserves momentum exactly, unlike the reference's
    advective-form kernels (v5.py:112-147)."""
    # advecting velocities (2nd-order averages, all schemes share these)
    uc = 0.5 * (u[:, :-1] + u[:, 1:])  # u at cell centers   (ny, nx)
    vc = 0.5 * (v[:-1, :] + v[1:, :])  # v at cell centers   (ny, nx)
    u_y = 0.5 * (ue[:-1, :] + ue[1:, :])  # u at corners     (ny+1, nx+1)
    v_x = 0.5 * (ve[:, :-1] + ve[:, 1:])  # v at corners     (ny+1, nx+1)

    if scheme == "central":
        F_u = uc * uc  # x-flux of u at centers
        G_u = v_x * u_y  # y-flux of u at corners
        F_v = u_y * v_x  # x-flux of v at corners
        G_v = vc * vc  # y-flux of v at centers
    elif scheme in ("upwind", "tvd"):
        tvd = scheme == "tvd"
        su_x = _slopes_x(u) if tvd else jnp.zeros_like(u)
        su_y = _slopes_y(ue) if tvd else jnp.zeros_like(ue)
        sv_y = _slopes_y(v) if tvd else jnp.zeros_like(v)
        sv_x = _slopes_x(ve) if tvd else jnp.zeros_like(ve)
        F_u = uc * _face_value(u[:, :-1], u[:, 1:], uc, su_x[:, :-1], su_x[:, 1:])
        G_u = v_x * _face_value(ue[:-1, :], ue[1:, :], v_x, su_y[:-1, :], su_y[1:, :])
        G_v = vc * _face_value(v[:-1, :], v[1:, :], vc, sv_y[:-1, :], sv_y[1:, :])
        F_v = u_y * _face_value(ve[:, :-1], ve[:, 1:], u_y, sv_x[:, :-1], sv_x[:, 1:])
    else:
        raise ValueError(f"unknown MAC scheme {scheme!r}")

    conv_u = (F_u[:, 1:] - F_u[:, :-1]) * (1.0 / dx) + (
        G_u[1:, 1:-1] - G_u[:-1, 1:-1]
    ) * (1.0 / dy)
    conv_v = (F_v[1:-1, 1:] - F_v[1:-1, :-1]) * (1.0 / dx) + (
        G_v[1:, :] - G_v[:-1, :]
    ) * (1.0 / dy)
    return conv_u, conv_v


def smagorinsky_viscosity_mac(u, v, ue, ve, dx: float, dy: float, cs: float):
    """ν_t = (C_s Δ)²|S| at cell centers from MAC face velocities:
    the normal strains live naturally at centers, the shear at corners
    (averaged back to centers). Reference physics v5.py:96-110 on the
    staggered layout."""
    delta = (dx * dy) ** 0.5
    dudx = (u[:, 1:] - u[:, :-1]) * (1.0 / dx)          # (ny, nx) centers
    dvdy = (v[1:, :] - v[:-1, :]) * (1.0 / dy)
    dudy = (ue[1:, :] - ue[:-1, :]) * (1.0 / dy)        # (ny+1, nx+1) corners
    dvdx = (ve[:, 1:] - ve[:, :-1]) * (1.0 / dx)
    sh = dudy + dvdx                                    # 2·S12 at corners
    sh_c = 0.25 * (sh[:-1, :-1] + sh[:-1, 1:] + sh[1:, :-1] + sh[1:, 1:])
    s_mag = jnp.sqrt(2.0 * (dudx * dudx + dvdy * dvdy) + sh_c * sh_c)
    return (cs * delta) ** 2 * s_mag


def _diffuse_les(ue, ve, nu_eff_c, dx: float, dy: float):
    """Flux-form variable-ν diffusion: ∇·(ν_eff ∇u) on interior u-faces
    (ny, nx−1) / v-faces (ny−1, nx). ν_eff lives at cell centers; the
    cross-derivative fluxes use corner-averaged ν (edge-clamped)."""
    nu_e = jnp.pad(nu_eff_c, 1, mode="edge")
    nu_k = 0.25 * (
        nu_e[:-1, :-1] + nu_e[:-1, 1:] + nu_e[1:, :-1] + nu_e[1:, 1:]
    )  # (ny+1, nx+1) corners
    # u: d/dx(ν du/dx) + d/dy(ν du/dy)
    fux = nu_eff_c * (ue[1:-1, 1:] - ue[1:-1, :-1]) * (1.0 / dx)  # centers
    lap_u_x = (fux[:, 1:] - fux[:, :-1]) * (1.0 / dx)
    fuy = nu_k * (ue[1:, :] - ue[:-1, :]) * (1.0 / dy)            # corners
    lap_u_y = (fuy[1:, 1:-1] - fuy[:-1, 1:-1]) * (1.0 / dy)
    # v: d/dx(ν dv/dx) + d/dy(ν dv/dy)
    fvy = nu_eff_c * (ve[1:, 1:-1] - ve[:-1, 1:-1]) * (1.0 / dy)
    lap_v_y = (fvy[1:, :] - fvy[:-1, :]) * (1.0 / dy)
    fvx = nu_k * (ve[:, 1:] - ve[:, :-1]) * (1.0 / dx)
    lap_v_x = (fvx[1:-1, 1:] - fvx[1:-1, :-1]) * (1.0 / dx)
    return lap_u_x + lap_u_y, lap_v_x + lap_v_y


def _diffuse(ue, ve, dx: float, dy: float):
    """5-point Laplacians on interior u-faces (ny, nx−1) / v-faces (ny−1, nx)
    using the ghost-extended arrays for tangential wall values."""
    ax, ay = 1.0 / (dx * dx), 1.0 / (dy * dy)
    lap_u = (ue[1:-1, 2:] - 2.0 * ue[1:-1, 1:-1] + ue[1:-1, :-2]) * ax + (
        ue[2:, 1:-1] - 2.0 * ue[1:-1, 1:-1] + ue[:-2, 1:-1]
    ) * ay
    lap_v = (ve[1:-1, 2:] - 2.0 * ve[1:-1, 1:-1] + ve[1:-1, :-2]) * ax + (
        ve[2:, 1:-1] - 2.0 * ve[1:-1, 1:-1] + ve[:-2, 1:-1]
    ) * ay
    return lap_u, lap_v


def divergence_mac(u, v, dx: float, dy: float):
    """Exact discrete cell divergence (u_E−u_W)/dx + (v_N−v_S)/dy, (ny, nx)."""
    return (u[:, 1:] - u[:, :-1]) * (1.0 / dx) + (v[1:, :] - v[:-1, :]) * (
        1.0 / dy
    )


def vorticity_mac(u, v, dx: float, dy: float):
    """z-vorticity at interior corners, (ny−1, nx−1)."""
    dvdx = (v[:, 1:] - v[:, :-1]) * (1.0 / dx)
    dudy = (u[1:, :] - u[:-1, :]) * (1.0 / dy)
    return dvdx[1:-1, :] - dudy[:, 1:-1]


def center_velocities(u, v):
    """Cell-centered (u, v) averages for visualization/diagnostics."""
    return 0.5 * (u[:, :-1] + u[:, 1:]), 0.5 * (v[:-1, :] + v[1:, :])


# ---------------------------------------------------------------------------
# step builder
# ---------------------------------------------------------------------------

def _adaptive_dt(cfg: MACConfig, u, v, step, cfl_scale, nu_total=None):
    """CFL + explicit-viscous dt (same policy as the collocated module,
    reference adaptive_time_step v5.py:316-326). ``nu_total`` overrides
    the molecular viscosity in the viscous bound (LES: ν + mean ν_t,
    the collocated module's convention)."""
    if not cfg.adaptive_dt:
        return jnp.float32(cfg.dt_base)
    h = min(cfg.grid.dx, cfg.grid.dy)
    vel_max = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v))), 1e-10
    )
    dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
    if cfg.diffusion == "implicit":
        dt_visc = jnp.float32(jnp.inf)  # CN viscous term: A-stable
    else:
        dt_visc = 0.2 * h * h / (cfg.nu if nu_total is None else nu_total)
    dt = jnp.clip(jnp.minimum(dt_cfl, dt_visc), cfg.dt_min, cfg.dt_max)
    if cfg.warmup_steps > 0:
        dt = jnp.where(step < cfg.warmup_steps, jnp.float32(cfg.warmup_dt), dt)
    return dt.astype(jnp.float32)


def make_step(
    cfg: MACConfig,
    bcs: MACBCs,
    ibm_mask_u: Optional[jax.Array] = None,
    ibm_mask_v: Optional[jax.Array] = None,
    ibm_ramp_steps: int = 0,
    forcing: Optional[tuple] = None,
    moving_body=None,
    implicit_kit: Optional[MACImplicitKit] = None,
    ibm_ghost=None,
    moving_scheme: str = "penalize",
) -> Callable:
    """Build ``step(state, cfl_scale) -> (state, StepMetrics)``.

    ``ibm_mask_u``/``ibm_mask_v`` are face-sampled penalization masks
    (the reference's Gaussian-shell IBM, v5.py:228-237, sampled at u/v
    face locations); ``forcing`` is an optional (fu, fv) face-located
    body-force pair. ``moving_body`` (an ``ibm.MovingBody``) enables the
    moving-geometry IBM: sharp face masks are rebuilt on device each
    step from the body's center(t), and the penalization drives the
    fluid toward the body velocity — u ← u − s·m·(u − u_b(t)) — with
    the exchanged momentum reported as (fx, fy). Under rk2 the second
    (Heun) stage evaluates BCs and the body at t + dt, keeping second
    order for unsteady boundaries and moving bodies.

    ``ibm_ghost`` (ibm_ghost.GhostIBM2D): sharp-interface ghost-cell
    direct forcing for a static body — second-order wall placement at
    the exact surface (mutually exclusive with ibm_mask_*; same
    momentum-exchange force accounting). ``moving_scheme="ghost"``
    upgrades ``moving_body`` from the penalization masks to the same
    sharp-interface treatment, with the classification and bilinear
    probe stencils rebuilt on device each stage from center(t)
    (ibm_ghost.moving_ghost_forcing_2d — uniform grids).
    """
    if ibm_ghost is not None and ibm_mask_u is not None:
        raise ValueError("ibm_ghost and ibm_mask_* are mutually exclusive")
    if moving_scheme not in ("penalize", "ghost"):
        raise ValueError(f"unknown moving_scheme {moving_scheme!r}")
    if cfg.time_scheme not in ("euler", "rk2"):
        raise ValueError(f"unknown MAC time scheme {cfg.time_scheme!r}")
    if cfg.projection not in ("chorin", "incremental"):
        raise ValueError(f"unknown MAC projection {cfg.projection!r}")
    if cfg.poisson.dct_variant == "auto":
        # pin the autotuned DCT variant NOW (eager): tuning launches its
        # own jitted chains, which cannot run from inside the traced step
        import dataclasses as _dc

        from cfdsim_tpu.solvers.autotune import resolve_poisson_config

        g0 = cfg.grid
        cfg = _dc.replace(cfg, poisson=resolve_poisson_config(
            cfg.poisson, (g0.ny, g0.nx), g0.dx, g0.dy))
    if cfg.diffusion not in ("explicit", "implicit"):
        raise ValueError(f"unknown MAC diffusion {cfg.diffusion!r}")
    if cfg.diffusion == "implicit":
        if implicit_kit is None:
            raise ValueError(
                "diffusion='implicit' needs an implicit_kit matching the "
                "BCs (mac.cavity_implicit_kit / free_slip_implicit_kit)"
            )
        if cfg.use_les:
            raise ValueError(
                "diffusion='implicit' needs constant ν (no LES): the "
                "variable-ν operator is not transform-diagonalizable"
            )
        if cfg.time_scheme != "euler":
            raise ValueError(
                "diffusion='implicit' is Crank–Nicolson within the "
                "euler step; combine with time_scheme='euler'"
            )
    g = cfg.grid
    dx, dy = g.dx, g.dy

    if moving_body is not None:
        import numpy as _np

        xu = g.x_min + _np.arange(g.nx + 1) * dx
        yu = g.y_min + (_np.arange(g.ny) + 0.5) * dy
        Xu, Yu = (jnp.asarray(a, jnp.float32)
                  for a in _np.meshgrid(xu, yu, indexing="xy"))
        xv = g.x_min + (_np.arange(g.nx) + 0.5) * dx
        yv = g.y_min + _np.arange(g.ny + 1) * dy
        Xv, Yv = (jnp.asarray(a, jnp.float32)
                  for a in _np.meshgrid(xv, yv, indexing="xy"))

        hb = min(dx, dy)  # isotropic half-offset/taper (= dx on square
        # cells; per-axis-safe on anisotropic grids, matching the
        # stretched tiers' h_min convention)

        def body_masks(t):
            cx, cy = moving_body.center(t)
            r = moving_body.radius
            du = jnp.sqrt((Xu - cx) ** 2 + (Yu - cy) ** 2)
            dv = jnp.sqrt((Xv - cx) ** 2 + (Yv - cy) ** 2)
            m_u = jnp.clip((r + 0.5 * hb - du) / hb, 0.0, 1.0)
            m_v = jnp.clip((r + 0.5 * hb - dv) / hb, 0.0, 1.0)
            return m_u, m_v

    if cfg.storage not in ("fp32", "bf16"):
        raise ValueError(f"unknown MAC storage {cfg.storage!r}")

    def step(state: MACState, cfl_scale):
        if cfg.storage == "bf16":
            # upcast once; every stencil/solve below runs fp32
            state = state._replace(u=state.u.astype(jnp.float32),
                                   v=state.v.astype(jnp.float32))
        u, v = bcs.set_normal(state.u, state.v, state.step, state.t)
        ue, ve = bcs.extend(u, v, state.step, state.t)
        if cfg.use_les:
            nu_t = smagorinsky_viscosity_mac(
                u, v, ue, ve, dx, dy, cfg.smagorinsky_constant
            )
            nu_total = cfg.nu + jnp.mean(nu_t)
        else:
            nu_t = None
            nu_total = None
        dt = _adaptive_dt(cfg, u, v, state.step, cfl_scale, nu_total)

        def stage(u, v, ue, ve, nu_t, p_warm, t_s):
            """One projected Euler stage from BC-consistent (u, v),
            with BCs/body evaluated at stage time ``t_s``: returns
            (u_new, v_new, phi, (fx, fy, div_star, rhs))."""
            conv_u, conv_v = _advect(u, v, ue, ve, dx, dy, cfg.scheme)
            if cfg.use_les:
                visc_u, visc_v = _diffuse_les(ue, ve, cfg.nu + nu_t, dx, dy)
            else:
                lap_u, lap_v = _diffuse(ue, ve, dx, dy)
                visc_u, visc_v = cfg.nu * lap_u, cfg.nu * lap_v

            if cfg.diffusion == "implicit":
                # Crank–Nicolson viscous term: (I − c∇²_h)u* =
                # u + dt(−conv + ½ν∇²u) + c·(BC values), c = ½dtν —
                # solved exactly in the mixed transform basis
                c = 0.5 * dt * cfg.nu
                ru = u[:, 1:-1] + dt * (0.5 * visc_u - conv_u)
                rv = v[1:-1, :] + dt * (0.5 * visc_v - conv_v)
                if forcing is not None:
                    ru = ru + dt * forcing[0][:, 1:-1]
                    rv = rv + dt * forcing[1][1:-1, :]
                if cfg.projection == "incremental":
                    # the lagged pressure gradient belongs in the
                    # Helmholtz RHS (post-solve it would pick up an
                    # O(c·dt) steady splitting defect)
                    ru = ru - dt * (p_warm[:, 1:] - p_warm[:, :-1]) * (
                        1.0 / dx)
                    rv = rv - dt * (p_warm[1:, :] - p_warm[:-1, :]) * (
                        1.0 / dy)
                ru = implicit_kit.rhs_fix_u(ru, c, state.step, t_s)
                rv = implicit_kit.rhs_fix_v(rv, c, state.step, t_s)
                u_star = u.at[:, 1:-1].set(implicit_kit.solve_u(ru, c))
                v_star = v.at[1:-1, :].set(implicit_kit.solve_v(rv, c))
            else:
                u_star = u.at[:, 1:-1].add(dt * (visc_u - conv_u))
                v_star = v.at[1:-1, :].add(dt * (visc_v - conv_v))
            if cfg.projection == "incremental" and cfg.diffusion != "implicit":
                # the predictor carries the lagged pressure gradient;
                # the projection below then solves for the increment
                u_star = u_star.at[:, 1:-1].add(
                    -dt * (p_warm[:, 1:] - p_warm[:, :-1]) * (1.0 / dx)
                )
                v_star = v_star.at[1:-1, :].add(
                    -dt * (p_warm[1:, :] - p_warm[:-1, :]) * (1.0 / dy)
                )
            if forcing is not None and cfg.diffusion != "implicit":
                u_star = u_star + dt * forcing[0]
                v_star = v_star + dt * forcing[1]
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
                    # hydrodynamic force on the body = momentum sink of
                    # the penalization, per unit density: F = Σ Δu·dA / dt
                    cell = dx * dy
                    fx = jnp.sum(du_ibm) * cell / dt
                    fy = jnp.sum(dv_ibm) * cell / dt

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
                    cell = dx * dy
                    fx = jnp.sum(du_g) * cell / dt
                    fy = jnp.sum(dv_g) * cell / dt

            if moving_body is not None:
                from cfdsim_tpu.ibm import ibm_ramp

                ub, vb = moving_body.velocity(t_s)
                strength = ibm_ramp(state.step, ibm_ramp_steps)
                if moving_scheme == "ghost":
                    from cfdsim_tpu.ibm_ghost import moving_ghost_forcing_2d

                    ctr = moving_body.center(t_s)
                    r = moving_body.radius
                    delta = 1.5 * hb
                    u_star, du_mb = moving_ghost_forcing_2d(
                        u_star, Xu, Yu, g.x_min, dx, g.y_min + 0.5 * dy,
                        dy, ctr, r, delta, ub, strength,
                    )
                    v_star, dv_mb = moving_ghost_forcing_2d(
                        v_star, Xv, Yv, g.x_min + 0.5 * dx, dx, g.y_min,
                        dy, ctr, r, delta, vb, strength,
                    )
                else:
                    m_u, m_v = body_masks(t_s)
                    du_mb = (u_star - ub) * (strength * m_u)
                    dv_mb = (v_star - vb) * (strength * m_v)
                    u_star = u_star - du_mb
                    v_star = v_star - dv_mb
                if cfg.compute_metrics:
                    cell = dx * dy
                    fx = fx + jnp.sum(du_mb) * cell / dt
                    fy = fy + jnp.sum(dv_mb) * cell / dt

            # --- exact projection: the MAC divergence/gradient pair is
            # adjoint, so ∇·(u* − dt∇φ) = ∇·u* − dt·L φ with L the
            # clamped-edge 5-point operator — solved exactly by the DCT
            # backend
            div_star = divergence_mac(u_star, v_star, dx, dy)
            rhs = div_star / dt
            if cfg.poisson.method not in ("dct", "fft"):
                # Neumann solvability for the iterative solvers; the
                # direct solvers discard the k=0 mode in-spectrum
                rhs = rhs - jnp.mean(rhs)
            warm = (jnp.zeros_like(p_warm)
                    if cfg.projection == "incremental" else p_warm)
            phi = solve_poisson(warm, rhs, dx, dy, cfg.poisson)
            u_new = u_star.at[:, 1:-1].add(
                -dt * (phi[:, 1:] - phi[:, :-1]) * (1.0 / dx)
            )
            v_new = v_star.at[1:-1, :].add(
                -dt * (phi[1:, :] - phi[:-1, :]) * (1.0 / dy)
            )
            u_new, v_new = bcs.set_normal(u_new, v_new, state.step, t_s)
            u_new = jnp.clip(u_new, -cfg.max_velocity, cfg.max_velocity)
            v_new = jnp.clip(v_new, -cfg.max_velocity, cfg.max_velocity)
            p_out = (p_warm + phi
                     if cfg.projection == "incremental" else phi)
            return u_new, v_new, p_out, (fx, fy, div_star, rhs, phi)

        u_new, v_new, phi, (fx, fy, div_star, rhs, dphi) = stage(
            u, v, ue, ve, nu_t, state.p, state.t
        )
        if cfg.time_scheme == "rk2":
            # Heun: average the start state with a second projected Euler
            # stage taken from the first stage's result (both solenoidal,
            # so the average is too); ν_t is refreshed from stage 1
            t2 = state.t + dt
            ue1, ve1 = bcs.extend(u_new, v_new, state.step, t2)
            if cfg.use_les:
                nu_t = smagorinsky_viscosity_mac(
                    u_new, v_new, ue1, ve1, dx, dy, cfg.smagorinsky_constant
                )
            u2, v2, phi2, (fx2, fy2, div_star, rhs, dphi) = stage(
                u_new, v_new, ue1, ve1, nu_t, phi, t2
            )
            u_new = 0.5 * (u + u2)
            v_new = 0.5 * (v + v2)
            u_new, v_new = bcs.set_normal(u_new, v_new, state.step, t2)
            phi_solve = dphi  # the field the stage-2 residual pairs with
            phi = 0.5 * (phi + phi2)
            fx = 0.5 * (fx + fx2)
            fy = 0.5 * (fy + fy2)
        else:
            phi_solve = dphi

        u_out, v_out = u_new, v_new
        if cfg.storage == "bf16":
            # round the velocities once per step for half-width storage
            u_out = u_new.astype(jnp.bfloat16)
            v_out = v_new.astype(jnp.bfloat16)
        new_state = MACState(
            u=u_out, v=v_out, p=phi, t=state.t + dt, step=state.step + 1
        )

        if cfg.compute_metrics:
            div_post = divergence_mac(u_new, v_new, dx, dy)
            ucc, vcc = center_velocities(u_new, v_new)
            vort = vorticity_mac(u_new, v_new, dx, dy)
            metrics = StepMetrics(
                dt=dt,
                div_pre=jnp.max(jnp.abs(div_star)),
                div_post=jnp.max(jnp.abs(div_post)),  # no interior mask:
                # the staggered projection is exact up to the wall
                max_vel=jnp.maximum(
                    jnp.max(jnp.abs(u_new)), jnp.max(jnp.abs(v_new))
                ),
                energy=jnp.mean(0.5 * (ucc * ucc + vcc * vcc)),
                vort_max=jnp.max(jnp.abs(vort)),
                poisson_res=poisson_residual(
                    phi_solve, rhs, dx, dy, None, "neumann"
                ),
                fx=fx,
                fy=fy,
            )
        else:
            zero = jnp.float32(0.0)
            metrics = StepMetrics(dt, zero, zero, zero, zero, zero, zero)
        return new_state, metrics

    return step
