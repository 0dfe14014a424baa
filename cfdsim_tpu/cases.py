"""Named case registry — the config/flag system.

The reference configures each solver with a per-script dataclass and no CLI
(SURVEY.md §5); here each named case ("cavity", "channel", "cylinder",
"wedge", "cavity_supersonic", "kolmogorov", "transport") is a builder that
returns a ready-to-run bundle: static config, jitted step function, and
initial state — preserving the reference's scene/state API (u, v, p arrays,
dt/dx/nu params) per BASELINE.json.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp

from cfdsim_tpu import boundary
from cfdsim_tpu.grid import Grid
from cfdsim_tpu.ibm import cylinder_masks, potential_flow_cylinder
from cfdsim_tpu.models.incompressible import (
    IncompressibleConfig,
    init_state,
    make_step,
)
from cfdsim_tpu.solvers.poisson import PoissonConfig


@dataclasses.dataclass
class Case:
    """A runnable bundle: ``step(state, cfl_scale) -> (state, metrics)``."""

    name: str
    cfg: Any
    step: Callable
    state: Any
    grid: Grid
    extras: dict = dataclasses.field(default_factory=dict)


def lid_cavity(
    n: int = 128,
    Re: float = 100.0,
    lid_velocity: float = 1.0,
    poisson: Optional[PoissonConfig] = None,
    scheme: str = "central",
    cfl: float = 0.5,
    **cfg_overrides,
) -> Case:
    """2D lid-driven cavity (BASELINE.json config 1; the Ghia benchmark)."""
    grid = Grid(nx=n, ny=n)
    pois = poisson or PoissonConfig(method="mg", iters=2, mg_pre=2, mg_post=2)
    cfg = IncompressibleConfig(
        grid=grid,
        nu=lid_velocity / Re,
        scheme=scheme,
        poisson=pois,
        cfl_target=cfl,
        dt_max=0.5 * min(grid.dx, grid.dy) / max(lid_velocity, 1e-10),
        max_velocity=5.0 * lid_velocity,
        **cfg_overrides,
    )
    bc = boundary.lid_cavity_bcs(lid_velocity)
    step = make_step(cfg, bc)
    state = init_state(cfg)
    return Case("cavity", cfg, step, state, grid)


def channel(
    nx: int = 512,
    ny: int = 128,
    Re: float = 100.0,
    u_in: float = 1.0,
    length: float = 4.0,
    height: float = 1.0,
    parabolic_inflow: bool = True,
    poisson: Optional[PoissonConfig] = None,
    **cfg_overrides,
) -> Case:
    """2D channel / Poiseuille flow with inflow-outflow and no-slip walls
    (BASELINE.json config 2)."""
    grid = Grid(nx=nx, ny=ny, x_max=length, y_max=height)
    # Re based on channel height
    nu = u_in * height / Re
    y = jnp.asarray(grid.y_coords(), jnp.float32)
    profile = None
    if parabolic_inflow:
        profile = 6.0 * u_in * (y / height) * (1.0 - y / height)
    pois = poisson or PoissonConfig(method="mg", iters=2)
    cfg = IncompressibleConfig(
        grid=grid,
        nu=nu,
        scheme="central",
        poisson=pois,
        cfl_target=0.4,
        dt_max=0.4 * min(grid.dx, grid.dy) / max(u_in, 1e-10),
        max_velocity=10.0 * u_in,
        **cfg_overrides,
    )
    bc = boundary.channel_bcs(u_in, profile)
    step = make_step(cfg, bc)
    state = init_state(cfg)
    return Case("channel", cfg, step, state, grid, {"profile": profile})


def cylinder(
    nx: int = 600,
    ny: int = 180,
    Re: float = 600.0,
    v_inf: float = 1.0,
    radius: float = 0.5,
    center: tuple[float, float] = (4.0, 2.0),
    domain: tuple[float, float] = (20.0, 4.0),
    scheme: str = "supg",
    use_les: bool = False,
    smagorinsky_constant: float = 0.17,
    artificial_viscosity: float = 1e-3,
    poisson: Optional[PoissonConfig] = None,
    ref_parity: bool = False,
    **cfg_overrides,
) -> Case:
    """Flow past an immersed cylinder — the reference's flagship case
    (v5.py:616-650 defaults: 600×180 grid on a 20×4 domain, Re=600, SUPG,
    artificial viscosity 1e-3, IBM ramp + fixed-dt warmup over the first
    1000 steps, velocity clip at 5). ``ref_parity=True`` reproduces the
    reference's halved SUPG convection and masked rbsor Poisson exactly;
    the default uses the corrected operator and unmasked multigrid."""
    grid = Grid(nx=nx, ny=ny, x_max=domain[0], y_max=domain[1])
    solid, ibm = cylinder_masks(grid, center, radius)
    if poisson is None:
        if ref_parity:
            poisson = PoissonConfig(
                method="rbsor", iters=1500, tol=1e-8, check_every=50, omega=1.7
            )
        else:
            poisson = PoissonConfig(method="mg", iters=2)
    defaults = dict(
        adaptive_dt=True,
        cfl_target=0.1,
        dt_base=5e-5,
        dt_min=1e-6,
        dt_max=1e-4,
        warmup_steps=1000,
        warmup_dt=2e-5,
        ibm_ramp_steps=1000,
        max_velocity=5.0 * v_inf,
        cleanup_iters=2,
    )
    defaults.update(cfg_overrides)
    cfg = IncompressibleConfig(
        grid=grid,
        nu=v_inf / Re,
        scheme=("supg_refparity" if ref_parity and scheme == "supg" else scheme),
        use_les=use_les,
        smagorinsky_constant=smagorinsky_constant,
        artificial_viscosity=artificial_viscosity,
        poisson=poisson,
        masked_poisson=ref_parity,
        **defaults,
    )
    bc = boundary.cylinder_inflow_bcs(
        v_inf, grid.y_coords(), grid.y_max, perturb_amp=0.01, perturb_ramp_steps=1000
    )
    step = make_step(cfg, bc, solid_mask=solid, ibm_mask=ibm)
    u0, v0 = potential_flow_cylinder(grid, center, radius, v_inf, ibm)
    state = init_state(cfg, u0=u0, v0=v0)
    return Case(
        "cylinder", cfg, step, state, grid,
        {"solid_mask": solid, "ibm_mask": ibm, "center": center, "radius": radius},
    )


CASES: dict[str, Callable[..., Case]] = {
    "cavity": lid_cavity,
    "channel": channel,
    "cylinder": cylinder,
}


def build(name: str, **kwargs) -> Case:
    """Build a named case; later modules register wedge/cavity_supersonic/
    kolmogorov/transport here."""
    try:
        builder = CASES[name]
    except KeyError:
        raise KeyError(f"unknown case {name!r}; available: {sorted(CASES)}")
    return builder(**kwargs)
