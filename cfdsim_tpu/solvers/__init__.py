"""Numerical solvers: pressure-Poisson backends and Riemann flux solvers."""

from cfdsim_tpu.solvers.poisson import (
    PoissonConfig,
    poisson_residual,
    solve_poisson,
)
from cfdsim_tpu.solvers.poisson3d import Poisson3DConfig, solve_poisson_3d
from cfdsim_tpu.solvers.helmholtz import solve_helmholtz_dirichlet
from cfdsim_tpu.solvers.fdm import make_fdm_solver
from cfdsim_tpu.solvers.riemann import (
    FLUXES,
    cons_to_prim,
    hllc_flux,
    prim_to_cons,
    roe_flux,
    roe_ref_flux,
    rusanov_flux,
)

__all__ = [
    "PoissonConfig",
    "poisson_residual",
    "solve_poisson",
    "Poisson3DConfig",
    "solve_poisson_3d",
    "solve_helmholtz_dirichlet",
    "make_fdm_solver",
    "FLUXES",
    "cons_to_prim",
    "prim_to_cons",
    "rusanov_flux",
    "hllc_flux",
    "roe_flux",
    "roe_ref_flux",
]
