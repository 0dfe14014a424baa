"""Numerical solvers: pressure-Poisson backends and flux solvers."""

from cfdsim_tpu.solvers.poisson import (
    PoissonConfig,
    poisson_residual,
    solve_poisson,
)

__all__ = ["PoissonConfig", "poisson_residual", "solve_poisson"]
