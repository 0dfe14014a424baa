"""Solver families ("models"): the reference's four script families
rebuilt as composable, jittable modules (SURVEY.md §2)."""

from cfdsim_tpu.models.incompressible import (
    IncompressibleConfig,
    IncompressibleState,
    StepMetrics,
    init_state,
    make_step,
)

__all__ = [
    "IncompressibleConfig",
    "IncompressibleState",
    "StepMetrics",
    "init_state",
    "make_step",
]
