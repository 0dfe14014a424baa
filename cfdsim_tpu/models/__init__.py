"""Solver families ("models"): the reference's four script families
rebuilt as composable, jittable modules (SURVEY.md §2)."""

from cfdsim_tpu.models.incompressible import (
    IncompressibleConfig,
    IncompressibleState,
    StepMetrics,
    init_state,
    make_step,
)

from cfdsim_tpu.models.mac import MACConfig, MACState
from cfdsim_tpu.models.mac_stretched import StretchedMACConfig
from cfdsim_tpu.models.mac_stretched3d import StretchedMAC3DConfig
from cfdsim_tpu.models.mac3d import MAC3DConfig, MAC3DState

__all__ = [
    "MACConfig",
    "MACState",
    "StretchedMACConfig",
    "MAC3DConfig",
    "MAC3DState",
    "IncompressibleConfig",
    "IncompressibleState",
    "StepMetrics",
    "init_state",
    "make_step",
]
