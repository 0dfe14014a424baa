"""Passive-scalar transport: coupled advection-diffusion over a flow field.

BASELINE.json config 3 ("scalar transport: temperature/dye over the cavity
flow"). The reference has no standalone transport solver; this reuses the
framework's convection/diffusion operators (the same kernels the momentum
equations use, reference v5.py:112-176) for a scalar θ advanced alongside
the incompressible solver in one fused jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from cfdsim_tpu.grid import Grid
from cfdsim_tpu.models.incompressible import IncompressibleState
from cfdsim_tpu.ops.convection import convection_central, convection_upwind
from cfdsim_tpu.ops.stencil import laplacian


class CoupledState(NamedTuple):
    flow: IncompressibleState
    theta: jax.Array

    # runner interface: time/step bookkeeping lives on the flow state
    @property
    def t(self):
        return self.flow.t

    @property
    def step(self):
        return self.flow.step


class CoupledMetrics(NamedTuple):
    flow: object  # StepMetrics
    theta_min: jax.Array
    theta_max: jax.Array
    theta_mean: jax.Array

    # runner/monitor interface: passthrough to the flow metrics
    @property
    def dt(self):
        return self.flow.dt

    @property
    def energy(self):
        return self.flow.energy

    @property
    def max_vel(self):
        return self.flow.max_vel

    @property
    def div_post(self):
        return self.flow.div_post


@dataclasses.dataclass(frozen=True)
class TransportConfig:
    grid: Grid
    kappa: float  # scalar diffusivity
    scheme: str = "upwind"  # upwind (monotone) | central
    # The scalar's explicit stability bound (advection number + diffusion
    # number ≤ 1) is usually tighter than the momentum dt the flow solver
    # picks, so the scalar takes `substeps` sub-steps of dt/substeps.
    substeps: int = 2


def make_transport_step(cfg: TransportConfig, bc_fn: Callable) -> Callable:
    """``step(theta, u, v, dt) -> theta``: one explicit advection-diffusion
    update with the scalar's own BCs applied as edge writes."""
    dx, dy = cfg.grid.dx, cfg.grid.dy
    conv = convection_upwind if cfg.scheme == "upwind" else convection_central

    def step(theta, u, v, dt):
        dt_sub = dt / cfg.substeps
        for _ in range(cfg.substeps):
            c = conv(u, v, theta, dx, dy)
            d = laplacian(theta, dx, dy)
            theta = bc_fn(theta + dt_sub * (cfg.kappa * d - c))
        return theta

    return step


def make_coupled_step(
    flow_step: Callable,
    transport_cfg: TransportConfig,
    theta_bc: Callable,
) -> Callable:
    """Fuse a flow step and a transport step into one jitted update: the
    scalar is advected by the freshly projected velocity field."""
    t_step = make_transport_step(transport_cfg, theta_bc)

    def step(state: CoupledState, cfl_scale):
        flow, metrics = flow_step(state.flow, cfl_scale)
        theta = t_step(state.theta, flow.u, flow.v, metrics.dt)
        new_state = CoupledState(flow=flow, theta=theta)
        m = CoupledMetrics(
            flow=metrics,
            theta_min=jnp.min(theta),
            theta_max=jnp.max(theta),
            theta_mean=jnp.mean(theta),
        )
        return new_state, m

    return step


def init_coupled(flow_state: IncompressibleState, theta0) -> CoupledState:
    return CoupledState(flow=flow_state, theta=jnp.asarray(theta0, jnp.float32))
