"""Boundary conditions as functional ghost/edge writes.

The reference applies BCs by mutating edge rows/columns in place
(``apply_boundary_conditions`` v5.py:349-360, v1_shock.py:277-289,
``apply_cavity_bcs_improved`` cavity_flow_v1.py:152-171). Here each BC is a
pure ``field -> field`` transform built from ``.at[].set()`` edge writes,
which XLA fuses into the surrounding step. Across a sharded mesh the same
edge writes become halo writes on the boundary shards (see
``cfdsim_tpu.parallel.halo``).

Sides are named by axis and end: ``x_lo`` (j=0 column), ``x_hi`` (last
column), ``y_lo`` (i=0 row), ``y_hi`` (last row). Arrays are (ny, nx).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

SIDES = ("x_lo", "x_hi", "y_lo", "y_hi")


def set_edge(field, side: str, value):
    """Dirichlet: set the edge line to ``value`` (scalar or 1D array)."""
    if side == "x_lo":
        return field.at[:, 0].set(value)
    if side == "x_hi":
        return field.at[:, -1].set(value)
    if side == "y_lo":
        return field.at[0, :].set(value)
    if side == "y_hi":
        return field.at[-1, :].set(value)
    raise ValueError(side)


def copy_edge(field, side: str):
    """Neumann / zero-gradient outflow: copy the adjacent interior line
    (reference outflow, v5.py:355-356)."""
    if side == "x_lo":
        return field.at[:, 0].set(field[:, 1])
    if side == "x_hi":
        return field.at[:, -1].set(field[:, -2])
    if side == "y_lo":
        return field.at[0, :].set(field[1, :])
    if side == "y_hi":
        return field.at[-1, :].set(field[-2, :])
    raise ValueError(side)


def mirror_all_edges(field):
    """Zero-normal-gradient on all four edges (used for pressure Neumann)."""
    field = field.at[:, 0].set(field[:, 1])
    field = field.at[:, -1].set(field[:, -2])
    field = field.at[0, :].set(field[1, :])
    field = field.at[-1, :].set(field[-2, :])
    return field


def apply_bc_spec(field, spec: dict):
    """Apply a {side: bc} dict where bc is ("dirichlet", value), ("neumann",),
    or a callable ``field -> field``."""
    for side in SIDES:
        bc = spec.get(side)
        if bc is None:
            continue
        if callable(bc):
            field = bc(field)
        elif bc[0] == "dirichlet":
            field = set_edge(field, side, bc[1])
        elif bc[0] == "neumann":
            field = copy_edge(field, side)
        else:
            raise ValueError(f"unknown bc {bc!r} for side {side}")
    return field


# ---------------------------------------------------------------------------
# Case-level velocity BC builders (u, v pairs)
# ---------------------------------------------------------------------------

def lid_cavity_bcs(lid_velocity: float = 1.0) -> Callable:
    """Lid-driven cavity: moving lid at y_hi, no-slip elsewhere."""

    def apply(u, v, step=None, t=None):
        u = u.at[:, 0].set(0.0).at[:, -1].set(0.0).at[0, :].set(0.0)
        v = v.at[:, 0].set(0.0).at[:, -1].set(0.0).at[0, :].set(0.0)
        u = u.at[-1, :].set(lid_velocity)
        v = v.at[-1, :].set(0.0)
        return u, v

    return apply


def channel_bcs(u_in: float = 1.0, profile=None) -> Callable:
    """Channel / Poiseuille: inflow at x_lo (uniform or given profile),
    zero-gradient outflow at x_hi, no-slip walls at y_lo / y_hi."""

    def apply(u, v, step=None, t=None):
        inflow = u_in if profile is None else profile
        u = u.at[:, 0].set(inflow)
        v = v.at[:, 0].set(0.0)
        u = u.at[:, -1].set(u[:, -2])
        v = v.at[:, -1].set(v[:, -2])
        u = u.at[0, :].set(0.0).at[-1, :].set(0.0)
        v = v.at[0, :].set(0.0).at[-1, :].set(0.0)
        return u, v

    return apply


def cylinder_inflow_bcs(
    v_inf: float,
    y_coords,
    y_max: float,
    perturb_amp: float = 0.01,
    perturb_ramp_steps: int = 1000,
) -> Callable:
    """External-flow BCs for the cylinder case.

    Inflow u = V∞(1 + ε·sin(2πy/y_max + 0.02·step)) with ε ramped from 0 to
    ``perturb_amp`` over ``perturb_ramp_steps`` — the vortex-shedding trigger
    of reference v5.py:349-360 — plus Neumann outflow and no-slip top/bottom
    walls.
    """
    y = jnp.asarray(y_coords, dtype=jnp.float32)

    def apply(u, v, step, t=None):
        scale = jnp.minimum(1.0, step / perturb_ramp_steps) * perturb_amp
        pert = scale * jnp.sin(2.0 * jnp.pi * y / y_max + 0.02 * step)
        u = u.at[:, 0].set(v_inf * (1.0 + pert))
        v = v.at[:, 0].set(0.0)
        u = u.at[:, -1].set(u[:, -2])
        v = v.at[:, -1].set(v[:, -2])
        u = u.at[0, :].set(0.0).at[-1, :].set(0.0)
        v = v.at[0, :].set(0.0).at[-1, :].set(0.0)
        return u, v

    return apply
