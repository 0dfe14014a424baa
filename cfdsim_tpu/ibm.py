"""Immersed-boundary geometry: solid masks, smooth IBM forcing shells,
and potential-flow initialization.

TPU-native equivalents of the reference's mask builders
(``setup_boundary_masks`` v5.py:275-283, ``setup_wedge`` v1_shock.py:240-248,
cavity mask cavity_flow_v1.py:264-273) and ``initialize_potential_flow``
(v5.py:299-314). Masks are computed once with NumPy at setup time and
captured as constants by the jitted step.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cfdsim_tpu.grid import Grid


def cylinder_masks(grid: Grid, center: tuple[float, float], radius: float):
    """(solid_mask bool, ibm_mask float) for an embedded cylinder.

    The IBM mask is 1 inside the body and decays as a Gaussian shell
    exp(−((r−R)/2dx)²) out to R+5dx (reference v5.py:275-283), giving the
    smooth penalization force profile.
    """
    X, Y = grid.meshgrid()
    dist = np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2)
    solid = dist <= radius
    sigma = 2.0 * grid.dx
    shell = np.exp(-(((dist - radius) / sigma) ** 2))
    ibm = np.where(dist < radius, 1.0, np.where(dist < radius + 5 * grid.dx, shell, 0.0))
    return jnp.asarray(solid), jnp.asarray(ibm, jnp.float32)


def apply_ibm(u, v, ibm_mask, strength):
    """Penalize velocity inside/near the body: q *= (1 − mask·strength).

    Parity: reference ``apply_ibm_fast`` v5.py:228-237; ``strength`` ramps
    0→1 over the initial steps (v5.py:406).
    """
    damp = 1.0 - ibm_mask * strength
    return u * damp, v * damp


def ibm_ramp(step, ramp_steps: int):
    """Force-strength ramp min(1, step/ramp_steps); 1 if no ramp."""
    if ramp_steps <= 0:
        return jnp.float32(1.0)
    return jnp.minimum(1.0, step.astype(jnp.float32) / ramp_steps)


def potential_flow_cylinder(
    grid: Grid, center: tuple[float, float], radius: float, v_inf: float, ibm_mask
):
    """Initial condition: ideal potential flow around a cylinder, blended to
    rest inside the IBM shell (reference ``initialize_potential_flow``
    v5.py:299-314).
    """
    X, Y = grid.meshgrid()
    dx = grid.dx
    r = np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2)
    theta = np.arctan2(Y - center[1], X - center[0])
    mask = np.asarray(ibm_mask)
    factor = (radius / np.maximum(r, 1e-10)) ** 2
    u_far = v_inf * (1.0 - factor * np.cos(2.0 * theta)) * (1.0 - mask)
    v_far = -v_inf * factor * np.sin(2.0 * theta) * (1.0 - mask)
    blend = np.minimum(1.0, ((r - radius) / (4.0 * dx)) ** 2)
    u_near = v_inf * blend * (1.0 - mask)
    far = r > radius + 4.0 * dx
    u0 = np.where(far, u_far, u_near)
    v0 = np.where(far, v_far, 0.0)
    return jnp.asarray(u0, jnp.float32), jnp.asarray(v0, jnp.float32)


def wedge_mask(grid: Grid, wedge_angle: float, wedge_start_x: float):
    """Boolean mask of a wedge rising at ``wedge_angle`` from
    ``wedge_start_x`` along the bottom wall (reference v1_shock.py:240-248).
    Returns an (ny, nx) mask in this framework's row-major (y, x) layout.
    """
    X, Y = grid.meshgrid()
    wedge_y = np.tan(wedge_angle) * (X - wedge_start_x)
    return jnp.asarray((X >= wedge_start_x) & (Y <= wedge_y))


def cavity_mask(grid: Grid, x_start: float, length: float, depth: float):
    """Smoothed mask for the open-cavity geometry: 1 inside the cavity
    below the shear layer, Gaussian-smoothed edge above it (σ = 3dx),
    parity with reference cavity_flow_v1.py:264-273.

    Note the supersonic-cavity convention: the "cavity" region marks cells
    whose state is pinned to quiescent fluid each step.
    """
    X, Y = grid.meshgrid()
    inside = (X >= x_start) & (X <= x_start + length) & (Y <= depth)
    mask = inside.astype(np.float64)
    sigma = 3.0 * grid.dx
    above = (~inside) & (X >= x_start) & (X <= x_start + length) & (Y > depth)
    dist_y = Y - depth
    shell = np.exp(-((dist_y / sigma) ** 2))
    mask = np.where(above & (dist_y < 3.0 * sigma), shell, mask)
    return jnp.asarray(mask, jnp.float32)
