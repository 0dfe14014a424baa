"""Convection operators: first-order upwind and SUPG-stabilized central.

TPU-native equivalents of the reference's convection kernels
(``compute_convection_fast`` v5.py:112-125, ``compute_convection_supg_fast``
v5.py:127-147, ``compute_supg_stabilization_fast`` v5.py:149-162). The
branchy per-cell upwind selects become ``jnp.where`` masks that the VPU
evaluates in one fused pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from cfdsim_tpu.ops.stencil import _pad1


def convection_upwind(u, v, phi, dx: float, dy: float):
    """First-order upwind u·∇φ; zero on boundary frame.

    Parity: reference ``compute_convection_fast`` v5.py:112-125 (backward
    difference when velocity > 0, forward otherwise).
    """
    uc = u[1:-1, 1:-1]
    vc = v[1:-1, 1:-1]
    pc = phi[1:-1, 1:-1]
    bwd_x = (pc - phi[1:-1, :-2]) * (1.0 / dx)
    fwd_x = (phi[1:-1, 2:] - pc) * (1.0 / dx)
    bwd_y = (pc - phi[:-2, 1:-1]) * (1.0 / dy)
    fwd_y = (phi[2:, 1:-1] - pc) * (1.0 / dy)
    dphidx = jnp.where(uc > 0, bwd_x, fwd_x)
    dphidy = jnp.where(vc > 0, bwd_y, fwd_y)
    return _pad1(uc * dphidx + vc * dphidy)


def supg_tau(u, v, dx: float, dy: float, dt, nu_eff):
    """SUPG stabilization parameter τ.

    τ = h/(2|u|)·min(1, Pe/2) with Pe = |u|h/ν_eff; τ = dt/2 at stagnation
    points. Parity: reference ``compute_supg_stabilization_fast``
    v5.py:149-162 (computed everywhere; boundary frame zeroed to match the
    reference's 1..n-1 loop).
    """
    h = min(dx, dy)
    vel = jnp.sqrt(u * u + v * v)
    pe = vel * h / (nu_eff + 1e-10)
    tau_flow = h / (2.0 * jnp.maximum(vel, 1e-10)) * jnp.minimum(1.0, pe / 2.0)
    tau = jnp.where(vel > 1e-10, tau_flow, dt / 2.0)
    return _pad1(tau[1:-1, 1:-1])


def convection_supg(u, v, phi, dx: float, dy: float, tau):
    """Central-difference convection minus the SUPG correction term.

    conv = u·∇φ − τ·(u ∂²φ/∂x² + v ∂²φ/∂y²); zero on boundary frame.
    Parity: reference ``compute_convection_supg_fast`` v5.py:127-147,
    including its effective 0.25/dx first-derivative factor (the reference
    multiplies the central difference by ``0.5 * dx_inv`` where
    ``dx_inv = 0.5/dx`` — a deliberate halved convection it relies on for
    stability; we reproduce it for parity).
    """
    uc = u[1:-1, 1:-1]
    vc = v[1:-1, 1:-1]
    pc = phi[1:-1, 1:-1]
    dx_inv = 0.5 / dx
    dy_inv = 0.5 / dy
    dphidx = (phi[1:-1, 2:] - phi[1:-1, :-2]) * (0.5 * dx_inv)
    dphidy = (phi[2:, 1:-1] - phi[:-2, 1:-1]) * (0.5 * dy_inv)
    conv_std = uc * dphidx + vc * dphidy
    # second derivatives with the reference's (0.5/dx)^2 scaling (v5.py:141-143)
    d2x = (phi[1:-1, 2:] - 2.0 * pc + phi[1:-1, :-2]) * (dx_inv * dx_inv)
    d2y = (phi[2:, 1:-1] - 2.0 * pc + phi[:-2, 1:-1]) * (dy_inv * dy_inv)
    tc = tau[1:-1, 1:-1]
    supg = tc * (uc * d2x + vc * d2y)
    return _pad1(jnp.where(tc > 0, conv_std - supg, conv_std))


def convection_central(u, v, phi, dx: float, dy: float):
    """Plain second-order central convection u·∇φ; zero on boundary frame."""
    uc = u[1:-1, 1:-1]
    vc = v[1:-1, 1:-1]
    dphidx = (phi[1:-1, 2:] - phi[1:-1, :-2]) * (0.5 / dx)
    dphidy = (phi[2:, 1:-1] - phi[:-2, 1:-1]) * (0.5 / dy)
    return _pad1(uc * dphidx + vc * dphidy)
