"""Exact Dirichlet Helmholtz solver via discrete sine transforms.

The implicit (backward-Euler) viscous step solves

    (I − c ∇²) u* = b,   c = dt·ν,

with Dirichlet velocity BCs on the one-node boundary frame (the capability
of the reference's Julia FEM solver, v1.jl:130-167). The interior 5-point
operator with homogeneous Dirichlet walls is exactly diagonalized by the
2D DST-I; inhomogeneous boundary values move to the right-hand side. One
forward/inverse transform pair replaces the damped-Jacobi iteration
(models/incompressible.py) — machine-precision instead of
O((ρ_J)^iters) error, at FFT cost.

DST-I of length m is computed as the imaginary part of an FFT of the odd
extension (length 2(m+1)) — TPU-friendly, no scatter/gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def dst1(x, axis: int):
    """DST-I along ``axis``: S[k] = Σ_{j=1..m} x_j sin(πjk/(m+1)), k=1..m.

    Self-inverse up to the factor 2/(m+1): dst1(dst1(x)) = (m+1)/2 · x.
    """
    m = x.shape[axis]
    pad_shape = list(x.shape)
    pad_shape[axis] = 1
    zero = jnp.zeros(pad_shape, x.dtype)
    v = jnp.concatenate([zero, x, zero, -jnp.flip(x, axis)], axis=axis)
    V = jnp.fft.rfft(v, axis=axis)  # length m+2 along axis
    S = -0.5 * jnp.imag(jnp.take(V, jnp.arange(1, m + 1), axis=axis))
    return S.astype(x.dtype)


def idst1(X, axis: int):
    m = X.shape[axis]
    return dst1(X, axis) * (2.0 / (m + 1))


def solve_helmholtz_dirichlet(b, coeff, dx: float, dy: float):
    """Solve (I − coeff·∇²) u = b on the interior of a (ny, nx) array whose
    one-node boundary frame carries the Dirichlet values of u (they are
    preserved in the returned array). ``coeff`` = dt·ν must be a scalar
    (spatially varying ν needs the iterative path)."""
    ax = 1.0 / (dx * dx)
    ay = 1.0 / (dy * dy)
    # move the known boundary values to the RHS of the interior system
    rhs = b[1:-1, 1:-1]
    rhs = rhs.at[:, 0].add(coeff * ax * b[1:-1, 0])
    rhs = rhs.at[:, -1].add(coeff * ax * b[1:-1, -1])
    rhs = rhs.at[0, :].add(coeff * ay * b[0, 1:-1])
    rhs = rhs.at[-1, :].add(coeff * ay * b[-1, 1:-1])

    my, mx = rhs.shape
    ky = np.arange(1, my + 1)
    kx = np.arange(1, mx + 1)
    cy = 2.0 * np.cos(np.pi * ky / (my + 1))
    cx = 2.0 * np.cos(np.pi * kx / (mx + 1))
    denom = jnp.asarray(
        1.0 + coeff * (2.0 * (ax + ay) - ax * cx[None, :] - ay * cy[:, None]),
        rhs.dtype,
    )

    rhat = dst1(dst1(rhs, axis=0), axis=1)
    uhat = rhat / denom
    u_int = idst1(idst1(uhat, axis=1), axis=0)
    return b.at[1:-1, 1:-1].set(u_int.astype(b.dtype))
