"""Slope limiters for the compressible finite-volume module.

Vectorized equivalents of the reference's scalar limiters:
``minmod`` (cavity_flow_v1.py:89-93) and ``superbee``
(v1_shock.py:77-82). These operate elementwise on whole face arrays, so a
single call limits every interface at once (vs. the reference's
per-interface scalar Numba calls).
"""

from __future__ import annotations

import jax.numpy as jnp


def minmod(a, b):
    """Textbook minmod: the smaller-magnitude argument when a and b agree
    in sign (a tie returns that common value), else 0. (The reference's
    scalar version returns 0 on the measure-zero |a| == |b| tie,
    cavity_flow_v1.py:89-93 — degrading to first order exactly where the
    slopes are bitwise equal; the standard definition is used here.)"""
    same = a * b > 0
    pick_b = jnp.logical_and(jnp.abs(b) < jnp.abs(a), same)
    return jnp.where(same, jnp.where(pick_b, b, a), 0.0)


def minmod3(a, b, c):
    """Three-argument minmod (used by MUSCL reconstruction)."""
    return minmod(a, minmod(b, c))


def superbee(a, b):
    """Superbee-limited delta: max(0, min(2r,1), min(r,2)) * b with r=a/b.

    Parity: reference ``superbee`` v1_shock.py:77-82 (returns 0 when a·b≤0).
    """
    r = a / (b + 1e-10)
    lim = jnp.maximum(
        jnp.maximum(0.0, jnp.minimum(2.0 * r, 1.0)), jnp.minimum(r, 2.0)
    )
    return jnp.where(a * b <= 0, 0.0, lim * b)


def superbee_slope(a, b):
    """Textbook superbee slope: maxmod(minmod(2a, b), minmod(a, 2b)) —
    the sharpest TVD limiter (Roe 1985); the compressive choice the
    reference's Roe path uses (v1_shock.py:124-138, via its ratio form)."""
    s1 = minmod(2.0 * a, b)
    s2 = minmod(a, 2.0 * b)
    return jnp.where(jnp.abs(s1) > jnp.abs(s2), s1, s2)


def vanleer_slope(a, b):
    """Van Leer harmonic-mean slope: 2ab/(a+b) where a·b > 0, else 0 —
    smooth TVD limiter, the default for the incompressible TVD scheme."""
    prod = a * b
    den = a + b
    den = jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)
    return jnp.where(prod > 0.0, 2.0 * prod / den, 0.0)


SLOPE_LIMITERS = {
    "minmod": minmod,
    "superbee": superbee_slope,
    "vanleer": vanleer_slope,
}
