"""Pallas TPU kernel: VMEM-resident red-black SOR sweeps.

The jnp red-black sweep streams φ and rhs through HBM once *per
half-sweep* (~24 MB per sweep at 1024²). This kernel instead loads φ and
rhs into VMEM once, runs ``iters`` full red-black SOR sweeps entirely
on-chip (fori_loop over VPU passes), and writes φ back once — turning the
pressure solve from HBM-bandwidth-bound into VPU-bound. At 1024² fp32 both
arrays (8 MB) fit comfortably in ~16 MB VMEM.

Neumann (clamped-edge) neighbor access is built from ``pltpu.roll`` plus
edge masks, matching ``solvers.poisson.lap_neumann`` exactly. Off-TPU the
kernel runs in interpreter mode so the CPU test suite covers it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest array (elements) the single-block kernel compiles for on v5e:
# the compiler's scoped-VMEM estimate is ~8x the array size (loop-carried
# phi + rhs + shifted-neighbor temporaries + masks), so 512² fp32 fits and
# 768² does not (verified empirically). Callers fall back to the streaming
# jnp path above this.
MAX_ELEMS = 512 * 512


def _roll(x, shift: int, axis: int, interpret: bool):
    # pltpu.roll lowers to the native TPU rotate (it requires a
    # non-negative shift, so negative shifts wrap modulo the axis length);
    # plain jnp.roll in interpreter mode
    if interpret:
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _kernel(phi_ref, rhs_ref, *rest, iters, omega, ax, ay, bc, masked,
            interpret):
    if masked:
        mask_ref, out_ref = rest
    else:
        (out_ref,) = rest
    ny, nx = phi_ref.shape
    iy = lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    ix = lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    red_m = ((iy + ix) % 2) == 0
    black_m = jnp.logical_not(red_m)
    if bc != "neumann":  # dirichlet: frame fixed
        interior = (iy > 0) & (iy < ny - 1) & (ix > 0) & (ix < nx - 1)
        red_m = red_m & interior
        black_m = black_m & interior
    if masked:  # φ frozen inside embedded solids (reference v5.py:213)
        fluid = mask_ref[:] < 0.5
        red_m = red_m & fluid
        black_m = black_m & fluid
    # boolean edge masks (kept; the int32 iotas above are DCE'd after this)
    e_edge = ix == nx - 1
    w_edge = ix == 0
    n_edge = iy == ny - 1
    s_edge = iy == 0

    denom_inv = 1.0 / (2.0 * (ax + ay))

    def nbsum(p):
        # accumulate one shifted neighbor at a time to keep VMEM liveness
        # at ~2 full arrays instead of 4
        def nb(shift, axis, edge):
            q = _roll(p, shift, axis, interpret)
            if bc == "neumann":  # clamped edges: ghost = edge value
                q = jnp.where(edge, p, q)
            return q

        acc = nb(-1, 1, e_edge)
        acc = acc + nb(1, 1, w_edge)
        acc = acc * ax
        acc = acc + ay * nb(-1, 0, n_edge)
        acc = acc + ay * nb(1, 0, s_edge)
        return acc

    def half(p, color):
        star = (nbsum(p) - rhs_ref[:]) * denom_inv
        return jnp.where(color, (1.0 - omega) * p + omega * star, p)

    def sweep(_, p):
        p = half(p, red_m)
        return half(p, black_m)

    out_ref[:] = lax.fori_loop(0, iters, sweep, phi_ref[:])


def rbsor_pallas(
    phi0,
    rhs,
    dx: float,
    dy: float,
    iters: int = 100,
    omega: float = 1.7,
    bc: str = "neumann",
    solid_mask=None,
    interpret: bool | None = None,
):
    """Run ``iters`` red-black SOR sweeps fully in VMEM (with optional
    frozen-φ solid mask, reference v5.py:213).

    Falls back to the streaming jnp implementation when the arrays exceed
    the VMEM budget."""
    if phi0.size > MAX_ELEMS:
        from cfdsim_tpu.solvers.poisson import PoissonConfig, solve_poisson

        return solve_poisson(
            phi0, rhs, dx, dy,
            PoissonConfig(method="rbsor", iters=iters, omega=omega, bc=bc),
            solid_mask=solid_mask,
        )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    masked = solid_mask is not None
    ax = 1.0 / (dx * dx)
    ay = 1.0 / (dy * dy)
    kernel = functools.partial(
        _kernel, iters=iters, omega=omega, ax=ax, ay=ay, bc=bc,
        masked=masked, interpret=interpret,
    )
    args = [phi0, rhs]
    if masked:
        args.append(jnp.asarray(solid_mask, jnp.float32))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(phi0.shape, phi0.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
