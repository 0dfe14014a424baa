"""Pallas TPU kernel: fused incompressible predictor.

The jnp predictor (models/incompressible.py, explicit central path) runs
convection×2 + Laplacian×2 + axpy×2 as separate XLA ops — ~10 HBM passes
over the fields per step. This kernel fuses the whole predictor

    u* = u + dt·(ν ∇²u − u·∇u),   v* = v + dt·(ν ∇²v − u·∇v)

into one grid-blocked pass: row strips of u and v (plus one halo row per
side) are DMA'd to VMEM, both momentum updates are computed on-chip, and
u*/v* are written once — 4 HBM passes total. Semantics match
``convection_central`` + ``laplacian_coeff`` exactly (zero-frame: the
boundary frame passes through unchanged, reference kernels loop 1..n-1,
v5.py:112-176).

The SUPG variant of the reference's predictor would fuse the same way;
central is the bench/default-cavity scheme.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cfdsim_tpu.ops.pallas.poisson_rb import _roll


def _kernel(dt_ref, u_hbm, v_hbm, us_ref, vs_ref, u_s, v_s, sem_u, sem_v,
            *, R, ny, nx, nu, dx, dy, interpret):
    i = pl.program_id(0)
    # 8-row halos keep the DMA slice 8-aligned (Mosaic sublane tiling);
    # only the innermost halo row is actually read by the stencil
    src0 = i * R
    rows = R + 16
    dma_u = pltpu.make_async_copy(u_hbm.at[pl.ds(src0, rows), :], u_s, sem_u)
    dma_v = pltpu.make_async_copy(v_hbm.at[pl.ds(src0, rows), :], v_s, sem_v)
    dma_u.start()
    dma_v.start()
    dma_u.wait()
    dma_v.wait()

    g = lax.broadcasted_iota(jnp.int32, (rows, nx), 0) + (i * R - 8)
    ix = lax.broadcasted_iota(jnp.int32, (rows, nx), 1)
    interior = (g > 0) & (g < ny - 1) & (ix > 0) & (ix < nx - 1)

    dt = dt_ref[0, 0]
    u = u_s[:]
    v = v_s[:]

    def shifts(q):
        e = _roll(q, -1, 1, interpret)
        w = _roll(q, 1, 1, interpret)
        n_ = _roll(q, -1, 0, interpret)
        s_ = _roll(q, 1, 0, interpret)
        return e, w, n_, s_

    def rhs(q):
        """ν∇²q − (u·∇)q with central differences (interior only)."""
        e, w, n_, s_ = shifts(q)
        lap = (e - 2.0 * q + w) * (1.0 / (dx * dx)) + (
            n_ - 2.0 * q + s_
        ) * (1.0 / (dy * dy))
        conv = u * (e - w) * (0.5 / dx) + v * (n_ - s_) * (0.5 / dy)
        return nu * lap - conv

    us = jnp.where(interior, u + dt * rhs(u), u)
    vs = jnp.where(interior, v + dt * rhs(v), v)
    us_ref[:] = us[8:8 + R, :]
    vs_ref[:] = vs[8:8 + R, :]


def fused_predictor_central(u, v, dt, nu: float, dx: float, dy: float,
                            rows_per_block: int = 256,
                            interpret: bool | None = None):
    """Fused central predictor: returns (u*, v*) equal to

        u + dt*(laplacian_coeff(u, dx, dy, nu) - convection_central(u,v,u))

    and the v analog, in one Pallas pass (zero-frame semantics)."""
    ny, nx = u.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # width-aware strip height: 2 scratch buffers + Mosaic-materialized
    # temporaries measure ~7.3x the (R+16, nx) block against the 16 MB
    # scoped-VMEM limit
    budget = max(24, (14 * 2**20) // (nx * 4 * 8))
    R = min(rows_per_block, max(8, (budget - 16) // 8 * 8))
    R = min(R, ny)
    n_strips = -(-ny // R)
    ny_pad = n_strips * R
    pad = ((8, ny_pad - ny + 8), (0, 0))
    u_p = jnp.pad(u, pad)
    v_p = jnp.pad(v, pad)
    dt_arr = jnp.asarray(dt, jnp.float32).reshape(1, 1)

    kernel = functools.partial(
        _kernel, R=R, ny=ny, nx=nx, nu=float(nu), dx=dx, dy=dy,
        interpret=interpret,
    )
    us, vs = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((R, nx), lambda i: (i, 0)),
            pl.BlockSpec((R, nx), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ny_pad, nx), u.dtype),
            jax.ShapeDtypeStruct((ny_pad, nx), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((R + 16, nx), u.dtype),
            pltpu.VMEM((R + 16, nx), v.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(dt_arr, u_p, v_p)
    return us[:ny], vs[:ny]
