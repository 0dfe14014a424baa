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


def _blocked_kernel(phi_hbm, rhs_hbm, out_ref, phi_s, rhs_s, sem_p, sem_r,
                    *, R, K, H, ny, nx, omega, ax, ay, interpret):
    """One strip of the grid-blocked kernel: DMA (R + 2H) rows (strip +
    halos) from the padded HBM arrays into VMEM, run K full red-black
    sweeps on-chip, write back the R center rows. H = 2K halo rows per
    side make the K blocked sweeps EXACTLY equal to K global sweeps (each
    full red-black sweep consumes two halo layers: red reads old black,
    black reads fresh red)."""
    i = pl.program_id(0)
    src0 = i * R  # padded row of the first halo row (strip starts at +H...
    # padded layout: pad rows [0, H) below, true rows at [H, H+ny_pad)
    dma_p = pltpu.make_async_copy(
        phi_hbm.at[pl.ds(src0, R + 2 * H), :], phi_s, sem_p
    )
    dma_r = pltpu.make_async_copy(
        rhs_hbm.at[pl.ds(src0, R + 2 * H), :], rhs_s, sem_r
    )
    dma_p.start()
    dma_r.start()
    dma_p.wait()
    dma_r.wait()

    rows = R + 2 * H
    # true (unpadded) row index of each local row: g = i*R - H + r
    g = lax.broadcasted_iota(jnp.int32, (rows, nx), 0) + (i * R - H)
    ix = lax.broadcasted_iota(jnp.int32, (rows, nx), 1)
    valid = (g >= 0) & (g < ny)
    red_m = (((g + ix) % 2) == 0) & valid
    black_m = (((g + ix) % 2) == 1) & valid
    s_edge = g == 0
    n_edge = g == ny - 1
    w_edge = ix == 0
    e_edge = ix == nx - 1

    denom_inv = 1.0 / (2.0 * (ax + ay))
    rhs_v = rhs_s[:]

    def nbsum(p):
        def nb(shift, axis, edge):
            q = _roll(p, shift, axis, interpret)
            return jnp.where(edge, p, q)  # clamped edge (Neumann)

        acc = nb(-1, 1, e_edge)
        acc = acc + nb(1, 1, w_edge)
        acc = acc * ax
        acc = acc + ay * nb(-1, 0, n_edge)
        acc = acc + ay * nb(1, 0, s_edge)
        return acc

    def half(p, color):
        star = (nbsum(p) - rhs_v) * denom_inv
        return jnp.where(color, (1.0 - omega) * p + omega * star, p)

    def sweep(_, p):
        return half(half(p, red_m), black_m)

    out_ref[:] = lax.fori_loop(0, K, sweep, phi_s[:])[H:H + R, :]


def rbsor_pallas_blocked(
    phi0,
    rhs,
    dx: float,
    dy: float,
    iters: int = 100,
    omega: float = 1.7,
    rows_per_block: int | None = None,
    sweeps_per_pass: int = 8,
    interpret: bool | None = None,
):
    """Grid-blocked red-black SOR for arrays beyond the single-block VMEM
    budget: the domain is cut into full-width row strips; each strip (plus
    2·K halo rows per side) is DMA'd to VMEM, swept K times on-chip, and
    written back — K sweeps per HBM pass instead of the streaming path's
    per-half-sweep round trip, cutting pressure-solve HBM traffic ~K×.

    Neumann (clamped-edge) BCs only; exactly equivalent to ``iters``
    global red-black sweeps (the 2K halos cover each sweep's dependence
    cone). The trailing ``iters % K`` sweeps run as one smaller pass.
    ``rows_per_block=None`` auto-sizes the strip so the working set
    (~8× the block, the compiler's scoped-VMEM estimate) fits VMEM."""
    ny, nx = phi0.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ax = 1.0 / (dx * dx)
    ay = 1.0 / (dy * dy)
    if rows_per_block is None:
        # measured scoped-VMEM factor ≈ 11× the (R+4K, nx) block (2 scratch
        # buffers + loop temporaries + hoisted masks); stay under the 16 MB
        # scoped limit with margin
        budget_rows = max(16, (15 * 2**20) // (nx * 4 * 11))
        sweeps_per_pass = max(1, min(sweeps_per_pass, (budget_rows - 8) // 4))
        rows_per_block = max(8, (budget_rows - 4 * sweeps_per_pass) // 8 * 8)
    R = min(rows_per_block, ny)
    n_strips = -(-ny // R)
    ny_pad = n_strips * R

    def passes(phi, K, n_passes):
        H = 2 * K
        # padded layout: H dead rows below, ny_pad - ny + H dead rows above.
        # Dead rows are never READ from valid rows (the edge clamp redirects
        # g==0 / g==ny-1 neighbor reads), so their content is irrelevant.
        pad_lo = H
        pad_hi = ny_pad - ny + H
        rhs_p = jnp.pad(rhs, ((pad_lo, pad_hi), (0, 0)))
        kernel = functools.partial(
            _blocked_kernel, R=R, K=K, H=H, ny=ny, nx=nx, omega=omega,
            ax=ax, ay=ay, interpret=interpret,
        )
        call = pl.pallas_call(
            kernel,
            grid=(n_strips,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((R, nx), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ny_pad, nx), phi0.dtype),
            scratch_shapes=[
                pltpu.VMEM((R + 2 * H, nx), phi0.dtype),
                pltpu.VMEM((R + 2 * H, nx), phi0.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )

        def one(_, p):
            p_pad = jnp.pad(p, ((pad_lo, pad_hi), (0, 0)))
            out = call(p_pad, rhs_p)
            return out[:ny, :]

        return lax.fori_loop(0, n_passes, one, phi)

    K = min(sweeps_per_pass, iters)
    phi = passes(phi0, K, iters // K)
    if iters % K:
        phi = passes(phi, iters % K, 1)
    return phi


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

    Arrays beyond the single-block VMEM budget route to the grid-blocked
    strip kernel (``rbsor_pallas_blocked``) when its constraints hold
    (Neumann, unmasked), else to the streaming jnp implementation."""
    if phi0.size > MAX_ELEMS:
        if bc == "neumann" and solid_mask is None:
            return rbsor_pallas_blocked(
                phi0, rhs, dx, dy, iters=iters, omega=omega,
                interpret=interpret,
            )
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
