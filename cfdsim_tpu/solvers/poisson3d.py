"""3D pressure-Poisson solvers: red-black SOR, geometric multigrid, DCT.

Extension of ``solvers.poisson`` to (nz, ny, nx) fields for the 3D cavity
(BASELINE.json config 5: 256³ with geometric-multigrid Poisson). Same
clamped-edge Neumann convention — every node is an unknown, ghost = edge —
so the operator coarsens cleanly (2×2×2 averaging) and is diagonalized by
a 3D DCT-II.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from cfdsim_tpu.solvers.poisson import (
    _dct3d_rfftn,
    _dct_fwd,
    _dct_inv,
    _idct3d_rfftn,
)


@dataclasses.dataclass(frozen=True)
class Poisson3DConfig:
    method: str = "mg"  # rbsor | mg | dct
    iters: int = 2
    omega: float = 1.5
    mg_pre: int = 2
    mg_post: int = 2
    mg_coarse: int = 20
    mg_min_size: int = 4
    # exact-DCT backend: "rfftn" = single real 3D FFT (2D-Makhoul
    # generalized — one composed rfft2+fft pair instead of six per-axis
    # transforms; round-3 chip measurement: 1.55 -> 0.52 ms per 128³
    # solve, 3.0x), "rfft" = per-axis transforms.  "rfftn" needs even
    # sizes on all axes and falls back per-axis otherwise.  Both exact,
    # same nullspace convention.
    dct_variant: str = "rfftn"


def _nb_sum(phi, ax: float, ay: float, az: float):
    """Clamped-edge neighbor sum in 3D (ghost = edge value)."""
    p = jnp.pad(phi, 1, mode="edge")
    return (
        ax * (p[1:-1, 1:-1, 2:] + p[1:-1, 1:-1, :-2])
        + ay * (p[1:-1, 2:, 1:-1] + p[1:-1, :-2, 1:-1])
        + az * (p[2:, 1:-1, 1:-1] + p[:-2, 1:-1, 1:-1])
    )


def lap_neumann_3d(phi, dx: float, dy: float, dz: float):
    ax, ay, az = 1.0 / dx**2, 1.0 / dy**2, 1.0 / dz**2
    return _nb_sum(phi, ax, ay, az) - 2.0 * (ax + ay + az) * phi


def _parity_mask(shape):
    nz, ny, nx = shape
    g = (
        np.add.outer(np.add.outer(np.arange(nz), np.arange(ny)), np.arange(nx))
        % 2
    )
    return jnp.asarray(g == 0)


def _sweep(phi, rhs, dx, dy, dz, colors, omega):
    ax, ay, az = 1.0 / dx**2, 1.0 / dy**2, 1.0 / dz**2
    denom_inv = 1.0 / (2.0 * (ax + ay + az))
    for color in colors:
        star = (_nb_sum(phi, ax, ay, az) - rhs) * denom_inv
        phi = jnp.where(color, (1.0 - omega) * phi + omega * star, phi)
    return phi


def _restrict(r):
    nz, ny, nx = r.shape
    return r.reshape(nz // 2, 2, ny // 2, 2, nx // 2, 2).mean(axis=(1, 3, 5))


def _prolong_axis(e, axis: int):
    n = e.shape[axis]
    first = jax.lax.slice_in_dim(e, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(e, n - 1, n, axis=axis)
    lo = jnp.concatenate([first, jax.lax.slice_in_dim(e, 0, n - 1, axis=axis)], axis=axis)
    hi = jnp.concatenate([jax.lax.slice_in_dim(e, 1, n, axis=axis), last], axis=axis)
    a = 0.75 * e + 0.25 * lo
    b = 0.75 * e + 0.25 * hi
    st = jnp.stack([a, b], axis=axis + 1)
    shape = list(e.shape)
    shape[axis] *= 2
    return st.reshape(shape)


def _prolong(e):
    return _prolong_axis(_prolong_axis(_prolong_axis(e, 0), 1), 2)


def _level_shapes(shape, min_size):
    shapes = [tuple(shape)]
    nz, ny, nx = shape
    while (
        nz % 2 == 0 and ny % 2 == 0 and nx % 2 == 0
        and min(nz, ny, nx) // 2 >= min_size
    ):
        nz, ny, nx = nz // 2, ny // 2, nx // 2
        shapes.append((nz, ny, nx))
    return shapes


def _vcycle(phi, rhs, d, cfg: Poisson3DConfig, masks, level, n_levels):
    dx, dy, dz = d
    colors = masks[level]
    sweep = partial(_sweep, rhs=rhs, dx=dx, dy=dy, dz=dz, colors=colors, omega=1.0)
    for _ in range(cfg.mg_pre):
        phi = sweep(phi)
    if level == n_levels - 1:
        return jax.lax.fori_loop(0, cfg.mg_coarse, lambda _, p: sweep(p), phi)
    r = rhs - lap_neumann_3d(phi, dx, dy, dz)
    e_c = jnp.zeros_like(r[::2, ::2, ::2])
    e_c = _vcycle(
        e_c, _restrict(r), (2 * dx, 2 * dy, 2 * dz), cfg, masks, level + 1, n_levels
    )
    phi = phi + _prolong(e_c)
    for _ in range(cfg.mg_post):
        phi = sweep(phi)
    return phi


def solve_poisson_3d(
    phi0, rhs, dx: float, dy: float, dz: float,
    cfg: Poisson3DConfig = Poisson3DConfig(),
):
    if cfg.method == "dct":
        nz, ny, nx = rhs.shape
        # cancellation-safe −4sin²(πk/2n) form of 2cos(πk/n)−2: fp32 cos
        # near 1 loses most of the low-mode eigenvalues at large n, fp32
        # sin near 0 loses nothing (see poisson._inv_neumann_eigenvalues)
        def _ax(n_):
            s = jnp.sin((jnp.pi / (2 * n_)) * jnp.arange(n_, dtype=jnp.float32))
            return -4.0 * s * s

        lam = (
            _ax(nz)[:, None, None] / dz**2
            + _ax(ny)[None, :, None] / dy**2
            + _ax(nx)[None, None, :] / dx**2
        )
        lam = lam.at[0, 0, 0].set(1.0)
        ilam = (1.0 / lam).at[0, 0, 0].set(0.0)
        if (getattr(cfg, "dct_variant", "rfftn") == "rfftn"
                and nz % 2 == 0 and ny % 2 == 0 and nx % 2 == 0):
            # single-3D-FFT Makhoul path: one rfftn + one irfftn total
            return _idct3d_rfftn(_dct3d_rfftn(rhs), scale=ilam).astype(
                rhs.dtype)
        rhs_hat = _dct_fwd(_dct_fwd(_dct_fwd(rhs, 0), 1), 2)
        phi_hat = rhs_hat * ilam
        return _dct_inv(_dct_inv(_dct_inv(phi_hat, 2), 1), 0).astype(rhs.dtype)

    if cfg.method == "mg":
        shapes = _level_shapes(phi0.shape, cfg.mg_min_size)
        masks = []
        for s in shapes:
            red = _parity_mask(s)
            masks.append((red, jnp.logical_not(red)))

        def cycle(_, p):
            return _vcycle(p, rhs, (dx, dy, dz), cfg, masks, 0, len(shapes))

        return jax.lax.fori_loop(0, cfg.iters, cycle, phi0)

    if cfg.method == "rbsor":
        red = _parity_mask(phi0.shape)
        colors = (red, jnp.logical_not(red))
        sweep = partial(
            _sweep, rhs=rhs, dx=dx, dy=dy, dz=dz, colors=colors, omega=cfg.omega
        )
        return jax.lax.fori_loop(0, cfg.iters, lambda _, p: sweep(p), phi0)

    raise ValueError(f"unknown 3D poisson method {cfg.method!r}")


def residual_3d(phi, rhs, dx, dy, dz):
    return jnp.max(jnp.abs(lap_neumann_3d(phi, dx, dy, dz) - rhs))
