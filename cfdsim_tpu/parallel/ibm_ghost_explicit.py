"""Sharded ghost-cell direct-forcing IBM — tables as shard_map args.

The sharp-interface wall treatment (cfdsim_tpu/ibm_ghost.py — the one
that cut the Re=3900 sphere LES drag error from +23% to +7.2% vs DNS)
was single-device only: its probe stencils are host-precomputed gather
tables, and gathers on CLOSED-OVER CONSTANTS inside shard_map
miscompile on this backend (CLAUDE.md "SECOND backend bug"). The fix
is the proven fem_explicit pattern: partition the tables per shard on
the host and pass them as shard_map *arguments* — gathers on traced
args compile correctly.

Layout: each shard owns a (nz, ny_l, nx_l) block of the trimmed face
arrays. A ghost face belongs to the shard that owns it; its trilinear
probe corners may poke into neighbor blocks, so each Jacobi sweep
gathers from a width-``W`` halo-padded window (``W`` measured at
partition time from the actual index excursions — δ = 1.5·h_min keeps
it at 2–4). Probe indices are re-encoded as flat offsets into that
padded window; per-shard ghost counts are padded to the max with
out-of-bounds scatter sentinels (XLA drops OOB scatter updates), so
every shard runs the same static program.

Exactness vs the single-device ``apply_ghost_forcing``: sweep 1
gathers from the solid-zeroed field (identical everywhere); each later
sweep re-exchanges halos, so neighbor ghost writes are visible exactly
as in the global array. Equality tests: tests/test_ghost_explicit.py.

Reference anchor: the ghost/halo layout of cavity_flow_v1.py:258-262
extended inter-chip, applied to the immersed boundary instead of the
domain boundary.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from cfdsim_tpu.ibm_ghost import GhostFaceSet, GhostIBM3D
from cfdsim_tpu.parallel.halo import _exchange_axis

_OOB = np.int32(1 << 20)  # scatter sentinel: XLA drops OOB scatter updates


class ShardedGhostSet(NamedTuple):
    """Per-shard ghost tables for ONE staggered component.

    solid: (nz, ny, nx) bool — the trimmed dense interior mask, sharded
        P(None, "y", "x") like the face arrays.
    g: (py, px, M, 3) int32 — (z, local-y, local-x) of each owned ghost
        face; padding rows hold the OOB sentinel (scatter drops them).
    pidx: (py, px, M, 8) int32 — flat probe-corner indices into the
        width-W halo-padded local window (nz, ny_l+2W, nx_l+2W).
    pw: (py, px, M, 8) f32 trilinear weights (0 on padding rows).
    scale: (py, px, M) f32 reflection factors (0 on padding rows).
    """

    solid: jnp.ndarray
    g: jnp.ndarray
    pidx: jnp.ndarray
    pw: jnp.ndarray
    scale: jnp.ndarray


class ShardedGhostIBM3D(NamedTuple):
    u: ShardedGhostSet
    v: ShardedGhostSet
    w: ShardedGhostSet


def _excursion(gs: GhostFaceSet, full_dims, py: int, px: int,
               ny_l: int, nx_l: int) -> int:
    """Max probe-corner index excursion beyond the owning shard's block
    (the halo width the apply needs)."""
    nzf, nyf, nxf = full_dims
    gy = np.asarray(gs.gy)
    gx = np.asarray(gs.gx)
    if gy.size == 0:
        return 0
    pidx = np.asarray(gs.pidx)
    rem = pidx % (nyf * nxf)
    j = rem // nxf
    i = rem % nxf
    sy = gy // ny_l
    sx = gx // nx_l
    y0 = (sy * ny_l)[:, None]
    x0 = (sx * nx_l)[:, None]
    exc = max(
        int(np.max(y0 - j, initial=0)),
        int(np.max(j - (y0 + ny_l - 1), initial=0)),
        int(np.max(x0 - i, initial=0)),
        int(np.max(i - (x0 + nx_l - 1), initial=0)),
    )
    return max(exc, 0)


def _partition_set(gs: GhostFaceSet, full_dims, trim, py: int, px: int,
                   width: int) -> ShardedGhostSet:
    """Split one component's global ghost tables into per-shard tables.

    ``full_dims`` are the dims of the component's FULL face array (the
    one the global ``pidx`` flat indices address); ``trim`` says how
    many trailing faces the trimmed sharded representation drops per
    axis (u: (0,0,1), v: (0,1,0), w: (1,0,0), cell-centered: zeros).
    """
    nzf, nyf, nxf = full_dims
    tz, ty, tx = trim
    nz, ny, nx = nzf - tz, nyf - ty, nxf - tx
    ny_l, nx_l = ny // py, nx // px
    if ny % py or nx % px:
        raise ValueError(f"grid {ny}x{nx} not divisible by mesh {py}x{px}")

    solid = np.asarray(gs.solid)
    gz = np.asarray(gs.gz)
    gy = np.asarray(gs.gy)
    gx = np.asarray(gs.gx)
    pidx = np.asarray(gs.pidx)
    pw = np.asarray(gs.pw)
    scale = np.asarray(gs.scale)

    # the body must be interior: nothing on the dropped boundary faces
    if tz and (solid[-1].any() or (gz >= nz).any()):
        raise ValueError("ghost IBM body touches the dropped z boundary face")
    if ty and (solid[:, -1].any() or (gy >= ny).any()):
        raise ValueError("ghost IBM body touches the dropped y boundary face")
    if tx and (solid[:, :, -1].any() or (gx >= nx).any()):
        raise ValueError("ghost IBM body touches the dropped x boundary face")
    solid_t = solid[: nz, : ny, : nx]

    # decode global probe corners
    k = pidx // (nyf * nxf)
    rem = pidx % (nyf * nxf)
    j = rem // nxf
    i = rem % nxf
    live = pw != 0.0
    if (live & ((k >= nz) | (j >= ny) | (i >= nx))).any():
        raise ValueError(
            "ghost IBM probe corner lands on a dropped boundary face; "
            "the body must be interior to the domain"
        )

    sy = gy // ny_l
    sx = gx // nx_l
    jj = j - (sy * ny_l)[:, None] + width
    ii = i - (sx * nx_l)[:, None] + width
    # dead corners (pw == 0) may decode anywhere; clamp them in-window
    jj = np.where(live, jj, np.clip(jj, 0, ny_l + 2 * width - 1))
    ii = np.where(live, ii, np.clip(ii, 0, nx_l + 2 * width - 1))
    if (live & ((jj < 0) | (jj >= ny_l + 2 * width)
                | (ii < 0) | (ii >= nx_l + 2 * width))).any():
        raise ValueError(
            f"probe corner exceeds halo width {width}; "
            "partition_ghost_ibm3d should have sized it — bug"
        )
    p_local = (k * (ny_l + 2 * width) + jj) * (nx_l + 2 * width) + ii

    shard_of = sy * px + sx
    counts = np.bincount(shard_of, minlength=py * px) if gz.size else \
        np.zeros(py * px, np.int64)
    m_max = max(int(counts.max()) if counts.size else 0, 1)

    g_t = np.full((py * px, m_max, 3), _OOB, np.int32)
    pidx_t = np.zeros((py * px, m_max, 8), np.int32)
    pw_t = np.zeros((py * px, m_max, 8), np.float32)
    scale_t = np.zeros((py * px, m_max), np.float32)
    for s in range(py * px):
        rows = np.nonzero(shard_of == s)[0]
        m = rows.size
        if m == 0:
            continue
        g_t[s, :m, 0] = gz[rows]
        g_t[s, :m, 1] = gy[rows] - (s // px) * ny_l
        g_t[s, :m, 2] = gx[rows] - (s % px) * nx_l
        pidx_t[s, :m] = p_local[rows]
        pw_t[s, :m] = pw[rows]
        scale_t[s, :m] = scale[rows]

    return ShardedGhostSet(
        solid=jnp.asarray(solid_t, jnp.bool_),
        g=jnp.asarray(g_t.reshape(py, px, m_max, 3)),
        pidx=jnp.asarray(pidx_t.reshape(py, px, m_max, 8)),
        pw=jnp.asarray(pw_t.reshape(py, px, m_max, 8)),
        scale=jnp.asarray(scale_t.reshape(py, px, m_max)),
    )


def partition_ghost_ibm3d(ibm: GhostIBM3D, nx: int, ny: int, nz: int,
                          py: int, px: int,
                          extra: GhostFaceSet | None = None):
    """Partition a host-built ``GhostIBM3D`` (sphere_ghost_ibm) for a
    (py, px) mesh over the trimmed (nz, ny, nx) representation.

    Returns ``(tables, width)``: the per-shard tables (pass as a
    shard_map argument) and the measured static halo width. ``extra``
    optionally partitions a cell-centered set (sphere_ghost_cells — the
    θ habitat) with the same width; it is returned as a fourth element.
    """
    ny_l, nx_l = ny // py, nx // px
    dims_u = (nz, ny, nx + 1)
    dims_v = (nz, ny + 1, nx)
    dims_w = (nz + 1, ny, nx)
    dims_c = (nz, ny, nx)
    width = max(
        _excursion(ibm.u, dims_u, py, px, ny_l, nx_l),
        _excursion(ibm.v, dims_v, py, px, ny_l, nx_l),
        _excursion(ibm.w, dims_w, py, px, ny_l, nx_l),
        _excursion(extra, dims_c, py, px, ny_l, nx_l) if extra is not None
        else 0,
        1,
    )
    if width > min(ny_l, nx_l):
        raise ValueError(
            f"ghost probe stencils need halo width {width} > local block "
            f"{ny_l}x{nx_l}; use a coarser mesh or finer grid"
        )
    tables = ShardedGhostIBM3D(
        u=_partition_set(ibm.u, dims_u, (0, 0, 1), py, px, width),
        v=_partition_set(ibm.v, dims_v, (0, 1, 0), py, px, width),
        w=_partition_set(ibm.w, dims_w, (1, 0, 0), py, px, width),
    )
    if extra is not None:
        extra_t = _partition_set(extra, dims_c, (0, 0, 0), py, px, width)
        return tables, width, extra_t
    return tables, width


def ghost_set_spec():
    """shard_map PartitionSpec pytree for one ShardedGhostSet."""
    from jax.sharding import PartitionSpec as P

    return ShardedGhostSet(
        solid=P(None, "y", "x"), g=P("y", "x"), pidx=P("y", "x"),
        pw=P("y", "x"), scale=P("y", "x"),
    )


def ghost_ibm_spec():
    return ShardedGhostIBM3D(
        u=ghost_set_spec(), v=ghost_set_spec(), w=ghost_set_spec()
    )


def shard_ghost_tables(tables, mesh):
    """device_put per-shard tables with the matching NamedSharding."""
    import jax
    from jax.sharding import NamedSharding

    def place(spec, x):
        return jax.device_put(x, NamedSharding(mesh, spec))

    spec = (ghost_ibm_spec() if isinstance(tables, ShardedGhostIBM3D)
            else ghost_set_spec())
    return jax.tree_util.tree_map(place, spec, tables)


def _halo_yx_w(block, py: int, px: int, w: int):
    lo, hi = _exchange_axis(block, "y", py, axis=1, width=w)
    block = jnp.concatenate([lo, block, hi], axis=1)
    lo, hi = _exchange_axis(block, "x", px, axis=2, width=w)
    return jnp.concatenate([lo, block, hi], axis=2)


def apply_ghost_forcing_local(field_t, gs: ShardedGhostSet, py: int,
                              px: int, width: int, strength,
                              sweeps: int = 2):
    """Sharded twin of ``ibm_ghost.apply_ghost_forcing`` — call INSIDE
    shard_map with the local table leaves (leading (1, 1) mesh axes).
    Returns (field_out, du) exactly matching the single-device apply on
    the corresponding global array."""
    g = gs.g.reshape(-1, 3)
    pidx = gs.pidx.reshape(-1, 8)
    pw = gs.pw.reshape(-1, 8)
    scale = gs.scale.reshape(-1)
    solid = gs.solid
    tgt = jnp.where(solid, jnp.float32(0.0), field_t)
    for _ in range(sweeps):
        T = _halo_yx_w(tgt, py, px, width)
        probe = jnp.sum(jnp.take(T.reshape(-1), pidx, axis=0) * pw, axis=-1)
        tgt = tgt.at[g[:, 0], g[:, 1], g[:, 2]].set(-scale * probe)
    out = field_t - strength * (field_t - tgt)
    return out, field_t - out


__all__ = [
    "ShardedGhostSet",
    "ShardedGhostIBM3D",
    "partition_ghost_ibm3d",
    "ghost_set_spec",
    "ghost_ibm_spec",
    "shard_ghost_tables",
    "apply_ghost_forcing_local",
]
