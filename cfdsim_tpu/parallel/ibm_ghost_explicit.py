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


def moving_ghost_width_2d(delta: float, dx: float, dy: float) -> int:
    """Static halo width for the sharded moving ghost: a ghost sample
    sits within h·√2 of the surface, its probe at radius+δ along the
    normal, so the probe corner is at most δ + h·√2 + h away in index
    space (+1 for the floor)."""
    import math

    h = min(dx, dy)
    return int(math.ceil((delta + 2.5 * max(dx, dy)) / h)) + 1


def moving_ghost_forcing_2d_local(field_t, x0: float, dx: float,
                                  y0: float, dy: float, nxf: int,
                                  nyf: int, gy0, gx0, center,
                                  radius: float, delta: float, u_b,
                                  strength, py: int, px: int,
                                  width: int, sweeps: int = 2):
    """Sharded twin of ``ibm_ghost.moving_ghost_forcing_2d`` — call
    INSIDE shard_map on the trimmed owned block ``field_t``
    (ny_l, nx_l). Classification, normals and probe stencils are
    recomputed elementwise from the shard's global index offsets
    (``gy0``/``gx0`` = iy·ny_l / ix·nx_l) — no closed-over coordinate
    constants; probe corners gather from a width-``width``
    (``moving_ghost_width_2d``) halo window re-exchanged each sweep.
    ``x0``/``y0`` are the face-set sample-(0,0) coordinates, (nxf, nyf)
    the FULL face-array dims the single-device clip uses. Exact vs the
    single-device apply for bodies ≥ (width+1) samples inside the
    domain (the moving-body cases' standing assumption)."""
    from jax import lax

    from cfdsim_tpu.parallel.halo import halo_exchange

    ny_l, nx_l = field_t.shape
    cx, cy = center
    shp_e = (ny_l + 2, nx_l + 2)
    re = gy0 - 1 + lax.broadcasted_iota(jnp.int32, shp_e, 0)
    ce = gx0 - 1 + lax.broadcasted_iota(jnp.int32, shp_e, 1)
    Xe = x0 + ce.astype(jnp.float32) * dx
    Ye = y0 + re.astype(jnp.float32) * dy
    pxe, pye = Xe - cx, Ye - cy
    de = jnp.sqrt(pxe * pxe + pye * pye)
    outside_e = de > radius
    near = (outside_e[1:-1, :-2] | outside_e[1:-1, 2:]
            | outside_e[:-2, 1:-1] | outside_e[2:, 1:-1])
    inside = ~outside_e[1:-1, 1:-1]
    ghost = inside & near
    solid = inside & ~near

    d = de[1:-1, 1:-1]
    inv = 1.0 / jnp.maximum(d, 1e-12)
    qx = cx + pxe[1:-1, 1:-1] * inv * (radius + delta)
    qy = cy + pye[1:-1, 1:-1] * inv * (radius + delta)
    scale = jnp.clip((radius - d) / delta, 0.0, 1.0)

    # single-device global clip, then window re-encode (clamped lanes
    # are non-ghost samples whose gathers are never used)
    gxf = jnp.clip((qx - x0) / dx, 0.0, nxf - 1.001)
    gyf = jnp.clip((qy - y0) / dy, 0.0, nyf - 1.001)
    ixg = jnp.floor(gxf).astype(jnp.int32)
    tx = gxf - ixg
    iyg = jnp.floor(gyf).astype(jnp.int32)
    ty = gyf - iyg
    NXW = nx_l + 2 * width
    NYW = ny_l + 2 * width
    jw = jnp.clip(ixg - gx0 + width, 0, NXW - 2)
    iw = jnp.clip(iyg - gy0 + width, 0, NYW - 2)
    base = iw * NXW + jw

    def gather(Twin):
        fl = Twin.reshape(-1)
        v00 = jnp.take(fl, base, axis=0)
        v01 = jnp.take(fl, base + 1, axis=0)
        v10 = jnp.take(fl, base + NXW, axis=0)
        v11 = jnp.take(fl, base + NXW + 1, axis=0)
        return ((1.0 - ty) * ((1.0 - tx) * v00 + tx * v01)
                + ty * ((1.0 - tx) * v10 + tx * v11))

    tgt = jnp.where(solid, u_b, field_t)
    for _ in range(sweeps):
        Twin = halo_exchange(tgt, py, px, width=width)
        probe = gather(Twin)
        u_g = u_b - scale * (probe - u_b)
        tgt = jnp.where(ghost, u_g, jnp.where(solid, u_b, field_t))
    out = field_t - strength * (field_t - tgt)
    return out, field_t - out


def moving_ghost_forcing_2d_nonuniform_local(field_t, xline_e, yline_e,
                                             xs, ys, gy0, gx0, center,
                                             radius: float, delta: float,
                                             u_b, strength, py: int,
                                             px: int, width: int,
                                             sweeps: int = 2):
    """Sharded twin of ``ibm_ghost.moving_ghost_forcing_2d_nonuniform``
    on the trimmed owned block. ``xline_e``/``yline_e`` are the
    edge-padded ±1-extended sample-coordinate LINES of this face set
    ((1, nx_l+2) / (ny_l+2, 1), from the stretched tier's ``_lut``
    dynamic slices) — edge padding reproduces the single-device
    ``jnp.pad(outside, mode="edge")`` classification exactly. ``xs``/
    ``ys`` are the FULL 1D sample-coordinate vectors, passed as
    shard_map ARGS (replicated) so the searchsorted/corner gathers run
    on traced operands (gather-on-constants miscompile rules)."""
    from cfdsim_tpu.parallel.halo import halo_exchange

    ny_l, nx_l = field_t.shape
    cx, cy = center
    Xe = jnp.broadcast_to(xline_e, (ny_l + 2, nx_l + 2))
    Ye = jnp.broadcast_to(yline_e, (ny_l + 2, nx_l + 2))
    pxe, pye = Xe - cx, Ye - cy
    de = jnp.sqrt(pxe * pxe + pye * pye)
    outside_e = de > radius
    near = (outside_e[1:-1, :-2] | outside_e[1:-1, 2:]
            | outside_e[:-2, 1:-1] | outside_e[2:, 1:-1])
    inside = ~outside_e[1:-1, 1:-1]
    ghost = inside & near
    solid = inside & ~near

    d = de[1:-1, 1:-1]
    inv = 1.0 / jnp.maximum(d, 1e-12)
    qx = cx + pxe[1:-1, 1:-1] * inv * (radius + delta)
    qy = cy + pye[1:-1, 1:-1] * inv * (radius + delta)
    scale = jnp.clip((radius - d) / delta, 0.0, 1.0)

    nxf = xs.shape[0]
    nyf = ys.shape[0]
    ixg = jnp.clip(jnp.searchsorted(xs, qx, side="right") - 1, 0, nxf - 2)
    iyg = jnp.clip(jnp.searchsorted(ys, qy, side="right") - 1, 0, nyf - 2)
    x_lo = jnp.take(xs, ixg, axis=0)
    y_lo = jnp.take(ys, iyg, axis=0)
    tx = jnp.clip(
        (qx - x_lo) / (jnp.take(xs, ixg + 1, axis=0) - x_lo), 0.0, 1.0
    )
    ty = jnp.clip(
        (qy - y_lo) / (jnp.take(ys, iyg + 1, axis=0) - y_lo), 0.0, 1.0
    )
    NXW = nx_l + 2 * width
    NYW = ny_l + 2 * width
    jw = jnp.clip(ixg - gx0 + width, 0, NXW - 2)
    iw = jnp.clip(iyg - gy0 + width, 0, NYW - 2)
    base = iw * NXW + jw

    def gather(Twin):
        fl = Twin.reshape(-1)
        v00 = jnp.take(fl, base, axis=0)
        v01 = jnp.take(fl, base + 1, axis=0)
        v10 = jnp.take(fl, base + NXW, axis=0)
        v11 = jnp.take(fl, base + NXW + 1, axis=0)
        return ((1.0 - ty) * ((1.0 - tx) * v00 + tx * v01)
                + ty * ((1.0 - tx) * v10 + tx * v11))

    tgt = jnp.where(solid, u_b, field_t)
    for _ in range(sweeps):
        Twin = halo_exchange(tgt, py, px, width=width)
        probe = gather(Twin)
        u_g = u_b - scale * (probe - u_b)
        tgt = jnp.where(ghost, u_g, jnp.where(solid, u_b, field_t))
    out = field_t - strength * (field_t - tgt)
    return out, field_t - out


def moving_ghost_forcing_3d_local(field_t, origin, spacing, dims_full,
                                  gy0, gx0, center, radius: float,
                                  delta: float, u_b, strength,
                                  py: int, px: int, width: int,
                                  sweeps: int = 2):
    """Sharded twin of ``ibm_ghost.moving_ghost_forcing_3d`` on the
    trimmed (nz, ny_l, nx_l) block (z local). Same window/classification
    strategy as the 2D local apply; ``origin``/``spacing`` are the face
    set's sample-(0,0,0) coordinates and uniform spacings,
    ``dims_full = (nzf, nyf, nxf)`` the full face-array dims of the
    single-device clip."""
    from jax import lax

    from cfdsim_tpu.parallel.halo import _exchange_axis

    nz_l, ny_l, nx_l = field_t.shape
    nzf, nyf, nxf = dims_full
    x0, y0, z0 = origin
    dx, dy, dz = spacing
    cx, cy, cz = center
    shp_e = (nz_l + 2, ny_l + 2, nx_l + 2)
    ze = -1 + lax.broadcasted_iota(jnp.int32, shp_e, 0)
    re = gy0 - 1 + lax.broadcasted_iota(jnp.int32, shp_e, 1)
    ce = gx0 - 1 + lax.broadcasted_iota(jnp.int32, shp_e, 2)
    Xe = x0 + ce.astype(jnp.float32) * dx
    Ye = y0 + re.astype(jnp.float32) * dy
    Ze = z0 + ze.astype(jnp.float32) * dz
    pxe, pye, pze = Xe - cx, Ye - cy, Ze - cz
    de = jnp.sqrt(pxe * pxe + pye * pye + pze * pze)
    outside_e = de > radius
    near = (
        outside_e[1:-1, 1:-1, :-2] | outside_e[1:-1, 1:-1, 2:]
        | outside_e[1:-1, :-2, 1:-1] | outside_e[1:-1, 2:, 1:-1]
        | outside_e[:-2, 1:-1, 1:-1] | outside_e[2:, 1:-1, 1:-1]
    )
    inside = ~outside_e[1:-1, 1:-1, 1:-1]
    ghost = inside & near
    solid = inside & ~near

    d = de[1:-1, 1:-1, 1:-1]
    inv = 1.0 / jnp.maximum(d, 1e-12)
    qx = cx + pxe[1:-1, 1:-1, 1:-1] * inv * (radius + delta)
    qy = cy + pye[1:-1, 1:-1, 1:-1] * inv * (radius + delta)
    qz = cz + pze[1:-1, 1:-1, 1:-1] * inv * (radius + delta)
    scale = jnp.clip((radius - d) / delta, 0.0, 1.0)

    gxf = jnp.clip((qx - x0) / dx, 0.0, nxf - 1.001)
    gyf = jnp.clip((qy - y0) / dy, 0.0, nyf - 1.001)
    gzf = jnp.clip((qz - z0) / dz, 0.0, nzf - 1.001)
    ixg = jnp.floor(gxf).astype(jnp.int32)
    tx = gxf - ixg
    iyg = jnp.floor(gyf).astype(jnp.int32)
    ty = gyf - iyg
    izg = jnp.floor(gzf).astype(jnp.int32)
    tz = gzf - izg
    NXW = nx_l + 2 * width
    NYW = ny_l + 2 * width
    jw = jnp.clip(ixg - gx0 + width, 0, NXW - 2)
    iw = jnp.clip(iyg - gy0 + width, 0, NYW - 2)
    kw = jnp.clip(izg, 0, nz_l - 2)  # z local: window = global
    base = (kw * NYW + iw) * NXW + jw
    sy, sz = NXW, NYW * NXW

    def gather(Twin):
        fl = Twin.reshape(-1)

        def plane(b):
            return (
                (1.0 - ty) * ((1.0 - tx) * jnp.take(fl, b, axis=0)
                              + tx * jnp.take(fl, b + 1, axis=0))
                + ty * ((1.0 - tx) * jnp.take(fl, b + sy, axis=0)
                        + tx * jnp.take(fl, b + sy + 1, axis=0))
            )

        return (1.0 - tz) * plane(base) + tz * plane(base + sz)

    tgt = jnp.where(solid, u_b, field_t)
    for _ in range(sweeps):
        lo, hi = _exchange_axis(tgt, "y", py, axis=1, width=width)
        Twin = jnp.concatenate([lo, tgt, hi], axis=1)
        lo, hi = _exchange_axis(Twin, "x", px, axis=2, width=width)
        Twin = jnp.concatenate([lo, Twin, hi], axis=2)
        probe = gather(Twin)
        u_g = u_b - scale * (probe - u_b)
        tgt = jnp.where(ghost, u_g, jnp.where(solid, u_b, field_t))
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
    "moving_ghost_width_2d",
    "moving_ghost_forcing_2d_local",
    "moving_ghost_forcing_2d_nonuniform_local",
    "moving_ghost_forcing_3d_local",
]
