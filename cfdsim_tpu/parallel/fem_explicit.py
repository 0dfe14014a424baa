"""Multi-chip unstructured FEM: element-partitioned assembly.

The natural SPMD decomposition for matrix-free FEM on a device mesh is
element data-parallelism: each chip owns a contiguous slice of the
element tables (DOF maps, gradients, quadrature weights), computes its
partial gather→einsum→``segment_sum`` assembly into a full-length DOF
vector, and one ``psum`` over the mesh axis produces the replicated
global result — the unstructured analog of the halo-exchange stencil
steps in ``parallel/mac_explicit.py``. DOF vectors stay replicated
(they are ~1000× smaller than the element tables), so GMRES runs
bit-identically on every device with one collective per operator
application.

Implementation notes for this backend (CLAUDE.md "second backend bug"):
the element tables are passed as shard_map *arguments*, never closed
over — gathers on closed-over constants inside shard_map miscompile on
the pinned XLA CPU build. Element counts are padded to a multiple of
the mesh size with zero-weight elements (wq=0 ⇒ zero contribution).

Parity: distributes the same weak form as models/fem.py (reference
v2.jl:202-215); the reference family itself has no distributed solve —
its only parallelism is pmap'd viz sampling (v2.jl:22-24, :286).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cfdsim_tpu.fem.assembly import ElementOps
from cfdsim_tpu.models.fem import (
    FEMConfig,
    FEMState,
    _gmres,
    _relres,
    _tau,
    apply_mass_u,
)
from cfdsim_tpu.models.incompressible import StepMetrics


class ShardedTables(NamedTuple):
    """Element tables padded to a multiple of the mesh size (leading
    axis is sharded; everything is a shard_map argument)."""

    elem_u: jax.Array
    elem_p: jax.Array
    Gu: jax.Array
    Gp: jax.Array
    wq: jax.Array
    tau: jax.Array  # per-element stabilization, 0 where off/padded


def _pad_tables(ops: ElementOps, tau, n_dev: int) -> ShardedTables:
    nt = ops.elem_u.shape[0]
    pad = (-nt) % n_dev
    if tau is None:
        tau = jnp.zeros((nt,), dtype=ops.wq.dtype)

    def padded(a, fill=0):
        if pad == 0:
            return a
        width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, width, constant_values=fill)

    return ShardedTables(
        elem_u=padded(ops.elem_u),
        elem_p=padded(ops.elem_p),
        Gu=padded(ops.Gu),
        Gp=padded(ops.Gp),
        wq=padded(ops.wq),  # zero weights ⇒ padded elements contribute 0
        tau=padded(tau),
    )


def _local_apply(ops, tab, u, p, nu, inv_dt, adv_u, axis):
    """Per-device block application on the local element slice, psum'd
    to the replicated global residual (runs inside shard_map)."""
    ue = u[tab.elem_u]
    pe = p[tab.elem_p]
    gu = jnp.einsum("eqlc,eld->eqdc", tab.Gu, ue)
    pq = jnp.einsum("ql,el->eq", ops.Np, pe)
    divu = gu[..., 0, 0] + gu[..., 1, 1]

    ru = nu * jnp.einsum("eq,eqlc,eqdc->eld", tab.wq, tab.Gu, gu)
    if inv_dt is not None:
        uq = jnp.einsum("ql,eld->eqd", ops.Nu, ue)
        ru = ru + inv_dt * jnp.einsum("eq,ql,eqd->eld", tab.wq, ops.Nu, uq)
    if adv_u is not None:
        aq = jnp.einsum("ql,eld->eqd", ops.Nu, adv_u[tab.elem_u])
        conv = jnp.einsum("eqc,eqdc->eqd", aq, gu)
        ru = ru + jnp.einsum("eq,ql,eqd->eld", tab.wq, ops.Nu, conv)
    ru = ru - jnp.einsum("eq,eqld,eq->eld", tab.wq, tab.Gu, pq)

    rp = jnp.einsum("eq,ql,eq->el", tab.wq, ops.Np, divu)
    gp = jnp.einsum("eqlc,el->eqc", tab.Gp, pe)
    rp = rp + jnp.einsum("e,eq,eqlc,eqc->el", tab.tau, tab.wq, tab.Gp, gp)

    yu = jax.ops.segment_sum(
        ru.reshape(-1, 2), tab.elem_u.reshape(-1), num_segments=ops.n_u
    )
    yp = jax.ops.segment_sum(
        rp.reshape(-1), tab.elem_p.reshape(-1), num_segments=ops.n_p
    )
    return jax.lax.psum(yu, axis), jax.lax.psum(yp, axis)


def make_sharded_ns_apply(
    ops: ElementOps,
    mesh: Mesh,
    cfg: FEMConfig,
    axis: str = "x",
):
    """Build ``apply(u, p, inv_dt, adv_u) -> (yu, yp)`` with element-
    sharded assembly over ``mesh`` (replicated in/out DOF vectors)."""
    n_dev = mesh.shape[axis]
    tab = _pad_tables(ops, _tau(ops, cfg), n_dev)
    sharded = P(axis)
    rep = P()
    tab_specs = ShardedTables(*(sharded for _ in tab))

    smapped_t = shard_map(  # transient: mass + convection present
        lambda tb, u, p, nu, idt, au: _local_apply(
            ops, tb, u, p, nu, idt, au, axis
        ),
        mesh=mesh,
        in_specs=(tab_specs, rep, rep, rep, rep, rep),
        out_specs=(rep, rep),
        check_rep=False,
    )
    smapped_s = shard_map(  # steady Stokes: no mass, no convection
        lambda tb, u, p, nu: _local_apply(
            ops, tb, u, p, nu, None, None, axis
        ),
        mesh=mesh,
        in_specs=(tab_specs, rep, rep, rep),
        out_specs=(rep, rep),
        check_rep=False,
    )

    def apply(u, p, inv_dt=None, adv_u=None, nu=None):
        # ``nu`` override supports the θ-scheme's scaled calls
        # (models/fem.py: θ(νK+C(ū))u = (θν)Ku + C(θū)u)
        nu = jnp.asarray(cfg.nu if nu is None else nu, dtype=ops.Nu.dtype)
        if adv_u is None and inv_dt is None:
            return smapped_s(tab, u, p, nu)
        return smapped_t(tab, u, p, nu, jnp.asarray(inv_dt), adv_u)

    return apply


def make_step(
    ops: ElementOps,
    cfg: FEMConfig,
    g,
    mesh: Mesh,
    axis: str = "x",
    force_nodes=None,
):
    """Sharded-assembly counterpart of models.fem.make_step — identical
    math (exact-equality-tested), one psum per operator application."""
    from cfdsim_tpu.models.fem import _preconditioner

    g = jnp.asarray(g)
    apply_sharded = make_sharded_ns_apply(ops, mesh, cfg, axis)
    tau = _tau(ops, cfg)
    dm = ops.dir_mask[:, None]
    fmask = None
    if force_nodes is not None and len(force_nodes) > 0:
        fmask = jnp.zeros((ops.n_u,)).at[jnp.asarray(force_nodes)].set(1.0)

    th = float(cfg.theta)

    def step(state: FEMState, cfl_scale=1.0):
        dt = cfg.dt * cfl_scale
        inv_dt = 1.0 / dt
        u_prev, p_prev = state.u, state.p

        def A(x):
            # θ-weighted implicit operator (see models/fem.py)
            u, p = x
            yu, yp = apply_sharded(
                u, p, inv_dt, th * u_prev, nu=th * cfg.nu
            )
            return (jnp.where(dm, u, yu), yp)

        rhs_u = inv_dt * apply_mass_u(ops, u_prev)
        if th != 1.0:
            yu_e, _ = apply_sharded(
                u_prev, jnp.zeros((ops.n_p,), dtype=u_prev.dtype),
                inv_dt=0.0, adv_u=(1.0 - th) * u_prev,
                nu=(1.0 - th) * cfg.nu,
            )
            rhs_u = rhs_u - yu_e
        bu = jnp.where(dm, g, rhs_u)
        b = (bu, jnp.zeros((ops.n_p,), dtype=bu.dtype))
        M = _preconditioner(ops, cfg, inv_dt, tau)
        u, p = _gmres(A, b, (u_prev, p_prev), M, cfg)

        relres = _relres(A, (u, p), b)
        finite = jnp.isfinite(jnp.sum(u)) & jnp.isfinite(jnp.sum(p))
        ok = finite & (relres < cfg.accept_relres)
        u = jnp.where(ok, u, u_prev)
        p = jnp.where(ok, p, p_prev)

        from cfdsim_tpu.fem.assembly import interpolate_u, l2_norm

        uq, gu = interpolate_u(ops, u)
        div_l2 = l2_norm(ops, gu[..., 0, 0] + gu[..., 1, 1])
        vort = gu[..., 1, 0] - gu[..., 0, 1]
        area = jnp.sum(ops.wq)
        energy = 0.5 * jnp.sum(ops.wq * jnp.sum(uq * uq, axis=-1)) / area
        max_vel = jnp.sqrt(jnp.max(jnp.sum(uq * uq, axis=-1)))

        fx = jnp.float32(0.0)
        fy = jnp.float32(0.0)
        if fmask is not None:
            yu, _ = apply_sharded(
                u, p, inv_dt, th * u_prev, nu=th * cfg.nu
            )
            res_u = yu - rhs_u
            fx = -jnp.sum(fmask * res_u[:, 0])
            fy = -jnp.sum(fmask * res_u[:, 1])

        new = FEMState(u=u, p=p, t=state.t + dt, step=state.step + 1)
        metrics = StepMetrics(
            dt=dt,
            div_pre=div_l2,
            div_post=div_l2,
            max_vel=max_vel,
            energy=energy,
            vort_max=jnp.max(jnp.abs(vort)),
            poisson_res=relres,
            fx=fx,
            fy=fy,
        )
        return new, metrics

    return step


def solve_stokes_sharded(
    ops: ElementOps, cfg: FEMConfig, g, mesh: Mesh, axis: str = "x"
) -> FEMState:
    """Sharded-assembly steady Stokes init (models.fem.solve_stokes)."""
    from cfdsim_tpu.models.fem import _preconditioner

    g = jnp.asarray(g, dtype=ops.Nu.dtype)
    apply_sharded = make_sharded_ns_apply(ops, mesh, cfg, axis)
    dm = ops.dir_mask[:, None]

    def A(x):
        u, p = x
        yu, yp = apply_sharded(u, p)
        return (jnp.where(dm, u, yu), yp)

    bu = jnp.where(dm, g, jnp.zeros((ops.n_u, 2), dtype=ops.Nu.dtype))
    b = (bu, jnp.zeros((ops.n_p,), dtype=ops.Nu.dtype))
    M = _preconditioner(ops, cfg, None, _tau(ops, cfg))
    u, p = _gmres(A, b, (g, jnp.zeros((ops.n_p,), dtype=ops.Nu.dtype)), M, cfg)
    return FEMState(u=u, p=p, t=jnp.float32(0.0), step=jnp.int32(0))
