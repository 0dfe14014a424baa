"""Fully explicit shard_map NS step: every halo exchange, boundary write,
and reduction hand-placed.

The GSPMD path (``make_sharded_step``) lets XLA insert the collectives;
this module is the manual counterpart for the lid-driven cavity — the
template for custom comm scheduling at scale. Inside one ``shard_map``
over the ("y","x") mesh, a full Chorin projection step runs on local
blocks:

- stencils: ``lax.ppermute`` halo exchange per application (ghost-cell
  swaps over ICI — the reference's NG ghost layout, cavity_flow_v1.py:
  258-262, made inter-chip), zero-frame semantics restored with a
  global-interior mask;
- BCs: edge writes guarded by ``lax.axis_index`` so only boundary shards
  touch their global edges;
- pressure: distributed red-black SOR with per-color halo exchange and
  globally correct checkerboard ordering (``sharded.rbsor_local``);
- reductions (adaptive dt, rhs mean, metrics): local reduce + ``psum``/
  ``pmax`` over both mesh axes.

Matches the single-device step exactly when configured with the same
rbsor Poisson (verified in tests/test_explicit_step.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from cfdsim_tpu.models.incompressible import (
    IncompressibleConfig,
    IncompressibleState,
    StepMetrics,
)
from cfdsim_tpu.parallel.halo import (
    global_interior_mask,
    halo_exchange,
)
from cfdsim_tpu.parallel.sharded import rbsor_local

AXES = ("y", "x")


def _pmax(x):
    return lax.pmax(lax.pmax(x, "y"), "x")


def _pmean(x_sum, n_global):
    return lax.psum(lax.psum(x_sum, "y"), "x") / n_global


def make_cavity_explicit_step(cfg: IncompressibleConfig, mesh: Mesh,
                              lid_velocity: float = 1.0):
    """Explicit-comm step for the lid-driven cavity (central convection,
    explicit diffusion, distributed rbsor projection). Poisson sweeps come
    from ``cfg.poisson.iters``/``omega`` (method must be "rbsor")."""
    assert cfg.poisson.method == "rbsor", "explicit step uses distributed rbsor"
    g = cfg.grid
    dx, dy = g.dx, g.dy
    ax, ay = 1.0 / (dx * dx), 1.0 / (dy * dy)
    py = mesh.shape["y"]
    px = mesh.shape["x"]
    n_global = float(g.nx * g.ny)
    spec = P("y", "x")
    state_spec = IncompressibleState(u=spec, v=spec, p=spec, t=P(), step=P())
    metric_spec = StepMetrics(*([P()] * len(StepMetrics._fields)))

    def bc(u, v):
        """Cavity BCs as global-edge writes on boundary shards only."""
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")
        u = jnp.where(ix == 0, u.at[:, 0].set(0.0), u)
        u = jnp.where(ix == px - 1, u.at[:, -1].set(0.0), u)
        u = jnp.where(iy == 0, u.at[0, :].set(0.0), u)
        u = jnp.where(iy == py - 1, u.at[-1, :].set(lid_velocity), u)
        v = jnp.where(ix == 0, v.at[:, 0].set(0.0), v)
        v = jnp.where(ix == px - 1, v.at[:, -1].set(0.0), v)
        v = jnp.where(iy == 0, v.at[0, :].set(0.0), v)
        v = jnp.where(iy == py - 1, v.at[-1, :].set(0.0), v)
        return u, v

    def stencil(op, *fields):
        """Apply a zero-frame stencil op with explicit halos."""
        padded = [halo_exchange(f, py, px, width=1) for f in fields]
        out = op(*padded)
        outs = out if isinstance(out, tuple) else (out,)
        mask = global_interior_mask(fields[0].shape, width=1)
        cropped = tuple(jnp.where(mask, o[1:-1, 1:-1], 0.0) for o in outs)
        return cropped if isinstance(out, tuple) else cropped[0]

    from cfdsim_tpu.ops.convection import convection_central
    from cfdsim_tpu.ops.stencil import divergence, gradient, laplacian_coeff

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(state_spec, P()),
        out_specs=(state_spec, metric_spec),
    )
    def step(state: IncompressibleState, cfl_scale):
        u, v, p = state.u, state.v, state.p

        # adaptive dt: local max + pmax (v5.py:316-326 semantics)
        vel_max = _pmax(
            jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v)))
        )
        vel_max = jnp.maximum(vel_max, 1e-10)
        h = min(dx, dy)
        dt_cfl = cfg.cfl_target * cfl_scale * h / vel_max
        dt_visc = 0.2 * h * h / cfg.nu
        dt = jnp.clip(
            jnp.minimum(dt_cfl, dt_visc), cfg.dt_min, cfg.dt_max
        ).astype(jnp.float32)

        conv_u = stencil(lambda a, b, c: convection_central(a, b, c, dx, dy), u, v, u)
        conv_v = stencil(lambda a, b, c: convection_central(a, b, c, dx, dy), u, v, v)
        lap_u = stencil(lambda a: laplacian_coeff(a, dx, dy, cfg.nu), u)
        lap_v = stencil(lambda a: laplacian_coeff(a, dx, dy, cfg.nu), v)
        u_star = u + dt * (lap_u - conv_u)
        v_star = v + dt * (lap_v - conv_v)
        u_star, v_star = bc(u_star, v_star)

        div_star = stencil(lambda a, b: divergence(a, b, dx, dy), u_star, v_star)
        rhs = div_star / dt
        rhs = rhs - _pmean(jnp.sum(rhs), n_global)  # Neumann solvability
        phi = rbsor_local(
            p, rhs, py, px, ax, ay, cfg.poisson.iters, cfg.poisson.omega
        )
        gx, gy = stencil(lambda a: gradient(a, dx, dy), phi)
        u_new = u_star - dt * gx
        v_new = v_star - dt * gy
        u_new, v_new = bc(u_new, v_new)
        u_new = jnp.clip(u_new, -cfg.max_velocity, cfg.max_velocity)
        v_new = jnp.clip(v_new, -cfg.max_velocity, cfg.max_velocity)

        new_state = IncompressibleState(
            u=u_new, v=v_new, p=phi, t=state.t + dt, step=state.step + 1
        )

        div_post = stencil(lambda a, b: divergence(a, b, dx, dy), u_new, v_new)
        imask = global_interior_mask(u_new.shape, width=2)
        energy = _pmean(jnp.sum(0.5 * (u_new**2 + v_new**2)), n_global)
        metrics = StepMetrics(
            dt=dt,
            div_pre=_pmax(jnp.max(jnp.abs(div_star))),
            div_post=_pmax(jnp.max(jnp.where(imask, jnp.abs(div_post), 0.0))),
            max_vel=_pmax(
                jnp.maximum(jnp.max(jnp.abs(u_new)), jnp.max(jnp.abs(v_new)))
            ),
            energy=energy,
            vort_max=jnp.float32(0.0),  # not computed on the explicit path
            poisson_res=jnp.float32(0.0),
        )
        return new_state, metrics

    return step


def make_cylinder_explicit_step(cfg: IncompressibleConfig, mesh: Mesh,
                                ibm_mask, v_inf: float = 1.0):
    """Explicit-comm step for the IBM cylinder case (upwind convection,
    inflow with the reference's perturbation ramp, penalization forcing,
    distributed rbsor projection).

    ``ibm_mask`` is the *global* (ny, nx) Gaussian-shell mask; pass it
    sharded (``jax.device_put(mask, NamedSharding(mesh, P("y","x")))``) as
    the step's third argument along with a P("y")-sharded global y-coord
    vector: ``step(state, cfl_scale, ibm_block, y_block)``.
    """
    assert cfg.poisson.method == "rbsor", "explicit step uses distributed rbsor"
    g = cfg.grid
    dx, dy = g.dx, g.dy
    ax, ay = 1.0 / (dx * dx), 1.0 / (dy * dy)
    py = mesh.shape["y"]
    px = mesh.shape["x"]
    n_global = float(g.nx * g.ny)
    spec = P("y", "x")
    state_spec = IncompressibleState(u=spec, v=spec, p=spec, t=P(), step=P())
    metric_spec = StepMetrics(*([P()] * len(StepMetrics._fields)))

    from cfdsim_tpu.ops.convection import convection_upwind
    from cfdsim_tpu.ops.stencil import divergence, gradient, laplacian_coeff

    def stencil(op, *fields):
        padded = [halo_exchange(f, py, px, width=1) for f in fields]
        out = op(*padded)
        outs = out if isinstance(out, tuple) else (out,)
        mask = global_interior_mask(fields[0].shape, width=1)
        cropped = tuple(jnp.where(mask, o[1:-1, 1:-1], 0.0) for o in outs)
        return cropped if isinstance(out, tuple) else cropped[0]

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(state_spec, P(), spec, P("y")),
        out_specs=(state_spec, metric_spec),
    )
    def step(state: IncompressibleState, cfl_scale, ibm_b, y_b):
        u, v, p = state.u, state.v, state.p
        iy = lax.axis_index("y")
        ix = lax.axis_index("x")

        def bc(uu, vv):
            # inflow perturbation ramp (reference v5.py:349-360) on x_lo
            scale = jnp.minimum(1.0, state.step / 1000.0) * 0.01
            pert = scale * jnp.sin(
                2.0 * jnp.pi * y_b / g.y_max + 0.02 * state.step
            )
            uu = jnp.where(ix == 0, uu.at[:, 0].set(v_inf * (1.0 + pert)), uu)
            vv = jnp.where(ix == 0, vv.at[:, 0].set(0.0), vv)
            # Neumann outflow at x_hi
            uu = jnp.where(ix == px - 1, uu.at[:, -1].set(uu[:, -2]), uu)
            vv = jnp.where(ix == px - 1, vv.at[:, -1].set(vv[:, -2]), vv)
            # no-slip walls
            uu = jnp.where(iy == 0, uu.at[0, :].set(0.0), uu)
            uu = jnp.where(iy == py - 1, uu.at[-1, :].set(0.0), uu)
            vv = jnp.where(iy == 0, vv.at[0, :].set(0.0), vv)
            vv = jnp.where(iy == py - 1, vv.at[-1, :].set(0.0), vv)
            return uu, vv

        strength = jnp.minimum(
            1.0, state.step.astype(jnp.float32) / max(cfg.ibm_ramp_steps, 1)
        ) if cfg.ibm_ramp_steps > 0 else jnp.float32(1.0)
        damp = 1.0 - ibm_b * strength

        vel_max = _pmax(jnp.maximum(jnp.max(jnp.abs(u)), jnp.max(jnp.abs(v))))
        vel_max = jnp.maximum(vel_max, 1e-10)
        h = min(dx, dy)
        nu_tot = cfg.nu + cfg.artificial_viscosity
        dt = jnp.clip(
            jnp.minimum(
                cfg.cfl_target * cfl_scale * h / vel_max,
                0.2 * h * h / nu_tot,
            ),
            cfg.dt_min, cfg.dt_max,
        )
        if cfg.warmup_steps > 0:
            dt = jnp.where(
                state.step < cfg.warmup_steps, jnp.float32(cfg.warmup_dt), dt
            )
        dt = dt.astype(jnp.float32)

        conv_u = stencil(lambda a, b, c: convection_upwind(a, b, c, dx, dy), u, v, u)
        conv_v = stencil(lambda a, b, c: convection_upwind(a, b, c, dx, dy), u, v, v)
        lap_u = stencil(lambda a: laplacian_coeff(a, dx, dy, nu_tot), u)
        lap_v = stencil(lambda a: laplacian_coeff(a, dx, dy, nu_tot), v)
        u_star = u + dt * (lap_u - conv_u)
        v_star = v + dt * (lap_v - conv_v)
        u_star, v_star = bc(u_star, v_star)
        u_star = u_star * damp
        v_star = v_star * damp

        div_star = stencil(lambda a, b: divergence(a, b, dx, dy), u_star, v_star)
        rhs = div_star / dt
        rhs = rhs - _pmean(jnp.sum(rhs), n_global)
        phi = rbsor_local(
            p, rhs, py, px, ax, ay, cfg.poisson.iters, cfg.poisson.omega
        )
        gx, gy = stencil(lambda a: gradient(a, dx, dy), phi)
        u_new = u_star - dt * gx
        v_new = v_star - dt * gy
        u_new, v_new = bc(u_new, v_new)
        u_new = u_new * damp
        v_new = v_new * damp
        u_new = jnp.clip(u_new, -cfg.max_velocity, cfg.max_velocity)
        v_new = jnp.clip(v_new, -cfg.max_velocity, cfg.max_velocity)

        new_state = IncompressibleState(
            u=u_new, v=v_new, p=phi, t=state.t + dt, step=state.step + 1
        )
        div_post = stencil(lambda a, b: divergence(a, b, dx, dy), u_new, v_new)
        imask = global_interior_mask(u_new.shape, width=2)
        metrics = StepMetrics(
            dt=dt,
            div_pre=_pmax(jnp.max(jnp.abs(div_star))),
            div_post=_pmax(jnp.max(jnp.where(imask, jnp.abs(div_post), 0.0))),
            max_vel=_pmax(
                jnp.maximum(jnp.max(jnp.abs(u_new)), jnp.max(jnp.abs(v_new)))
            ),
            energy=_pmean(jnp.sum(0.5 * (u_new**2 + v_new**2)), n_global),
            vort_max=jnp.float32(0.0),
            poisson_res=jnp.float32(0.0),
        )
        return new_state, metrics

    return step
