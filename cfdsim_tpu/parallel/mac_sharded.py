"""Multi-chip sharding for the staggered (MAC) solvers.

MAC face arrays are (ny, nx+1) / (ny+1, nx) — one dimension is never
divisible by the mesh, which JAX's explicit NamedShardings require. The
trick: the *last* boundary face of each component is always a function of
the interior through ``MACBCs.set_normal`` (Dirichlet wall/inflow value or
outflow copy), so the distributed state stores the trimmed arrays
u[:, :-1], v[:-1, :] — every array (ny, nx), cleanly P("y","x")-shardable
— and the jitted step reconstructs the full faces, runs the normal MAC
step, and trims again. GSPMD inserts the halo collectives exactly as for
the collocated path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cfdsim_tpu.models.mac import MACBCs, MACState


def trim_state(state: MACState) -> MACState:
    """Full MAC state → mesh-divisible trimmed state (drop the last
    boundary face of u and v; they are re-derived by set_normal)."""
    return state._replace(u=state.u[:, :-1], v=state.v[:-1, :])


def untrim_state(tstate: MACState, bcs: MACBCs) -> MACState:
    """Trimmed state → full MAC state (boundary faces re-imposed)."""
    u = jnp.pad(tstate.u, ((0, 0), (0, 1)))
    v = jnp.pad(tstate.v, ((0, 1), (0, 0)))
    u, v = bcs.set_normal(u, v, tstate.step, tstate.t)
    return tstate._replace(u=u, v=v)


def shard_trimmed_state(tstate: MACState, mesh: Mesh) -> MACState:
    sh = NamedSharding(mesh, P("y", "x"))

    def place(x):
        x = jnp.asarray(x)
        if jnp.ndim(x) == 2:
            return jax.device_put(x, sh)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, tstate)


def make_sharded_mac_step(step_fn, bcs: MACBCs, mesh: Mesh):
    """Lift a MAC ``step(state, cfl) -> (state, metrics)`` to the trimmed
    representation: ``tstep(tstate, cfl) -> (tstate, metrics)`` operating
    on P("y","x")-sharded (ny, nx) arrays. Exact: the reconstruction uses
    the same set_normal writes the step itself applies first."""
    del mesh  # placement is carried by the committed input shardings

    def tstep(tstate: MACState, cfl_scale):
        state = untrim_state(tstate, bcs)
        new_state, metrics = step_fn(state, cfl_scale)
        return trim_state(new_state), metrics

    return jax.jit(tstep)
