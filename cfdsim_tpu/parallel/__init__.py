"""Multi-chip parallelism: 2D spatial domain decomposition over a device
mesh (SURVEY.md §2.6 — the reference has no distributed compute at all;
this module is the ICI-native scaling story).

Two complementary paths:

- ``sharded``: GSPMD auto-partitioning — jit the *same* single-device step
  with ``NamedSharding(P("y", "x"))`` annotations and let XLA insert the
  halo collectives (the scaling-book recipe).
- ``halo``: explicit ``shard_map`` + ``lax.ppermute`` halo exchange for the
  inner hot loops where manual comm scheduling matters (ghost-cell swaps =
  the reference's NG=2 ghost layout, cavity_flow_v1.py:258-262, made
  inter-chip).
"""

from cfdsim_tpu.parallel.mesh import make_grid_mesh, field_sharding
from cfdsim_tpu.parallel.halo import halo_exchange
from cfdsim_tpu.parallel.sharded import shard_state, make_sharded_step

__all__ = [
    "make_grid_mesh",
    "field_sharding",
    "halo_exchange",
    "shard_state",
    "make_sharded_step",
]
