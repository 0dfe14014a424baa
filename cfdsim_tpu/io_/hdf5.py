"""HDF5 snapshot I/O.

Keeps the reference's on-disk schema — one group ``step_NNNNNN`` per
snapshot with a ``time`` attribute and gzip'd field datasets
(``save_data_to_hdf5`` v5.py:454-470, v1_shock.py:342-354,
cavity_flow_v1.py:319-332) — and adds what the reference never had: an
actual resume path (SURVEY.md §5: reference snapshots are write-only).

Device→host copies happen only here, off the jitted step path
(``jax.device_get`` at snapshot boundaries).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class SnapshotWriter:
    """Appends step snapshots to an HDF5 file (reference schema)."""

    def __init__(self, path, compression: str | None = "gzip", compression_opts=4):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.compression = compression
        self.compression_opts = compression_opts if compression else None

    def save(self, step: int, time: float, **fields) -> None:
        import h5py
        import jax

        host_fields = {
            k: np.asarray(jax.device_get(v)) for k, v in fields.items() if v is not None
        }
        with h5py.File(self.path, "a") as f:
            name = f"step_{step:06d}"
            if name in f:
                return
            g = f.create_group(name)
            g.attrs["time"] = float(time)
            for k, v in host_fields.items():
                g.create_dataset(
                    k,
                    data=v,
                    compression=self.compression,
                    compression_opts=self.compression_opts,
                )


def list_steps(path) -> list[int]:
    import h5py

    with h5py.File(path, "r") as f:
        return sorted(
            int(k.split("_")[1]) for k in f.keys() if k.startswith("step_")
        )


def load_step(path, step: int) -> tuple[dict, float]:
    """Load one snapshot: ({field: np.ndarray}, time)."""
    import h5py

    with h5py.File(path, "r") as f:
        g = f[f"step_{step:06d}"]
        fields = {k: np.asarray(g[k][:]) for k in g.keys()}
        return fields, float(g.attrs["time"])


def load_latest(path) -> tuple[dict, int, float]:
    """Resume support: load the most recent snapshot → (fields, step, time)."""
    steps = list_steps(path)
    if not steps:
        raise FileNotFoundError(f"no snapshots in {path}")
    step = steps[-1]
    fields, t = load_step(path, step)
    return fields, step, t


def restore(state, path):
    """Restore a model state from the latest snapshot: every snapshot
    dataset whose name matches a state field is loaded (recursing into
    nested NamedTuple states like transport's CoupledState); ``t`` and
    ``step`` are taken from the snapshot metadata."""
    import jax.numpy as jnp

    fields, step, t = load_latest(path)

    def fill(st):
        updates = {}
        matched = 0
        for name in st._fields:
            v = getattr(st, name)
            if hasattr(v, "_fields"):
                sub, n = fill(v)
                updates[name] = sub
                matched += n
            elif name in fields:
                updates[name] = jnp.asarray(fields[name])
                matched += 1
        if "t" in st._fields:
            updates["t"] = jnp.float32(t)
        if "step" in st._fields:
            updates["step"] = jnp.int32(step)
        return st._replace(**updates), matched

    restored, matched = fill(state)
    if matched == 0:
        raise KeyError(
            f"no snapshot dataset matches state fields {state._fields}"
        )
    return restored
