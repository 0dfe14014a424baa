"""Mach-2 flow over a 10° wedge with θ-β-M validation and rendering.

Reproduces the reference's shockwave workflow (v1_shock.py main(),
:454-503): run the compressible FV solver, snapshot to HDF5, render
density frames, and report the measured oblique-shock angle and jump
ratios against the analytic θ-β-M relation (β ≈ 39.3°, p₂/p₁ ≈ 1.707,
ρ₂/ρ₁ ≈ 1.458 on the weak branch).

Run:  python examples/wedge_shock.py [--flux hllc|roe|rusanov] [--t-final 1.5]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flux", default="hllc", choices=["hllc", "roe", "rusanov"])
    ap.add_argument("--t-final", type=float, default=1.5)
    ap.add_argument("--nx", type=int, default=400)
    ap.add_argument("--ny", type=int, default=200)
    ap.add_argument("--out", default="out/wedge")
    args = ap.parse_args()

    import jax.numpy as jnp

    from cfdsim_tpu.cases import wedge
    from cfdsim_tpu.io_ import SnapshotWriter
    from cfdsim_tpu.monitor import check_compressible
    from cfdsim_tpu.runner import RunnerConfig, Simulation
    from cfdsim_tpu.solvers.riemann import cons_to_prim
    from cfdsim_tpu.viz import render_frames_from_hdf5

    out = Path(args.out)
    case = wedge(nx=args.nx, ny=args.ny, flux=args.flux, reconstruction="muscl")
    writer = SnapshotWriter(out / "snapshots.h5")
    sim = Simulation(
        case.step, case.state,
        RunnerConfig(t_final=args.t_final, chunk_steps=200, snapshot_interval=400),
        case.grid.n_cells,
        snapshot_fn=lambda s, st, t: writer.save(st, t, U=s.U),
        health_fn=lambda m, step: check_compressible(m),
    )
    state, report = sim.run()
    print("run report:", report)

    U = np.asarray(state.U)
    rho = U[0]
    X = case.grid.x_coords()
    Y = case.grid.y_coords()
    xs, ys = [], []
    for j in range(len(X)):
        if 1.0 <= X[j] <= 1.8:
            idx = np.where(rho[:, j] > 1.2)[0]
            if len(idx):
                xs.append(X[j])
                ys.append(Y[idx.max()])
    beta = np.degrees(np.arctan(np.polyfit(xs, ys, 1)[0]))
    jj = int(np.argmin(np.abs(X - 1.5)))
    ii = int(np.argmin(np.abs(Y - (np.tan(np.deg2rad(10)) * 1.0 + 0.08))))
    r, u, v, p = (np.asarray(a) for a in cons_to_prim(jnp.asarray(U), 1.4))
    print(f"shock angle β = {beta:.1f}° (analytic 39.3°)")
    print(f"p2/p1 = {p[ii, jj]:.3f} (analytic 1.707);  "
          f"rho2/rho1 = {r[ii, jj]:.3f} (analytic 1.458)")

    render_frames_from_hdf5(out / "snapshots.h5", out / "frames",
                            grid=case.grid, fields=("density", "velocity"))
    print(f"frames in {out / 'frames'}")


if __name__ == "__main__":
    main()
