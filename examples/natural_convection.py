"""Natural-convection showcase: the three Boussinesq benchmarks.

1. Differentially heated square cavity (de Vahl Davis 1983): runs to
   steady state and prints the average hot-wall Nusselt number against
   the benchmark value for the chosen Ra.
2. Rayleigh–Bénard onset: two short runs bracketing the critical
   Rayleigh number Ra_c = 1708 (subcritical decay vs supercritical roll
   growth).
3. Optionally (--cube) the 3D heated cube against the Tric et al. (2000)
   spectral benchmark.

Run:  python examples/natural_convection.py [Ra] [--cube]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

BENCH_2D = {1e3: 1.118, 1e4: 2.243, 1e5: 4.519, 1e6: 8.800}
BENCH_CUBE = {1e4: 2.054, 1e5: 4.337, 1e6: 8.640}


def drive(case, t_end, chunk=1000):
    f = jax.jit(lambda s0: jax.lax.scan(
        lambda st, _: case.step(st, jnp.float32(1.0)), s0, None, length=chunk))
    s = case.state
    ms = None
    while float(s.t) < t_end:
        s, ms = f(s)
    return s, ms


def main():
    from cfdsim_tpu.cases import heated_cavity, heated_cube, rayleigh_benard

    Ra = float(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else 1e4

    case = heated_cavity(n=64 if Ra < 1e5 else 128, Ra=Ra)
    s, ms = drive(case, 0.6 if Ra < 1e5 else 0.4)
    nu = float(np.asarray(ms.nu_hot_wall)[-1])
    ref = BENCH_2D.get(Ra)
    ref_s = f"(de Vahl Davis: {ref})" if ref else ""
    print(f"heated cavity Ra={Ra:g}: Nu = {nu:.4f} {ref_s}  "
          f"max|V| = {float(np.asarray(ms.max_vel)[-1]):.2f}")

    for ra, t_end in ((1200.0, 1.0), (3000.0, 5.0)):
        case = rayleigh_benard(ny=32, aspect=2.0, Ra=ra)
        s, ms = drive(case, t_end)
        vel = float(np.asarray(ms.max_vel)[-1])
        regime = "conducting (perturbation decayed)" if vel < 1e-2 else \
                 f"convecting (Nu = {float(np.asarray(ms.nu_hot_wall)[-1]):.3f})"
        print(f"Rayleigh-Benard Ra={ra:g} (Ra_c = 1708): {regime}")

    if "--cube" in sys.argv:
        case = heated_cube(n=48, Ra=1e4)
        s, ms = drive(case, 0.45)
        print(f"heated cube Ra=1e4: Nu = {float(np.asarray(ms.nu_hot_wall)[-1]):.4f} "
              f"(Tric et al.: {BENCH_CUBE[1e4]})")


if __name__ == "__main__":
    main()
