"""High-Re Ghia cavity regression at 128² (slow; CFDSIM_SLOW_TESTS=1)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdsim_tpu.cases import lid_cavity
from cfdsim_tpu.validation import ghia_error

pytestmark = pytest.mark.skipif(
    os.environ.get("CFDSIM_SLOW_TESTS") != "1",
    reason="set CFDSIM_SLOW_TESTS=1 to run high-Re Ghia regressions",
)


# Measured on this scheme (implicit, exact/mg projection): 128² gives
# (eu, ev) ≈ (0.005, 0.005) at Re=100, (0.020, 0.024) at Re=400,
# (0.069, 0.083) at Re=1000; 256² reaches (0.007, 0.012) at Re=400 and
# (0.018, 0.019) at Re=1000 (2nd-order convergence). Tolerances =
# measured + 20% (round-2 verdict: the old +100-400% margins would have
# passed a substantially degraded solver).
@pytest.mark.parametrize("Re,t_end,tol", [(100, 30.0, 0.006),
                                          (400, 60.0, 0.029),
                                          (1000, 100.0, 0.10)])
def test_ghia_profiles_128(Re, t_end, tol):
    case = lid_cavity(n=128, Re=float(Re), diffusion="implicit", cfl=0.6)
    f = jax.jit(lambda s, c: jax.lax.scan(
        lambda st, _: case.step(st, c), s, None, length=500))
    state = case.state
    while float(state.t) < t_end:
        state, m = f(state, jnp.float32(1.0))
    assert np.all(np.isfinite(np.asarray(state.u)))
    eu, ev = ghia_error(
        state.u, state.v, Re, case.grid.y_coords(), case.grid.x_coords()
    )
    assert eu < tol, f"Re={Re} u-profile RMS {eu}"
    assert ev < tol, f"Re={Re} v-profile RMS {ev}"
