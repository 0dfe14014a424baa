"""Kármán vortex-street / Strouhal regression (BASELINE config 4).

Slow (minutes): skipped unless CFDSIM_SLOW_TESTS=1. Measured behavior on
this rig (Re=150, upwind, ~17-22 cells per diameter): St ≈ 0.22 at the
reference geometry's 25% blockage, ≈ 0.14 at 12.5% blockage — straddling
the unconfined empirical St ≈ 0.18 and showing the correct confinement
trend. The CI assertion is deliberately generous: shedding must exist
(probe amplitude) with St in [0.12, 0.27].
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("CFDSIM_SLOW_TESTS") != "1",
    reason="set CFDSIM_SLOW_TESTS=1 to run shedding regression",
)


def test_cylinder_vortex_shedding_strouhal():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from cylinder_shedding import run_shedding

    from cfdsim_tpu.validation import strouhal_number

    times, probe, case = run_shedding(
        Re=150.0, t_final=70.0, nx=300, ny=90, verbose=False
    )
    n0 = int(0.4 * len(probe))
    sample_dt = float(np.mean(np.diff(times[n0:])))
    amp = float(np.std(probe[n0:]))
    St = strouhal_number(probe[n0:], sample_dt, 2 * case.extras["radius"], 1.0)
    assert amp > 0.1, f"no vortex shedding (probe amplitude {amp})"
    assert 0.12 <= St <= 0.27, f"Strouhal {St} outside plausible band"
