"""Short-horizon golden-value physics regressions (VERDICT r2 item 6).

The slow Ghia/B&P/shedding validations are gated behind
CFDSIM_SLOW_TESTS; without these goldens nothing in the default suite
would catch a physics regression that leaves tiny-grid *mechanics*
(equality/convergence/conservation) intact. Each golden runs a small
case for a fixed number of steps on CPU and compares a handful of
physical scalars (energy, extrema, body forces, heat flux, field
checksums) against stored values at tight relative tolerance.

Regenerate after an INTENDED physics change with:
    CFDSIM_WRITE_GOLDENS=1 python -m pytest tests/test_goldens.py -q
then commit the updated tests/goldens.json with a note on what moved.
"""

import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfdsim_tpu.cases import build

GOLDEN_PATH = Path(__file__).parent / "goldens.json"
RTOL = 2e-5  # fp32 scalars on a fixed platform reproduce far tighter

# name -> (builder kwargs, steps); tiny grids, < ~15 s each on CPU
CASES = {
    "cavity_collocated_48": (dict(name="cavity", n=48, Re=100.0), 300),
    "cavity_mac_48_re1000": (dict(name="cavity_mac", n=48, Re=1000.0), 300),
    "heated_cavity_32": (dict(name="heated_cavity", n=32, Ra=1e4), 300),
    "cylinder_mac_forces": (
        dict(name="cylinder_mac", nx=96, ny=48, Re=100.0,
             ibm_profile="sharp"),
        200,
    ),
    "wedge_shock": (dict(name="wedge", nx=120, ny=60), 150),
    "heated_sphere_nu": (
        dict(name="heated_sphere", nx=32, ny=16, nz=16, Re=100.0,
             domain=(8.0, 4.0, 4.0), center=(2.0, 2.0, 2.0),
             ibm_ramp_steps=4),
        60,
    ),
    "sphere_ghost_ibm": (
        dict(name="sphere_stretched", nx=36, ny=20, nz=20, Re=100.0,
             domain=(8.0, 4.0, 4.0), center=(2.0, 2.0, 2.0),
             refine_strength=2.0, refine_width=1.0,
             ibm_scheme="ghost", ibm_ramp_steps=4),
        60,
    ),
    # the M=2.5 open-cavity flagship (Rossiter-mode validation, round
    # 5): both the reference-parity pinned-quiescent mode and the
    # real-geometry solid-plate mode
    "cavity_supersonic_pin": (
        dict(name="cavity_supersonic", nx=150, ny=45), 150),
    "cavity_supersonic_real": (
        dict(name="cavity_supersonic", nx=150, ny=45,
             real_geometry=True), 150),
}


def _field_sigs(state):
    """Physical scalars from the final state: per-field L2 checksums."""
    out = {}
    for name in state._fields:
        v = getattr(state, name)
        if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 2:
            out[f"l2_{name}"] = float(jnp.sqrt(jnp.mean(
                jnp.asarray(v, jnp.float32) ** 2)))
            out[f"max_{name}"] = float(jnp.max(jnp.abs(v)))
    return out


def _run_signature(name: str) -> dict:
    kwargs, steps = CASES[name]
    kwargs = dict(kwargs)
    case = build(kwargs.pop("name"), **kwargs)

    def chunk(s):
        def body(c, _):
            c2, m = case.step(c, jnp.float32(1.0))
            return c2, None

        return jax.lax.scan(body, s, None, length=steps)[0]

    s = jax.jit(chunk)(case.state)
    _, m = jax.jit(case.step)(s, jnp.float32(1.0))
    sig = _field_sigs(s)
    for mname in ("energy", "max_vel", "fx", "fy", "nusselt", "q_body",
                  "vort_max"):
        v = getattr(m, mname, None)
        if v is not None:
            sig[mname] = float(v)
    return sig


@pytest.mark.parametrize("name", sorted(CASES))
def test_golden(name):
    sig = _run_signature(name)
    if os.environ.get("CFDSIM_WRITE_GOLDENS") == "1":
        data = (json.loads(GOLDEN_PATH.read_text())
                if GOLDEN_PATH.exists() else {})
        data[name] = sig
        GOLDEN_PATH.write_text(json.dumps(data, indent=1, sort_keys=True))
        pytest.skip(f"golden for {name} rewritten")
    data = json.loads(GOLDEN_PATH.read_text())
    assert name in data, f"no golden for {name}; regenerate (module doc)"
    ref = data[name]
    # Noise floor: quantities that are numerical zeros (e.g. fy on a
    # symmetric sphere, ~1e-8) shift at noise level whenever the solver's
    # fp reduction order changes (e.g. a faster-but-equal Poisson variant).
    # The floor applies ONLY to keys whose golden value is itself below
    # it — small-but-physical keys (l2_theta ~0.57 next to max_p ~2563)
    # keep the tight relative band (ADVICE r3: the old max(rtol, atol)
    # silently loosened them ~230x).
    scale = max(abs(v) for v in ref.values())
    atol = 1e-6 * scale
    for key, want in ref.items():
        got = sig[key]
        tol = RTOL * abs(want) if abs(want) > atol else atol
        assert abs(got - want) <= tol, (
            f"{name}.{key}: {got!r} != golden {want!r} "
            f"(|Δ|={abs(got - want):.3e} > {tol:.3e}) — physics changed? "
            f"If intended, regenerate (see module docstring)."
        )
