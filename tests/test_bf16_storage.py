"""bf16 inter-step velocity storage (VERDICT r4 #3 bandwidth experiment).

`storage="bf16"` on the collocated and MAC tiers stores u/v in bfloat16
between steps while all compute (stencils, projection) stays fp32.  The
tests pin the contract: dtypes round-trip, the run stays healthy, the
projection still produces small divergence, and the trajectory tracks
the fp32 run to bf16 rounding (~4e-3 relative) — NOT to fp32 accuracy,
which is exactly why this is a measured experiment and not the default
(see BENCHNOTES "bf16 storage").
"""

import jax
import jax.numpy as jnp
import numpy as np

from cfdsim_tpu.cases import lid_cavity, lid_cavity_mac


def _run(case, n):
    f = jax.jit(lambda s: jax.lax.scan(
        lambda st, _: case.step(st, jnp.float32(1.0)), s, None, length=n))
    s, m = f(case.state)
    return s, m


def test_mac_bf16_storage_roundtrip_and_health():
    case = lid_cavity_mac(n=64, Re=100.0, storage="bf16")
    assert case.state.u.dtype == jnp.bfloat16
    assert case.state.p.dtype == jnp.float32  # p warm-starts the solve
    s, m = _run(case, 50)
    assert s.u.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(s.u.astype(jnp.float32))))
    # projection quality is measured pre-rounding inside the step
    assert float(m.div_post[-1]) < 1e-3


def test_mac_bf16_tracks_fp32_to_rounding():
    c32 = lid_cavity_mac(n=64, Re=100.0)
    c16 = lid_cavity_mac(n=64, Re=100.0, storage="bf16")
    s32, _ = _run(c32, 50)
    s16, _ = _run(c16, 50)
    err = float(jnp.max(jnp.abs(
        s16.u.astype(jnp.float32) - s32.u)))
    # bf16 has an 8-bit mantissa: per-step rounding ~4e-3·|u|; over 50
    # steps the diffusive dynamics keep the gap O(1e-2) on the unit lid
    assert err < 5e-2, err
    assert err > 0  # it IS a different trajectory (sanity)


def test_collocated_bf16_storage_runs():
    case = lid_cavity(n=64, Re=100.0, storage="bf16")
    assert case.state.u.dtype == jnp.bfloat16
    s, m = _run(case, 50)
    assert s.u.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(s.u.astype(jnp.float32))))
    u = np.asarray(s.u.astype(jnp.float32))
    assert 0.0 < np.abs(u).max() <= 1.5
