"""End-to-end differentiability: the whole solver is a pure jitted
function, so gradients flow through N steps (with jax.checkpoint
rematerialization trading FLOPs for memory) — an adjoint capability the
reference's NumPy/Numba scripts cannot express."""

import jax
import jax.numpy as jnp
import numpy as np

from cfdsim_tpu.cases import lid_cavity
from cfdsim_tpu.solvers.poisson import PoissonConfig


def _case():
    return lid_cavity(
        n=24, Re=100.0, poisson=PoissonConfig(method="jacobi", iters=8)
    )


def test_gradient_through_unrolled_steps():
    case = _case()

    def loss(u0):
        state = case.state._replace(u=u0)

        def body(s, _):
            s2, _ = case.step(s, jnp.float32(1.0))
            return s2, None

        final, _ = jax.lax.scan(jax.checkpoint(body), state, None, length=8)
        return jnp.mean(final.u**2)

    g = jax.jit(jax.grad(loss))(case.state.u)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0  # gradient actually flows


def test_gradient_matches_finite_difference():
    case = _case()

    def loss(scale):
        state = case.state._replace(u=case.state.u + scale)

        def body(s, _):
            s2, _ = case.step(s, jnp.float32(1.0))
            return s2, None

        final, _ = jax.lax.scan(body, state, None, length=5)
        return jnp.mean(final.u**2)

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    eps = 1e-2
    fd = (float(loss(jnp.float32(eps))) - float(loss(jnp.float32(-eps)))) / (2 * eps)
    assert abs(g - fd) < 0.05 * max(abs(fd), 1e-6), f"grad {g} vs fd {fd}"
