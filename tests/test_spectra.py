"""Energy-spectrum diagnostic (utils/spectra.py)."""

import jax.numpy as jnp
import numpy as np

from cfdsim_tpu.utils.spectra import energy_spectrum_3d


def _tgv_centers(n):
    h = np.pi / n
    xc = (np.arange(n) + 0.5) * h
    u = (np.sin(xc)[None, None, :] * np.cos(xc)[None, :, None]
         * np.cos(xc)[:, None, None])
    v = (-np.cos(xc)[None, None, :] * np.sin(xc)[None, :, None]
         * np.cos(xc)[:, None, None])
    w = np.zeros((n, n, n))
    return (jnp.asarray(u, jnp.float32), jnp.asarray(v, jnp.float32),
            jnp.asarray(w, jnp.float32))


def test_parseval_total_energy():
    rng = np.random.default_rng(0)
    n = 16
    uc = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((n, n, n)), jnp.float32)
    k, e = energy_spectrum_3d(uc, vc, wc)
    ke_phys = 0.5 * float(jnp.mean(uc**2 + vc**2 + wc**2))
    assert abs(e.sum() - ke_phys) < 1e-4 * ke_phys


def test_tgv_mode_concentrates_at_k_sqrt3():
    # u = sin x cos y cos z on the mirrored box is the (1,1,1) mode:
    # all energy in the |k| = √3 → shell 2 bin
    n = 24
    uc, vc, wc = _tgv_centers(n)
    k, e = energy_spectrum_3d(uc, vc, wc, mirror=True)
    ke_phys = 0.5 * float(jnp.mean(uc**2 + vc**2 + wc**2))
    assert abs(e.sum() - ke_phys) < 1e-3 * ke_phys  # Parseval with mirror
    assert e[2] > 0.999 * e.sum(), e[:6] / e.sum()


def test_energy_spectrum_2d_parseval_and_mode():
    from cfdsim_tpu.utils.spectra import energy_spectrum_2d

    n = 32
    x = (np.arange(n) + 0.5) * (2 * np.pi / n)
    u = jnp.asarray(np.sin(4 * x)[None, :] * np.ones((n, 1)), jnp.float32)
    v = jnp.asarray(np.cos(3 * x)[:, None] * np.ones((1, n)), jnp.float32)
    k, e = energy_spectrum_2d(u, v)
    ke = 0.5 * float(jnp.mean(u**2 + v**2))
    assert abs(e.sum() - ke) < 1e-4 * ke
    assert e[3] + e[4] > 0.999 * e.sum()


def test_single_axis_mode_lands_in_its_shell():
    n = 16
    x = (np.arange(n) + 0.5) * (2 * np.pi / n)
    uc = jnp.asarray(
        np.broadcast_to(np.sin(3 * x)[None, None, :], (n, n, n)), jnp.float32
    )
    z = jnp.zeros((n, n, n), jnp.float32)
    k, e = energy_spectrum_3d(uc, z, z)
    assert e[3] > 0.999 * e.sum()
    assert abs(e.sum() - 0.25) < 1e-3  # ⟨sin²⟩/2
