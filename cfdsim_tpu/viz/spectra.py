"""Kinetic-energy spectra E(k) — turbulence diagnostics for the
spectral / LES tiers.

Radially binned shell spectrum of the velocity field on a uniform
periodic grid (2D or 3D): E(k) = ½ Σ_{|k'|∈shell k} |û(k')|², with the
FFT normalized so that Σ_k E(k) = mean(½|u|²) (Parseval — tested). The
reference's Kolmogorov solver renders vorticity frames only
(plot.jl:134-165); a quantitative spectrum is the standard companion
diagnostic (e.g. the k^-5/3 inertial range, or LES pile-up checks at
the grid scale).

All-device computation via jnp FFTs; one small host transfer for the
binned result.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def energy_spectrum(*components, lengths=None):
    """Shell-binned kinetic-energy spectrum of a periodic velocity field.

    ``components``: 2 or 3 equal-shape arrays (u, v[, w]) sampled on a
    uniform periodic grid (collocated samples — average MAC faces to
    centers first). ``lengths``: physical domain lengths per axis
    (defaults to 2π each, making wavenumbers integers).

    Returns (k, E): bin centers (1, 2, …, k_max) and the spectrum with
    Σ E = mean(½|u|²) + the k=0 (mean-flow) share dropped.
    """
    if len(components) not in (2, 3):
        raise ValueError("energy_spectrum expects 2 or 3 components")
    shape = components[0].shape
    ndim = len(shape)
    if ndim != len(components):
        raise ValueError(
            f"{len(components)} components but {ndim}-dimensional arrays"
        )
    if lengths is None:
        lengths = (2.0 * np.pi,) * ndim
    n_tot = float(np.prod(shape))

    # integer-valued wavenumber magnitudes scaled per-axis by 2π/L
    ks = []
    for ax, (n, L) in enumerate(zip(shape, lengths)):
        k1 = np.fft.fftfreq(n, d=1.0 / n) * (2.0 * np.pi / L)
        sh = [1] * ndim
        sh[ax] = n
        ks.append(k1.reshape(sh))
    k_mag = np.sqrt(sum(np.broadcast_to(k * k, shape) for k in ks))
    k_bin = np.rint(k_mag).astype(np.int32)
    k_max = int(k_bin.max())
    flat_bins = jnp.asarray(k_bin.ravel())

    # ½|û|² with the Σ|û|²/N² = mean|u|² normalization (Parseval)
    e_hat = 0.0
    for c in components:
        ch = jnp.fft.fftn(jnp.asarray(c))
        e_hat = e_hat + 0.5 * (jnp.abs(ch) ** 2)
    e_hat = e_hat / (n_tot * n_tot)

    import jax

    spec = jax.ops.segment_sum(
        e_hat.ravel(), flat_bins, num_segments=k_max + 1
    )
    spec = np.asarray(spec)
    return np.arange(1, k_max + 1), spec[1:]


def spectrum_slope(k, E, k_lo, k_hi):
    """Least-squares log-log slope of E(k) over [k_lo, k_hi] — the
    inertial-range exponent (Kolmogorov: −5/3)."""
    m = (k >= k_lo) & (k <= k_hi) & (E > 0)
    lk, lE = np.log(k[m]), np.log(E[m])
    return float(np.polyfit(lk, lE, 1)[0])
